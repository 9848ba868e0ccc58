#!/usr/bin/env python3
"""Multi-process × model-sharding worker: FSDP×TP mesh SPANNING a process
boundary, plus a checkpoint round-trip on that layout.

The reference's multi-node contract is DDP only (pure data parallelism per
process, ``speechbrain/utils/distributed.py:107-171``). The TPU-native
design composes further: here the **model axis itself crosses OS
processes** — the device mesh is built as ``jax.devices().reshape(nprocs,
local).T`` so each TP pair (and each FSDP gather group on the other axis)
includes one device from every process, forcing XLA's collectives across
the process boundary (the DCN path of a real multi-host deployment).

One step of SGD over a TP-sharded MLP (column/row-parallel w1/w2) with an
FSDP-sharded head, batch data-parallel; then a checkpoint save on process 0
(replicated gather → ``Checkpointer``), a barrier, restore + re-place on
every process, and two more steps.

Usage (spawned by ``tests/test_multiprocess.py`` and
``__graft_entry__.dryrun_multiprocess``):

  python tools/multiproc_sharding_demo.py <proc_id> <port> <nprocs> <ckpt>

``proc_id == -1`` runs the identical program single-process (expects
``nprocs * 4`` local virtual devices) — the bit-equality reference.
"""
import os
import sys

LOCAL_DEVICES = 4


def main(proc_id, port, nprocs, ckpt_dir):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from svt_speechbrain_tpu.parallel import distributed as dist
    from svt_speechbrain_tpu.utils.checkpoints import (Checkpointer,
                                                       PytreeHandle)

    multi = proc_id >= 0
    if multi:
        dist.ddp_init_group({"distributed_launch": True,
                             "coordinator_address": f"127.0.0.1:{port}",
                             "num_processes": nprocs, "process_id": proc_id})
        assert jax.process_count() == nprocs
        assert len(jax.local_devices()) == LOCAL_DEVICES

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n = nprocs * LOCAL_DEVICES
    assert len(jax.devices()) == n, (len(jax.devices()), n)
    # transpose so the "model" axis pairs device i of every process —
    # TP collectives and FSDP gathers must cross the process boundary
    grid = np.array(jax.devices()).reshape(nprocs, LOCAL_DEVICES).T
    mesh = Mesh(grid, ("data", "model"))

    rng = np.random.default_rng(0)
    host_params = {
        "w1": (rng.normal(size=(16, 32)) * 0.2).astype(np.float32),
        "b1": np.zeros((32,), np.float32),
        "w2": (rng.normal(size=(32, 8)) * 0.2).astype(np.float32),
        "w3": (rng.normal(size=(8, 8)) * 0.2).astype(np.float32),
    }
    specs = {"w1": P(None, "model"), "b1": P("model"),   # Megatron column
             "w2": P("model", None),                      # Megatron row
             "w3": P("data", None)}                       # ZeRO-3 FSDP

    def place(host_tree):
        return {
            k: jax.make_array_from_callback(
                v.shape, NamedSharding(mesh, specs[k]),
                lambda idx, v=v: v[idx])
            for k, v in host_tree.items()}

    params = place(host_params)
    rng = np.random.default_rng(1)
    xy = {"x": rng.normal(size=(8, 16)).astype(np.float32),
          "y": rng.normal(size=(8, 8)).astype(np.float32)}
    data_sh = NamedSharding(mesh, P("data", None))
    x, y = (jax.make_array_from_callback(v.shape, data_sh,
                                         lambda idx, v=v: v[idx])
            for v in (xy["x"], xy["y"]))

    def loss_fn(p, x, y):
        h = jnp.tanh(x @ p["w1"] + p["b1"])
        return jnp.mean((h @ p["w2"] @ p["w3"] - y) ** 2)

    @jax.jit
    def step(p):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        return loss, jax.tree_util.tree_map(
            lambda w, gw: w - 0.1 * gw, p, g)

    @jax.jit
    def gather(p):  # replicate for host access / checkpointing
        return jax.lax.with_sharding_constraint(
            p, jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), p))

    loss = None
    for _ in range(3):
        loss, params = step(params)
    wsum = jnp.sum(jnp.abs(gather(params)["w1"])) + \
        jnp.sum(jnp.abs(gather(params)["w3"]))
    print(f"MPSHARD_LOSS {float(jax.device_get(loss)):.17g}")
    print(f"MPSHARD_WSUM {float(jax.device_get(wsum)):.17g}")

    # ---- checkpoint on THIS layout: gather → save on proc 0 → restore all
    host_state = {k: np.asarray(jax.device_get(v))
                  for k, v in gather(params).items()}
    if not multi or dist.if_main_process():
        Checkpointer(ckpt_dir, recoverables={
            "state": PytreeHandle(get=lambda: host_state,
                                  set=lambda t: None)}).save_checkpoint(
                                      verbosity=0)
    if multi:
        dist.ddp_barrier()
    box = {}
    ckptr = Checkpointer(ckpt_dir, recoverables={
        "state": PytreeHandle(get=lambda: host_state,
                              set=lambda t: box.update(t=t))})
    assert ckptr.recover_if_possible() is not None
    params = place(box["t"])          # re-place on the cross-process mesh

    for _ in range(2):
        loss, params = step(params)
    wsum2 = jnp.sum(jnp.abs(gather(params)["w1"])) + \
        jnp.sum(jnp.abs(gather(params)["w2"]))
    print(f"MPSHARD_LOSS2 {float(jax.device_get(loss)):.17g}")
    print(f"MPSHARD_WSUM2 {float(jax.device_get(wsum2)):.17g}")
    if multi:
        dist.ddp_barrier()
    print(f"MPSHARD_OK {proc_id}")


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), sys.argv[4])
