"""Cross-topology checkpoint restore: train state saved under one mesh
topology must restore and continue training on a different one.

The reference Checkpointer only ever round-trips on a single topology
(``speechbrain/utils/checkpoints.py:381-570`` — torch CPU/GPU tensors); the
TPU-native claim is stronger: a train state sharded over an 8-device mesh
(FSDP, or hybrid FSDP×TP) saves through the host-side ``PytreeHandle``
(``jax.device_get`` gathers shards) and restores onto 4- and 1-device
meshes — and vice versa — with training continuing exactly as if the
topology had never changed.

Bit-exactness note: sharding changes reduction order (GSPMD partitions
contractions and psums partials), so a sharded run is only fp32-close to an
unsharded one. The BIT-equal claim that *is* made: the checkpoint round-trip
(host gather → disk → restore → re-place on the new mesh) adds exactly
nothing — continued training equals a run that switched topology directly
without ever touching disk.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from svt_speechbrain_tpu.parallel.fsdp import apply_fsdp, fsdp_shardings
from svt_speechbrain_tpu.parallel.tp import apply_tp, encoder_tp_shardings
from svt_speechbrain_tpu.utils.checkpoints import Checkpointer, PytreeHandle


def _mesh(n, axis_names=("data",), shape=None):
    devs = np.array(jax.devices()[:n]).reshape(shape or (n,))
    return Mesh(devs, axis_names)


def _init_params():
    rng = np.random.default_rng(0)
    return {
        "w1": jnp.asarray(rng.normal(size=(16, 32)) * 0.2, jnp.float32),
        "b1": jnp.zeros((32,), jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(32, 8)) * 0.2, jnp.float32),
    }


def _batch():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    return x, y


TX = optax.adam(1e-2)


def _loss(params, x, y):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return jnp.mean((h @ params["w2"] - y) ** 2)


def _train(params, opt_state, steps):
    x, y = _batch()

    @jax.jit
    def step(params, opt_state):
        grads = jax.grad(_loss)(params, x, y)
        updates, opt_state = TX.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for _ in range(steps):
        params, opt_state = step(params, opt_state)
    return params, opt_state


def _save(tmpdir, state):
    ckptr = Checkpointer(tmpdir, recoverables={
        "train_state": PytreeHandle(get=lambda: state,
                                    set=lambda t: None)})
    ckptr.save_checkpoint(verbosity=0)


def _restore(tmpdir, template, place):
    """Restore into ``template``'s treedef and re-place each leaf with
    ``place`` (the new topology's sharding) — the exact mechanism
    ``core.Brain._set_module_params`` uses on recovery."""
    box = {}
    ckptr = Checkpointer(tmpdir, recoverables={
        "train_state": PytreeHandle(get=lambda: jax.device_get(template),
                                    set=lambda t: box.update(t=t))})
    assert ckptr.recover_if_possible() is not None
    return place(box["t"])


def _leaves_equal(a, b, exact=True):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        la, lb = np.asarray(la), np.asarray(lb)
        if exact:
            np.testing.assert_array_equal(la, lb)
        else:
            np.testing.assert_allclose(la, lb, rtol=2e-6, atol=1e-7)


@pytest.mark.parametrize("n_save,n_restore", [(8, 4), (8, 1), (1, 8)])
def test_fsdp_reshard_restore_bitequal(tmp_path, n_save, n_restore):
    """FSDP state saved on an ``n_save``-device mesh restores onto an
    ``n_restore``-device mesh and continues training BIT-equal to a run
    that switched topology directly (no checkpoint), and fp32-close to a
    run that never sharded at all."""
    params0 = _init_params()

    # unsharded baseline: 6 steps on one device
    base_params, _ = _train(params0, TX.init(params0), 6)

    # phase 1: train 3 steps sharded over the save mesh, checkpoint
    mesh_a = _mesh(n_save)
    p = apply_fsdp(params0, mesh_a)
    s = apply_fsdp(TX.init(params0), mesh_a)
    p, s = _train(p, s, 3)
    _save(tmp_path, {"params": p, "opt": s})

    # no-disk control: re-place the live state on the new mesh directly
    mesh_b = _mesh(n_restore)
    ctrl_p, ctrl_s = _train(apply_fsdp(p, mesh_b), apply_fsdp(s, mesh_b), 3)

    # phase 2: restore onto the other topology, finish training
    restored = _restore(
        tmp_path, {"params": p, "opt": s},
        lambda t: {"params": apply_fsdp(t["params"], mesh_b),
                   "opt": apply_fsdp(t["opt"], mesh_b)})
    # the restored leaves really are sharded over the new mesh
    w1 = restored["params"]["w1"]
    assert w1.sharding.mesh.devices.size == n_restore
    p2, s2 = _train(restored["params"], restored["opt"], 3)

    _leaves_equal(p2, ctrl_p, exact=True)       # disk round-trip: lossless
    _leaves_equal(s2, ctrl_s, exact=True)
    _leaves_equal(p2, base_params, exact=False)  # semantics vs unsharded


def _tp_layer_params():
    rng = np.random.default_rng(2)
    d, f = 16, 32
    return {"layers": {"0": {
        "ffn1": {"w": jnp.asarray(rng.normal(size=(d, f)) * 0.2, jnp.float32),
                 "b": jnp.zeros((f,), jnp.float32)},
        "ffn2": {"w": jnp.asarray(rng.normal(size=(f, d)) * 0.2, jnp.float32)},
        "attn": {"wq": jnp.asarray(rng.normal(size=(d, d)) * 0.2, jnp.float32),
                 "wo": jnp.asarray(rng.normal(size=(d, d)) * 0.2, jnp.float32)},
        "norm": {"scale": jnp.ones((d,), jnp.float32)},
    }}}


def _tp_loss(params, x, y):
    lp = params["layers"]["0"]
    h = x @ lp["attn"]["wq"]
    h = h @ lp["attn"]["wo"] * lp["norm"]["scale"]
    h = jnp.tanh(h @ lp["ffn1"]["w"] + lp["ffn1"]["b"])
    return jnp.mean((h @ lp["ffn2"]["w"] - y) ** 2)


def _tp_train(params, opt_state, steps):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)

    @jax.jit
    def step(params, opt_state):
        grads = jax.grad(_tp_loss)(params, x, y)
        updates, opt_state = TX.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for _ in range(steps):
        params, opt_state = step(params, opt_state)
    return params, opt_state


def _place_hybrid(tree, mesh):
    """FSDP over "data" on top of TP over "model" (the hybrid layout of
    ``parallel/fsdp.py``)."""
    tp_sh = encoder_tp_shardings(tree, mesh)
    sh = fsdp_shardings(tree, mesh, axis="data", base=tp_sh)
    return jax.tree_util.tree_map(jax.device_put, tree, sh)


def test_fsdp_tp_hybrid_reshard_restore(tmp_path):
    """Hybrid FSDP×TP state saved on a (4×2) mesh restores onto a (2×2)
    mesh and a single device; row-parallel TP psums matmul partials, so
    continued training matches the unsharded run to fp32 reduction
    tolerance rather than bitwise."""
    params0 = _tp_layer_params()
    base_params, _ = _tp_train(params0, TX.init(params0), 6)

    mesh_a = _mesh(8, ("data", "model"), (4, 2))
    p = _place_hybrid(params0, mesh_a)
    s = _place_hybrid(TX.init(params0), mesh_a)
    p, s = _tp_train(p, s, 3)
    _save(tmp_path, {"params": p, "opt": s})

    for mesh_b in (_mesh(4, ("data", "model"), (2, 2)),
                   _mesh(1, ("data", "model"), (1, 1))):
        restored = _restore(
            tmp_path, {"params": p, "opt": s},
            lambda t: {"params": _place_hybrid(t["params"], mesh_b),
                       "opt": _place_hybrid(t["opt"], mesh_b)})
        ffn1_w = restored["params"]["layers"]["0"]["ffn1"]["w"]
        assert ffn1_w.sharding.mesh.devices.size == mesh_b.devices.size
        p2, _ = _tp_train(restored["params"], restored["opt"], 3)
        _leaves_equal(p2, base_params, exact=False)


def test_brain_reshard_restore(tmp_path):
    """End to end through the engine: a Brain trained with the ``fsdp``
    run-opt on the full 8-device mesh checkpoints; a fresh Brain on a
    4-device mesh recovers and continues — equal to an unsharded Brain."""
    from svt_speechbrain_tpu.core import Brain
    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.dataio.batch import PaddedBatch

    lin = Linear(input_size=16, n_neurons=8)
    rng = np.random.default_rng(4)
    rows = [{"id": str(i), "sig": rng.normal(size=(16,)).astype(np.float32),
             "target": rng.normal(size=(8,)).astype(np.float32)}
            for i in range(8)]

    class Reg(Brain):
        def compute_forward(self, params, batch, stage, rng=None):
            return self.modules.model(params["model"], batch["sig"][0])

        def compute_objectives(self, predictions, batch, stage):
            return jnp.mean((predictions - batch["target"][0]) ** 2)

    def make_brain(tmpdir, mesh, fsdp):
        ckptr = Checkpointer(tmpdir) if tmpdir else None
        brain = Reg(modules={"model": lin},
                    opt_class=lambda: optax.adam(1e-2),
                    run_opts={"noprogressbar": True, "fsdp": fsdp},
                    checkpointer=ckptr)
        if mesh is not None:
            brain.mesh = mesh
        brain.load_module_params("model", lin.init(jax.random.PRNGKey(5)))
        brain.init_optimizers()
        return brain

    def fit_steps(brain, n):
        for i in range(n):
            brain.fit_batch(PaddedBatch(rows))
        return jax.device_get(brain.params["model"])

    base = make_brain(None, None, fsdp=False)
    base_params = fit_steps(base, 6)

    brain_a = make_brain(tmp_path, _mesh(8), fsdp=True)
    fit_steps(brain_a, 3)
    brain_a.checkpointer.save_checkpoint(verbosity=0)

    brain_b = make_brain(tmp_path, _mesh(4), fsdp=True)
    brain_b.checkpointer.recover_if_possible()
    got = fit_steps(brain_b, 3)

    for a, b in zip(jax.tree_util.tree_leaves(base_params),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-7)
