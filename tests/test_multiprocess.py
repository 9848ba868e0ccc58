"""Real multi-process distributed runtime: two OS processes initialize via
``ddp_init_group`` over a local coordinator, build a global sharded array
from per-process local shards, and run a cross-process collective — the
multi-host path that simulated single-process meshes cannot exercise.
(The reference's analogue is ``torch.distributed.launch`` + NCCL/Gloo DDP,
``speechbrain/utils/distributed.py:107-184``.)"""
import os
import socket
import subprocess
import sys

import pytest

from tests.conftest import REPO_ROOT

WORKER = r"""
import sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
nprocs = int(sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo_root!r})
from svt_speechbrain_tpu.parallel import distributed as dist
from svt_speechbrain_tpu.parallel import mesh as mesh_lib

dist.ddp_init_group({{"distributed_launch": True,
                     "coordinator_address": "127.0.0.1:" + port,
                     "num_processes": nprocs, "process_id": proc_id}})
assert jax.process_count() == nprocs, jax.process_count()
assert jax.process_index() == proc_id

import numpy as np
mesh = mesh_lib.make_mesh()
local = np.full((4, 2), float(proc_id + 1), np.float32)
arr = mesh_lib.shard_batch(mesh, local)   # global (4*nprocs, 2) from shards
total = float(np.asarray(jax.jit(lambda x: x.sum())(arr)))
expect = 8.0 * sum(range(1, nprocs + 1))
assert total == expect, (total, expect)
assert dist.if_main_process() == (proc_id == 0)
dist.ddp_barrier()
print("MP_OK", proc_id)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nprocs", [2, 4])
def test_multi_process_distributed_init(tmp_path, nprocs):
    """2- and 4-process topologies: the 4-process case exercises non-trivial
    ring collectives (the 2-process ring degenerates to a pairwise swap)."""
    port = str(_free_port())
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo_root=REPO_ROOT))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers use their own 1-device CPU runtime
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port, str(nprocs)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(nprocs)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"MP_OK {i}" in out


def test_ddp_init_group_raises_on_explicit_failure():
    """Requested distributed launch must not silently degrade to one
    process when initialization cannot connect."""
    from svt_speechbrain_tpu.parallel.distributed import ddp_init_group
    import jax

    if jax.process_count() > 1:  # pragma: no cover
        pytest.skip("already distributed")
    with pytest.raises(RuntimeError):
        # unroutable coordinator, tiny patience via init timeout env is not
        # available -> rely on invalid address failing fast
        ddp_init_group({"distributed_launch": True,
                        "coordinator_address": "127.0.0.1:1",
                        "num_processes": 2, "process_id": 0})


BRAIN_WORKER = r"""
import sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo_root!r})
import numpy as np
import jax.numpy as jnp
import svt_speechbrain_tpu as sb
from svt_speechbrain_tpu.parallel import distributed as dist
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet import losses
from svt_speechbrain_tpu.dataio.batch import PaddedData

dist.ddp_init_group({{"distributed_launch": True,
                     "coordinator_address": "127.0.0.1:" + port,
                     "num_processes": 2, "process_id": proc_id}})

class TinyBrain(sb.Brain):
    def compute_forward(self, params, batch, stage, rng=None):
        x, lens = batch["sig"]
        return self.modules.model(params["model"], x), lens
    def compute_objectives(self, predictions, batch, stage):
        logits, lens = predictions
        target, tlens = batch["anno"]
        return losses.mse_loss(logits, target.astype(jnp.float32), length=tlens)
    def init_optimizers(self):
        import functools, optax
        self.add_optimizer("opt", functools.partial(optax.sgd), ["model"], lr=0.1)

brain = TinyBrain(modules={{"model": Linear(4, 8)}}, hparams={{"seed": 7}},
                  run_opts={{"noprogressbar": True}})
brain.init_optimizers()
rng = np.random.default_rng(0)
x = rng.normal(size=(16, 10, 8)).astype(np.float32)
y = rng.normal(size=(16, 10, 4)).astype(np.float32)
lens = np.ones(16, np.float32)
lo, hi = (0, 8) if proc_id == 0 else (8, 16)   # per-process local shard
batch = {{"sig": PaddedData(x[lo:hi], lens[lo:hi]),
         "anno": PaddedData(y[lo:hi], lens[lo:hi])}}
for _ in range(3):
    loss = brain.fit_batch(batch)
w = np.asarray(brain.params["model"]["w"])
print("MPBRAIN_LOSS", float(loss))
print("MPBRAIN_WSUM", float(np.abs(w).sum()))
"""


def test_two_process_brain_matches_single(tmp_path):
    """Brain training across two OS processes, each feeding its own local
    half of the global batch, reaches the same loss/params as one process
    on the full batch (the gradient psum spans processes)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    import svt_speechbrain_tpu as sb
    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.nnet import losses
    from svt_speechbrain_tpu.dataio.batch import PaddedData

    class TinyBrain(sb.Brain):
        def compute_forward(self, params, batch, stage, rng=None):
            x, lens = batch["sig"]
            return self.modules.model(params["model"], x), lens

        def compute_objectives(self, predictions, batch, stage):
            logits, lens = predictions
            target, tlens = batch["anno"]
            return losses.mse_loss(logits, target.astype(jnp.float32), length=tlens)

        def init_optimizers(self):
            import functools
            import optax

            self.add_optimizer("opt", functools.partial(optax.sgd), ["model"], lr=0.1)

    ref = TinyBrain(modules={"model": Linear(4, 8)}, hparams={"seed": 7},
                    run_opts={"noprogressbar": True, "data_parallel_count": 1})
    ref.init_optimizers()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 10, 8)).astype(np.float32)
    y = rng.normal(size=(16, 10, 4)).astype(np.float32)
    lens = np.ones(16, np.float32)
    batch = {"sig": PaddedData(x, lens), "anno": PaddedData(y, lens)}
    for _ in range(3):
        ref_loss = ref.fit_batch(batch)
    ref_wsum = float(np.abs(np.asarray(ref.params["model"]["w"])).sum())

    port = str(_free_port())
    script = tmp_path / "brain_worker.py"
    script.write_text(BRAIN_WORKER.format(repo_root=REPO_ROOT))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        loss = float(out.split("MPBRAIN_LOSS ")[1].split()[0])
        wsum = float(out.split("MPBRAIN_WSUM ")[1].split()[0])
        assert abs(loss - float(ref_loss)) < 1e-4, (loss, float(ref_loss))
        assert abs(wsum - ref_wsum) < 1e-4, (wsum, ref_wsum)


def test_multiprocess_fsdp_tp_spanning_processes(tmp_path):
    """Model sharding ACROSS the process boundary (the DCN layout of a real
    multi-host deployment): 2 OS processes x 4 virtual devices, mesh built
    transposed so every TP pair / FSDP gather group contains one device
    from each process, one checkpoint save/restore on that exact layout,
    then continued training. Both processes must agree bit-exactly; the
    pre-checkpoint phase must be bit-equal to the identical single-process
    8-device run (post-restore values are allclose — a different process
    topology compiles a different collective schedule, so the loss scalar
    may move by an ulp even when the weights do not)."""
    demo = os.path.join(REPO_ROOT, "tools", "multiproc_sharding_demo.py")

    def run(args, ckpt, n_local):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_local}")
        return subprocess.Popen(
            [sys.executable, demo, *args, str(ckpt)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)

    def metrics(out):
        return {k: float(out.split(f"MPSHARD_{k} ")[1].split()[0])
                for k in ("LOSS", "WSUM", "LOSS2", "WSUM2")}

    single = run(["-1", "0", "2"], tmp_path / "ck_single", 8)
    out, _ = single.communicate(timeout=300)
    assert single.returncode == 0, out[-2000:]
    ref = metrics(out)

    port = str(_free_port())
    procs = [run([str(i), port, "2"], tmp_path / "ck_multi", 4)
             for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"MPSHARD_OK {i}" in out
        outs.append(metrics(out))

    assert outs[0] == outs[1], "processes disagree"
    assert outs[0]["LOSS"] == ref["LOSS"]       # bit-equal pre-checkpoint
    assert outs[0]["WSUM"] == ref["WSUM"]
    for k in ("LOSS2", "WSUM2"):                # post-restore: allclose
        assert abs(outs[0][k] - ref[k]) <= 2e-6 * abs(ref[k]), (
            k, outs[0][k], ref[k])
