"""Crash recovery end-to-end: SIGKILL a real CLI training subprocess after
its first end-of-epoch checkpoint, relaunch the same command, and require
the resumed run to finish BIT-EQUAL to an uninterrupted one.

The reference recovers params/opt/epoch on restart
(``speechbrain/utils/checkpoints.py:381-570`` via ``core.py:771``) but does
not checkpoint the RNG stream, so its resumed runs diverge from
uninterrupted ones whenever dropout is active. Ours saves the brain RNG in
``_BrainCounters`` (core.py), which makes kill → recover → continue exactly
reproduce the uninterrupted trajectory — the property this test pins.

SURVEY.md §5.3 (failure detection / recovery): this is the process-kill
half; mid-epoch loader fast-forward is covered by
``tests/test_dataloader_resume.py``.
"""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from tests.conftest import REPO_ROOT

RECIPE_DIR = os.path.join(REPO_ROOT, "recipes", "MIR_ST500")

RUNNER = """
import jax
jax.config.update("jax_platforms", "cpu")
import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, {repo!r})
sys.path.insert(0, {recipe_dir!r})
from svt_speechbrain_tpu.config import load_hyperyaml

spec = importlib.util.spec_from_file_location(
    "mir_recipe", os.path.join({recipe_dir!r}, "train_audio_ssl.py"))
recipe = importlib.util.module_from_spec(spec)
sys.modules["mir_recipe"] = recipe
spec.loader.exec_module(recipe)

with open({overrides_path!r}) as f:
    overrides = f.read()
with open(os.path.join({recipe_dir!r}, "hparams",
                       "train_audio_ssl.yaml")) as f:
    hparams = load_hyperyaml(f, overrides)
train_data, valid_data, _ = recipe.dataio_prepare(hparams)
brain = recipe.AMT(modules=hparams["modules"], hparams=hparams,
                   run_opts={{"noprogressbar": True}},
                   checkpointer=hparams["checkpointer"])
brain.fit(hparams["epoch_counter"], train_data, valid_data,
          train_loader_kwargs=hparams["train_dataloader_opts"],
          valid_loader_kwargs=hparams["valid_dataloader_opts"])
leaves = jax.tree_util.tree_leaves(jax.device_get(brain.params))
np.savez(os.path.join({out!r}, "final_params.npz"),
         **{{str(i): np.asarray(x) for i, x in enumerate(leaves)}})
print("RUN-COMPLETE epochs=%d" % hparams["epoch_counter"].current)
"""

TINY_ARCH = """
wav2vec2: !new:svt_speechbrain_tpu.models.wav2vec2.HuggingFaceWav2Vec2
   source: tiny-test
   output_norm: True
   normalize_wav: True
   arch_overrides:
      hidden_size: 32
      num_layers: 2
      num_heads: 4
      ffn_size: 64
      conv_dim: [16, 16, 16, 16, 16, 16, 16]
      num_conv_pos_embeddings: 16
      num_conv_pos_embedding_groups: 4
feat_dim: 32
"""


def _make_dataset(root):
    """Tiny MIR-ST500-layout dataset (2 songs) via the real prep scripts."""
    import importlib.util

    from svt_speechbrain_tpu.dataio.dataio import write_audio

    prep_spec = importlib.util.spec_from_file_location(
        "mir_prep_crash", os.path.join(RECIPE_DIR, "prepare_benchmarks.py"))
    prep = importlib.util.module_from_spec(prep_spec)
    prep_spec.loader.exec_module(prep)

    rng = np.random.default_rng(0)
    gt = {}
    folder = os.path.join(root, "wav16kHz")
    for song_i in range(2):
        name = f"song{song_i}"
        duration = 8.0
        notes, t0 = [], 0.2
        while t0 < duration - 0.6:
            dur = float(rng.uniform(0.2, 0.6))
            notes.append([round(t0, 3), round(t0 + dur, 3),
                          int(rng.integers(40, 80))])
            t0 += dur + float(rng.uniform(0.05, 0.4))
        gt[name] = notes
        t = np.arange(int(duration * 16000)) / 16000
        sig = np.zeros_like(t, dtype=np.float32)
        for on, off, midi in notes:
            f0 = 440.0 * 2 ** ((midi - 69) / 12)
            mask = (t >= on) & (t < off)
            sig[mask] += 0.5 * np.sin(
                2 * np.pi * f0 * t[mask]).astype(np.float32)
        sig += 0.01 * rng.normal(size=sig.shape).astype(np.float32)
        os.makedirs(os.path.join(folder, name), exist_ok=True)
        write_audio(os.path.join(folder, name, "vocals.wav"), sig, 16000)
    anno = os.path.join(root, "Annotations.json")
    with open(anno, "w") as f:
        json.dump(gt, f)
    prep.prepare_frame_anno(anno, folder)
    csv_dir = os.path.join(root, "csv")
    os.makedirs(csv_dir, exist_ok=True)
    prep.prepare_csv_benchmarks(folder, os.path.join(csv_dir, "train.csv"),
                                dur_thrd=5)
    return root


def _write_run(tmp_path, data_root, tag):
    out = os.path.join(str(tmp_path), tag)
    os.makedirs(out, exist_ok=True)
    csv = os.path.join(data_root, "csv", "train.csv")
    overrides_path = os.path.join(out, "overrides.yaml")
    with open(overrides_path, "w") as f:
        f.write(f"""
data_folder: {data_root}
output_folder: {out}/results
csv_folder: {data_root}/csv
train_csv: {csv}
valid_csv: {csv}
test_csv: [{csv}]
number_of_epochs: 3
linear_prob_epochs: 0
batch_size: 2
num_workers: 0
{TINY_ARCH}
""")
    runner_path = os.path.join(out, "runner.py")
    with open(runner_path, "w") as f:
        f.write(RUNNER.format(repo=REPO_ROOT, recipe_dir=RECIPE_DIR,
                              overrides_path=overrides_path, out=out))
    return out, runner_path


def _launch(runner_path):
    return subprocess.Popen(
        [sys.executable, runner_path],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _ckpt_dirs(save_dir):
    if not os.path.isdir(save_dir):
        return []
    return [d for d in os.listdir(save_dir)
            if d.startswith("CKPT")
            and os.path.exists(os.path.join(save_dir, d, "CKPT.yaml"))]


def test_metafile_written_last(tmp_path):
    """CKPT.yaml is the completeness marker: every recoverable must already
    be on disk (under its final name) when it appears."""
    from svt_speechbrain_tpu.utils.checkpoints import Checkpointer, METAFNAME

    seen = {}

    class Probe:
        def ckpt_save(self, path):
            ckpt_dir = os.path.dirname(path)
            seen["meta_existed"] = os.path.exists(
                os.path.join(ckpt_dir, METAFNAME))
            with open(path, "w") as f:
                f.write("ok")

        def ckpt_load(self, path, end_of_epoch=True):
            pass

    ckptr = Checkpointer(str(tmp_path), recoverables={"probe": Probe()})
    ckpt = ckptr.save_checkpoint(verbosity=0)
    assert seen["meta_existed"] is False
    assert os.path.exists(os.path.join(ckpt.path, METAFNAME))
    assert os.path.exists(ckpt.paramfiles["probe"])
    # no stray temp files survive a completed save
    assert not [f for f in os.listdir(ckpt.path) if f.endswith(".tmp")]


def test_partial_checkpoint_dir_is_invisible(tmp_path):
    """A directory left by a crash mid-save (recoverable files but no
    CKPT.yaml) must be ignored by listing AND by recovery — the resumed run
    picks the older complete checkpoint instead of crashing on truncation."""
    from svt_speechbrain_tpu.utils.epoch_loop import EpochCounter
    from svt_speechbrain_tpu.utils.checkpoints import Checkpointer

    counter = EpochCounter(limit=10)
    counter.current = 3
    ckptr = Checkpointer(str(tmp_path), recoverables={"epoch": counter})
    ckptr.save_checkpoint(verbosity=0)

    partial = tmp_path / "CKPT+9999-99-99+99-99-99+00"
    partial.mkdir()
    (partial / "epoch.ckpt").write_bytes(b"\x82\xa4trun")  # truncated msgpack

    counter.current = 7
    assert len(ckptr.list_checkpoints()) == 1
    loaded = ckptr.recover_if_possible()
    assert loaded is not None and counter.current == 3


def test_killed_save_never_discoverable(tmp_path):
    """Simulate the kill at every point inside save_checkpoint: whatever
    instant the process dies, list_checkpoints sees only complete ckpts."""
    from svt_speechbrain_tpu.utils.epoch_loop import EpochCounter
    from svt_speechbrain_tpu.utils.checkpoints import Checkpointer

    class Dies(Exception):
        pass

    class Bomb:
        """Recoverable that dies mid-write on demand."""

        armed = False

        def ckpt_save(self, path):
            with open(path, "w") as f:
                f.write("partial")
                if Bomb.armed:
                    raise Dies()
            # never reached when armed: file stays at its temp name

        def ckpt_load(self, path, end_of_epoch=True):
            assert open(path).read() == "partial"

    counter = EpochCounter(limit=10)
    ckptr = Checkpointer(
        str(tmp_path), recoverables={"a_epoch": counter, "bomb": Bomb()})
    ckptr.save_checkpoint(verbosity=0)  # one good ckpt
    Bomb.armed = True
    with pytest.raises(Dies):
        ckptr.save_checkpoint(verbosity=0)
    ckpts = ckptr.list_checkpoints()
    assert len(ckpts) == 1
    assert ckptr.recover_if_possible() is not None


@pytest.mark.slow
def test_sigkill_resume_bitequal(tmp_path):
    data_root = _make_dataset(str(tmp_path / "data"))

    # uninterrupted 3-epoch run
    out_a, runner_a = _write_run(tmp_path, data_root, "uninterrupted")
    proc = _launch(runner_a)
    log_a, _ = proc.communicate(timeout=1200)
    assert proc.returncode == 0, log_a[-2000:]
    assert "RUN-COMPLETE epochs=3" in log_a

    # killed run: SIGKILL as soon as the first end-of-epoch ckpt is complete
    out_b, runner_b = _write_run(tmp_path, data_root, "killed")
    save_dir = os.path.join(out_b, "results", "save")
    proc = _launch(runner_b)
    deadline = time.time() + 900
    while time.time() < deadline:
        if _ckpt_dirs(save_dir):
            break
        if proc.poll() is not None:
            out, _ = proc.communicate()
            raise AssertionError(
                "run finished before any checkpoint appeared:\n" + out[-2000:])
        time.sleep(0.25)
    else:
        proc.kill()
        raise AssertionError("no checkpoint within 900s")
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)
    assert proc.returncode != 0
    assert not os.path.exists(os.path.join(out_b, "final_params.npz"))

    # relaunch the SAME command: recovers and finishes the remaining epochs
    proc = _launch(runner_b)
    log_b, _ = proc.communicate(timeout=1200)
    assert proc.returncode == 0, log_b[-2000:]
    assert "RUN-COMPLETE epochs=3" in log_b

    a = np.load(os.path.join(out_a, "final_params.npz"))
    b = np.load(os.path.join(out_b, "final_params.npz"))
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k])
