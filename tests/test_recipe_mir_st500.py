"""End-to-end smoke test of the MIR-ST500 AMT recipe on synthetic data —
the analogue of the reference's ``--debug`` 2-batch integration runs
(SURVEY.md §4). Builds a tiny dataset in the reference's on-disk layout,
runs data prep, trains a tiny wav2vec2 for 2 epochs and evaluates with
song-stitched COnPOff scoring."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from tests.conftest import REPO_ROOT

RECIPE_DIR = os.path.join(REPO_ROOT, "recipes", "MIR_ST500")

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


def _load_recipe():
    spec = importlib.util.spec_from_file_location(
        "mir_recipe", os.path.join(RECIPE_DIR, "train_audio_ssl.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["mir_recipe"] = mod
    spec.loader.exec_module(mod)
    return mod


def _make_note_track(rng, duration):
    """Random monophonic notes over [0, duration]."""
    notes = []
    t = 0.2
    while t < duration - 0.6:
        dur = float(rng.uniform(0.2, 0.6))
        notes.append([round(t, 3), round(t + dur, 3), int(rng.integers(40, 80))])
        t += dur + float(rng.uniform(0.05, 0.4))
    return notes


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    from svt_speechbrain_tpu.dataio.dataio import write_audio

    sys.path.insert(0, RECIPE_DIR)
    prep_spec = importlib.util.spec_from_file_location(
        "mir_prep", os.path.join(RECIPE_DIR, "prepare_benchmarks.py"))
    prep = importlib.util.module_from_spec(prep_spec)
    prep_spec.loader.exec_module(prep)

    root = tmp_path_factory.mktemp("mir_data")
    rng = np.random.default_rng(0)
    gt = {}
    folder = root / "wav16kHz"
    for song_i in range(3):
        name = f"song{song_i}"
        duration = 8.0 + 2.0 * song_i  # 8, 10, 12 s
        notes = _make_note_track(rng, duration)
        gt[name] = notes
        t = np.arange(int(duration * 16000)) / 16000
        sig = np.zeros_like(t, dtype=np.float32)
        for on, off, midi in notes:
            f0 = 440.0 * 2 ** ((midi - 69) / 12)
            mask = (t >= on) & (t < off)
            sig[mask] += 0.5 * np.sin(2 * np.pi * f0 * t[mask]).astype(np.float32)
        sig += 0.01 * rng.normal(size=sig.shape).astype(np.float32)
        os.makedirs(folder / name, exist_ok=True)
        write_audio(str(folder / name / "vocals.wav"), sig, 16000)
    with open(root / "Annotations.json", "w") as f:
        json.dump(gt, f)

    prep.prepare_frame_anno(str(root / "Annotations.json"), str(folder))
    csv_dir = root / "csv"
    os.makedirs(csv_dir, exist_ok=True)
    prep.prepare_csv_benchmarks(str(folder), str(csv_dir / "train.csv"), dur_thrd=5)
    return root


def test_recipe_end_to_end(synthetic_dataset, tmp_path):
    from svt_speechbrain_tpu.config import load_hyperyaml
    import svt_speechbrain_tpu as sb

    recipe = _load_recipe()
    root = synthetic_dataset
    csv = str(root / "csv" / "train.csv")
    overrides = f"""
data_folder: {root}
output_folder: {tmp_path}/results
csv_folder: {root}/csv
train_csv: {csv}
valid_csv: {csv}
test_csv: [{csv}]
number_of_epochs: 2
linear_prob_epochs: 1
batch_size: 2
num_workers: 0
{TINY_ARCH}
"""
    with open(os.path.join(RECIPE_DIR, "hparams", "train_audio_ssl.yaml")) as f:
        hparams = load_hyperyaml(f, overrides)

    train_data, valid_data, test_datasets = recipe.dataio_prepare(hparams)
    assert len(train_data) == 2 + 2 + 2  # songs of 8/10/12 s at 5 s threshold

    brain = recipe.AMT(
        modules=hparams["modules"],
        hparams=hparams,
        run_opts={"noprogressbar": True},
        checkpointer=hparams["checkpointer"],
    )
    brain.fit(
        hparams["epoch_counter"], train_data, valid_data,
        train_loader_kwargs=hparams["train_dataloader_opts"],
        valid_loader_kwargs=hparams["valid_dataloader_opts"],
    )
    # train log written with valid metrics
    with open(hparams["train_log"]) as f:
        log = f.read()
    assert "COnPOff_f1" in log and "epoch: 2" in log
    # checkpoint saved and retained by min valid loss
    ckpts = hparams["checkpointer"].list_checkpoints()
    assert len(ckpts) >= 1
    assert any("loss" in c.meta for c in ckpts)

    test_loss = brain.evaluate(
        list(test_datasets.values())[0], min_key="loss",
        test_loader_kwargs=hparams["test_dataloader_opts"])
    assert np.isfinite(test_loss)
    # song-stitched scoring ran over all 3 songs
    assert brain.COn_f1.count == 3
    assert 0.0 <= brain.COn_f1.avg <= 1.0


def test_recipe_resumes_from_checkpoint(synthetic_dataset, tmp_path):
    """Checkpoint → recover round-trip restores params exactly."""
    from svt_speechbrain_tpu.config import load_hyperyaml
    import jax

    recipe = _load_recipe()
    root = synthetic_dataset
    csv = str(root / "csv" / "train.csv")
    overrides = f"""
data_folder: {root}
output_folder: {tmp_path}/results
csv_folder: {root}/csv
train_csv: {csv}
valid_csv: {csv}
test_csv: [{csv}]
number_of_epochs: 1
linear_prob_epochs: 0
batch_size: 2
num_workers: 0
{TINY_ARCH}
"""
    with open(os.path.join(RECIPE_DIR, "hparams", "train_audio_ssl.yaml")) as f:
        hparams = load_hyperyaml(f, overrides)
    train_data, valid_data, _ = recipe.dataio_prepare(hparams)
    brain = recipe.AMT(modules=hparams["modules"], hparams=hparams,
                       run_opts={"noprogressbar": True},
                       checkpointer=hparams["checkpointer"])
    brain.fit(hparams["epoch_counter"], train_data, valid_data,
              train_loader_kwargs=hparams["train_dataloader_opts"],
              valid_loader_kwargs=hparams["valid_dataloader_opts"])
    trained = jax.device_get(brain.params)

    # fresh brain, same checkpointer dir → recovery restores trained params
    with open(os.path.join(RECIPE_DIR, "hparams", "train_audio_ssl.yaml")) as f:
        hparams2 = load_hyperyaml(f, overrides)
    brain2 = recipe.AMT(modules=hparams2["modules"], hparams=hparams2,
                        run_opts={"noprogressbar": True},
                        checkpointer=hparams2["checkpointer"])
    brain2.init_optimizers()
    brain2.checkpointer.recover_if_possible()
    restored = jax.device_get(brain2.params)
    for a, b in zip(jax.tree_util.tree_leaves(trained),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_transcriber_matches_recipe_eval(synthetic_dataset, tmp_path):
    """North-star coherence: the batched inference pipeline (reference
    chunking mode) must produce the SAME note events as the recipe's
    batch-1 song-stitched evaluation."""
    from svt_speechbrain_tpu.config import load_hyperyaml
    from svt_speechbrain_tpu.inference import BatchedAMTTranscriber
    from svt_speechbrain_tpu.dataio.dataio import read_audio
    import jax
    import jax.numpy as jnp

    recipe = _load_recipe()
    root = synthetic_dataset
    csv = str(root / "csv" / "train.csv")
    overrides = f"""
data_folder: {root}
output_folder: {tmp_path}/results
csv_folder: {root}/csv
train_csv: {csv}
valid_csv: {csv}
test_csv: [{csv}]
number_of_epochs: 1
linear_prob_epochs: 0
batch_size: 2
num_workers: 0
{TINY_ARCH}
"""
    with open(os.path.join(RECIPE_DIR, "hparams", "train_audio_ssl.yaml")) as f:
        hparams = load_hyperyaml(f, overrides)
    train_data, valid_data, test_datasets = recipe.dataio_prepare(hparams)

    captured = {}

    class CapturingAMT(recipe.AMT):
        def on_song_end(self, batch, est_np):
            song = batch.id[0].rsplit("_", 1)[0]
            captured[song] = est_np

    brain = CapturingAMT(modules=hparams["modules"], hparams=hparams,
                         run_opts={"noprogressbar": True},
                         checkpointer=None)
    brain.fit(hparams["epoch_counter"], train_data, valid_data,
              train_loader_kwargs=hparams["train_dataloader_opts"],
              valid_loader_kwargs=hparams["valid_dataloader_opts"])
    brain.evaluate(list(test_datasets.values())[0],
                   test_loader_kwargs=hparams["test_dataloader_opts"])
    assert len(captured) == 3

    transcriber = BatchedAMTTranscriber(
        brain.modules.wav2vec2, brain.modules.model,
        jax.device_get(brain.params), chunk_seconds=5.0, batch_size=4,
        compute_dtype=jnp.float32, chunking="reference")
    songs = {f"song{i}": read_audio(str(root / "wav16kHz" / f"song{i}" / "vocals.wav"))
             for i in range(3)}
    notes = transcriber.transcribe(songs, fast=False)
    for name in songs:
        got = np.asarray(notes[name]) if notes[name] else np.zeros((0, 3))
        expected = captured[name]
        assert got.shape == expected.shape, f"{name}: {got.shape} vs {expected.shape}"
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_recipe_learns_on_synthetic_songs(synthetic_dataset, tmp_path):
    """Quality coherence: the full pipeline (labels -> 4-term loss ->
    optimization -> sigmoid/argmax -> frame2note -> bipartite scoring) must
    actually LEARN — onset detection F1 on the training songs climbs well
    above the random-init level after a few epochs of overfitting. Catches
    sign/indexing/threshold errors that 2-epoch smoke runs cannot."""
    from svt_speechbrain_tpu.config import load_hyperyaml

    recipe = _load_recipe()
    root = synthetic_dataset
    csv = str(root / "csv" / "train.csv")
    overrides = f"""
data_folder: {root}
output_folder: {tmp_path}/results
csv_folder: {root}/csv
train_csv: {csv}
valid_csv: {csv}
test_csv: [{csv}]
number_of_epochs: 9
linear_prob_epochs: 0
batch_size: 3
num_workers: 0
lr_model: 1.0
lr_wav2vec: 0.002
{TINY_ARCH}
"""
    with open(os.path.join(RECIPE_DIR, "hparams", "train_audio_ssl.yaml")) as f:
        hparams = load_hyperyaml(f, overrides)
    train_data, valid_data, _ = recipe.dataio_prepare(hparams)
    brain = recipe.AMT(
        modules=hparams["modules"],
        hparams=hparams,
        run_opts={"noprogressbar": True},
        checkpointer=None,
    )
    brain.fit(
        hparams["epoch_counter"], train_data, valid_data,
        train_loader_kwargs=hparams["train_dataloader_opts"],
        valid_loader_kwargs=hparams["valid_dataloader_opts"],
    )
    with open(hparams["train_log"]) as f:
        lines = [l for l in f.read().splitlines() if "COn_f1" in l]

    def metric(line, key):
        part = line.split(key + ": ")[1]
        return float(part.split(",")[0].split(" - ")[0])

    first_loss = metric(lines[0], "valid loss")
    last_loss = metric(lines[-1], "valid loss")
    last_f1 = metric(lines[-1], "valid COn_f1")
    assert last_loss < first_loss - 0.5, (first_loss, last_loss)
    assert last_f1 > 0.55, lines[-1]  # random init scores ~0.28 here
