"""End-to-end smoke tests for the N20EMv2 video-only and audio-visual fusion
recipes on synthetic data (tiny architectures)."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from tests.conftest import REPO_ROOT

VIDEO_RECIPE = os.path.join(REPO_ROOT, "recipes", "N20EMv2", "video_only")
AV_RECIPE = os.path.join(REPO_ROOT, "recipes", "N20EMv2", "audio_visual")


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _make_notes(rng, duration):
    notes, t = [], 0.2
    while t < duration - 0.5:
        dur = float(rng.uniform(0.2, 0.5))
        notes.append([round(t, 3), round(t + dur, 3), int(rng.integers(45, 70))])
        t += dur + 0.1
    return notes


@pytest.fixture(scope="module")
def video_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("n20em_video")
    rng = np.random.default_rng(0)
    annotations = {}
    for i, split in enumerate(["train", "valid", "test"]):
        entry = f"song{i}"
        duration = 4.0
        notes = _make_notes(rng, duration)
        annotations[entry] = {"midi": notes, "split": split}
        d = root / "data" / entry
        os.makedirs(d, exist_ok=True)
        video = (rng.random((int(duration * 50), 96, 96)) * 255).astype(np.uint8)
        np.save(d / "video_50fps.npy", video)
    with open(root / "annotations.json", "w") as f:
        json.dump(annotations, f)

    prep = _load(os.path.join(VIDEO_RECIPE, "prepare_n20emv2.py"), "video_prep")
    prep.prepare_frame_anno(str(root), frame_rate=50)
    prep.prepare_csv_n20emv2(str(root), csv_folder=str(root / "csv"),
                             frame_rate=50, dur_thrd=2)
    return root


TINY_VIDEO_ARCH = """
encoder: !new:svt_speechbrain_tpu.models.avhubert.FairseqAVHubert
   arch_overrides:
      encoder_layers: 1
      encoder_embed_dim: 32
      encoder_ffn_embed_dim: 64
      encoder_attention_heads: 4
      audio_feat_dim: 8
      conv_pos: 16
      conv_pos_groups: 4
feat_dim: 32
"""


def test_video_recipe_end_to_end(video_dataset, tmp_path):
    from svt_speechbrain_tpu.config import load_hyperyaml

    recipe = _load(os.path.join(VIDEO_RECIPE, "train_video_ssl.py"), "video_recipe")
    root = video_dataset
    csv_dir = root / "csv" / "frame_rate50" / "dur_2s"
    overrides = f"""
data_folder: {root}
output_folder: {tmp_path}/results
csv_folder: {csv_dir}
train_csv: {csv_dir}/n20em_train.csv
valid_csv: {csv_dir}/n20em_valid.csv
test_csv: [{csv_dir}/n20em_test.csv]
dur_threshold: 2
number_of_epochs: 1
linear_prob_epochs: 0
batch_size: 2
num_workers: 0
split_noise: True
{TINY_VIDEO_ARCH}
"""
    with open(os.path.join(VIDEO_RECIPE, "hparams", "train_video_ssl.yaml")) as f:
        hparams = load_hyperyaml(f, overrides)
    train_data, valid_data, test_datasets = recipe.dataio_prepare(hparams)
    assert len(train_data) == 2  # one 4 s song at 2 s threshold

    brain = recipe.AMT(modules=hparams["modules"], hparams=hparams,
                       run_opts={"noprogressbar": True},
                       checkpointer=hparams["checkpointer"])
    brain.fit(hparams["epoch_counter"], train_data, valid_data,
              train_loader_kwargs=hparams["train_dataloader_opts"],
              valid_loader_kwargs=hparams["valid_dataloader_opts"])
    loss = brain.evaluate(list(test_datasets.values())[0], max_key="COnPOff_f1",
                          test_loader_kwargs=hparams["test_dataloader_opts"])
    assert np.isfinite(loss)
    assert brain.COn_f1.count == 1  # one test song scored
    assert hasattr(brain, "COff_f1")  # COff metrics active


@pytest.fixture(scope="module")
def fusion_dataset(tmp_path_factory):
    """Synthetic pre-extracted feature dumps (stage-2 input)."""
    root = tmp_path_factory.mktemp("n20em_av")
    rng = np.random.default_rng(0)
    annotations = {}
    from svt_speechbrain_tpu.utils.amt import note2frame

    for i, split in enumerate(["train", "valid", "test"]):
        entry = f"song{i}"
        duration = 6.0
        notes = _make_notes(rng, duration)
        annotations[entry] = {"midi": notes, "split": split}
        d = root / "data" / entry / "noise_data"
        os.makedirs(d, exist_ok=True)
        a_frames = round(duration * 49.8)
        v_frames = round(duration * 50)
        np.save(d / "clean_feats.npy", rng.normal(size=(a_frames, 16)).astype(np.float32))
        np.save(d / "video_feats.npy", rng.normal(size=(v_frames, 16)).astype(np.float32))
        with open(root / "data" / entry / "note_anno.json", "w") as f:
            json.dump(notes, f)
        np.save(root / "data" / entry / "frame_anno.npy",
                note2frame(notes, a_frames))
    with open(root / "annotations.json", "w") as f:
        json.dump(annotations, f)

    prep = _load(os.path.join(AV_RECIPE, "prepare_n20emv2.py"), "av_prep")
    prep.prepare_csv_n20emv2_feat(str(root), csv_folder=str(root / "csv"), dur_thrd=3)
    return root


@pytest.mark.parametrize("zero_video", [False, True])
def test_fusion_recipe_end_to_end(fusion_dataset, tmp_path, zero_video):
    from svt_speechbrain_tpu.config import load_hyperyaml

    recipe = _load(os.path.join(AV_RECIPE, "train_rca_av.py"), "av_recipe")
    recipe_a = _load(os.path.join(AV_RECIPE, "train_rca_a.py"), "av_recipe_a")
    root = fusion_dataset
    csv_dir = root / "csv" / "dur_3s"
    overrides = f"""
data_folder: {root}
output_folder: {tmp_path}/results_{zero_video}
csv_folder: {csv_dir}
train_csv: {csv_dir}/n20em_train.csv
valid_csv: {csv_dir}/n20em_valid.csv
test_csv: [{csv_dir}/n20em_test.csv]
dur_threshold: 3
number_of_epochs: 1
batch_size: 2
num_workers: 0
pretrain: False
feat_dim: 16
fusion: !new:svt_speechbrain_tpu.models.fusion.FusionRCA
   alpha: 0.5
   nhead: 4
   d_ffn: 32
   d_model: 16
"""
    with open(os.path.join(AV_RECIPE, "hparams", "train_rca_av.yaml")) as f:
        hparams = load_hyperyaml(f, overrides)
    train_data, valid_data, test_datasets = recipe.dataio_prepare(hparams)

    cls = recipe_a.AMT if zero_video else recipe.AMT
    brain = cls(modules=hparams["modules"], hparams=hparams,
                run_opts={"noprogressbar": True},
                checkpointer=hparams["checkpointer"])
    brain.fit(hparams["epoch_counter"], train_data, valid_data,
              train_loader_kwargs=hparams["train_dataloader_opts"],
              valid_loader_kwargs=hparams["valid_dataloader_opts"])
    loss = brain.evaluate(list(test_datasets.values())[0], max_key="COnPOff_f1",
                          test_loader_kwargs=hparams["test_dataloader_opts"])
    assert np.isfinite(loss)
    # per-song prediction dump written (reference train_rca_av.py:113-123);
    # the audio-only control tags its dumps "audio" like the reference's
    # train_rca_a.py (tasks/amt.py:435)
    tag = "audio" if zero_video else "av"
    pred = root / "data" / "song2" / "noise_data" / f"clean_{tag}_pred.npy"
    assert pred.exists()


AUDIO_RECIPE = os.path.join(REPO_ROOT, "recipes", "N20EMv2", "audio_only")

TINY_AUDIO_ARCH = """
wav2vec2: !new:svt_speechbrain_tpu.models.wav2vec2.HuggingFaceWav2Vec2
   source: tiny-test
   output_norm: True
   normalize_wav: True
   arch_overrides:
      hidden_size: 32
      num_layers: 1
      num_heads: 4
      ffn_size: 64
      conv_dim: [16, 16, 16, 16, 16, 16, 16]
      num_conv_pos_embeddings: 16
      num_conv_pos_embedding_groups: 4
feat_dim: 32
"""


@pytest.fixture(scope="module")
def n20em_audio_dataset(tmp_path_factory):
    from svt_speechbrain_tpu.dataio.dataio import write_audio

    root = tmp_path_factory.mktemp("n20em_audio")
    rng = np.random.default_rng(0)
    annotations = {}
    for i, split in enumerate(["train", "valid", "test"]):
        entry = f"song{i}"
        duration = 6.0
        notes = _make_notes(rng, duration)
        annotations[entry] = {"midi": notes, "split": split}
        d = root / "data" / entry
        os.makedirs(d, exist_ok=True)
        sig = (rng.normal(size=int(duration * 16000)) * 0.1).astype(np.float32)
        write_audio(str(d / "vocals.wav"), sig, 16000)
    with open(root / "annotations.json", "w") as f:
        json.dump(annotations, f)

    prep = _load(os.path.join(AUDIO_RECIPE, "prepare_n20emv2.py"), "n20em_audio_prep")
    prep.prepare_frame_anno(str(root))
    prep.prepare_csv_n20emv2(str(root), csv_folder=str(root / "csv"), dur_thrd=3)
    return root


def test_n20emv2_audio_recipe_end_to_end(n20em_audio_dataset, tmp_path):
    from svt_speechbrain_tpu.config import load_hyperyaml

    recipe = _load(os.path.join(AUDIO_RECIPE, "train_audio_ssl.py"),
                   "n20em_audio_recipe")
    root = n20em_audio_dataset
    csv_dir = root / "csv" / "dur_3s"
    overrides = f"""
data_folder: {root}
output_folder: {tmp_path}/results
csv_folder: {csv_dir}
mix_train: False
train_csv: {csv_dir}/n20em_train.csv
valid_csv: {csv_dir}/n20em_valid.csv
test_csv: [{csv_dir}/n20em_test.csv]
dur_threshold: 3
number_of_epochs: 1
linear_prob_epochs: 0
batch_size: 2
num_workers: 0
save_model: True
save_model_folder: {tmp_path}/save_model
{TINY_AUDIO_ARCH}
"""
    with open(os.path.join(AUDIO_RECIPE, "hparams", "train_audio_ssl.yaml")) as f:
        hparams = load_hyperyaml(f, overrides)
    train_data, valid_data, test_datasets = recipe.dataio_prepare(hparams)
    brain = recipe.AMT(modules=hparams["modules"], hparams=hparams,
                       run_opts={"noprogressbar": True},
                       checkpointer=hparams["checkpointer"])
    assert brain.compute_coff and brain.ckpt_policy == "max_COnPOff_f1"
    brain.fit(hparams["epoch_counter"], train_data, valid_data,
              train_loader_kwargs=hparams["train_dataloader_opts"],
              valid_loader_kwargs=hparams["valid_dataloader_opts"])
    loss = brain.evaluate(list(test_datasets.values())[0], max_key="COnPOff_f1",
                          test_loader_kwargs=hparams["test_dataloader_opts"])
    assert np.isfinite(loss)
    assert hasattr(brain, "COff_f1")
    # model export for stage-2 fusion (reference extract_ssl_feats :227-232)
    assert os.path.exists(tmp_path / "save_model" / "wav2vec2.msgpack")
    assert os.path.exists(tmp_path / "save_model" / "model.msgpack")
    # checkpoint selected by max COnPOff_f1
    ckpts = hparams["checkpointer"].list_checkpoints()
    assert any("COnPOff_f1" in c.meta for c in ckpts)
