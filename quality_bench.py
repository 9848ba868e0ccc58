#!/usr/bin/env python3
"""Standing QUALITY benchmark: deterministic synthetic-song COnPOff.

The real quality bar (COnPOff F1 52.39 on MIR-ST500, BASELINE.md) is
unverifiable in this image — no datasets or pretrained weights ship. This
script is the round-over-round quality signal instead: a fixed-seed
synthetic dataset (sinusoid note tracks) run through the ACTUAL MIR-ST500
recipe — data prep, 4-term loss, two-optimizer training, NewBob annealing,
song-stitched eval, frame2note decode, bipartite COnPOff scoring — for a
fixed number of epochs, then scored on the training songs.

Deterministic: fixed seeds, CPU backend (bit-stable across rounds; the
tiny model would not benefit from the TPU anyway). Runtime ~5 min (QBENCH_EPOCHS=16 default; COnPOff ~0.47, COn ~1.0 healthy).

Prints ONE JSON line: {"metric": "synthetic_overfit_COnPOff_f1", "value",
"COnP_f1", "COn_f1", "final_valid_loss", "epochs"}. A value collapsing
toward 0 between rounds = a real pipeline regression (label/decode/loss/
threshold plumbing), independent of host-link noise.
"""
import importlib.util
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
RECIPE_DIR = os.path.join(REPO_ROOT, "recipes", "MIR_ST500")

TINY_ARCH = """
wav2vec2: !new:svt_speechbrain_tpu.models.wav2vec2.HuggingFaceWav2Vec2
   source: tiny-test
   output_norm: True
   normalize_wav: True
   arch_overrides:
      hidden_size: 64
      num_layers: 2
      num_heads: 4
      ffn_size: 128
      conv_dim: [32, 32, 32, 32, 32, 32, 32]
      num_conv_pos_embeddings: 16
      num_conv_pos_embedding_groups: 4
feat_dim: 64
"""


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def make_dataset(root):
    from svt_speechbrain_tpu.dataio.dataio import write_audio

    sys.path.insert(0, RECIPE_DIR)
    prep = _load(os.path.join(RECIPE_DIR, "prepare_benchmarks.py"),
                 "qb_prep")
    rng = np.random.default_rng(0)
    gt = {}
    folder = os.path.join(root, "wav16kHz")
    # 5 distinct pitches (distinct octave+class combos), each with a
    # distinct amplitude: a minutes-budget tiny model cannot become
    # frequency-selective from raw sinusoids (COnP plateaus at the 1/5
    # majority-class level), but it CAN read amplitude — which still
    # exercises the whole pitch pipeline (octave/class labels → NLL losses
    # → argmax → frame2note pitch → COnP/COnPOff bipartite scoring). This
    # artifact tracks pipeline health, not acoustic modeling.
    pitch_pool = np.asarray([45, 52, 57, 64, 69])
    pitch_amp = {p: 0.12 + 0.12 * i for i, p in enumerate(pitch_pool)}
    for song_i in range(3):
        name = f"song{song_i}"
        duration = 8.0 + 2.0 * song_i
        notes = []
        t0 = 0.2
        while t0 < duration - 0.6:
            dur = float(rng.uniform(0.2, 0.6))
            notes.append([round(t0, 3), round(t0 + dur, 3),
                          int(rng.choice(pitch_pool))])
            t0 += dur + float(rng.uniform(0.05, 0.4))
        gt[name] = notes
        t = np.arange(int(duration * 16000)) / 16000
        sig = np.zeros_like(t, dtype=np.float32)
        for on, off, midi in notes:
            f0 = 440.0 * 2 ** ((midi - 69) / 12)
            m = (t >= on) & (t < off)
            sig[m] += (pitch_amp[midi]
                       * np.sin(2 * np.pi * f0 * t[m]).astype(np.float32))
        sig += 0.01 * rng.normal(size=sig.shape).astype(np.float32)
        os.makedirs(os.path.join(folder, name), exist_ok=True)
        write_audio(os.path.join(folder, name, "vocals.wav"), sig, 16000)
    anno_path = os.path.join(root, "Annotations.json")
    with open(anno_path, "w") as f:
        json.dump(gt, f)
    prep.prepare_frame_anno(anno_path, folder)
    csv_dir = os.path.join(root, "csv")
    os.makedirs(csv_dir, exist_ok=True)
    prep.prepare_csv_benchmarks(folder, os.path.join(csv_dir, "train.csv"),
                                dur_thrd=5)
    return os.path.join(csv_dir, "train.csv")


def main():
    from svt_speechbrain_tpu.config import load_hyperyaml

    epochs = int(os.environ.get("QBENCH_EPOCHS", "16"))
    root = tempfile.mkdtemp(prefix="quality_bench_")
    try:
        csv = make_dataset(root)
        recipe = _load(os.path.join(RECIPE_DIR, "train_audio_ssl.py"),
                       "qb_recipe")
        overrides = f"""
data_folder: {root}
output_folder: {root}/results
csv_folder: {root}/csv
train_csv: {csv}
valid_csv: {csv}
test_csv: [{csv}]
number_of_epochs: {epochs}
linear_prob_epochs: 0
batch_size: 3
num_workers: 0
lr_model: 1.0
lr_wav2vec: 0.004
{TINY_ARCH}
"""
        with open(os.path.join(RECIPE_DIR, "hparams",
                               "train_audio_ssl.yaml")) as f:
            hparams = load_hyperyaml(f, overrides)
        train_data, valid_data, test_datasets = recipe.dataio_prepare(hparams)
        brain = recipe.AMT(modules=hparams["modules"], hparams=hparams,
                           run_opts={"noprogressbar": True},
                           checkpointer=None)
        brain.fit(hparams["epoch_counter"], train_data, valid_data,
                  train_loader_kwargs=hparams["train_dataloader_opts"],
                  valid_loader_kwargs=hparams["valid_dataloader_opts"])
        loss = brain.evaluate(
            list(test_datasets.values())[0],
            test_loader_kwargs=hparams["test_dataloader_opts"])
        print(json.dumps({
            "metric": "synthetic_overfit_COnPOff_f1",
            "value": round(brain.COnPOff_f1.avg, 4),
            "COnP_f1": round(brain.COnP_f1.avg, 4),
            "COn_f1": round(brain.COn_f1.avg, 4),
            "final_test_loss": round(float(loss), 4),
            "songs": brain.COn_f1.count,
            "epochs": epochs,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
