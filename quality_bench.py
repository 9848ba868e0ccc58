#!/usr/bin/env python3
"""Standing QUALITY benchmark: synthetic-song COnPOff, OURS vs the
REFERENCE torch recipe — a parity artifact, not just a self-regression
canary.

The real quality bar (COnPOff F1 52.39 on MIR-ST500, BASELINE.md) is
unverifiable in this image — no datasets or pretrained weights ship. This
script instead trains BOTH stacks end to end on a fixed-seed synthetic
dataset (sinusoid note tracks with amplitude-coded pitch):

  * ours: the ACTUAL MIR-ST500 recipe Brain (JAX) — 4-term loss,
    two-optimizer training, NewBob annealing, song-stitched eval,
    frame2note decode, bipartite COnPOff scoring;
  * reference: the ACTUAL torch ``AMT`` Brain from
    ``/root/reference/MIR_ST500/train_audio_ssl.py`` (deps stubbed as in
    ``tests/test_golden_recipe_parity.py``), driven through the same
    batch sequence from the SAME initial weights (``convert_hf``).

Both sides train fp32 on CPU with zero dropout, so the printed ``delta``
directly measures framework drift in trained quality: near 0 when our
optimizer/loss/decode semantics track the reference, diverging otherwise.
The dataset is tuned so COnPOff lands in a sensitive mid band (not a
saturated 1.0 and not majority-class floor), where regressions move the
number.

Prints ONE JSON line: {"metric": "synthetic_COnPOff_f1_vs_reference",
"value", "reference_value", "delta", per-metric pairs, epochs}.

Runtime ~8-12 min (QBENCH_EPOCHS=6 default; COnPOff ~0.79 = the sensitive band). Set QBENCH_SKIP_REFERENCE=1
for the ours-only legacy behavior (e.g. without /root/reference).
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
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
RECIPE_DIR = os.path.join(REPO_ROOT, "recipes", "MIR_ST500")
REFERENCE_ROOT = "/root/reference"

# tiny arch: both stacks share it; all dropouts zero so the two trainings
# are deterministic given identical weights + batches
ARCH = dict(hidden_size=64, num_layers=2, num_heads=4, ffn_size=128,
            conv_dim=(32,) * 7, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4)

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
      hidden_dropout: 0.0
      attention_dropout: 0.0
      activation_dropout: 0.0
      feat_proj_dropout: 0.0
feat_dim: 64
"""

# big lrs so the tiny model reaches its plateau within the epoch budget
LR_MODEL = 1.0      # Adadelta head (yaml key "lr")
LR_WAV2VEC = 0.004  # Adam encoder


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def make_dataset(root):
    """3 songs of sinusoid notes. Pitch is amplitude-coded (a tiny model
    cannot become frequency-selective in minutes, but it can read
    amplitude), 5 classes with stepped amplitudes so the pitch
    pipeline is learnable to a HIGH-but-not-saturated COnP — the sensitive
    band where a quality regression moves the score."""
    from svt_speechbrain_tpu.dataio.dataio import write_audio

    sys.path.insert(0, RECIPE_DIR)
    prep = _load(os.path.join(RECIPE_DIR, "prepare_benchmarks.py"),
                 "qb_prep")
    rng = np.random.default_rng(0)
    gt = {}
    folder = os.path.join(root, "wav16kHz")
    pitch_pool = np.asarray([45, 52, 57, 64, 69])
    pitch_amp = {p: 0.10 + 0.16 * i for i, p in enumerate(pitch_pool)}
    for song_i in range(3):
        name = f"song{song_i}"
        duration = 8.0 + 2.0 * song_i
        notes = []
        t0 = 0.2
        while t0 < duration - 0.6:
            dur = float(rng.uniform(0.25, 0.6))
            notes.append([round(t0, 3), round(t0 + dur, 3),
                          int(rng.choice(pitch_pool))])
            t0 += dur + float(rng.uniform(0.1, 0.4))
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


def _examples(data):
    """Materialize a DynamicItemDataset in csv order."""
    return [data[i] for i in range(len(data))]


def _train_batches(examples):
    """Deterministic batch plan replayed every epoch: group utterances of
    IDENTICAL length (so no padding exists and the reference's
    wav-length anno mask equals our exact frame mask), batch size <= 3."""
    by_len = {}
    for ex in examples:
        by_len.setdefault(len(ex["sig"]), []).append(ex)
    batches = []
    for n in sorted(by_len):
        group = by_len[n]
        for i in range(0, len(group), 3):
            batches.append(group[i:i + 3])
    return batches


def _import_reference():
    """Stub-import the reference speechbrain + MIR_ST500 recipe — the ONE
    shared harness (tests/reference_harness.py), so the tests and this
    standing artifact can't drift apart in what they stub."""
    from tests.reference_harness import import_reference_mir_recipe

    return import_reference_mir_recipe()


def _tiny_torch_model():
    import torch
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model

    hf_cfg = HFConfig(
        hidden_size=ARCH["hidden_size"],
        num_hidden_layers=ARCH["num_layers"],
        num_attention_heads=ARCH["num_heads"],
        intermediate_size=ARCH["ffn_size"],
        conv_dim=ARCH["conv_dim"],
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        feat_extract_norm="layer", conv_bias=True,
        num_conv_pos_embeddings=ARCH["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=ARCH["num_conv_pos_embedding_groups"],
        do_stable_layer_norm=True, hidden_dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0)
    torch.manual_seed(0)
    model = Wav2Vec2Model(hf_cfg)
    model.config.apply_spec_augment = False
    return model


def _ref_hparams(sb):
    from tests.reference_harness import ref_amt_hparams

    return ref_amt_hparams(sb)


def _run_reference(train_batches, eval_examples, hf_model, head_w, head_b,
                   epochs):
    """Train + song-eval the reference torch AMT Brain."""
    import torch

    from tests.reference_harness import RefBatch as _RefBatch

    sb, ref_recipe, ref_hi = _import_reference()
    ref_w2v = ref_hi.HuggingFaceWav2Vec2.__new__(ref_hi.HuggingFaceWav2Vec2)
    torch.nn.Module.__init__(ref_w2v)
    ref_w2v.model = hf_model
    ref_w2v.normalize_wav = True
    ref_w2v.output_norm = True
    ref_w2v.freeze = False
    ref_w2v.freeze_feature_extractor = False
    ref_head = sb.nnet.linear.Linear(input_size=ARCH["hidden_size"],
                                     n_neurons=20)
    with torch.no_grad():
        ref_head.w.weight.copy_(torch.tensor(head_w.T))
        ref_head.w.bias.copy_(torch.tensor(head_b))
    brain = ref_recipe.AMT(modules={"wav2vec2": ref_w2v, "model": ref_head},
                           hparams=_ref_hparams(sb),
                           run_opts={"device": "cpu"})
    # init_optimizers semantics (train_audio_ssl.py:307-318) with the
    # quality bench's lrs (overridden identically on both sides)
    brain.wav2vec_optimizer = torch.optim.Adam(ref_w2v.parameters(),
                                               lr=LR_WAV2VEC)
    brain.model_optimizer = torch.optim.Adadelta(
        ref_head.parameters(), lr=LR_MODEL, rho=0.95, eps=1e-8)
    sched_w2v = sb.nnet.schedulers.NewBobScheduler(
        initial_value=LR_WAV2VEC, improvement_threshold=0.0025,
        annealing_factor=0.9, patient=0)
    sched_model = sb.nnet.schedulers.NewBobScheduler(
        initial_value=LR_MODEL, improvement_threshold=0.0025,
        annealing_factor=0.8, patient=0)

    for _ in range(epochs):
        losses = []
        for group in train_batches:
            wavs = torch.tensor(np.stack([ex["sig"] for ex in group]))
            anno = torch.tensor(
                np.stack([ex["anno"] for ex in group]).astype(np.float32))
            lens = torch.ones(len(group))
            rb = _RefBatch(id=[ex["id"] for ex in group],
                           sig=(wavs, lens), anno=(anno, lens))
            losses.append(float(brain.fit_batch(rb)))
        valid = float(np.mean(losses))
        _, new_w2v = sched_w2v(valid)
        _, new_model = sched_model(valid)
        sb.nnet.schedulers.update_learning_rate(
            brain.wav2vec_optimizer, new_w2v)
        sb.nnet.schedulers.update_learning_rate(
            brain.model_optimizer, new_model)

    brain.on_stage_start(sb.Stage.VALID, 1)
    eval_losses = []
    for ex in eval_examples:
        rb = _RefBatch(
            id=[ex["id"]],
            sig=(torch.tensor(np.asarray(ex["sig"])[None]),
                 torch.ones(1)),
            anno=(torch.tensor(
                np.asarray(ex["anno"], np.float32)[None]), torch.ones(1)),
            cur_utter=torch.tensor([int(ex["cur_utter"])]),
            all_utter=torch.tensor([int(ex["all_utter"])]),
            ref_intervals=(torch.tensor(
                np.asarray(ex["ref_intervals"])[None]), torch.ones(1)),
            ref_pitchs=(torch.tensor(
                np.asarray(ex["ref_pitchs"])[None]), torch.ones(1)))
        with torch.no_grad():
            pred = brain.compute_forward(rb, sb.Stage.VALID)
            eval_losses.append(float(
                brain.compute_objectives(pred, rb, sb.Stage.VALID)))
    return {
        "COnPOff_f1": brain.COnPOff_f1.avg,
        "COnP_f1": brain.COnP_f1.avg,
        "COn_f1": brain.COn_f1.avg,
        "loss": float(np.mean(eval_losses)),
    }


def _run_ours(train_batches, eval_examples, hparams, recipe, my_params,
              epochs):
    """Train + song-eval our recipe Brain on the identical plan."""
    from svt_speechbrain_tpu.core import Stage
    from svt_speechbrain_tpu.dataio.batch import PaddedBatch

    brain = recipe.AMT(modules=hparams["modules"], hparams=hparams,
                       run_opts={"noprogressbar": True}, checkpointer=None)
    brain.load_module_params("wav2vec2", my_params["wav2vec2"])
    brain.load_module_params("model", my_params["model"])
    brain.init_optimizers()
    for _ in range(epochs):
        losses = []
        for group in train_batches:
            losses.append(brain.fit_batch(PaddedBatch(
                [{"id": ex["id"], "sig": ex["sig"], "anno": ex["anno"]}
                 for ex in group])))
        valid = float(np.mean(losses))
        _, w2v_lr = hparams["lr_annealing_wav2vec"](valid)
        brain.set_learning_rate("wav2vec", w2v_lr)
        _, model_lr = hparams["lr_annealing_model"](valid)
        brain.set_learning_rate("model", model_lr)

    brain.on_stage_start(Stage.VALID, 1)
    eval_losses = []
    for ex in eval_examples:
        b = PaddedBatch([dict(ex)])
        arrays = {k: v for k, v in b.numpy_arrays().items()
                  if k not in brain.host_only_keys}
        pred = brain.compute_forward(brain.params, arrays, Stage.VALID)
        loss = float(brain.compute_objectives(pred, arrays, Stage.VALID))
        pred_np = jax.tree_util.tree_map(np.asarray, pred)
        brain.on_evaluate_batch_end(b, pred_np, loss, Stage.VALID)
        eval_losses.append(loss)
    return {
        "COnPOff_f1": brain.COnPOff_f1.avg,
        "COnP_f1": brain.COnP_f1.avg,
        "COn_f1": brain.COn_f1.avg,
        "loss": float(np.mean(eval_losses)),
    }


def main():
    from svt_speechbrain_tpu.config import load_hyperyaml
    from svt_speechbrain_tpu.models.convert_hf import (
        convert_wav2vec2_state_dict)
    from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Config

    epochs = int(os.environ.get("QBENCH_EPOCHS", "6"))
    skip_ref = (os.environ.get("QBENCH_SKIP_REFERENCE") == "1"
                or not os.path.isdir(REFERENCE_ROOT))
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
lr: 1.0
lr_wav2vec: 0.004
{TINY_ARCH}
"""
        with open(os.path.join(RECIPE_DIR, "hparams",
                               "train_audio_ssl.yaml")) as f:
            hparams = load_hyperyaml(f, overrides)
        train_data, valid_data, _ = recipe.dataio_prepare(hparams)
        train_batches = _train_batches(_examples(train_data))
        eval_examples = _examples(valid_data)

        # shared init: torch tiny model -> convert_hf -> our param tree
        import torch

        hf_model = _tiny_torch_model()
        torch.manual_seed(1)
        head_w = (np.random.default_rng(1)
                  .normal(size=(ARCH["hidden_size"], 20))
                  .astype(np.float32) * 0.05)
        head_b = np.zeros(20, np.float32)
        sd = {k: v.numpy().copy() for k, v in hf_model.state_dict().items()}
        my_cfg = Wav2Vec2Config(
            **{**ARCH, "conv_kernel": (10, 3, 3, 3, 3, 2, 2),
               "conv_stride": (5, 2, 2, 2, 2, 2, 2)})
        my_params = {
            "wav2vec2": {"encoder": convert_wav2vec2_state_dict(sd, my_cfg)},
            "model": {"w": head_w.copy(), "b": head_b.copy()},
        }

        mine = _run_ours(train_batches, eval_examples, hparams, recipe,
                         my_params, epochs)
        result = {
            "metric": "synthetic_COnPOff_f1_vs_reference",
            "value": round(mine["COnPOff_f1"], 4),
            "COnP_f1": round(mine["COnP_f1"], 4),
            "COn_f1": round(mine["COn_f1"], 4),
            "final_eval_loss": round(mine["loss"], 4),
            "epochs": epochs,
        }
        if not skip_ref:
            ref = _run_reference(train_batches, eval_examples, hf_model,
                                 head_w, head_b, epochs)
            result.update({
                "reference_value": round(ref["COnPOff_f1"], 4),
                "delta": round(mine["COnPOff_f1"] - ref["COnPOff_f1"], 4),
                "ref_COnP_f1": round(ref["COnP_f1"], 4),
                "ref_COn_f1": round(ref["COn_f1"], 4),
                "ref_final_eval_loss": round(ref["loss"], 4),
            })
        else:
            result["reference_value"] = None
        print(json.dumps(result))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
