"""WHOLE-RECIPE golden parity: the reference's actual torch ``AMT`` Brain
(``/root/reference/MIR_ST500/train_audio_ssl.py:28-141``) vs our recipe's
``AMT`` on a shared tiny wav2vec2 with ``convert_hf``-converted weights.

This is the strongest in-image proxy for the COnPOff-on-real-data bar (no
datasets/pretrained weights ship in this environment): it proves the whole
pipeline — HF encoder bridge + whole-tensor norms + linear head + 4-term
masked loss + sigmoid/argmax frame decode + ``frame2note`` + bipartite
COnPOff scoring — produces the SAME numbers end to end, not just per
component.

The reference package needs hyperpyyaml/torchaudio/ruamel/mir_eval, which
this image doesn't ship; they're stubbed (mir_eval's ``evaluate`` routes to
our ``transcription_eval`` — itself golden-tested against mir_eval
semantics in ``test_transcription_eval.py`` — and records the estimated
events so we can compare them exactly).

Known sub-frame deviation (documented in PARITY.md): the reference masks
the frame-loss by *waveform* relative length (``train_audio_ssl.py:65-72``,
``length*399`` may be fractional → one extra valid frame), while our
pipeline masks by exact annotation frame counts. The train batch here
passes the reference's lengths to both sides, which makes the losses
bit-comparable; eval is batch-1 unpadded so the question never arises.
"""
import functools
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tests.conftest import REPO_ROOT, reference_available
from tests.reference_harness import (
    STUBBED_MODULES, RefBatch as _RefBatch, load_reference_module,
    ref_amt_hparams as _ref_hparams, stub_module as _stub,
    stub_reference_deps)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

T_SAMPLES = 8000


@pytest.fixture(scope="module")
def env():
    """Import the reference recipe (stubbed deps) + our recipe, build the
    shared tiny model, and run BOTH stacks through train + eval. Returns a
    namespace with everything the asserts need."""
    import torch
    from svt_speechbrain_tpu.utils import transcription_eval

    recorded = []

    def recording_evaluate(ref_i, ref_p, est_i, est_p, **kw):
        out = transcription_eval.evaluate(ref_i, ref_p, est_i, est_p, **kw)
        recorded.append((np.asarray(est_i), np.asarray(est_p)))
        return out

    added_mods = []

    def stub(name, **attrs):
        added_mods.append(name)
        return _stub(name, **attrs)

    saved_modules = {k: sys.modules.get(k)
                     for k in STUBBED_MODULES + ("utils",)}
    stub_reference_deps(evaluate_fn=recording_evaluate, stub=stub)

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/MIR_ST500")
    try:
        import speechbrain as sb

        ref_recipe = load_reference_module(
            "/root/reference/MIR_ST500/train_audio_ssl.py",
            "_ref_amt_recipe")
        ref_hi = load_reference_module(
            "/root/reference/MIR_ST500/huggingface_interface.py",
            "_ref_hf_iface")

        ns = _run_both_stacks(sb, ref_recipe, ref_hi, recorded)
    finally:
        sys.path.remove("/root/reference")
        sys.path.remove("/root/reference/MIR_ST500")
        # un-stub everything that could shadow real modules in later tests
        for k, v in saved_modules.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns


def _tiny_torch_model():
    import torch
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model

    hf_cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), feat_extract_norm="layer", conv_bias=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0)
    torch.manual_seed(0)
    model = Wav2Vec2Model(hf_cfg)
    model.config.apply_spec_augment = False
    return model


def _my_config():
    from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Config

    return Wav2Vec2Config(
        hidden_size=32, num_layers=2, num_heads=4, ffn_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        feat_extract_norm="layer", conv_bias=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True)


ARCH_OVERRIDES = """
data_folder: /tmp/golden_unused
output_folder: /tmp/golden_parity_out
csv_folder: /tmp/golden_unused
train_csv: /tmp/golden_unused.csv
valid_csv: /tmp/golden_unused.csv
test_csv: [/tmp/golden_unused.csv]
num_workers: 0
wav2vec2: !new:svt_speechbrain_tpu.models.wav2vec2.HuggingFaceWav2Vec2
   source: tiny-test
   output_norm: True
   normalize_wav: True
   arch_overrides:
      hidden_size: 32
      num_layers: 2
      num_heads: 4
      ffn_size: 64
      conv_dim: [16, 16, 16]
      conv_kernel: [10, 3, 2]
      conv_stride: [5, 2, 2]
      feat_extract_norm: layer
      conv_bias: True
      do_stable_layer_norm: True
      num_conv_pos_embeddings: 16
      num_conv_pos_embedding_groups: 4
      hidden_dropout: 0.0
      attention_dropout: 0.0
      activation_dropout: 0.0
      feat_proj_dropout: 0.0
feat_dim: 32
"""


def _run_both_stacks(sb, ref_recipe, ref_hi, recorded):
    import jax
    import torch
    from svt_speechbrain_tpu.core import Stage
    from svt_speechbrain_tpu.config import load_hyperyaml
    from svt_speechbrain_tpu.dataio.batch import PaddedBatch, PaddedData
    from svt_speechbrain_tpu.models.convert_hf import (
        convert_wav2vec2_state_dict)

    ns = types.SimpleNamespace()
    hf_model = _tiny_torch_model()
    my_cfg = _my_config()

    # ---- reference brain around the shared torch model (the interface's
    # download path is bypassed: we install the model + the flags its
    # forward uses, huggingface_interface.py:127-144,263-298)
    ref_w2v = ref_hi.HuggingFaceWav2Vec2.__new__(ref_hi.HuggingFaceWav2Vec2)
    torch.nn.Module.__init__(ref_w2v)
    ref_w2v.model = hf_model
    ref_w2v.normalize_wav = True
    ref_w2v.output_norm = True
    ref_w2v.freeze = False
    ref_w2v.freeze_feature_extractor = False
    torch.manual_seed(1)
    ref_head = sb.nnet.linear.Linear(input_size=32, n_neurons=20)
    ref_brain = ref_recipe.AMT(
        modules={"wav2vec2": ref_w2v, "model": ref_head},
        hparams=_ref_hparams(sb), run_opts={"device": "cpu"})

    # ---- our brain with converted weights
    spec = importlib.util.spec_from_file_location(
        "golden_my_recipe",
        os.path.join(REPO_ROOT, "recipes", "MIR_ST500", "train_audio_ssl.py"))
    my_recipe = importlib.util.module_from_spec(spec)
    sys.modules["golden_my_recipe"] = my_recipe
    spec.loader.exec_module(my_recipe)
    with open(os.path.join(REPO_ROOT, "recipes", "MIR_ST500", "hparams",
                           "train_audio_ssl.yaml")) as f:
        hparams = load_hyperyaml(f, ARCH_OVERRIDES)
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    my_params = {
        "wav2vec2": {"encoder": convert_wav2vec2_state_dict(sd, my_cfg)},
        "model": {"w": ref_head.w.weight.detach().numpy().T.copy(),
                  "b": ref_head.w.bias.detach().numpy().copy()},
    }

    # ---- shared synthetic train batch: B=2, second row 20% padded
    rng = np.random.default_rng(42)
    wavs = rng.normal(size=(2, T_SAMPLES)).astype(np.float32) * 0.1
    true_samples = [T_SAMPLES, 6400]
    wavs[1, true_samples[1]:] = 0.0
    wav_lens = np.asarray([1.0, true_samples[1] / T_SAMPLES], np.float32)
    n_frames = my_cfg.output_length(T_SAMPLES)
    anno = np.stack([
        (rng.random((2, n_frames)) > 0.85).astype(np.float32),
        (rng.random((2, n_frames)) > 0.85).astype(np.float32),
        rng.integers(0, 5, size=(2, n_frames)).astype(np.float32),
        rng.integers(0, 13, size=(2, n_frames)).astype(np.float32),
    ], axis=-1)
    tf = [my_cfg.output_length(s) for s in true_samples]
    anno[1, tf[1]:] = 0.0

    ref_batch = _RefBatch(
        id=["u1", "u2"],
        sig=(torch.tensor(wavs), torch.tensor(wav_lens)),
        anno=(torch.tensor(anno), torch.tensor(wav_lens)))
    with torch.no_grad():
        ns.ref_pred = [p.numpy() for p in
                       ref_brain.compute_forward(ref_batch, sb.Stage.TRAIN)]
        ns.ref_train_loss = float(ref_brain.compute_objectives(
            [torch.tensor(p) for p in ns.ref_pred], ref_batch,
            sb.Stage.TRAIN))

    brain = my_recipe.AMT(modules=hparams["modules"], hparams=hparams,
                          run_opts={"noprogressbar": True}, checkpointer=None)
    examples = [{"id": f"u{i+1}", "sig": wavs[i, :true_samples[i]],
                 "anno": anno[i, :tf[i]]} for i in range(2)]
    my_batch = PaddedBatch(examples)
    arrays = my_batch.numpy_arrays()
    # see module docstring: align with the reference's wav-length anno mask
    arrays["anno"] = PaddedData(arrays["anno"].data, wav_lens)
    my_pred = brain.compute_forward(my_params, arrays, Stage.TRAIN)
    ns.my_train_loss = float(brain.compute_objectives(my_pred, arrays,
                                                      Stage.TRAIN))
    ns.my_pred = [np.asarray(p) for p in my_pred[:4]]

    # ---- shared eval: one song = 2 unpadded batch-1 utterances
    utt_samples = [4000, 5200]
    utt_wavs = [rng.normal(size=(s,)).astype(np.float32) * 0.1
                for s in utt_samples]
    utt_frames = [my_cfg.output_length(s) for s in utt_samples]
    utt_annos = [np.stack([
        (rng.random(f) > 0.85).astype(np.float32),
        (rng.random(f) > 0.85).astype(np.float32),
        rng.integers(0, 5, size=f).astype(np.float32),
        rng.integers(0, 13, size=f).astype(np.float32)], axis=-1)
        for f in utt_frames]
    gt_intervals = np.asarray([[0.1, 0.5], [0.7, 1.0], [1.2, 1.5]],
                              np.float64)
    gt_pitchs = np.asarray([60.0, 64.0, 67.0], np.float64)

    ref_brain.on_stage_start(sb.Stage.VALID, 1)
    ns.ref_eval_losses = []
    for i in range(2):
        rb = _RefBatch(
            id=[f"song1_{i}"],
            sig=(torch.tensor(utt_wavs[i][None]), torch.tensor([1.0])),
            anno=(torch.tensor(utt_annos[i][None]), torch.tensor([1.0])),
            cur_utter=torch.tensor([i + 1]), all_utter=torch.tensor([2]),
            ref_intervals=(torch.tensor(gt_intervals[None]),
                           torch.tensor([1.0])),
            ref_pitchs=(torch.tensor(gt_pitchs[None]), torch.tensor([1.0])))
        with torch.no_grad():
            pred = ref_brain.compute_forward(rb, sb.Stage.VALID)
            ns.ref_eval_losses.append(float(
                ref_brain.compute_objectives(pred, rb, sb.Stage.VALID)))
    assert len(recorded) == 1
    ns.ref_est_intervals, ns.ref_est_pitchs_hz = recorded[0]
    ns.ref_f1 = {k: getattr(ref_brain, f"{k}_f1").avg
                 for k in ("COnPOff", "COnP", "COn")}

    captured = {}

    class CapturingAMT(my_recipe.AMT):
        def on_song_end(self, batch, est_np):
            captured["est"] = est_np

    brain2 = CapturingAMT(modules=hparams["modules"], hparams=hparams,
                          run_opts={"noprogressbar": True}, checkpointer=None)
    brain2.on_stage_start(Stage.VALID, 1)
    ns.my_eval_losses = []
    for i in range(2):
        ex = {"id": f"song1_{i}", "sig": utt_wavs[i], "anno": utt_annos[i],
              "cur_utter": i + 1, "all_utter": 2,
              "ref_intervals": gt_intervals, "ref_pitchs": gt_pitchs}
        b = PaddedBatch([ex])
        arrays = {k: v for k, v in b.numpy_arrays().items()
                  if k not in brain2.host_only_keys}
        pred = brain2.compute_forward(my_params, arrays, Stage.VALID)
        loss = float(brain2.compute_objectives(pred, arrays, Stage.VALID))
        pred_np = jax.tree_util.tree_map(np.asarray, pred)
        brain2.on_evaluate_batch_end(b, pred_np, loss, Stage.VALID)
        ns.my_eval_losses.append(loss)
    ns.my_est = captured["est"]
    ns.my_f1 = {k: getattr(brain2, f"{k}_f1").avg
                for k in ("COnPOff", "COnP", "COn")}
    return ns


def test_forward_logits_match(env):
    """All four heads' logits match the reference stack at fp32 tolerance
    (conftest pins highest matmul precision)."""
    names = ["onset", "offset", "octave", "pitch_class"]
    for name, r, m in zip(names, env.ref_pred[:4], env.my_pred):
        assert r.shape == m.shape, name
        np.testing.assert_allclose(m, r, atol=1e-5, rtol=1e-4, err_msg=name)


def test_train_loss_matches(env):
    assert np.isclose(env.my_train_loss, env.ref_train_loss,
                      rtol=0, atol=1e-5), (
        env.my_train_loss, env.ref_train_loss)


def test_eval_losses_match(env):
    for mine, ref in zip(env.my_eval_losses, env.ref_eval_losses):
        assert np.isclose(mine, ref, rtol=0, atol=1e-5), (mine, ref)


def test_decoded_note_events_identical(env):
    """The song-stitched frame decode produces the SAME note events
    (onset, offset, pitch) — not just close scores."""
    from svt_speechbrain_tpu.utils.transcription_eval import midi_to_hz

    assert env.my_est.shape[0] > 10, "decode produced too few events to be meaningful"
    assert env.my_est.shape[0] == env.ref_est_intervals.shape[0]
    np.testing.assert_allclose(env.my_est[:, :2], env.ref_est_intervals,
                               atol=1e-9)
    np.testing.assert_allclose(midi_to_hz(env.my_est[:, 2]),
                               env.ref_est_pitchs_hz, atol=1e-9)


def test_conpoff_scores_identical(env):
    for k in ("COnPOff", "COnP", "COn"):
        assert env.my_f1[k] == env.ref_f1[k], (k, env.my_f1, env.ref_f1)
