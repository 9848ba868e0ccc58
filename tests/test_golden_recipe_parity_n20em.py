"""Whole-recipe golden parity for the SECOND recipe family: the reference's
torch ``AMT`` Brain from ``N20EMv2/audio_only/train_audio_ssl.py`` vs our
``recipes/N20EMv2/audio_only`` recipe, on a shared tiny wav2vec2 with
converted weights.

Beyond the MIR-ST500 golden test this exercises the family's deltas:
weighted offset BCE (``offset_positive_weight``), and COff scoring in the
song-stitched eval.
"""
import functools
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tests.conftest import (REPO_ROOT, import_reference_speechbrain,
                            reference_available)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def env():
    import torch
    from svt_speechbrain_tpu.utils import transcription_eval

    recorded = []

    def recording_evaluate(ref_i, ref_p, est_i, est_p, **kw):
        out = transcription_eval.evaluate(ref_i, ref_p, est_i, est_p, **kw)
        recorded.append((np.asarray(est_i), np.asarray(est_p)))
        return out

    saved = {k: sys.modules.get(k) for k in (
        "mir_eval", "mir_eval.transcription", "mir_eval.util", "utils",
        "huggingface_interface")}
    sb = import_reference_speechbrain()
    me = _stub("mir_eval")
    me.transcription = _stub("mir_eval.transcription",
                             evaluate=recording_evaluate)
    me.util = _stub("mir_eval.util",
                    midi_to_hz=transcription_eval.midi_to_hz)
    sys.modules.pop("utils", None)  # force resolution from the recipe dir
    ref_dir = "/root/reference/N20EMv2/audio_only"
    sys.path.insert(0, ref_dir)
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_n20em_recipe", os.path.join(ref_dir, "train_audio_ssl.py"))
        ref_recipe = importlib.util.module_from_spec(spec)
        sys.modules["_ref_n20em_recipe"] = ref_recipe
        spec.loader.exec_module(ref_recipe)

        hi_spec = importlib.util.spec_from_file_location(
            "_ref_n20em_hf", os.path.join(ref_dir,
                                          "huggingface_interface.py"))
        ref_hi = importlib.util.module_from_spec(hi_spec)
        sys.modules["_ref_n20em_hf"] = ref_hi
        hi_spec.loader.exec_module(ref_hi)
        ns = _run(sb, ref_recipe, ref_hi, recorded)
    finally:
        sys.path.remove(ref_dir)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns


def _hparams(sb):
    def masked(fn, **kw):
        return functools.partial(fn, reduction="mean", allowed_len_diff=3,
                                 label_smoothing=0.0, **kw)

    def stats(fn):
        return functools.partial(
            sb.utils.metric_stats.MetricStats,
            metric=functools.partial(fn, reduction="batch",
                                     allowed_len_diff=3,
                                     label_smoothing=0.0))

    L = sb.nnet.losses
    return dict(
        pitch_octave_num=4, pitch_class_num=12,
        onset_positive_weight=15.0, offset_positive_weight=3.0,
        onset_criterion=masked(L.bce_loss), offset_criterion=masked(L.bce_loss),
        octave_criterion=masked(L.nll_loss), pitch_criterion=masked(L.nll_loss),
        log_softmax=sb.nnet.activations.Softmax(apply_log=True),
        onset_threshold=0.4, offset_threshold=0.5, frame_rate=49.8,
        onset_tolerance=0.05, pitch_tolerance=50,
        onset_stats=stats(L.bce_loss), offset_stats=stats(L.bce_loss),
        octave_stats=stats(L.nll_loss), pitch_stats=stats(L.nll_loss),
    )


ARCH = """
data_folder: /tmp/golden_unused
output_folder: /tmp/golden_n20em_out
csv_folder: /tmp/golden_unused
train_csv: /tmp/golden_unused.csv
valid_csv: /tmp/golden_unused.csv
test_csv: [/tmp/golden_unused.csv]
num_workers: 0
offset_positive_weight: 3.0
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
feat_dim: 32
"""


class _RefBatch:
    def __init__(self, **kw):
        self.__dict__.update(kw)

    def to(self, device):
        return self


def _run(sb, ref_recipe, ref_hi, recorded):
    import jax
    import torch
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model
    from svt_speechbrain_tpu.core import Stage
    from svt_speechbrain_tpu.config import load_hyperyaml
    from svt_speechbrain_tpu.dataio.batch import PaddedBatch
    from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Config
    from svt_speechbrain_tpu.models.convert_hf import (
        convert_wav2vec2_state_dict)

    ns = types.SimpleNamespace()
    hf_cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2),
        conv_stride=(5, 2, 2), feat_extract_norm="layer", conv_bias=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0)
    torch.manual_seed(20)
    hf_model = Wav2Vec2Model(hf_cfg)
    hf_model.config.apply_spec_augment = False
    my_cfg = Wav2Vec2Config(
        hidden_size=32, num_layers=2, num_heads=4, ffn_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        feat_extract_norm="layer", conv_bias=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True)

    ref_w2v = ref_hi.HuggingFaceWav2Vec2.__new__(ref_hi.HuggingFaceWav2Vec2)
    torch.nn.Module.__init__(ref_w2v)
    ref_w2v.model = hf_model
    ref_w2v.normalize_wav = True
    ref_w2v.output_norm = True
    ref_w2v.freeze = False
    ref_w2v.freeze_feature_extractor = False
    torch.manual_seed(21)
    ref_head = sb.nnet.linear.Linear(input_size=32, n_neurons=20)
    ref_brain = ref_recipe.AMT(
        modules={"wav2vec2": ref_w2v, "model": ref_head},
        hparams=_hparams(sb), run_opts={"device": "cpu"})

    spec = importlib.util.spec_from_file_location(
        "golden_n20em_mine",
        os.path.join(REPO_ROOT, "recipes", "N20EMv2", "audio_only",
                     "train_audio_ssl.py"))
    my_recipe = importlib.util.module_from_spec(spec)
    sys.modules["golden_n20em_mine"] = my_recipe
    spec.loader.exec_module(my_recipe)
    with open(os.path.join(REPO_ROOT, "recipes", "N20EMv2", "audio_only",
                           "hparams", "train_audio_ssl.yaml")) as f:
        hparams = load_hyperyaml(f, ARCH)
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    my_params = {
        "wav2vec2": {"encoder": convert_wav2vec2_state_dict(sd, my_cfg)},
        "model": {"w": ref_head.w.weight.detach().numpy().T.copy(),
                  "b": ref_head.w.bias.detach().numpy().copy()},
    }
    brain = my_recipe.AMT(modules=hparams["modules"], hparams=hparams,
                          run_opts={"noprogressbar": True}, checkpointer=None)

    # ---- train batch with the weighted-offset loss
    rng = np.random.default_rng(30)
    t_samples = 8000
    wavs = rng.normal(size=(2, t_samples)).astype(np.float32) * 0.1
    n_frames = my_cfg.output_length(t_samples)
    anno = np.stack([
        (rng.random((2, n_frames)) > 0.85).astype(np.float32),
        (rng.random((2, n_frames)) > 0.85).astype(np.float32),
        rng.integers(0, 5, size=(2, n_frames)).astype(np.float32),
        rng.integers(0, 13, size=(2, n_frames)).astype(np.float32),
    ], axis=-1)
    lens = np.ones(2, np.float32)
    rb = _RefBatch(id=["u1", "u2"],
                   sig=(torch.tensor(wavs), torch.tensor(lens)),
                   anno=(torch.tensor(anno), torch.tensor(lens)))
    with torch.no_grad():
        pred = ref_brain.compute_forward(rb, sb.Stage.TRAIN)
        ns.ref_train_loss = float(ref_brain.compute_objectives(
            pred, rb, sb.Stage.TRAIN))

    examples = [{"id": f"u{i+1}", "sig": wavs[i], "anno": anno[i]}
                for i in range(2)]
    arrays = PaddedBatch(examples).numpy_arrays()
    my_pred = brain.compute_forward(my_params, arrays, Stage.TRAIN)
    ns.my_train_loss = float(brain.compute_objectives(my_pred, arrays,
                                                      Stage.TRAIN))

    # ---- eval: one song = 2 utterances; compare COnPOff..COff
    utt_wavs = [rng.normal(size=(s,)).astype(np.float32) * 0.1
                for s in (4000, 5200)]
    utt_annos = []
    for s in (4000, 5200):
        f = my_cfg.output_length(s)
        utt_annos.append(np.stack([
            (rng.random(f) > 0.85).astype(np.float32),
            (rng.random(f) > 0.85).astype(np.float32),
            rng.integers(0, 5, size=f).astype(np.float32),
            rng.integers(0, 13, size=f).astype(np.float32)], axis=-1))
    gt_i = np.asarray([[0.1, 0.5], [0.7, 1.0]], np.float64)
    gt_p = np.asarray([60.0, 64.0], np.float64)

    ref_brain.on_stage_start(sb.Stage.VALID, 1)
    for i in range(2):
        rb = _RefBatch(
            id=[f"s_{i}"],
            sig=(torch.tensor(utt_wavs[i][None]), torch.tensor([1.0])),
            anno=(torch.tensor(utt_annos[i][None]), torch.tensor([1.0])),
            cur_utter=torch.tensor([i + 1]), all_utter=torch.tensor([2]),
            ref_intervals=(torch.tensor(gt_i[None]), torch.tensor([1.0])),
            ref_pitchs=(torch.tensor(gt_p[None]), torch.tensor([1.0])))
        with torch.no_grad():
            pred = ref_brain.compute_forward(rb, sb.Stage.VALID)
            ref_brain.compute_objectives(pred, rb, sb.Stage.VALID)
    ns.ref_f1 = {k: getattr(ref_brain, f"{k}_f1").avg
                 for k in ("COnPOff", "COnP", "COn", "COff")}

    brain.on_stage_start(Stage.VALID, 1)
    for i in range(2):
        ex = {"id": f"s_{i}", "sig": utt_wavs[i], "anno": utt_annos[i],
              "cur_utter": i + 1, "all_utter": 2,
              "ref_intervals": gt_i, "ref_pitchs": gt_p}
        b = PaddedBatch([ex])
        arrays = {k: v for k, v in b.numpy_arrays().items()
                  if k not in brain.host_only_keys}
        pred = brain.compute_forward(my_params, arrays, Stage.VALID)
        loss = float(brain.compute_objectives(pred, arrays, Stage.VALID))
        pred_np = jax.tree_util.tree_map(np.asarray, pred)
        brain.on_evaluate_batch_end(b, pred_np, loss, Stage.VALID)
    ns.my_f1 = {k: getattr(brain, f"{k}_f1").avg
                for k in ("COnPOff", "COnP", "COn", "COff")}
    return ns


def test_train_loss_matches_with_offset_weight(env):
    assert np.isclose(env.my_train_loss, env.ref_train_loss,
                      rtol=0, atol=1e-5), (
        env.my_train_loss, env.ref_train_loss)


def test_eval_metrics_match_including_coff(env):
    for k in ("COnPOff", "COnP", "COn", "COff"):
        assert env.my_f1[k] == env.ref_f1[k], (k, env.my_f1, env.ref_f1)
