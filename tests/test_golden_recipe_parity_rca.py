"""WHOLE-RECIPE golden parity for the RCA fusion family: the reference's
actual torch ``AMT`` Brains (``/root/reference/N20EMv2/audio_visual/
train_rca_av.py:26-171`` and the zeroed-video control ``train_rca_a.py``)
vs our fusion recipes, on shared synthetic feature dumps with
``convert_sb.convert_rca_fusion``-converted weights.

The noise-robustness sweep of this family is the paper's headline claim;
this test pins the whole stage-2 pipeline — sinusoidal positional encoding,
shared-weight self+cross RCA attention (our batched formulation vs the
reference's two MHA calls, ``fusion.py:137-183``), α-residual combine,
frame alignment of the 49.8 Hz audio / 50 Hz video streams, linear head,
4-term masked loss, frame decode + ``frame2note``, per-song prediction
dump, and COnPOff/COnP/COn/COff scoring — to equality, for BOTH the AV
recipe and the audio-only (zeroed video) control.

Same stub-import harness as ``test_golden_recipe_parity.py`` (no
hyperpyyaml/torchaudio/mir_eval in-image; mir_eval routes to our golden-
tested ``transcription_eval`` and records estimated events for exact
comparison).
"""
import functools
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tests.conftest import REPO_ROOT, reference_available
from tests.test_golden_recipe_parity import _ref_hparams, _RefBatch, _stub

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

D_MODEL = 64
NHEAD = 4
D_FFN = 128
N_FRAMES = 120   # train-utterance frames
AV_DIR = "/root/reference/N20EMv2/audio_visual"


@pytest.fixture(scope="module", params=["av", "audio_only"])
def env(request, tmp_path_factory):
    """Run the reference and our stack for one fusion variant ("av" or the
    zeroed-video "audio_only" control) through train + eval."""
    from svt_speechbrain_tpu.utils import transcription_eval

    recorded = []

    def recording_evaluate(ref_i, ref_p, est_i, est_p, **kw):
        out = transcription_eval.evaluate(ref_i, ref_p, est_i, est_p, **kw)
        recorded.append((np.asarray(est_i), np.asarray(est_p)))
        return out

    saved_modules = {k: sys.modules.get(k) for k in (
        "hyperpyyaml", "torchaudio", "ruamel", "ruamel.yaml", "mir_eval",
        "mir_eval.transcription", "mir_eval.util", "utils", "fusion")}
    for k in ("utils", "fusion"):
        sys.modules.pop(k, None)
    _stub("hyperpyyaml", load_hyperpyyaml=lambda *a, **k: {},
          resolve_references=lambda *a, **k: None)
    _stub("torchaudio", load=None, info=None,
          set_audio_backend=lambda *a, **k: None,
          get_audio_backend=lambda: "soundfile")
    ry = _stub("ruamel")
    ry.yaml = _stub("ruamel.yaml", YAML=object)
    me = _stub("mir_eval")
    me.transcription = _stub("mir_eval.transcription",
                             evaluate=recording_evaluate)
    me.util = _stub("mir_eval.util",
                    midi_to_hz=transcription_eval.midi_to_hz)

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, AV_DIR)
    try:
        import speechbrain as sb

        script = ("train_rca_av.py" if request.param == "av"
                  else "train_rca_a.py")
        spec = importlib.util.spec_from_file_location(
            f"_ref_rca_{request.param}", os.path.join(AV_DIR, script))
        ref_recipe = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = ref_recipe
        spec.loader.exec_module(ref_recipe)

        fspec = importlib.util.spec_from_file_location(
            "_ref_fusion", os.path.join(AV_DIR, "fusion.py"))
        ref_fusion = importlib.util.module_from_spec(fspec)
        sys.modules["_ref_fusion"] = ref_fusion
        fspec.loader.exec_module(ref_fusion)

        tmp = tmp_path_factory.mktemp(f"rca_golden_{request.param}")
        ns = _run_both_stacks(sb, ref_recipe, ref_fusion, recorded,
                              request.param, tmp)
    finally:
        sys.path.remove("/root/reference")
        sys.path.remove(AV_DIR)
        for k, v in saved_modules.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns


def _rca_ref_hparams(sb, tmp):
    hp = _ref_hparams(sb)
    hp.update(add_noise=False, noise_type="clean", snr_db=0)
    return hp


MY_OVERRIDES_TMPL = """
data_folder: {tmp}
output_folder: {tmp}/results
csv_folder: {tmp}
train_csv: {tmp}/unused.csv
valid_csv: {tmp}/unused.csv
test_csv: [{tmp}/unused.csv]
num_workers: 0
pretrain: False
feat_dim: 64
fusion: !new:svt_speechbrain_tpu.models.fusion.FusionRCA
   alpha: 0.5
   nhead: 4
   d_ffn: 128
   d_model: 64
"""


def _run_both_stacks(sb, ref_recipe, ref_fusion, recorded, variant, tmp):
    import jax
    import torch
    from svt_speechbrain_tpu.core import Stage
    from svt_speechbrain_tpu.config import load_hyperyaml
    from svt_speechbrain_tpu.dataio.batch import PaddedBatch
    from svt_speechbrain_tpu.models.convert_sb import convert_rca_fusion

    ns = types.SimpleNamespace()
    torch.manual_seed(0)
    ref_fus = ref_fusion.FusionRCA(alpha=0.5, nhead=NHEAD, d_ffn=D_FFN,
                                   d_model=D_MODEL)
    torch.manual_seed(1)
    ref_head = sb.nnet.linear.Linear(input_size=D_MODEL, n_neurons=20)
    ref_brain = ref_recipe.AMT(
        modules={"fusion": ref_fus, "head": ref_head},
        hparams=_rca_ref_hparams(sb, tmp), run_opts={"device": "cpu"})

    # ---- our brain with converted weights
    recipe_dir = os.path.join(REPO_ROOT, "recipes", "N20EMv2", "audio_visual")
    script = "train_rca_av.py" if variant == "av" else "train_rca_a.py"
    spec = importlib.util.spec_from_file_location(
        f"rca_golden_my_{variant}", os.path.join(recipe_dir, script))
    my_recipe = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = my_recipe
    spec.loader.exec_module(my_recipe)
    with open(os.path.join(recipe_dir, "hparams", "train_rca_av.yaml")) as f:
        hparams = load_hyperyaml(f, MY_OVERRIDES_TMPL.format(tmp=tmp))
    sd = {k: v.numpy().copy() for k, v in ref_fus.state_dict().items()}
    my_params = {
        "fusion": convert_rca_fusion(sd, d_model=D_MODEL),
        "head": {"w": ref_head.w.weight.detach().numpy().T.copy(),
                 "b": ref_head.w.bias.detach().numpy().copy()},
    }

    # ---- shared synthetic train batch: full-length rows (the 49.8/50 Hz
    # alignment pads/truncates video INSIDE FusionRCA on both sides)
    rng = np.random.default_rng(11)
    a_feats = rng.normal(size=(2, N_FRAMES, D_MODEL)).astype(np.float32) * 0.5
    v_feats = rng.normal(size=(2, N_FRAMES - 4, D_MODEL)).astype(np.float32) * 0.5
    ones = np.ones(2, np.float32)
    anno = np.stack([
        (rng.random((2, N_FRAMES)) > 0.85).astype(np.float32),
        (rng.random((2, N_FRAMES)) > 0.85).astype(np.float32),
        rng.integers(0, 5, size=(2, N_FRAMES)).astype(np.float32),
        rng.integers(0, 13, size=(2, N_FRAMES)).astype(np.float32),
    ], axis=-1)

    ref_batch = _RefBatch(
        id=["u1", "u2"],
        sig1=(torch.tensor(a_feats), torch.tensor(ones)),
        sig2=(torch.tensor(v_feats), torch.tensor(ones)),
        anno=(torch.tensor(anno), torch.tensor(ones)))
    with torch.no_grad():
        ns.ref_pred = [p.numpy() for p in
                       ref_brain.compute_forward(ref_batch, sb.Stage.TRAIN)]
        ns.ref_train_loss = float(ref_brain.compute_objectives(
            [torch.tensor(p) for p in ns.ref_pred], ref_batch,
            sb.Stage.TRAIN))

    brain = my_recipe.AMT(modules=hparams["modules"], hparams=hparams,
                          run_opts={"noprogressbar": True}, checkpointer=None)
    examples = [{"id": f"u{i+1}", "sig1": a_feats[i], "sig2": v_feats[i],
                 "anno": anno[i]} for i in range(2)]
    arrays = PaddedBatch(examples).numpy_arrays()
    my_pred = brain.compute_forward(my_params, arrays, Stage.TRAIN)
    ns.my_train_loss = float(brain.compute_objectives(my_pred, arrays,
                                                      Stage.TRAIN))
    ns.my_pred = [np.asarray(p) for p in my_pred[:4]]

    # ---- shared eval: one song = 2 batch-1 utterances; the reference saves
    # the per-song prediction npy next to batch.audio (train_rca_av.py:113)
    ref_song_dir = tmp / "ref_song"
    my_song_dir = tmp / "my_song"
    os.makedirs(ref_song_dir)
    os.makedirs(my_song_dir)
    utt_a = [rng.normal(size=(100, D_MODEL)).astype(np.float32) * 0.5,
             rng.normal(size=(80, D_MODEL)).astype(np.float32) * 0.5]
    utt_v = [rng.normal(size=(101, D_MODEL)).astype(np.float32) * 0.5,
             rng.normal(size=(79, D_MODEL)).astype(np.float32) * 0.5]
    utt_anno = [np.stack([
        (rng.random(f) > 0.85).astype(np.float32),
        (rng.random(f) > 0.85).astype(np.float32),
        rng.integers(0, 5, size=f).astype(np.float32),
        rng.integers(0, 13, size=f).astype(np.float32)], axis=-1)
        for f in (100, 80)]
    gt_intervals = np.asarray([[0.1, 0.5], [0.7, 1.0], [1.2, 1.5]],
                              np.float64)
    gt_pitchs = np.asarray([60.0, 64.0, 67.0], np.float64)

    ref_brain.on_stage_start(sb.Stage.VALID, 1)
    ns.ref_eval_losses = []
    for i in range(2):
        rb = _RefBatch(
            id=[f"song1_{i}"],
            audio=[str(ref_song_dir / "song.wav")],
            sig1=(torch.tensor(utt_a[i][None]), torch.tensor([1.0])),
            sig2=(torch.tensor(utt_v[i][None]), torch.tensor([1.0])),
            anno=(torch.tensor(utt_anno[i][None]), torch.tensor([1.0])),
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
                 for k in ("COnPOff", "COnP", "COn", "COff")}

    brain2 = my_recipe.AMT(modules=hparams["modules"], hparams=hparams,
                           run_opts={"noprogressbar": True}, checkpointer=None)
    brain2.on_stage_start(Stage.VALID, 1)
    ns.my_eval_losses = []
    for i in range(2):
        ex = {"id": f"song1_{i}", "audio": str(my_song_dir / "song.wav"),
              "sig1": utt_a[i], "sig2": utt_v[i], "anno": utt_anno[i],
              "cur_utter": i + 1, "all_utter": 2,
              "ref_intervals": gt_intervals, "ref_pitchs": gt_pitchs}
        b = PaddedBatch([ex])
        arrays = {k: v for k, v in b.numpy_arrays().items()
                  if k not in brain2.host_only_keys and k != "audio"}
        pred = brain2.compute_forward(my_params, arrays, Stage.VALID)
        loss = float(brain2.compute_objectives(pred, arrays, Stage.VALID))
        pred_np = jax.tree_util.tree_map(np.asarray, pred)
        brain2.on_evaluate_batch_end(b, pred_np, loss, Stage.VALID)
        ns.my_eval_losses.append(loss)
    ns.my_f1 = {k: getattr(brain2, f"{k}_f1").avg
                for k in ("COnPOff", "COnP", "COn", "COff")}
    file_name = ("clean_av_pred.npy" if variant == "av"
                 else "clean_audio_pred.npy")
    ns.ref_dump = np.load(ref_song_dir / file_name)
    ns.my_dump = np.load(my_song_dir / file_name)
    return ns


def test_forward_logits_match(env):
    names = ["onset", "offset", "octave", "pitch_class"]
    for name, r, m in zip(names, env.ref_pred[:4], env.my_pred):
        assert r.shape == m.shape, name
        np.testing.assert_allclose(m, r, atol=2e-5, rtol=1e-4, err_msg=name)


def test_train_loss_matches(env):
    assert np.isclose(env.my_train_loss, env.ref_train_loss,
                      rtol=0, atol=1e-5), (
        env.my_train_loss, env.ref_train_loss)


def test_eval_losses_match(env):
    for mine, ref in zip(env.my_eval_losses, env.ref_eval_losses):
        assert np.isclose(mine, ref, rtol=0, atol=1e-5), (mine, ref)


def test_decoded_events_and_dumps_identical(env):
    """Same stitched note events AND identical per-song prediction npy dumps
    (the artifact the reference's noise sweep consumes)."""
    from svt_speechbrain_tpu.utils.transcription_eval import midi_to_hz

    assert env.ref_dump.shape[0] > 5, "decode produced too few events"
    assert env.ref_dump.shape == env.my_dump.shape
    np.testing.assert_allclose(env.my_dump, env.ref_dump, atol=1e-9)
    np.testing.assert_allclose(env.my_dump[:, :2], env.ref_est_intervals,
                               atol=1e-9)
    np.testing.assert_allclose(midi_to_hz(env.my_dump[:, 2]),
                               env.ref_est_pitchs_hz, atol=1e-9)


def test_conpoff_scores_identical(env):
    for k in ("COnPOff", "COnP", "COn", "COff"):
        assert env.my_f1[k] == env.ref_f1[k], (k, env.my_f1, env.ref_f1)
