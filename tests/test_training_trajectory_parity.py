"""TRAINING-TRAJECTORY golden parity: the reference torch ``AMT`` Brain and
ours train from identical converted weights on identical batch sequences for
4 epochs x 10 steps (fp32, CPU), crossing NewBob anneals, and must produce
the same per-step losses, the same lr trajectories for BOTH optimizers, and
the same final parameters.

This closes the last in-image gap to the COnPOff-within-0.1 bar that the
one-step golden parity (``test_golden_recipe_parity.py``) left open: it pins
down ``optax.adam`` vs ``torch.optim.Adam`` and ``optax.adadelta`` vs
``torch.optim.Adadelta`` update semantics (lr placement, eps position, rho
accumulators) over time, the global-norm gradient clip
(reference ``speechbrain/core.py:882-924`` → torch ``clip_grad_norm_`` with
its +1e-6 denominator), and that the NewBob anneal
(reference ``speechbrain/nnet/schedulers.py:100-127``) fires on the same
epochs with equal post-anneal lrs and equal post-anneal dynamics.

Reference trainer semantics under test: ``fit_batch`` =
forward → objectives → backward → check_gradients(clip) → Adam step +
Adadelta step (``/root/reference/MIR_ST500/train_audio_ssl.py:144-163``),
optimizers built by ``init_optimizers`` (``:307-318``) from
``hparams/train_audio_ssl.yaml:146-162`` (Adadelta lr=3e-4 rho=0.95 eps=1e-8
on the head; Adam lr=5e-5 on the encoder; NewBob thresholds 0.0025, factors
0.8 / 0.9, patient=0).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from tests.conftest import REPO_ROOT, reference_available
from tests.test_golden_recipe_parity import (
    ARCH_OVERRIDES, T_SAMPLES, _RefBatch, _my_config, _ref_hparams, _stub,
    _tiny_torch_model)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

N_EPOCHS = 4     # epoch 3 anneals on a scripted plateau; epoch 4 runs on
                 # the annealed lrs (post-anneal dynamics under test)
N_STEPS = 10
PLATEAU_EPOCH = 3


@pytest.fixture(scope="module")
def env():
    saved_modules = {k: sys.modules.get(k) for k in (
        "hyperpyyaml", "torchaudio", "ruamel", "ruamel.yaml", "mir_eval",
        "mir_eval.transcription", "mir_eval.util", "utils")}
    from svt_speechbrain_tpu.utils import transcription_eval
    _stub("hyperpyyaml", load_hyperpyyaml=lambda *a, **k: {},
          resolve_references=lambda *a, **k: None)
    _stub("torchaudio", load=None, info=None,
          set_audio_backend=lambda *a, **k: None,
          get_audio_backend=lambda: "soundfile")
    ry = _stub("ruamel")
    ry.yaml = _stub("ruamel.yaml", YAML=object)
    me = _stub("mir_eval")
    me.transcription = _stub("mir_eval.transcription",
                             evaluate=transcription_eval.evaluate)
    me.util = _stub("mir_eval.util",
                    midi_to_hz=transcription_eval.midi_to_hz)

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/MIR_ST500")
    try:
        import speechbrain as sb

        spec = importlib.util.spec_from_file_location(
            "_ref_amt_recipe_traj",
            "/root/reference/MIR_ST500/train_audio_ssl.py")
        ref_recipe = importlib.util.module_from_spec(spec)
        sys.modules["_ref_amt_recipe_traj"] = ref_recipe
        spec.loader.exec_module(ref_recipe)

        hi_spec = importlib.util.spec_from_file_location(
            "_ref_hf_iface_traj",
            "/root/reference/MIR_ST500/huggingface_interface.py")
        ref_hi = importlib.util.module_from_spec(hi_spec)
        sys.modules["_ref_hf_iface_traj"] = ref_hi
        hi_spec.loader.exec_module(ref_hi)

        ns = _train_both_stacks(sb, ref_recipe, ref_hi)
    finally:
        sys.path.remove("/root/reference")
        sys.path.remove("/root/reference/MIR_ST500")
        for k, v in saved_modules.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return ns


def _make_batches(my_cfg):
    """N_STEPS deterministic full-length (unpadded) 2-row batches, replayed
    identically each epoch (a no-shuffle dataloader)."""
    rng = np.random.default_rng(7)
    n_frames = my_cfg.output_length(T_SAMPLES)
    batches = []
    for _ in range(N_STEPS):
        wavs = rng.normal(size=(2, T_SAMPLES)).astype(np.float32) * 0.1
        anno = np.stack([
            (rng.random((2, n_frames)) > 0.85).astype(np.float32),
            (rng.random((2, n_frames)) > 0.85).astype(np.float32),
            rng.integers(0, 5, size=(2, n_frames)).astype(np.float32),
            rng.integers(0, 13, size=(2, n_frames)).astype(np.float32),
        ], axis=-1)
        batches.append((wavs, anno))
    return batches


def _train_both_stacks(sb, ref_recipe, ref_hi):
    import torch
    from svt_speechbrain_tpu.config import load_hyperyaml
    from svt_speechbrain_tpu.dataio.batch import PaddedBatch
    from svt_speechbrain_tpu.models.convert_hf import (
        convert_wav2vec2_state_dict)

    ns = types.SimpleNamespace()
    hf_model = _tiny_torch_model()
    my_cfg = _my_config()
    batches = _make_batches(my_cfg)

    # ---------------- reference stack: Brain + real torch optimizers +
    # real reference NewBob schedulers, driven exactly like fit()
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
    # init_optimizers (train_audio_ssl.py:307-318) with the recipe's yaml
    # hyperparameters (hparams/train_audio_ssl.yaml:146-152)
    ref_brain.wav2vec_optimizer = torch.optim.Adam(
        ref_w2v.parameters(), lr=5e-5)
    ref_brain.model_optimizer = torch.optim.Adadelta(
        ref_head.parameters(), lr=3e-4, rho=0.95, eps=1e-8)
    ref_sched_w2v = sb.nnet.schedulers.NewBobScheduler(
        initial_value=5e-5, improvement_threshold=0.0025,
        annealing_factor=0.9, patient=0)
    ref_sched_model = sb.nnet.schedulers.NewBobScheduler(
        initial_value=3e-4, improvement_threshold=0.0025,
        annealing_factor=0.8, patient=0)

    # ---------------- our stack: recipe Brain + optax optimizers via
    # AudioAMT.init_optimizers + our NewBob from the recipe yaml
    spec = importlib.util.spec_from_file_location(
        "traj_my_recipe",
        os.path.join(REPO_ROOT, "recipes", "MIR_ST500", "train_audio_ssl.py"))
    my_recipe = importlib.util.module_from_spec(spec)
    sys.modules["traj_my_recipe"] = my_recipe
    spec.loader.exec_module(my_recipe)
    with open(os.path.join(REPO_ROOT, "recipes", "MIR_ST500", "hparams",
                           "train_audio_ssl.yaml")) as f:
        hparams = load_hyperyaml(f, ARCH_OVERRIDES)
    # .copy() is load-bearing: torch .numpy() returns views, JAX CPU arrays
    # can zero-copy them, and the reference optimizer steps mutate in place —
    # without the copy the reference's training would leak into our params
    sd = {k: v.numpy().copy() for k, v in hf_model.state_dict().items()}
    brain = my_recipe.AMT(modules=hparams["modules"], hparams=hparams,
                          run_opts={"noprogressbar": True}, checkpointer=None)
    brain.load_module_params(
        "wav2vec2", {"encoder": convert_wav2vec2_state_dict(sd, my_cfg)})
    brain.load_module_params(
        "model", {"w": ref_head.w.weight.detach().numpy().T.copy(),
                  "b": ref_head.w.bias.detach().numpy().copy()})
    brain.init_optimizers()

    ns.ref_losses, ns.my_losses = [], []
    ns.ref_lrs, ns.my_lrs = [], []   # (epoch, w2v_lr, model_lr) after anneal
    for epoch in range(1, N_EPOCHS + 1):
        ref_epoch, my_epoch = [], []
        for wavs, anno in batches:
            lens = torch.tensor([1.0, 1.0])
            ref_batch = _RefBatch(
                id=["u1", "u2"],
                sig=(torch.tensor(wavs), lens),
                anno=(torch.tensor(anno), lens))
            ref_epoch.append(float(ref_brain.fit_batch(ref_batch)))

            examples = [{"id": f"u{i+1}", "sig": wavs[i], "anno": anno[i]}
                        for i in range(2)]
            my_epoch.append(brain.fit_batch(PaddedBatch(examples)))
        ns.ref_losses.append(ref_epoch)
        ns.my_losses.append(my_epoch)

        # end-of-epoch anneal, each side driven by its OWN mean train loss
        # (train_audio_ssl.py:258-268 uses the valid stage loss; the mean
        # train loss is the same kind of scalar and keeps this test
        # dataloader-free). On the plateau epoch each side replays its own
        # previous value — zero improvement < threshold forces the NewBob
        # anneal deterministically, so the following epoch exercises the
        # post-anneal optimizer dynamics.
        ref_valid = float(np.mean(ref_epoch))
        my_valid = float(np.mean(my_epoch))
        if epoch == PLATEAU_EPOCH:
            ref_valid, my_valid = prev_ref_valid, prev_my_valid
        prev_ref_valid, prev_my_valid = ref_valid, my_valid
        _, new_w2v = ref_sched_w2v(ref_valid)
        _, new_model = ref_sched_model(ref_valid)
        sb.nnet.schedulers.update_learning_rate(
            ref_brain.wav2vec_optimizer, new_w2v)
        sb.nnet.schedulers.update_learning_rate(
            ref_brain.model_optimizer, new_model)
        ns.ref_lrs.append((new_w2v, new_model))

        _, m_w2v = hparams["lr_annealing_wav2vec"](my_valid)
        brain.set_learning_rate("wav2vec", m_w2v)
        _, m_model = hparams["lr_annealing_model"](my_valid)
        brain.set_learning_rate("model", m_model)
        ns.my_lrs.append((m_w2v, m_model))

    ns.ref_final = {
        "w2v": {k: v.detach().numpy().copy()
                for k, v in hf_model.state_dict().items()},
        "head_w": ref_head.w.weight.detach().numpy().T.copy(),
        "head_b": ref_head.w.bias.detach().numpy().copy(),
    }
    ns.my_final = {
        "w2v": brain.params["wav2vec2"],
        "head_w": np.asarray(brain.params["model"]["w"]),
        "head_b": np.asarray(brain.params["model"]["b"]),
    }
    ns.my_cfg = my_cfg
    ns.convert = convert_wav2vec2_state_dict
    return ns


def test_per_step_losses_match(env):
    """40 consecutive optimizer steps with losses in lockstep (fp32 drift
    compounds through two optimizers' accumulators — the tolerance grows
    with step index but stays far below any semantic divergence)."""
    flat_ref = np.asarray(env.ref_losses).ravel()
    flat_my = np.asarray(env.my_losses).ravel()
    for i, (r, m) in enumerate(zip(flat_ref, flat_my)):
        atol = 1e-5 * (1 + i)
        assert abs(r - m) < atol, (i, r, m)


def test_lr_trajectories_identical(env):
    """NewBob decisions (both schedulers) on the same epochs, equal new lrs."""
    assert len(env.ref_lrs) == len(env.my_lrs) == N_EPOCHS
    for e, ((rw, rm), (mw, mm)) in enumerate(zip(env.ref_lrs, env.my_lrs)):
        assert np.isclose(rw, mw, rtol=1e-12), (e, rw, mw)
        assert np.isclose(rm, mm, rtol=1e-12), (e, rm, mm)


def test_at_least_one_anneal_fired(env):
    """The trajectory must actually cross an anneal for the post-anneal
    dynamics claim to be non-vacuous."""
    w2v_lrs = [lr for lr, _ in env.ref_lrs]
    model_lrs = [lr for _, lr in env.ref_lrs]
    assert min(w2v_lrs) < 5e-5, w2v_lrs
    assert min(model_lrs) < 3e-4, model_lrs


def test_final_parameters_match(env):
    """Post-training parameters agree: Adam side (encoder) and Adadelta side
    (head) both within fp32 drift after 40 steps."""
    conv = env.convert(env.ref_final["w2v"], env.my_cfg)
    ref_tree = {"encoder": conv}
    import jax

    leaves_ref, treedef_r = jax.tree_util.tree_flatten(ref_tree)
    leaves_my, treedef_m = jax.tree_util.tree_flatten(env.my_final["w2v"])
    assert treedef_r == treedef_m
    for r, m in zip(leaves_ref, leaves_my):
        np.testing.assert_allclose(np.asarray(m), np.asarray(r),
                                   atol=5e-6, rtol=1e-4)
    np.testing.assert_allclose(env.my_final["head_w"],
                               env.ref_final["head_w"], atol=5e-6, rtol=1e-4)
    np.testing.assert_allclose(env.my_final["head_b"],
                               env.ref_final["head_b"], atol=5e-6, rtol=1e-4)
