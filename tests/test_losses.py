"""Masked-loss parity tests.

The reference's loss semantics (``speechbrain/nnet/losses.py``) are the ground
truth; torch (CPU) is available in the test image, so we check our jnp
implementations against the same formulas computed with torch ops.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from svt_speechbrain_tpu.nnet import losses


def _ref_masked(loss_elem, targets_shape, length, reduction):
    """Reference compute_masked_loss reduction on a torch elementwise loss."""
    b, t = targets_shape[:2]
    mask = torch.ones(targets_shape)
    if length is not None:
        lm = (torch.arange(t).float()[None, :] < (torch.tensor(length) * t)[:, None]).float()
        while lm.dim() < mask.dim():
            lm = lm.unsqueeze(-1)
        mask = mask * lm
    loss = loss_elem * mask
    if reduction == "mean":
        return (loss.sum() / mask.sum()).item()
    if reduction == "batchmean":
        return (loss.sum() / b).item()
    if reduction == "batch":
        return (loss.reshape(b, -1).sum(1) / mask.reshape(b, -1).sum(1)).numpy()
    raise ValueError


@pytest.mark.parametrize("reduction", ["mean", "batchmean", "batch"])
def test_bce_loss_matches_torch(reduction):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 50)).astype(np.float32)
    targets = (rng.random((4, 50)) > 0.8).astype(np.float32)
    length = [1.0, 0.9, 0.5, 0.72]
    pos_weight = 15.0

    t_logits = torch.tensor(logits)
    t_targets = torch.tensor(targets)
    elem = F.binary_cross_entropy_with_logits(
        t_logits, t_targets, pos_weight=torch.tensor([pos_weight]), reduction="none")
    expected = _ref_masked(elem, t_targets.shape, length, reduction)

    got = losses.bce_loss(logits, targets, length=np.array(length),
                          pos_weight=pos_weight, reduction=reduction)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5)


@pytest.mark.parametrize("reduction", ["mean", "batchmean", "batch"])
def test_nll_loss_matches_torch(reduction):
    rng = np.random.default_rng(1)
    logp = np.log(rng.dirichlet(np.ones(13), size=(4, 50)).astype(np.float32))
    targets = rng.integers(0, 13, size=(4, 50))
    length = [1.0, 0.8, 0.6, 0.31]

    t_logp = torch.tensor(logp).transpose(1, -1)
    elem = F.nll_loss(t_logp, torch.tensor(targets).long(), reduction="none")
    expected = _ref_masked(elem, targets.shape, length, reduction)

    got = losses.nll_loss(logp, targets, length=np.array(length), reduction=reduction)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5)


def test_bce_squeezes_singleton_and_truncates():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 52, 1)).astype(np.float32)  # 2 extra frames
    targets = (rng.random((2, 50)) > 0.5).astype(np.float32)
    got = losses.bce_loss(logits, targets, length=np.array([1.0, 1.0]))
    t_elem = F.binary_cross_entropy_with_logits(
        torch.tensor(logits[:, :50, 0]), torch.tensor(targets), reduction="none")
    np.testing.assert_allclose(np.asarray(got), t_elem.mean().item(), rtol=2e-5)


def test_truncate_raises_beyond_tolerance():
    with pytest.raises(ValueError):
        losses.truncate(np.zeros((1, 60)), np.zeros((1, 50)), allowed_len_diff=3)


def test_length_to_mask_float_semantics():
    # reference compares arange < length without rounding
    mask = np.asarray(losses.length_to_mask(np.array([2.5, 4.0]), max_len=4))
    np.testing.assert_array_equal(mask, [[1, 1, 1, 0], [1, 1, 1, 1]])


def test_mse_l1_classification_error():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(2, 10)).astype(np.float32)
    t = rng.normal(size=(2, 10)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(losses.mse_loss(p, t)), np.mean((p - t) ** 2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(losses.l1_loss(p, t)), np.mean(np.abs(p - t)), rtol=1e-6)

    probs = rng.random((2, 10, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=(2, 10))
    err = np.mean(np.argmax(probs, -1) != targets)
    np.testing.assert_allclose(
        np.asarray(losses.classification_error(probs, targets)), err, rtol=1e-6)


def test_amt_recipe_loss_composition():
    """The 4-term AMT loss (train_audio_ssl.py:64-76) runs end to end."""
    rng = np.random.default_rng(4)
    b, t = 3, 40
    logits = rng.normal(size=(b, t, 20)).astype(np.float32)
    anno = np.stack([
        (rng.random((b, t)) > 0.9).astype(np.int32),
        (rng.random((b, t)) > 0.9).astype(np.int32),
        rng.integers(0, 5, size=(b, t)),
        rng.integers(0, 13, size=(b, t)),
    ], axis=-1)
    length = np.array([1.0, 0.75, 0.5])

    import jax

    onset = losses.bce_loss(logits[:, :, 0], anno[:, :, 0].astype(np.float32),
                            length=length, pos_weight=15.0)
    offset = losses.bce_loss(logits[:, :, 1], anno[:, :, 1].astype(np.float32), length=length)
    octave = losses.nll_loss(jax.nn.log_softmax(logits[:, :, 2:7]), anno[:, :, 2], length=length)
    pitch = losses.nll_loss(jax.nn.log_softmax(logits[:, :, 7:20]), anno[:, :, 3], length=length)
    total = onset + offset + octave + pitch
    assert np.isfinite(np.asarray(total))
