"""Golden parity for the masked losses vs the reference
``speechbrain/nnet/losses.py``: nll (with label smoothing — the class-axis
regularizer — across reductions, 2-D and 3-D), mse/l1, bce, kldiv with
smoothing, classification error."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.nnet import losses as ol

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _ref():
    import_reference_speechbrain()
    from speechbrain.nnet import losses as rl
    return rl


def _data(seed=0, b=3, t=8, v=6):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    log_probs = torch.log_softmax(torch.tensor(logits), -1)
    targets = rng.integers(0, v, size=(b, t))
    lens = np.array([1.0, 0.75, 0.5], np.float32)[:b]
    return log_probs, targets, lens, rng


@pytest.mark.parametrize("ls", [0.0, 0.1, 0.3])
@pytest.mark.parametrize("red", ["mean", "batchmean", "batch"])
def test_nll_label_smoothing_matches_reference(ls, red):
    rl = _ref()
    log_probs, targets, lens, _ = _data()
    r = rl.nll_loss(log_probs, torch.tensor(targets), torch.tensor(lens),
                    label_smoothing=ls, reduction=red)
    o = ol.nll_loss(jnp.asarray(np.asarray(log_probs)), jnp.asarray(targets),
                    jnp.asarray(lens), label_smoothing=ls, reduction=red)
    np.testing.assert_allclose(np.atleast_1d(np.asarray(o)),
                               np.atleast_1d(r.numpy()), atol=1e-5)


def test_nll_2d_matches_reference():
    rl = _ref()
    rng = np.random.default_rng(1)
    lp = torch.log_softmax(torch.tensor(
        rng.normal(size=(3, 6)).astype(np.float32)), -1)
    tgt = rng.integers(0, 6, size=3)
    for ls in (0.0, 0.2):
        r = rl.nll_loss(lp, torch.tensor(tgt), label_smoothing=ls).item()
        o = float(ol.nll_loss(jnp.asarray(np.asarray(lp)), jnp.asarray(tgt),
                              label_smoothing=ls))
        assert abs(r - o) < 1e-5


def test_regression_and_binary_losses_match_reference():
    rl = _ref()
    log_probs, targets, lens, rng = _data(seed=2)
    x = rng.normal(size=(3, 8, 4)).astype(np.float32)
    y = rng.normal(size=(3, 8, 4)).astype(np.float32)
    assert abs(rl.mse_loss(torch.tensor(x), torch.tensor(y),
                           torch.tensor(lens)).item()
               - float(ol.mse_loss(jnp.asarray(x), jnp.asarray(y),
                                   jnp.asarray(lens)))) < 1e-5
    assert abs(rl.l1_loss(torch.tensor(x), torch.tensor(y),
                          torch.tensor(lens)).item()
               - float(ol.l1_loss(jnp.asarray(x), jnp.asarray(y),
                                  jnp.asarray(lens)))) < 1e-5
    tgt = (rng.random((3, 8)) > 0.5).astype(np.float32)
    pred = rng.normal(size=(3, 8)).astype(np.float32)
    assert abs(rl.bce_loss(torch.tensor(pred), torch.tensor(tgt),
                           torch.tensor(lens)).item()
               - float(ol.bce_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                   jnp.asarray(lens)))) < 1e-5
    assert abs(rl.kldiv_loss(log_probs, torch.tensor(targets),
                             torch.tensor(lens), label_smoothing=0.1).item()
               - float(ol.kldiv_loss(jnp.asarray(np.asarray(log_probs)),
                                     jnp.asarray(targets), jnp.asarray(lens),
                                     label_smoothing=0.1))) < 1e-4
    assert abs(rl.classification_error(log_probs, torch.tensor(targets),
                                       torch.tensor(lens)).item()
               - float(ol.classification_error(
                   jnp.asarray(np.asarray(log_probs)), jnp.asarray(targets),
                   jnp.asarray(lens)))) < 1e-5
