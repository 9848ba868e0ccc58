"""Golden parity for InputNormalization vs the reference
``speechbrain/processing/features.py``: all four modes over multi-step
sequences with variable lengths, the global update's epoch freeze and
count bookkeeping, speaker dictionaries, and eval behavior."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

from svt_speechbrain_tpu.processing.features import InputNormalization

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


def _ref(norm_type, **kw):
    import_reference_speechbrain()
    from speechbrain.processing.features import (InputNormalization
                                                 as RefNorm)
    return RefNorm(norm_type=norm_type, **kw)


@pytest.mark.parametrize("norm_type", ["sentence", "batch", "global"])
def test_modes_match_reference_across_steps(norm_type):
    rng = np.random.default_rng(0)
    r = _ref(norm_type, update_until_epoch=3)
    o = InputNormalization(norm_type=norm_type, update_until_epoch=3)
    state = o.init_state()
    for step in range(5):
        x = rng.normal(loc=step, size=(3, 20, 8)).astype(np.float32)
        lens = np.array([1.0, 0.8, 0.5], np.float32)
        epoch = 0 if step < 3 else 5           # cross the update freeze
        with torch.no_grad():
            ref_out = r(torch.tensor(x).clone(), torch.tensor(lens),
                        epoch=epoch).numpy()
        our_out, state = o(None, state, jnp.asarray(x), jnp.asarray(lens),
                           epoch=epoch)
        np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=1e-5)


def test_global_eval_uses_frozen_stats():
    rng = np.random.default_rng(1)
    r = _ref("global")
    o = InputNormalization(norm_type="global")
    state = o.init_state()
    for step in range(3):
        x = rng.normal(loc=step, size=(2, 10, 4)).astype(np.float32)
        with torch.no_grad():
            r(torch.tensor(x).clone(), torch.ones(2), epoch=0)
        _, state = o(None, state, jnp.asarray(x), jnp.ones(2), epoch=0)
    r.eval()
    x = rng.normal(size=(2, 10, 4)).astype(np.float32)
    with torch.no_grad():
        ref_out = r(torch.tensor(x).clone(), torch.ones(2), epoch=0).numpy()
    our_out, state2 = o(None, state, jnp.asarray(x), jnp.ones(2), epoch=0,
                        train=False)
    np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=1e-5)
    assert state2 is state                   # eval does not mutate stats


def test_speaker_mode_matches_reference():
    rng = np.random.default_rng(2)
    r = _ref("speaker")
    o = InputNormalization(norm_type="speaker")
    state = o.init_state()
    spk = np.array([[0], [1], [0]])
    for step in range(4):
        x = rng.normal(loc=step, size=(3, 20, 8)).astype(np.float32)
        lens = np.array([1.0, 0.8, 0.5], np.float32)
        with torch.no_grad():
            ref_out = r(torch.tensor(x).clone(), torch.tensor(lens),
                        spk_ids=torch.tensor(spk), epoch=0).numpy()
        our_out, state = o(None, state, jnp.asarray(x), jnp.asarray(lens),
                           spk_ids=spk, epoch=0)
        np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=1e-5)
    # eval: known speaker uses stored stats, unknown falls back to current
    r.eval()
    spk2 = np.array([[1], [7], [0]])
    x = rng.normal(size=(3, 20, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = r(torch.tensor(x).clone(), torch.ones(3),
                    spk_ids=torch.tensor(spk2), epoch=9).numpy()
    our_out, _ = o(None, state, jnp.asarray(x), jnp.ones(3), spk_ids=spk2,
                   epoch=9, train=False)
    np.testing.assert_allclose(np.asarray(our_out), ref_out, atol=1e-5)
