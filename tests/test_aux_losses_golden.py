"""Golden parity for the SI-SNR and guided-attention losses vs the
reference torch implementations (both are pure torch — no stubs needed)."""
import numpy as np
import pytest

import jax.numpy as jnp

import torch

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


@pytest.mark.parametrize("reduction", ["mean", "batch"])
def test_si_snr_loss_matches_reference(reduction):
    import_reference_speechbrain()
    from speechbrain.nnet.loss.si_snr_loss import si_snr_loss as ref_loss

    from svt_speechbrain_tpu.nnet.loss.si_snr_loss import si_snr_loss

    rng = np.random.default_rng(0)
    clean = rng.normal(size=(3, 4000)).astype(np.float32)
    # include a DC offset: the loss does NOT zero-mean (unlike cal_si_snr)
    pred = (clean + 0.3
            + np.array([0.05, 0.4, 1.2], np.float32)[:, None]
            * rng.normal(size=clean.shape).astype(np.float32))
    lens = np.array([1.0, 0.81, 0.55], np.float32)

    with torch.no_grad():
        ref = ref_loss(torch.tensor(pred), torch.tensor(clean),
                       torch.tensor(lens), reduction=reduction)
    ours = si_snr_loss(jnp.asarray(pred), jnp.asarray(clean), lens,
                       reduction=reduction)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


def test_guided_attention_loss_matches_reference():
    import_reference_speechbrain()
    from speechbrain.nnet.loss.guidedattn_loss import \
        GuidedAttentionLoss as RefLoss

    from svt_speechbrain_tpu.nnet.loss.guidedattn_loss import \
        GuidedAttentionLoss

    rng = np.random.default_rng(1)
    b, t_max, u_max = 3, 9, 7
    att = rng.uniform(size=(b, t_max, u_max)).astype(np.float32)
    il = np.array([7, 4, 6])
    tl = np.array([9, 6, 5])

    for sigma in (0.2, 0.45):
        ref_crit = RefLoss(sigma=sigma)
        our_crit = GuidedAttentionLoss(sigma=sigma)
        with torch.no_grad():
            ref = ref_crit(torch.tensor(att), torch.tensor(il),
                           torch.tensor(tl), max_input_len=u_max,
                           max_target_len=t_max)
            ref_mask = ref_crit.guided_attentions(
                torch.tensor(il), torch.tensor(tl), u_max, t_max)
        ours = our_crit(jnp.asarray(att), il, tl, max_input_len=u_max,
                        max_target_len=t_max)
        our_mask = our_crit.guided_attentions(il, tl, u_max, t_max)
        np.testing.assert_allclose(np.asarray(our_mask), ref_mask.numpy(),
                                   atol=1e-6)
        np.testing.assert_allclose(float(ours), float(ref), atol=1e-6)
