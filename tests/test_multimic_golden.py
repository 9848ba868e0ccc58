"""Golden parity of ``processing.multi_mic`` and ``processing.decomposition``
vs the reference torch implementations (``speechbrain/processing/
multi_mic.py``, ``decomposition.py``) on shared random inputs.

Beamformer outputs, packed covariances, fractional TDOAs, sphere/steering
geometry, and the decomposition helpers are compared tensor-for-tensor.
Eigenvector-based paths (gevd/svdl columns, the Gev beamformer) are
compared up to the per-column complex phase an eigensolver is free to
choose; everything else is exact.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref():
    import torch

    import_reference_speechbrain()
    from speechbrain.processing import decomposition as ref_eig
    from speechbrain.processing import multi_mic as ref_mm
    return ref_mm, ref_eig, torch


def _delayed_stft(delays, n=4000, fs=16000, seed=0):
    """Multichannel STFT (B=1, T, F, 2, M) of one broadband source arriving
    with the given per-mic integer delays, via our (torch-golden) STFT."""
    from svt_speechbrain_tpu.processing.features import STFT

    rng = np.random.default_rng(seed)
    base = rng.normal(size=n + 64).astype(np.float32)
    x = np.stack([base[32 - d: 32 - d + n] for d in delays], axis=-1)[None]
    xs = STFT(sample_rate=fs)(None, jnp.asarray(x))
    return np.asarray(xs)


def _noise_stft(m, n=4000, fs=16000, seed=1):
    from svt_speechbrain_tpu.processing.features import STFT

    rng = np.random.default_rng(seed)
    x = 0.3 * rng.normal(size=(1, n, m)).astype(np.float32)
    return np.asarray(STFT(sample_rate=fs)(None, jnp.asarray(x)))


def test_covariance_golden(ref):
    ref_mm, _, torch = ref
    xs = _delayed_stft([0, 4, -3])
    for average in (True, False):
        ours = np.asarray(
            __import__("svt_speechbrain_tpu.processing.multi_mic",
                       fromlist=["Covariance"]).Covariance(average=average)(
                           None, xs))
        theirs = ref_mm.Covariance(average=average)(
            torch.from_numpy(xs)).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_gccphat_golden(ref):
    ref_mm, _, torch = ref
    from svt_speechbrain_tpu.processing.multi_mic import Covariance, GccPhat

    xs = _delayed_stft([0, 4, -3])
    cov = np.asarray(Covariance()(None, xs))
    for tdoa_max in (None, 16):
        ours = np.asarray(GccPhat(tdoa_max=tdoa_max)(None, jnp.asarray(cov)))
        theirs = ref_mm.GccPhat(tdoa_max=tdoa_max)(
            torch.from_numpy(cov)).numpy()
        assert ours.shape == theirs.shape  # (B, T, P) fractional
        np.testing.assert_allclose(ours, theirs, atol=1e-3)
        # physical sanity: pair (0,1) recovers +4-ish, (0,2) recovers -3-ish
        assert abs(ours[0, 0, 1] - 4) < 1.0
        assert abs(ours[0, 0, 2] + 3) < 1.0


def test_delaysum_golden_tdoa_and_doa_modes(ref):
    ref_mm, _, torch = ref
    from svt_speechbrain_tpu.processing.multi_mic import (Covariance,
                                                          DelaySum, GccPhat)

    xs = _delayed_stft([0, 4, -3])
    cov = np.asarray(Covariance()(None, xs))
    tdoas = np.asarray(GccPhat()(None, jnp.asarray(cov))).astype(np.float32)

    ours = np.asarray(DelaySum()(None, xs, jnp.asarray(tdoas)))
    theirs = ref_mm.DelaySum()(torch.from_numpy(xs),
                               torch.from_numpy(tdoas)).numpy()
    assert ours.shape == theirs.shape == xs.shape[:3] + (2, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)

    mics = np.array([[-0.05, -0.05, 0], [-0.05, 0.05, 0], [0.05, 0.05, 0]],
                    np.float32)
    doas = np.tile(np.array([0.6, 0.64, 0.48], np.float32),
                   (1, xs.shape[1], 1))
    ours = np.asarray(DelaySum()(None, xs, jnp.asarray(doas), doa_mode=True,
                                 mics=mics, fs=16000))
    theirs = ref_mm.DelaySum()(torch.from_numpy(xs), torch.from_numpy(doas),
                               doa_mode=True, mics=torch.from_numpy(mics),
                               fs=16000).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_mvdr_golden(ref):
    ref_mm, _, torch = ref
    from svt_speechbrain_tpu.processing.multi_mic import (Covariance,
                                                          GccPhat, Mvdr)

    xs = _delayed_stft([0, 4, -3])
    nn = _noise_stft(3)
    nns = np.asarray(Covariance()(None, nn))
    cov = np.asarray(Covariance()(None, xs))
    tdoas = np.asarray(GccPhat()(None, jnp.asarray(cov))).astype(np.float32)

    ours = np.asarray(Mvdr()(None, xs, jnp.asarray(nns), jnp.asarray(tdoas)))
    theirs = ref_mm.Mvdr()(torch.from_numpy(xs), torch.from_numpy(nns),
                           torch.from_numpy(tdoas)).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_gev_golden_magnitude(ref):
    ref_mm, _, torch = ref
    from svt_speechbrain_tpu.processing.multi_mic import Covariance, Gev

    ss = _delayed_stft([0, 4, -3])
    nn = _noise_stft(3)
    xs = ss + nn
    sss = np.asarray(Covariance()(None, ss))
    nns = np.asarray(Covariance()(None, nn))

    ours = np.asarray(Gev()(None, xs, jnp.asarray(sss), jnp.asarray(nns)))
    theirs = ref_mm.Gev()(torch.from_numpy(xs), torch.from_numpy(sss),
                          torch.from_numpy(nns)).numpy()
    assert ours.shape == theirs.shape
    # the beamforming weight is a unit eigenvector, defined up to a complex
    # phase per (B, T, F); magnitudes are deterministic
    mag = lambda y: np.hypot(y[..., 0, 0], y[..., 1, 0])
    np.testing.assert_allclose(mag(ours), mag(theirs), atol=2e-3)


def _synthetic_direction_stft(mics, doa, fs=16000, n_fft=201, t=3, seed=2):
    """Plant one far-field source at ``doa``: X_m = S(f)·e^{−jωτ_m}."""
    from svt_speechbrain_tpu.processing.multi_mic import doas2taus

    rng = np.random.default_rng(seed)
    # physical arrival delay at mic m is −⟨doa, mic⟩/c: mics closer to the
    # source hear it earlier, so X_m = S·e^{+jω·doas2taus(doa)_m}
    taus = np.asarray(doas2taus(doa[None], mics, fs=fs))[0]  # (M,)
    omega = 2 * np.pi * np.arange(n_fft) / ((n_fft - 1) * 2)
    s = (rng.normal(size=(1, t, n_fft)) + 1j * rng.normal(size=(1, t, n_fft)))
    x = s[..., None] * np.exp(1j * omega[:, None] * taus[None, :])
    x = x + 0.01 * (rng.normal(size=x.shape) + 1j * rng.normal(size=x.shape))
    return np.stack([x.real, x.imag], axis=3).astype(np.float32)


def test_srp_phat_golden(ref):
    ref_mm, _, torch = ref
    from svt_speechbrain_tpu.processing.multi_mic import Covariance, SrpPhat

    mics = np.array([[-0.05, -0.05, 0], [-0.05, 0.05, 0],
                     [0.05, 0.05, 0], [0.05, -0.05, 0]], np.float32)
    doa = np.array([0.6, 0.64, 0.48], np.float32)
    xs = _synthetic_direction_stft(mics, doa)
    cov = np.asarray(Covariance()(None, xs))

    ours = np.asarray(SrpPhat(mics=mics)(None, jnp.asarray(cov)))
    theirs = ref_mm.SrpPhat(mics=torch.from_numpy(mics))(
        torch.from_numpy(cov)).numpy()
    assert ours.shape == theirs.shape == (1, xs.shape[1], 3)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    # and it found (a sphere point near) the planted direction
    assert float(np.dot(ours[0, 0], doa)) > 0.99


def test_music_golden(ref):
    ref_mm, _, torch = ref
    from svt_speechbrain_tpu.processing.multi_mic import Covariance, Music

    mics = np.array([[-0.05, -0.05, 0], [-0.05, 0.05, 0],
                     [0.05, 0.05, 0], [0.05, -0.05, 0]], np.float32)
    doa = np.array([0.6, 0.64, 0.48], np.float32)
    xs = _synthetic_direction_stft(mics, doa, t=2)
    cov = np.asarray(Covariance()(None, xs))

    ours = np.asarray(Music(mics=mics, n_sig=1)(None, jnp.asarray(cov)))
    theirs = ref_mm.Music(mics=torch.from_numpy(mics), n_sig=1)(
        torch.from_numpy(cov)).numpy()
    assert ours.shape == theirs.shape == (1, xs.shape[1], 3)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    assert float(np.dot(ours[0, 0], doa)) > 0.99


def test_geometry_helpers_golden(ref):
    ref_mm, _, torch = ref
    from svt_speechbrain_tpu.processing.multi_mic import (doas2taus, sphere,
                                                          steering,
                                                          tdoas2taus)

    for levels in (1, 2, 4):
        ours = np.asarray(sphere(levels_count=levels))
        theirs = ref_mm.sphere(levels_count=levels).numpy()
        assert ours.shape == theirs.shape  # identical point ORDER too
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    mics = np.array([[-0.05, -0.05, 0], [-0.05, 0.05, 0], [0.05, 0.05, 0]],
                    np.float32)
    doas = np.asarray(sphere(levels_count=1), np.float32)
    ours = np.asarray(doas2taus(jnp.asarray(doas[None]), mics, fs=16000))
    theirs = ref_mm.doas2taus(torch.from_numpy(doas[None]),
                              torch.from_numpy(mics), fs=16000).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    rng = np.random.default_rng(0)
    tdoas = rng.normal(size=(2, 3, 6)).astype(np.float32)  # M=3 packed
    np.testing.assert_allclose(
        np.asarray(tdoas2taus(jnp.asarray(tdoas))),
        ref_mm.tdoas2taus(torch.from_numpy(tdoas)).numpy())

    taus = rng.uniform(-5, 5, size=(2, 3, 4)).astype(np.float32)
    ours = np.asarray(steering(jnp.asarray(taus), n_fft=17))
    theirs = ref_mm.steering(torch.from_numpy(taus), n_fft=17).numpy()
    assert ours.shape == theirs.shape == (2, 3, 17, 2, 4)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def _random_packed(rng, batch=(3,), c=4):
    """A packed (*, 2, P) well-conditioned Hermitian matrix."""
    m = rng.normal(size=batch + (c, c)) + 1j * rng.normal(size=batch + (c, c))
    m = m @ np.conj(np.swapaxes(m, -1, -2)) + c * np.eye(c)
    iu = np.triu_indices(c)
    vals = m[..., iu[0], iu[1]]
    return np.stack([vals.real, vals.imag], axis=-2).astype(np.float32)


def _align_columns(ours, theirs):
    """Cancel each eigenvector column's free complex phase before compare."""
    inner = np.sum(np.conj(ours) * theirs, axis=-2, keepdims=True)
    phase = inner / (np.abs(inner) + 1e-30)
    return ours * phase


def test_decomposition_transforms_golden(ref):
    _, ref_eig, torch = ref
    from svt_speechbrain_tpu.processing import decomposition as eig

    rng = np.random.default_rng(0)
    ws = _random_packed(rng)
    tws = torch.from_numpy(ws)

    np.testing.assert_allclose(np.asarray(eig.f(ws)), ref_eig.f(tws).numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(eig.finv(eig.f(ws))),
                               ref_eig.finv(ref_eig.f(tws)).numpy(),
                               atol=1e-6)
    stacked = ref_eig.ginv(ref_eig.f(tws))  # (*, C, C, 2) full complex
    np.testing.assert_allclose(np.asarray(eig.g(stacked.numpy())),
                               ref_eig.g(stacked).numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(eig.ginv(eig.f(ws))),
                               stacked.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(eig.pos_def(ws, alpha=0.01)),
                               ref_eig.pos_def(tws, alpha=0.01).numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(eig.inv(ws)),
                               ref_eig.inv(tws).numpy(), atol=1e-5)


def test_gevd_golden(ref):
    _, ref_eig, torch = ref
    from svt_speechbrain_tpu.processing import decomposition as eig

    rng = np.random.default_rng(1)
    a = _random_packed(rng)
    b = _random_packed(rng)
    for bb in (b, None):
        vs, ds = eig.gevd(a, bb)
        tvs, tds = ref_eig.gevd(torch.from_numpy(a),
                                None if bb is None else torch.from_numpy(bb))
        np.testing.assert_allclose(np.asarray(ds), tds.numpy(), atol=1e-4)
        ours = np.asarray(vs[..., 0]) + 1j * np.asarray(vs[..., 1])
        theirs = tvs.numpy()[..., 0] + 1j * tvs.numpy()[..., 1]
        np.testing.assert_allclose(_align_columns(ours, theirs), theirs,
                                   atol=1e-4)


def test_svdl_golden(ref):
    _, ref_eig, torch = ref
    from svt_speechbrain_tpu.processing import decomposition as eig

    rng = np.random.default_rng(2)
    a = _random_packed(rng)
    us, ds = eig.svdl(a)
    tus, tds = ref_eig.svdl(torch.from_numpy(a))
    # singular values on the diagonal, reference's ASCENDING order
    np.testing.assert_allclose(np.asarray(ds), tds.numpy(), atol=1e-3)
    ours = np.asarray(us[..., 0]) + 1j * np.asarray(us[..., 1])
    theirs = tus.numpy()[..., 0] + 1j * tus.numpy()[..., 1]
    np.testing.assert_allclose(_align_columns(ours, theirs), theirs,
                               atol=1e-3)


def test_delaysum_beamformer_lobe_golden(ref):
    """End-to-end lobe chain (STFT → cov → GCC-PHAT → delay-sum → ISTFT)
    vs the reference speechbrain lobe (``lobes/beamform_multimic.py``)."""
    _, _, torch = ref
    from speechbrain.lobes.beamform_multimic import (
        DelaySum_Beamformer as RefBeamformer)

    from svt_speechbrain_tpu.models.beamform_multimic import (
        DelaySum_Beamformer)

    rng = np.random.default_rng(3)
    base = rng.normal(size=4100).astype(np.float32)
    x = np.stack([base[32:4032], base[28:4028], base[35:4035]], axis=-1)[None]

    ours = np.asarray(DelaySum_Beamformer(sampling_rate=16000)(None,
                                                               jnp.asarray(x)))
    theirs = RefBeamformer(sampling_rate=16000)(
        torch.from_numpy(x)).numpy()[..., 0]
    n = min(ours.shape[1], theirs.shape[1])
    np.testing.assert_allclose(ours[:, :n], theirs[:, :n], atol=1e-3)
