"""Complex/quaternion nets, multi-mic, PLDA/diarization, alignment, BLEU/DER."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_complex_linear_matches_numpy_complex():
    from svt_speechbrain_tpu.nnet.complex_networks import CLinear

    lin = CLinear(n_neurons=5, input_size=8)
    params = lin.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 8)).astype(np.float32)
    out = np.asarray(lin(params, x))
    xc = x[:, :4] + 1j * x[:, 4:]
    wc = np.asarray(params["real_weight"]) + 1j * np.asarray(params["imag_weight"])
    yc = xc @ wc
    np.testing.assert_allclose(out[:, :5], yc.real, atol=1e-5)
    np.testing.assert_allclose(out[:, 5:], yc.imag, atol=1e-5)


def test_quaternion_linear_hamilton_identity():
    from svt_speechbrain_tpu.nnet.quaternion_networks import QLinear, quaternion_linear_op

    # multiplying by the identity quaternion (1,0,0,0) must preserve input
    n = 3
    wr, wi, wj, wk = np.eye(n), np.zeros((n, n)), np.zeros((n, n)), np.zeros((n, n))
    x = np.random.default_rng(0).normal(size=(2, 4 * n)).astype(np.float32)
    y = np.asarray(quaternion_linear_op(jnp.asarray(x), wr, wi, wj, wk))
    np.testing.assert_allclose(y, x, atol=1e-6)

    lin = QLinear(n_neurons=4, input_size=8)
    params = lin.init(jax.random.PRNGKey(0))
    out = lin(params, x[:, :8])
    assert out.shape == (2, 16)


def test_complex_quaternion_rnn_conv():
    from svt_speechbrain_tpu.nnet.complex_networks import CConv1d, CRNN
    from svt_speechbrain_tpu.nnet.quaternion_networks import QConv1d, QRNN

    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 8)), jnp.float32)
    for mod, width in [(CConv1d(6, 3, input_size=8), 12),
                       (CRNN(5, input_size=8), 10),
                       (QConv1d(3, 3, input_size=8), 12),
                       (QRNN(2, input_size=8), 8)]:
        params = mod.init(jax.random.PRNGKey(0))
        out = mod(params, x)
        if isinstance(out, tuple):  # QRNN returns (out, h) like the reference
            out = out[0]
        assert out.shape == (2, 10, width)
        assert np.isfinite(np.asarray(out)).all()


def test_multi_mic_delay_sum_and_gcc():
    from svt_speechbrain_tpu.processing.features import STFT
    from svt_speechbrain_tpu.processing.multi_mic import Covariance, DelaySum, GccPhat, Mvdr

    rng = np.random.default_rng(0)
    base = rng.normal(size=18000).astype(np.float32)
    delay = 8
    # two mics: mic1 delayed copy of mic0
    x = np.stack([base[:16000], base[delay:16000 + delay]], axis=-1)[None]
    stft = STFT(sample_rate=16000, n_fft=400)
    xs = np.asarray(stft(None, jnp.asarray(x)))  # (B, T, F, 2, C)
    cov = Covariance()(None, xs)
    # packed triu pairs (0,0), (0,1), (1,1); fractional TDOAs per frame
    tdoas = np.asarray(GccPhat(tdoa_max=20)(None, cov))
    assert tdoas.shape == (1, xs.shape[1], 3)
    assert np.all(np.abs(tdoas[..., 0]) < 0.5)          # autocorrelation
    assert np.all(np.abs(tdoas[..., 2]) < 0.5)
    assert abs(abs(tdoas[0, 0, 1]) - delay) <= 1        # recovers the delay

    out = DelaySum()(None, jnp.asarray(xs), jnp.asarray(tdoas))
    assert out.shape == (1, xs.shape[1], xs.shape[2], 2, 1)
    out2 = Mvdr()(None, jnp.asarray(xs), cov, jnp.asarray(tdoas))
    assert np.isfinite(np.asarray(out2)).all()


def test_plda_scoring_separates_speakers():
    from svt_speechbrain_tpu.processing.plda_lda import PLDA, StatObject_SB

    rng = np.random.default_rng(0)
    dim, n_spk, per_spk = 8, 6, 20
    means = rng.normal(size=(n_spk, dim)) * 3
    x = np.concatenate([means[i] + rng.normal(size=(per_spk, dim))
                        for i in range(n_spk)])
    labels = np.repeat(np.arange(n_spk), per_spk)
    stats = StatObject_SB(modelset=labels, segset=np.arange(len(x)),
                          stat0=np.ones((len(x), 1)), stat1=x)
    plda = PLDA(rank_f=4, nb_iter=5)
    plda.plda(stats)

    enroll = StatObject_SB(modelset=np.arange(n_spk), segset=np.arange(n_spk),
                           stat1=means + rng.normal(size=(n_spk, dim)) * 0.1)
    test = StatObject_SB(modelset=np.arange(n_spk), segset=np.arange(n_spk),
                         stat1=means + rng.normal(size=(n_spk, dim)) * 0.1)
    scores = plda.scoring(enroll, test).scoremat
    # same-speaker scores should beat cross-speaker on average
    same = np.diag(scores).mean()
    cross = (scores.sum() - np.trace(scores)) / (n_spk * n_spk - n_spk)
    assert same > cross


def test_spectral_clustering_recovers_clusters(tmp_path):
    from svt_speechbrain_tpu.processing.diarization import (Spec_Clust_unorm,
                                                            do_AHC,
                                                            do_spec_clustering)
    from svt_speechbrain_tpu.processing.plda_lda import StatObject_SB

    rng = np.random.default_rng(1)
    a = rng.normal(size=(15, 12)) + np.array([5.0] + [0] * 11)
    b = rng.normal(size=(15, 12)) - np.array([5.0] + [0] * 11)
    emb = np.concatenate([a, b])
    clust = Spec_Clust_unorm()
    clust.do_spec_clust(emb, k_oracle=2, p_val=0.3)
    labels = clust.labels_
    assert len(set(labels[:15])) == 1 and len(set(labels[15:])) == 1
    assert labels[0] != labels[-1]

    # recipe entrypoints over a diary StatObject (segset carries times)
    segs = np.array([f"rec1_{i * 100}_{i * 100 + 150}" for i in range(30)],
                    dtype="|O")
    diary = StatObject_SB(modelset=segs, segset=segs, stat1=emb)
    out = tmp_path / "spec.rttm"
    labels2 = do_spec_clustering(diary, str(out), "rec1", k=2, pval=0.3,
                                 affinity_type="cos")
    assert out.read_text().startswith("SPEAKER rec1 0 ")
    assert labels2[0] != labels2[-1]
    diary2 = StatObject_SB(modelset=segs, segset=segs, stat1=emb.copy())
    ahc = do_AHC(diary2, str(tmp_path / "ahc.rttm"), "rec1", k_oracle=2)
    assert ahc[0] != ahc[-1]


def test_hmm_aligner():
    from svt_speechbrain_tpu.alignment.aligner import HMMAligner

    # 3 phonemes over 9 frames with clearly-peaked emissions
    emission = np.full((9, 5), -10.0)
    truth = [0, 0, 0, 1, 1, 1, 2, 2, 2]
    phn_ids = [3, 1, 4]
    for t, seg in enumerate(truth):
        emission[t, phn_ids[seg]] = 0.0
    aligner = HMMAligner()
    path, score = aligner.align(emission, phn_ids)
    assert list(path) == truth
    fwd = aligner.forward(emission[None], np.array([1.0]),
                          np.array([phn_ids]), np.array([1.0]), "forward")
    assert fwd[0] >= score


def test_ctc_segmentation_orders_segments():
    from svt_speechbrain_tpu.alignment.ctc_segmentation import ctc_segmentation

    t, v = 40, 6
    lp = np.full((t, v), -8.0)
    lp[:, 0] = -1.0  # blank likely everywhere
    # utterance 1 tokens at frames 5-12, utterance 2 at 25-35
    for f in range(5, 12):
        lp[f, 2] = 0.0
    for f in range(25, 35):
        lp[f, 3] = 0.0
    segs = ctc_segmentation(lp, [[2], [3]], blank_id=0)
    assert len(segs) == 2
    assert segs[0][0] <= segs[1][0]


def test_bleu_and_der():
    from svt_speechbrain_tpu.utils.bleu import corpus_bleu
    from svt_speechbrain_tpu.utils.der import DER

    assert corpus_bleu([["the", "cat", "sat"]], [[["the", "cat", "sat"]]]) == 100.0
    assert corpus_bleu([["dog"]], [[["the", "cat", "sat"]]]) == 0.0

    ref = [(0.0, 5.0, "A"), (5.0, 10.0, "B")]
    assert DER(ref, ref, collar=0.0) == 0.0
    flipped = [(0.0, 5.0, "X"), (5.0, 10.0, "X")]
    assert DER(ref, flipped, collar=0.0) > 0.0
