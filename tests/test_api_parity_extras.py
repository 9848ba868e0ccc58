"""Public-API parity extras: standalone attention classes, step-wise RNN
cells, checkpoint hook registry, LM-fused beam search, misc utilities the
reference exposes (symbol-level sweep vs SURVEY §2)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_standalone_attention_classes():
    from svt_speechbrain_tpu.nnet.attention import (
        ContentBasedAttention, KeyValueAttention, LocationAwareAttention)

    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(size=(4, 10, 20)), jnp.float32)
    dec = jnp.asarray(rng.normal(size=(4, 25)), jnp.float32)
    enc_len = jnp.full((4,), 7)
    for net in (ContentBasedAttention(20, 25, 30, 5),
                LocationAwareAttention(20, 25, 30, 5, 10, 16),
                KeyValueAttention(20, 25, 30, 5)):
        p = net.init(jax.random.PRNGKey(0))
        out, w = net(p, enc, enc_len, dec)
        assert out.shape == (4, 5)
        ww = np.asarray(w).reshape(4, -1)
        np.testing.assert_allclose(ww.sum(-1), 1.0, atol=1e-5)
        assert ww[:, 7:].max() == 0.0  # padding masked

    # location-aware threads prev_attn
    net = LocationAwareAttention(20, 25, 30, 5, 10, 16)
    p = net.init(jax.random.PRNGKey(1))
    _, w1 = net(p, enc, enc_len, dec)
    out2, w2 = net(p, enc, enc_len, dec, prev_attn=w1)
    assert out2.shape == (4, 5)
    assert not np.allclose(np.asarray(w1), np.asarray(w2))


def test_rnn_cells_match_scan_rnn():
    from svt_speechbrain_tpu.nnet.rnn import GRU, GRUCell, LSTMCell, RNNCell

    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.normal(size=(3, 5, 8)), jnp.float32)
    gru = GRU(6, input_size=8, num_layers=2)
    p = gru.init(jax.random.PRNGKey(1))
    full, _ = gru(p, seq)
    cell = GRUCell(6, input_size=8, num_layers=2)
    st, outs = None, []
    for t in range(5):
        o, st = cell(p, seq[:, t], st)
        outs.append(o)
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full), atol=1e-6)
    for cls in (RNNCell, LSTMCell):
        c = cls(6, input_size=8)
        out, _ = c(c.init(jax.random.PRNGKey(0)), seq[:, 0])
        assert out.shape == (3, 6)


def test_gumbel_softmax_and_adaptive_pool():
    import torch

    from svt_speechbrain_tpu.nnet.activations import GumbelSoftmax
    from svt_speechbrain_tpu.nnet.pooling import AdaptivePool

    x = np.random.default_rng(0).normal(size=(2, 13, 6)).astype(np.float32)
    got = np.asarray(AdaptivePool(4)({}, jnp.asarray(x)))
    exp = (torch.nn.AdaptiveAvgPool1d(4)(torch.tensor(x).permute(0, 2, 1))
           .permute(0, 2, 1).numpy())
    np.testing.assert_allclose(got, exp, atol=1e-6)

    y = GumbelSoftmax(0.8, hard=True)({}, jnp.asarray(x),
                                      rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(y).sum(-1), 1.0, atol=1e-5)
    # straight-through output is one-hot up to float cancellation
    ya = np.asarray(y)
    assert np.all((np.abs(ya) < 1e-5) | (np.abs(ya - 1.0) < 1e-5))


def test_checkpoint_hook_registry():
    import tempfile

    from svt_speechbrain_tpu.utils.checkpoints import (
        Checkpointer, average_state_dicts, mark_as_loader, mark_as_saver,
        register_checkpoint_hooks)

    @register_checkpoint_hooks
    class Counter:
        def __init__(self):
            self.n = 0

        @mark_as_saver
        def save(self, path):
            with open(path, "w") as f:
                f.write(str(self.n))

        @mark_as_loader
        def load(self, path, end_of_epoch=True):
            with open(path) as f:
                self.n = int(f.read())

    d = tempfile.mkdtemp()
    c = Counter()
    c.n = 42
    ck = Checkpointer(d, {"counter": c})
    ck.save_checkpoint()
    c.n = 0
    ck.recover_if_possible()
    assert c.n == 42
    assert float(average_state_dicts([{"a": 1.0}, {"a": 3.0}])["a"]) == 2.0


def test_lm_fused_beam_search_prefers_lm_tokens():
    """Shallow fusion shifts the decode toward LM-favored tokens."""
    from svt_speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearchLM
    from svt_speechbrain_tpu.nnet.embedding import Embedding
    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.nnet.rnn import AttentionalRNNDecoder

    vocab, emb_dim, enc_dim = 6, 8, 10
    emb = Embedding(vocab, emb_dim)
    dec = AttentionalRNNDecoder("gru", "content", hidden_size=12, attn_dim=8,
                                num_layers=1, enc_dim=enc_dim,
                                input_size=emb_dim)
    fc = Linear(vocab, 12)  # decoder out_proj emits hidden_size features
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {"emb": emb.init(k[0]), "dec": dec.init(k[1]), "fc": fc.init(k[2])}

    # a fake LM that strongly favors token 3
    class BiasLM:
        def __call__(self, p, prefix):
            logits = np.zeros((prefix.shape[0], prefix.shape[1], vocab),
                              np.float32)
            logits[:, :, 3] = 8.0
            return jnp.asarray(logits)

    enc_states = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 7, enc_dim)), jnp.float32)
    enc_lens = jnp.ones((1,))
    common = dict(bos_index=0, eos_index=1, min_decode_ratio=0.0,
                  max_decode_ratio=0.6, beam_size=3, using_eos_threshold=False)
    no_lm = S2SRNNBeamSearchLM(emb, dec, fc, BiasLM(), {}, params,
                               lm_weight=0.0, **common)
    with_lm = S2SRNNBeamSearchLM(emb, dec, fc, BiasLM(), {}, params,
                                 lm_weight=5.0, **common)
    hyps0, _ = no_lm(enc_states, enc_lens)
    hyps1, _ = with_lm(enc_states, enc_lens)
    frac0 = np.mean([t == 3 for t in hyps0[0]]) if hyps0[0] else 0.0
    frac1 = np.mean([t == 3 for t in hyps1[0]]) if hyps1[0] else 0.0
    assert frac1 >= frac0
    assert frac1 > 0.9  # LM dominates with weight 5


def test_transformer_beam_search_runs():
    from svt_speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearch
    from svt_speechbrain_tpu.models.transformer_asr import TransformerASR
    from svt_speechbrain_tpu.nnet.linear import Linear

    vocab = 8
    model = TransformerASR(tgt_vocab=vocab, input_size=12, d_model=16,
                           nhead=4, num_encoder_layers=1,
                           num_decoder_layers=1, d_ffn=32)
    lin = Linear(vocab, 16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    mp, lp = model.init(k1), lin.init(k2)
    src = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 12)),
                      jnp.float32)
    enc, _kpm = model.encode(mp, src)
    searcher = S2STransformerBeamSearch(
        [model, lin], [mp, lp], bos_index=0, eos_index=1,
        min_decode_ratio=0.0, max_decode_ratio=0.5, beam_size=2,
        using_eos_threshold=False)
    hyps, scores = searcher(enc, jnp.ones((2,)))
    assert len(hyps) == 2 and len(scores) == 2


def test_misc_small_apis():
    from svt_speechbrain_tpu.dataio.dataio import (convert_index_to_lab,
                                                   merge_char, split_word)
    from svt_speechbrain_tpu.decoders.seq2seq import (
        batch_filter_seq2seq_output, filter_seq2seq_output)
    from svt_speechbrain_tpu.lm.counting import (ngrams,
                                                 ngrams_for_evaluation,
                                                 pad_ends)
    from svt_speechbrain_tpu.nnet.losses import get_mask
    from svt_speechbrain_tpu.utils.metric_stats import EER

    assert filter_seq2seq_output([1, 2, -1, 3]) == [1, 2]
    assert batch_filter_seq2seq_output([[1, -1], [2]]) == [[1], [2]]
    s = pad_ends(["a", "b"])
    assert list(ngrams(s, 2)) == [("<s>", "a"), ("a", "b"), ("b", "</s>")]
    assert list(ngrams_for_evaluation(["a", "b", "c"], 2)) == [
        ("b", ("a",)), ("c", ("b",))]
    assert merge_char([list("ab_cd")]) == [["ab", "cd"]]
    assert split_word([["ab", "cd"]]) == [list("ab_cd")]
    assert convert_index_to_lab([[0, 1]], {0: "a", 1: "b"}) == [["a", "b"]]
    m = get_mask(jnp.zeros((2, 4, 3)), jnp.asarray([2, 4]))
    assert m.shape == (2, 4, 1)
    assert m[0, :, 0].tolist() == [1, 1, 0, 0]
    eer, _ = EER(np.array([0.9, 0.8]), np.array([0.1, 0.2]))
    assert eer == 0.0


def test_instance_norm2d_and_si_snr_module():
    import torch

    from svt_speechbrain_tpu.nnet.loss.si_snr_loss import si_snr_loss
    from svt_speechbrain_tpu.nnet.normalization import InstanceNorm2d

    x = np.random.default_rng(0).normal(size=(2, 5, 7, 3)).astype(np.float32)
    got = np.asarray(InstanceNorm2d(3)({}, jnp.asarray(x)))
    exp = torch.nn.InstanceNorm2d(3)(
        torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-4)

    t = np.sin(np.arange(8000) / 20).astype(np.float32)[None]
    perfect = float(si_snr_loss(jnp.asarray(t), jnp.asarray(t)))
    noisy = float(si_snr_loss(jnp.asarray(t + 0.3), jnp.asarray(t)))
    assert perfect < noisy


def test_complex_quaternion_2d_and_rnn_variants():
    """CConv2d/QConv2d with 1x1 kernels must equal the complex/quaternion
    linear ops (algebra check), and the gated recurrences must run bidir
    stacks with finite grads."""
    from svt_speechbrain_tpu.nnet.complex_networks import (
        CConv2d, CLayerNorm, CLiGRU, CLSTM, complex_linear_op)
    from svt_speechbrain_tpu.nnet.quaternion_networks import (
        QBatchNorm, QConv2d, QLiGRU, QLSTM, quaternion_linear_op)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 1, 1, 8)), jnp.float32)

    cconv = CConv2d(5, 1, input_size=8, bias=False)
    p = cconv.init(jax.random.PRNGKey(0))
    got = np.asarray(cconv(p, x))[:, 0, 0]
    exp = np.asarray(complex_linear_op(
        x[:, 0, 0], p["real"]["w"][0, 0], p["imag"]["w"][0, 0]))
    np.testing.assert_allclose(got, exp, atol=1e-5)

    qconv = QConv2d(5, 1, input_size=8, bias=False)
    p = qconv.init(jax.random.PRNGKey(1))
    got = np.asarray(qconv(p, x))[:, 0, 0]
    exp = np.asarray(quaternion_linear_op(
        x[:, 0, 0], p["r"]["w"][0, 0], p["i"]["w"][0, 0],
        p["j"]["w"][0, 0], p["k"]["w"][0, 0]))
    np.testing.assert_allclose(got, exp, atol=1e-5)

    seq = jnp.asarray(rng.normal(size=(2, 7, 8)), jnp.float32)
    for cls, width in ((CLSTM, 2), (CLiGRU, 2), (QLSTM, 4), (QLiGRU, 4)):
        m = cls(4, input_size=8, num_layers=2, bidirectional=True)
        p = m.init(jax.random.PRNGKey(2))

        def fwd(pp, m=m):
            if hasattr(m, "init_state"):  # stateful batchnorm'd LiGRUs
                res, _ = m(pp, m.init_state(), seq)
            else:
                res = m(pp, seq)
            # quaternion recurrences always return (out, h)
            return res[0] if isinstance(res, tuple) else res

        out = fwd(p)
        assert out.shape == (2, 7, 2 * width * 4)
        g = jax.grad(lambda pp: jnp.sum(jnp.square(fwd(pp))))(p)
        gn = max(float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gn) and gn > 0

    ln = CLayerNorm(8)
    y = ln(ln.init(None), seq)
    assert y.shape == seq.shape

    bn = QBatchNorm(8)
    y, st = bn(bn.init(None), bn.init_state(), seq, train=True)
    assert y.shape == seq.shape


def test_sweep_batch2_model_helpers():
    """MetricGAN/SEGAN helpers, dual-path blocks & norms, conformer decoder,
    constraint layers, Discriminator, batch-size guesser."""
    from svt_speechbrain_tpu.dataio.batch import BatchsizeGuesser
    from svt_speechbrain_tpu.models.conformer import ConformerDecoder
    from svt_speechbrain_tpu.models.enhancement import (Learnable_sigmoid,
                                                        d1_loss, d2_loss,
                                                        g3_loss,
                                                        shifted_sigmoid)
    from svt_speechbrain_tpu.models.separation import (ChannelwiseLayerNorm,
                                                       GlobalLayerNorm,
                                                       SBRNNBlock,
                                                       SBTransformerBlock,
                                                       choose_norm)
    from svt_speechbrain_tpu.models.transformer import (NormalizedEmbedding,
                                                        TransformerInterface)
    from svt_speechbrain_tpu.models.xvector import Discriminator
    from svt_speechbrain_tpu.nnet.cnn import (Conv2dWithConstraint,
                                              DepthwiseSeparableConv2d)
    from svt_speechbrain_tpu.nnet.linear import LinearWithConstraint

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9, 12)), jnp.float32)

    # MetricGAN sigmoids bounded by 1.2
    ls = Learnable_sigmoid(12)
    y = ls(ls.init(None), x)
    assert float(jnp.max(y)) < 1.2 and float(jnp.min(y)) > 0.0
    assert float(shifted_sigmoid(jnp.asarray(100.0))) == pytest.approx(1.2)

    # SEGAN losses: perfect discriminator output (1) → zero d1 loss
    assert float(d1_loss(jnp.ones((2, 5)))) == 0.0
    assert float(d2_loss(jnp.zeros((2, 5)))) == 0.0
    g = g3_loss(jnp.ones((2, 5)), x, x, l1LossCoeff=100.0)
    assert float(g) == 0.0

    # norms + factory
    for norm in (GlobalLayerNorm(12), ChannelwiseLayerNorm(12),
                 choose_norm("gLN", 12), choose_norm("cLN", 12)):
        y = norm(norm.init(None), x)
        assert y.shape == x.shape

    # pluggable dual-path blocks
    for blk in (SBTransformerBlock(1, 12, 4, 24, use_positional_encoding=True),
                SBRNNBlock(12, 8, 1)):
        p = blk.init(jax.random.PRNGKey(0))
        assert blk(p, x).shape == x.shape

    # conformer decoder stack
    dec = ConformerDecoder(2, nhead=4, d_ffn=24, d_model=12, kernel_size=7)
    out = dec(dec.init(jax.random.PRNGKey(1)), x[:, :5], x)
    assert out.shape == (2, 5, 12) and np.isfinite(np.asarray(out)).all()

    # interface assembly + scaled embedding
    ti = TransformerInterface(d_model=12, nhead=4, num_encoder_layers=1,
                              num_decoder_layers=1, d_ffn=24)
    assert set(ti.init(jax.random.PRNGKey(2))) == {"encoder", "decoder"}
    ne = NormalizedEmbedding(12, 7)
    e = ne(ne.init(jax.random.PRNGKey(3)), jnp.asarray([[1, 2]]))
    assert e.shape == (1, 2, 12)

    # constraint layers really bound the effective weight norm
    img = jnp.asarray(rng.normal(size=(2, 6, 6, 3)), jnp.float32)
    conv = Conv2dWithConstraint(4, 3, 3, max_norm=0.1)
    p = conv.init(jax.random.PRNGKey(4))
    big = dict(p, w=p["w"] * 1e4)
    np.testing.assert_allclose(np.asarray(conv(big, img)),
                               np.asarray(conv(dict(p, w=p["w"] * 1e8), img)),
                               rtol=1e-4)
    lin = LinearWithConstraint(4, 12, max_norm=0.1)
    lp = lin.init(jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        np.asarray(lin(dict(lp, w=lp["w"] * 1e4), x[:, 0])),
        np.asarray(lin(dict(lp, w=lp["w"] * 1e8), x[:, 0])), rtol=1e-4)

    ds = DepthwiseSeparableConv2d(5, 3, 3)
    assert ds(ds.init(jax.random.PRNGKey(6)), img).shape == (2, 6, 6, 5)

    # Discriminator + Xvector head
    d = Discriminator(input_size=16, lin_neurons=8)
    assert d(d.init(jax.random.PRNGKey(7)), jnp.ones((3, 16))).shape == (3, 1)

    g = BatchsizeGuesser()
    assert g(np.zeros((4, 2))) == 4 and g("weird") == 1


def test_sweep_batch2_util_helpers():
    import io

    from svt_speechbrain_tpu.alignment.aligner import (batch_log_matvecmul,
                                                       batch_log_maxvecmul,
                                                       map_inds_to_intersect)
    from svt_speechbrain_tpu.dataio.dataio import IterativeCSVWriter
    from svt_speechbrain_tpu.utils.bleu import merge_words
    from svt_speechbrain_tpu.utils.der import rectify
    from svt_speechbrain_tpu.utils.edit_distance import (
        top_wer_spks, top_wer_utts, wer_details_by_speaker,
        wer_details_by_utterance)

    det = wer_details_by_utterance({"u1": ["a", "b"], "u2": ["c"]},
                                   {"u1": ["a", "x"], "u2": ["c"]})
    spk = {d["speaker"]: d
           for d in wer_details_by_speaker(det, {"u1": "s1", "u2": "s2"})}
    assert spk["s1"]["WER"] == 50.0 and spk["s2"]["WER"] == 0.0
    top_non_empty, top_empty = top_wer_utts(det)
    assert top_non_empty[0]["key"] == "u1" and top_empty == []
    assert top_wer_spks(list(spk.values()))[0]["speaker"] == "s1"
    with pytest.raises(KeyError):
        wer_details_by_utterance({"u": ["a"]}, {}, scoring_mode="strict")
    present = wer_details_by_utterance({"u": ["a"]}, {},
                                       scoring_mode="present")
    assert len(present) == 1 and not present[0]["scored"]

    A = jnp.log(jnp.full((2, 3, 4), 0.25))
    b = jnp.log(jnp.full((2, 4), 0.25))
    # logsumexp over 4 terms of log(1/16) = log(1/4)
    np.testing.assert_allclose(np.asarray(batch_log_matvecmul(A, b)),
                               np.log(0.25), atol=1e-6)
    v, i = batch_log_maxvecmul(A, b)
    np.testing.assert_allclose(np.asarray(v), np.log(1 / 16), atol=1e-6)
    m1, m2, l2i = map_inds_to_intersect([[0]], [[0]], ({0: "a"}, {0: "b"}))
    assert l2i == {"a": 0, "b": 1} and m1 == [[0]] and m2 == [[1]]

    assert merge_words([["a", "b"]]) == ["a b"]
    assert list(rectify(np.array([np.nan, np.inf, 0.5]))) == [0.0, 100.0, 50.0]

    out = io.StringIO()
    w = IterativeCSVWriter(out, ["duration"])
    w.write(ID="u1", duration=2.5)
    assert out.getvalue().splitlines() == ["ID,duration", "u1,2.5"]


def test_sweep_batch3_processing():
    """Geometry helpers, decomposition round trips, diarization/PLDA public
    API, stoi helpers."""
    from svt_speechbrain_tpu.nnet.loss.stoi_loss import (removeSilentFrames,
                                                         thirdoct)
    from svt_speechbrain_tpu.processing.decomposition import (
        _pack, _unpack, f, finv, g, gevd, ginv, inv, pos_def)
    from svt_speechbrain_tpu.processing.diarization import (
        Spec_Clust_unorm, cosine_affinity, distribute_overlap, is_overlapped,
        spectral_clustering_sb)
    from svt_speechbrain_tpu.processing.multi_mic import (doas2taus, sphere,
                                                          steering,
                                                          tdoas2taus)
    from svt_speechbrain_tpu.processing.plda_lda import (Scores, diff,
                                                         ismember)

    # sphere points are unit and numerous; steering phases are unit complex
    doas = sphere(levels_count=1)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(doas), axis=-1),
                               1.0, atol=1e-5)
    assert doas.shape[0] > 12
    mics = np.array([[-0.05, 0, 0], [0.05, 0, 0]])
    taus = doas2taus(doas[None], mics, fs=16000)
    assert taus.shape == (1, doas.shape[0], 2)
    # tdoas2taus slices the first M columns of M + M(M-1)/2
    assert tdoas2taus(np.zeros((1, 5, 3))).shape == (1, 5, 2)
    A = steering(np.asarray(taus)[0, :4], n_fft=9)
    assert A.shape == (4, 9, 2, 2)
    np.testing.assert_allclose(A[..., 0, :] ** 2 + A[..., 1, :] ** 2, 1.0,
                               atol=1e-5)

    # decomposition round trips + generalized eigensolve (packed (*, 2, P))
    rng = np.random.default_rng(0)
    m = rng.normal(size=(2, 3, 3)) + 1j * rng.normal(size=(2, 3, 3))
    m = m @ np.conj(np.swapaxes(m, -1, -2)) + 3 * np.eye(3)
    tri = _pack(jnp.asarray(m, jnp.complex64))
    assert tri.shape == (2, 2, 6)
    np.testing.assert_allclose(np.asarray(_unpack(tri)), m, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(finv(f(tri))), np.asarray(tri),
                               atol=1e-5)
    stacked = jnp.stack([jnp.real(jnp.asarray(m, jnp.complex64)),
                         jnp.imag(jnp.asarray(m, jnp.complex64))], axis=-1)
    np.testing.assert_allclose(np.asarray(ginv(g(stacked))),
                               np.asarray(stacked), atol=1e-5)
    mi = np.asarray(inv(tri))
    mi = mi[..., 0] + 1j * mi[..., 1]
    prod = mi @ np.asarray(_unpack(pos_def(tri)))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                               atol=1e-4)
    b = _pack(jnp.asarray(np.stack([np.eye(3) * 2] * 2), jnp.complex64))
    vecs, ds = gevd(tri, b)
    vm = np.asarray(vecs[..., 0]) + 1j * np.asarray(vecs[..., 1])
    vals = np.asarray(ds[..., 0]).diagonal(axis1=-2, axis2=-1)
    lhs = np.asarray(_unpack(tri)) @ vm
    rhs = (np.asarray(_unpack(b)) @ vm) * vals[..., None, :]
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    # diarization public API separates two clear clusters
    X = np.concatenate([rng.normal(size=(10, 8)) + 5,
                        rng.normal(size=(10, 8)) - 5])
    labels = spectral_clustering_sb(cosine_affinity(X), n_clusters=2)
    assert len(set(labels[:10])) == 1 and labels[0] != labels[-1]
    sc = Spec_Clust_unorm()
    sc.do_spec_clust(X, 2, 0.3)
    assert sorted(set(sc.labels_)) == [0, 1]
    assert is_overlapped(2.0, 1.5) and not is_overlapped(2.0, 2.5)
    out = distribute_overlap([["r", 0.0, 2.0, 0], ["r", 1.0, 3.0, 1]])
    assert abs(out[0][2] - out[1][1]) < 1e-9
    assert ismember([1, 2, 3], [2]) == [False, True, False]
    assert diff([1, 2, 3], [2]) == [1, 3]
    assert repr(Scores(np.zeros((1, 2)), ["m"], ["a", "b"]))

    obm, cf = thirdoct(10000, 512, 15, 150)
    assert obm.shape == (15, 257) and len(cf) == 15
    x = np.concatenate([np.zeros(512), rng.normal(size=2048), np.zeros(512)])
    xs, ys = removeSilentFrames(x, x.copy())
    assert len(xs) < len(x)  # silence removed


def test_sweep_batch3_plda_scoring_orders():
    from svt_speechbrain_tpu.processing.plda_lda import (PLDA, StatObject_SB,
                                                         fast_PLDA_scoring)

    rng = np.random.default_rng(0)
    dim, spk, per = 8, 6, 12
    F = rng.normal(size=(dim, 3))
    means = rng.normal(size=(spk, 3)) @ F.T
    x, labs = [], []
    for s in range(spk):
        x.append(means[s] + 0.3 * rng.normal(size=(per, dim)))
        labs += [f"s{s}"] * per
    x = np.concatenate(x)
    stats = StatObject_SB(modelset=np.array(labs),
                          segset=np.array([f"u{i}" for i in range(len(x))]),
                          stat1=x)
    plda = PLDA(rank_f=3, nb_iter=5).plda(stats)
    enroll = StatObject_SB(
        modelset=np.array(["s0", "s1"]), segset=np.array(["e0", "e1"]),
        stat1=np.stack([x[:per].mean(0), x[per:2 * per].mean(0)]))
    test = StatObject_SB(
        modelset=np.array(["t0", "t1"]), segset=np.array(["t0", "t1"]),
        stat1=np.stack([means[0] + 0.3 * rng.normal(size=dim),
                        means[1] + 0.3 * rng.normal(size=dim)]))
    sc = fast_PLDA_scoring(enroll, test, None, plda.mean, plda.F, plda.Sigma)
    assert sc.scoremat[0, 0] > sc.scoremat[0, 1]
    assert sc.scoremat[1, 1] > sc.scoremat[1, 0]


def test_fairseq_wav2vec2_converter_roundtrip():
    """Building a fairseq-style state dict from our params and converting it
    back must reproduce the same forward output."""
    import dataclasses

    from svt_speechbrain_tpu.models.avhubert import FairseqWav2Vec2
    from svt_speechbrain_tpu.models.convert_fairseq import (
        convert_wav2vec2_fairseq_state_dict)
    from svt_speechbrain_tpu.models.wav2vec2 import (Wav2Vec2Config,
                                                     Wav2Vec2Encoder)

    cfg = dataclasses.replace(
        Wav2Vec2Config.large_lv60(), hidden_size=32, num_layers=1,
        num_heads=4, ffn_size=64, conv_dim=(16, 16), conv_kernel=(10, 3),
        conv_stride=(5, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    enc = Wav2Vec2Encoder(cfg)
    p = enc.init(jax.random.PRNGKey(0))

    def t(x):
        return np.ascontiguousarray(np.asarray(x).T)

    sd = {}
    for i in range(2):
        fe = p["feature_extractor"][str(i)]
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = np.transpose(
            np.asarray(fe["conv"]["w"]), (2, 1, 0))
        sd[f"feature_extractor.conv_layers.{i}.0.bias"] = np.asarray(
            fe["conv"]["b"])
        sd[f"feature_extractor.conv_layers.{i}.2.weight"] = np.asarray(
            fe["layer_norm"]["scale"])
        sd[f"feature_extractor.conv_layers.{i}.2.bias"] = np.asarray(
            fe["layer_norm"]["bias"])
    sd["layer_norm.weight"] = np.asarray(p["feat_proj_ln"]["scale"])
    sd["layer_norm.bias"] = np.asarray(p["feat_proj_ln"]["bias"])
    sd["post_extract_proj.weight"] = t(p["feat_proj"]["w"])
    sd["post_extract_proj.bias"] = np.asarray(p["feat_proj"]["b"])
    sd["encoder.pos_conv.0.weight_g"] = np.transpose(
        np.asarray(p["pos_conv"]["g"]), (2, 1, 0))
    sd["encoder.pos_conv.0.weight_v"] = np.transpose(
        np.asarray(p["pos_conv"]["v"]), (2, 1, 0))
    sd["encoder.pos_conv.0.bias"] = np.asarray(p["pos_conv"]["b"])
    sd["encoder.layer_norm.weight"] = np.asarray(p["encoder_ln"]["scale"])
    sd["encoder.layer_norm.bias"] = np.asarray(p["encoder_ln"]["bias"])
    lay = p["layers"]["0"]
    pre = "encoder.layers.0."
    for ours, theirs in (("wq", "q_proj"), ("wk", "k_proj"),
                         ("wv", "v_proj"), ("wo", "out_proj")):
        sd[pre + f"self_attn.{theirs}.weight"] = t(lay["attn"][ours])
        sd[pre + f"self_attn.{theirs}.bias"] = np.asarray(
            lay["attn"]["b" + ours[1]])
    sd[pre + "self_attn_layer_norm.weight"] = np.asarray(lay["ln1"]["scale"])
    sd[pre + "self_attn_layer_norm.bias"] = np.asarray(lay["ln1"]["bias"])
    sd[pre + "final_layer_norm.weight"] = np.asarray(lay["ln2"]["scale"])
    sd[pre + "final_layer_norm.bias"] = np.asarray(lay["ln2"]["bias"])
    sd[pre + "fc1.weight"] = t(lay["ffn1"]["w"])
    sd[pre + "fc1.bias"] = np.asarray(lay["ffn1"]["b"])
    sd[pre + "fc2.weight"] = t(lay["ffn2"]["w"])
    sd[pre + "fc2.bias"] = np.asarray(lay["ffn2"]["b"])

    converted = convert_wav2vec2_fairseq_state_dict(sd, cfg)
    wav = np.random.default_rng(0).normal(size=(1, 4000)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(enc(converted, wav)),
                               np.asarray(enc(p, wav)), atol=1e-6)

    m = FairseqWav2Vec2(config=cfg)
    out = m({"encoder": converted}, wav)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()


def test_sweep_batch3_misc():
    from svt_speechbrain_tpu.models.avhubert import (FairseqWav2Vec1,
                                                     load_label,
                                                     load_label_offset,
                                                     verify_label_lengths)
    from svt_speechbrain_tpu.models.enhancement import (Generator,
                                                        xavier_init_layer)
    from svt_speechbrain_tpu.models.transformer_se_st import (IMU_CRNN_GRU,
                                                              check_model)
    from svt_speechbrain_tpu.processing.nmf import (NMF_separate_spectra,
                                                    nmf_factorize,
                                                    reconstruct_results)
    from svt_speechbrain_tpu.processing.features import STFT

    import tempfile
    import os

    m = IMU_CRNN_GRU()
    assert check_model(m, m.init(jax.random.PRNGKey(0))) == (2, 2)

    p = xavier_init_layer(jax.random.PRNGKey(1), 4, 8)
    assert p["w"].shape == (4, 8) and p["b"].shape == (8,)
    assert Generator is not None

    w1 = FairseqWav2Vec1(conv_dim=(8,) * 5, embedding_dim=16,
                         context_layers=2)
    out = w1(w1.init(jax.random.PRNGKey(2)), jnp.zeros((1, 4000)))
    assert out.shape[-1] == 16

    d = tempfile.mkdtemp()
    lp = os.path.join(d, "labels.txt")
    with open(lp, "w") as fh:
        fh.write("a b\nc d e\nf\n")
    assert load_label(lp, [2, 0], 3) == ["f", "a b"]
    assert load_label_offset(lp, [0, 1], 3) == [(0, 4), (4, 10)]
    assert verify_label_lengths([32000, 48000], 16000, lp, 1.0, [0, 1], 3,
                                tol=0.5) == 0

    # NMF separation + resynthesis round trip (shapes/finiteness)
    rng = np.random.default_rng(0)
    t1 = np.abs(np.sin(2 * np.pi * 440 * np.arange(16000) / 16000))
    t2 = rng.random(16000)
    stft = STFT(16000)
    X1 = np.sqrt(np.sum(np.asarray(stft(None, jnp.asarray(t1[None],
                 jnp.float32))) ** 2, -1))[0].T
    X2 = np.sqrt(np.sum(np.asarray(stft(None, jnp.asarray(t2[None],
                 jnp.float32))) ** 2, -1))[0].T
    W1, _ = nmf_factorize(X1, rank=4, n_iter=20)
    W2, _ = nmf_factorize(X2, rank=4, n_iter=20)
    mix = jnp.asarray((0.5 * t1 + 0.5 * t2)[None], jnp.float32)
    Xmix_stft = np.asarray(stft(None, mix))
    Xmix = np.sqrt(np.sum(Xmix_stft ** 2, -1))[0]      # (T, F)
    X1h, X2h = NMF_separate_spectra((W1, W2), Xmix, n_iter=100)
    # (F, T) spectra + (BS, F, T, 2) mixture stft -> per-item waveform lists
    w1rs, w2rs = reconstruct_results(X1h[None], X2h[None],
                                     np.transpose(Xmix_stft, (0, 2, 1, 3)),
                                     16000, 25, 10)
    # iSTFT length covers the centered frames (≥ input length)
    assert w1rs[0].shape[1] >= 16000 and np.isfinite(w1rs[0]).all()


def test_sweep_batch4_complex_whitening_and_av_dataset():
    import os
    import tempfile

    import scipy.io.wavfile as wavfile

    from svt_speechbrain_tpu.models.avhubert import (AVHubertDataset,
                                                     load_audio_visual)
    from svt_speechbrain_tpu.models.resnet import (ResNet, conv3x3,
                                                   downsample_basic_block)
    from svt_speechbrain_tpu.nnet.complex_networks import (c_norm,
                                                           c_standardization)
    from svt_speechbrain_tpu.nnet.loss.transducer_loss import Transducer

    # complex whitening: unit variances, zero cross-covariance
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4096, 6)).astype(np.float32)
    x[:, 3:] = 0.7 * x[:, :3] + 0.3 * x[:, 3:]
    x -= x.mean(0)
    xr, xi = x[:, :3], x[:, 3:]
    y = np.asarray(c_standardization(
        jnp.asarray(x), jnp.asarray((xr * xr).mean(0)),
        jnp.asarray((xi * xi).mean(0)), jnp.asarray((xr * xi).mean(0))))
    yr, yi = y[:, :3], y[:, 3:]
    np.testing.assert_allclose((yr * yr).mean(0), 1.0, atol=2e-2)
    np.testing.assert_allclose((yr * yi).mean(0), 0.0, atol=2e-2)
    y2 = c_norm(jnp.asarray(x), jnp.asarray((xr * xr).mean(0)),
                jnp.asarray((xi * xi).mean(0)), jnp.asarray((xr * xi).mean(0)),
                beta=jnp.ones((6,)), gamma_rr=jnp.ones((3,)),
                gamma_ri=jnp.zeros((3,)), gamma_ii=jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(y2), y + 1.0, atol=1e-5)

    assert ResNet is not None and conv3x3(4, 3) is not None
    assert len(downsample_basic_block(4, 3)) == 2
    assert Transducer is not None

    # AV manifest loading + dataset items
    d = tempfile.mkdtemp()
    wavfile.write(os.path.join(d, "a0.wav"), 16000,
                  np.zeros(16000, np.int16))
    with open(os.path.join(d, "manifest.tsv"), "w") as f:
        f.write(d + "\n")
        f.write("u0\tv0.mp4\ta0.wav\t50\t16000\n")
        f.write("u1\tv1.mp4\ta1.wav\t50\t400\n")
    lab = os.path.join(d, "lab.txt")
    with open(lab, "w") as f:
        f.write("1 2 3\n4 5\n")
    root, names, inds, tot, sizes = load_audio_visual(
        os.path.join(d, "manifest.tsv"), None, 1000, 25)
    assert len(names) == 1 and sizes == [16000] and tot == 2
    ds = AVHubertDataset(os.path.join(d, "manifest.tsv"), label_paths=[lab],
                         min_keep_sample_size=1000)
    item = ds[0]
    assert "audio" in item and item["label0"] == "1 2 3"
