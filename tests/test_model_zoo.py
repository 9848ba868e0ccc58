"""Model zoo: shape/finiteness checks for CRDNN, VanillaNN, Xvector,
ECAPA-TDNN, RNNLM, Conformer, TransformerASR/LM."""
import numpy as np

import jax
import jax.numpy as jnp


def _feats(b=2, t=30, f=40, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=(b, t, f)), jnp.float32)


def test_crdnn():
    from svt_speechbrain_tpu.models.crdnn import CRDNN

    model = CRDNN(input_size=40, cnn_channels=(8, 16), rnn_neurons=32,
                  rnn_layers=2, dnn_neurons=24)
    params = model.init(jax.random.PRNGKey(0))
    out = model(params, _feats())
    assert out.shape == (2, 30, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_vanilla_nn():
    from svt_speechbrain_tpu.models.crdnn import VanillaNN

    model = VanillaNN(input_size=40, dnn_neurons=16)
    params = model.init(jax.random.PRNGKey(0))
    assert model(params, _feats()).shape == (2, 30, 16)


def test_xvector():
    from svt_speechbrain_tpu.models.xvector import Xvector

    model = Xvector(in_channels=40, tdnn_channels=(32, 32, 32, 32, 64),
                    lin_neurons=16)
    params = model.init(jax.random.PRNGKey(0))
    emb = model(params, _feats(), lengths=jnp.asarray([1.0, 0.5]))
    assert emb.shape == (2, 1, 16)


def test_ecapa_tdnn():
    from svt_speechbrain_tpu.models.ecapa_tdnn import ECAPA_TDNN, Classifier

    model = ECAPA_TDNN(input_size=40, lin_neurons=24,
                       channels=(32, 32, 32, 32, 96),
                       res2net_scale=4, se_channels=16, attention_channels=16)
    params = model.init(jax.random.PRNGKey(0))
    emb = model(params, _feats(), lengths=jnp.asarray([1.0, 0.7]))
    assert emb.shape == (2, 1, 24)
    clf = Classifier(input_size=24, lin_neurons=16, out_neurons=10)
    cp = clf.init(jax.random.PRNGKey(1))
    logits = clf(cp, emb)
    assert logits.shape == (2, 1, 10)
    # cosine outputs bounded
    assert float(jnp.abs(logits).max()) <= 1.0 + 1e-5


def test_rnnlm():
    from svt_speechbrain_tpu.models.rnnlm import RNNLM

    model = RNNLM(output_neurons=50, embedding_dim=16, rnn_neurons=32,
                  rnn_layers=1, dnn_neurons=24)
    params = model.init(jax.random.PRNGKey(0))
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 50, (2, 7)))
    logits = model(params, tokens)
    assert logits.shape == (2, 7, 50)


def test_conformer_encoder():
    from svt_speechbrain_tpu.models.conformer import ConformerEncoder

    model = ConformerEncoder(num_layers=2, d_model=32, d_ffn=64, nhead=4,
                             kernel_size=7)
    params = model.init(jax.random.PRNGKey(0))
    x = _feats(f=32)
    out = model(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_transformer_asr_and_lm():
    from svt_speechbrain_tpu.models.transformer_asr import TransformerASR, TransformerLM

    model = TransformerASR(tgt_vocab=30, input_size=40, d_model=32, nhead=4,
                           num_encoder_layers=2, num_decoder_layers=2, d_ffn=64)
    params = model.init(jax.random.PRNGKey(0))
    src = _feats()
    tgt = jnp.asarray(np.random.default_rng(1).integers(1, 30, (2, 6)))
    enc, dec = model(params, src, tgt, wav_len=jnp.asarray([1.0, 0.8]))
    assert enc.shape == (2, 30, 32)
    assert dec.shape == (2, 6, 32)

    lm = TransformerLM(vocab=30, d_model=32, nhead=4, num_encoder_layers=2, d_ffn=64)
    lp = lm.init(jax.random.PRNGKey(2))
    logits = lm(lp, tgt)
    assert logits.shape == (2, 6, 30)
    # causal: changing a later token must not affect earlier logits
    tgt2 = tgt.at[:, -1].set((tgt[:, -1] + 1) % 30)
    logits2 = lm(lp, tgt2)
    np.testing.assert_allclose(np.asarray(logits[:, :-1]),
                               np.asarray(logits2[:, :-1]), atol=1e-5)
