"""State-dict-level speechbrain-checkpoint converters
(``models/convert_sb.py``): build a reference torch module, take its
``state_dict()`` (what the reference Checkpointer saves), convert, and
assert equal forwards — the checkpoint-file-grade version of the
module-attribute golden tests.
"""
import importlib

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import import_reference_speechbrain, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_convert_xvector_state_dict():
    import torch

    import_reference_speechbrain()
    ref_mod = importlib.import_module("speechbrain.lobes.models.Xvector")
    from svt_speechbrain_tpu.models.convert_sb import convert_xvector
    from svt_speechbrain_tpu.models.xvector import Xvector

    torch.manual_seed(31)
    channels = (16, 16, 16, 16, 32)
    ref = ref_mod.Xvector(in_channels=24, tdnn_channels=list(channels),
                          lin_neurons=12).eval()
    params, state = convert_xvector(_sd(ref))
    mine = Xvector(in_channels=24, tdnn_channels=channels, lin_neurons=12)

    x = np.random.default_rng(32).normal(size=(3, 20, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got, _ = mine(params, jnp.asarray(x), state=state, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_convert_ecapa_state_dict():
    import torch

    import_reference_speechbrain()
    ref_mod = importlib.import_module("speechbrain.lobes.models.ECAPA_TDNN")
    from svt_speechbrain_tpu.models.convert_sb import convert_ecapa
    from svt_speechbrain_tpu.models.ecapa_tdnn import ECAPA_TDNN

    torch.manual_seed(33)
    channels = (16, 16, 16, 16, 48)
    ref = ref_mod.ECAPA_TDNN(input_size=20, lin_neurons=12,
                             channels=list(channels), attention_channels=8,
                             res2net_scale=4, se_channels=8).eval()
    params, state = convert_ecapa(_sd(ref), res2net_scale=4)
    mine = ECAPA_TDNN(input_size=20, lin_neurons=12, channels=channels,
                      attention_channels=8, res2net_scale=4, se_channels=8)

    x = np.random.default_rng(34).normal(size=(2, 30, 20)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    got, _ = mine(params, jnp.asarray(x), state=state, train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_convert_transformer_encoder_state_dict():
    import torch

    import_reference_speechbrain()
    ref_mod = importlib.import_module(
        "speechbrain.lobes.models.transformer.Transformer")
    from svt_speechbrain_tpu.models.convert_sb import (
        convert_transformer_encoder)
    from svt_speechbrain_tpu.models.transformer import TransformerEncoder

    torch.manual_seed(35)
    ref = ref_mod.TransformerEncoder(num_layers=2, nhead=4, d_ffn=64,
                                     d_model=32, dropout=0.0).eval()
    params = convert_transformer_encoder(_sd(ref), num_layers=2, d_model=32)
    mine = TransformerEncoder(num_layers=2, nhead=4, d_ffn=64, d_model=32,
                              dropout=0.0)
    x = np.random.default_rng(36).normal(size=(3, 12, 32)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.tensor(x))
    got, _ = mine(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_convert_dual_path_state_dict():
    import torch

    import_reference_speechbrain()
    dp = importlib.import_module("speechbrain.lobes.models.dual_path")
    from svt_speechbrain_tpu.models.convert_sb import convert_dual_path
    from svt_speechbrain_tpu.models.separation import (
        Dual_Path_Model, SBTransformerBlock)

    torch.manual_seed(37)
    d = 16
    ref_intra = dp.SBTransformerBlock(num_layers=1, d_model=d, nhead=4,
                                      d_ffn=32, use_positional_encoding=True,
                                      norm_before=True)
    ref_inter = dp.SBTransformerBlock(num_layers=1, d_model=d, nhead=4,
                                      d_ffn=32, use_positional_encoding=True,
                                      norm_before=True)
    ref = dp.Dual_Path_Model(in_channels=24, out_channels=d,
                             intra_model=ref_intra, inter_model=ref_inter,
                             num_layers=2, norm="ln", K=20,
                             num_spks=2).eval()
    params = convert_dual_path(_sd(ref), num_layers=2, num_tlayers=1,
                               d_model=d)
    intra = SBTransformerBlock(1, d, 4, 32, use_positional_encoding=True,
                               norm_before=True)
    inter = SBTransformerBlock(1, d, 4, 32, use_positional_encoding=True,
                               norm_before=True)
    mine = Dual_Path_Model(24, d, intra, inter, num_layers=2, K=20,
                           num_spks=2)

    x = np.random.default_rng(38).normal(size=(2, 90, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x).transpose(1, 2)).numpy()
    got = np.asarray(mine(params, jnp.asarray(x)))
    got_cf = got.transpose(2, 0, 3, 1)
    np.testing.assert_allclose(got_cf, want, atol=1e-5, rtol=1e-4)


def test_convert_ligru_state_dict():
    import torch

    sb = import_reference_speechbrain()
    from svt_speechbrain_tpu.models.convert_sb import convert_ligru
    from svt_speechbrain_tpu.nnet.rnn import LiGRU

    torch.manual_seed(39)
    ref = sb.nnet.RNN.LiGRU(hidden_size=8, input_shape=(3, 12, 10),
                            num_layers=2, normalization="batchnorm",
                            dropout=0.0, bidirectional=True).eval()
    params, state = convert_ligru(_sd(ref), num_layers=2)
    mine = LiGRU(hidden_size=8, input_size=10, num_layers=2,
                 normalization="batchnorm", bidirectional=True, dropout=0.0)
    x = np.random.default_rng(40).normal(size=(3, 12, 10)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.tensor(x))
    got, _, _ = mine(params, jnp.asarray(x), state=state, train=False)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_convert_rnnlm_state_dict():
    import torch

    import_reference_speechbrain()
    ref_mod = importlib.import_module("speechbrain.lobes.models.RNNLM")
    from svt_speechbrain_tpu.models.convert_sb import convert_rnnlm
    from svt_speechbrain_tpu.models.rnnlm import RNNLM

    torch.manual_seed(41)
    ref = ref_mod.RNNLM(output_neurons=30, embedding_dim=16, rnn_neurons=24,
                        dnn_neurons=12, dropout=0.0).eval()
    params = convert_rnnlm(_sd(ref), rnn_layers=2, dnn_blocks=1)
    mine = RNNLM(output_neurons=30, embedding_dim=16, rnn_neurons=24,
                 dnn_neurons=12, dropout=0.0)
    tokens = np.random.default_rng(42).integers(0, 30, size=(3, 9))
    with torch.no_grad():
        want = ref(torch.tensor(tokens)).numpy()
    got = np.asarray(mine(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
