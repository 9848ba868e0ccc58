"""Convert reference-speechbrain torch checkpoints to framework params.

The reference saves module ``state_dict()``s per checkpoint directory
(``speechbrain/utils/checkpoints.py`` torch_save). These converters map
those flat name→tensor dicts into our param/state pytrees, so models
trained with the reference drop into this framework. The weight-layout
rules are proven by the golden tests (``tests/test_batchnorm_parity.py``,
``tests/test_transformer_parity.py``, ``tests/test_dual_path_parity.py``)
and re-exercised through these converters in ``tests/test_convert_sb.py``.

All converters accept a flat ``{name: array}`` dict (use
``load_torch_state_dict`` for a ``.ckpt`` file) plus the architecture
facts that aren't recoverable from shapes alone.
"""
from __future__ import annotations

import numpy as np


def load_torch_state_dict(path):
    """Flat name → numpy dict from a torch checkpoint file."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v) for k, v in sd.items()}


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def _lin(sd, prefix):
    """torch ``nn.Linear`` state-dict entries → framework Linear params
    (weight transposed to (in, out); bias omitted when absent).

    Example
    -------
    >>> import torch
    >>> sd = {k: v.numpy() for k, v in torch.nn.Linear(4, 2).state_dict().items()}
    >>> p = _lin(sd, "")
    >>> p["w"].shape, p["b"].shape
    ((4, 2), (2,))
    """
    p = {"w": _t(sd[prefix + "weight"])}
    if prefix + "bias" in sd:
        p["b"] = np.asarray(sd[prefix + "bias"])
    return p


def _sb_lin(sd, prefix):
    # sb Linear wraps the torch linear as ".w"
    return _lin(sd, prefix + "w.")


def _conv1d(sd, prefix):
    """torch Conv1d (out, in/groups, k) → channel-last (k, in/groups, out)."""
    p = {"w": np.ascontiguousarray(
        np.transpose(np.asarray(sd[prefix + "weight"]), (2, 1, 0)))}
    if prefix + "bias" in sd:
        p["b"] = np.asarray(sd[prefix + "bias"])
    return p


def _affine(sd, prefix):
    return {"scale": np.asarray(sd[prefix + "weight"]),
            "bias": np.asarray(sd[prefix + "bias"])}


def _bn(sd, prefix):
    return (_affine(sd, prefix),
            {"mean": np.asarray(sd[prefix + "running_mean"]),
             "var": np.asarray(sd[prefix + "running_var"])})


def _mha(sd, prefix, d):
    """torch nn.MultiheadAttention packed in_proj → our MHA params.
    Bias keys are absent when the module was built with ``bias=False`` —
    our ``MultiheadAttention`` always reads bq/bk/bv/bo, so missing torch
    biases become zeros (numerically identical to torch's bias=False)."""
    w = np.asarray(sd[prefix + "in_proj_weight"])
    p = {"wq": _t(w[:d]), "wk": _t(w[d:2 * d]), "wv": _t(w[2 * d:]),
         "wo": _t(sd[prefix + "out_proj.weight"])}
    if prefix + "in_proj_bias" in sd:
        b = np.asarray(sd[prefix + "in_proj_bias"])
        p.update(bq=b[:d].copy(), bk=b[d:2 * d].copy(), bv=b[2 * d:].copy())
    else:
        z = np.zeros((d,), np.float32)
        p.update(bq=z, bk=z.copy(), bv=z.copy())
    if prefix + "out_proj.bias" in sd:
        p["bo"] = np.asarray(sd[prefix + "out_proj.bias"])
    else:
        p["bo"] = np.zeros((d,), np.float32)
    return p


def convert_relpos_mha(sd, prefix, d, num_heads):
    """Reference ``RelPosMHAXL`` → our params. Two reference quirks the
    mapping must honor (attention.py:551-557, 586-592): the SELF-attention
    path reads the packed projection per head (q/k/v interleaved within
    each head's 3·dh block), and the pos biases stored (dh, H) are VIEWED
    as (H, dh) raw memory."""
    dh = d // num_heads
    w3 = np.asarray(sd[prefix + "in_proj_weight"]).reshape(
        num_heads, 3, dh, d)
    return {
        "wq": _t(w3[:, 0].reshape(d, d)),
        "wk": _t(w3[:, 1].reshape(d, d)),
        "wv": _t(w3[:, 2].reshape(d, d)),
        "wo": _t(sd[prefix + "out_proj.weight"]),
        "bo": np.asarray(sd[prefix + "out_proj.bias"]),
        "wpos": _t(sd[prefix + "linear_pos.weight"]),
        "u": np.asarray(sd[prefix + "pos_bias_u"]).reshape(num_heads, dh),
        "v": np.asarray(sd[prefix + "pos_bias_v"]).reshape(num_heads, dh),
    }


def convert_transformer_encoder(sd, num_layers, d_model, prefix=""):
    """Reference ``TransformerEncoder`` (``lobes/models/transformer/
    Transformer.py:318``) → our ``models.transformer.TransformerEncoder``
    params."""
    layers = {}
    for i in range(num_layers):
        p = f"{prefix}layers.{i}."
        layers[str(i)] = {
            "self_att": _mha(sd, p + "self_att.att.", d_model),
            "pos_ffn": {"ffn1": _lin(sd, p + "pos_ffn.ffn.0."),
                        "ffn2": _lin(sd, p + "pos_ffn.ffn.3.")},
            "norm1": _affine(sd, p + "norm1.norm."),
            "norm2": _affine(sd, p + "norm2.norm."),
        }
    return {"layers": layers, "norm": _affine(sd, prefix + "norm.norm.")}


def convert_xvector(sd, tdnn_blocks=5):
    """Reference ``Xvector`` lobe → (params, state)."""
    params, state = {}, {}
    for i in range(tdnn_blocks):
        conv = _conv1d(sd, f"blocks.{3 * i}.conv.")
        norm_p, norm_s = _bn(sd, f"blocks.{3 * i + 2}.norm.")
        params[f"tdnn{i}"] = {"conv": conv, "norm": norm_p}
        state[f"tdnn{i}"] = norm_s
    params["fc"] = _sb_lin(sd, f"blocks.{3 * tdnn_blocks + 1}.")
    return params, state


def convert_ecapa(sd, n_se_blocks=3, res2net_scale=8):
    """Reference ``ECAPA_TDNN`` lobe → (params, state)."""

    def tdnn(prefix):
        p_norm, s_norm = _bn(sd, prefix + "norm.norm.")
        return ({"conv": _conv1d(sd, prefix + "conv.conv."),
                 "norm": p_norm}, s_norm)

    params, state = {}, {}
    params["block0"], state["block0"] = tdnn("blocks.0.")
    for i in range(1, n_se_blocks + 1):
        pre = f"blocks.{i}."
        p, s = {}, {}
        p["tdnn1"], s["tdnn1"] = tdnn(pre + "tdnn1.")
        res_p, res_s = {}, {}
        for j in range(res2net_scale - 1):
            res_p[str(j)], res_s[str(j)] = tdnn(
                pre + f"res2net_block.blocks.{j}.")
        p["res2net"], s["res2net"] = res_p, res_s
        p["tdnn2"], s["tdnn2"] = tdnn(pre + "tdnn2.")
        p["se"] = {"conv1": _conv1d(sd, pre + "se_block.conv1.conv."),
                   "conv2": _conv1d(sd, pre + "se_block.conv2.conv.")}
        if pre + "shortcut.conv.weight" in sd:
            p["shortcut"] = _conv1d(sd, pre + "shortcut.conv.")
        params[f"block{i}"], state[f"block{i}"] = p, s
    params["mfa"], state["mfa"] = tdnn("mfa.")
    asp_p, asp_s = tdnn("asp.tdnn.")
    params["asp"] = {"tdnn": asp_p, "conv": _conv1d(sd, "asp.conv.conv.")}
    state["asp"] = asp_s
    params["asp_norm"], state["asp_norm"] = _bn(sd, "asp_bn.norm.")
    params["fc"] = _conv1d(sd, "fc.conv.")
    return params, state


def convert_dual_path(sd, num_layers, num_tlayers, d_model):
    """Reference ``Dual_Path_Model`` (SBTransformerBlock intra/inter) →
    our ``separation.Dual_Path_Model`` params."""
    conv2d_w = np.asarray(sd["conv2d.weight"])[:, :, 0, 0]
    params = {
        "norm": _affine(sd, "norm."),
        "conv_in": {"w": _t(np.asarray(sd["conv1d.weight"])[:, :, 0])},
        "conv2d": {"w": _t(conv2d_w), "b": np.asarray(sd["conv2d.bias"])},
        "end_conv": {"w": _t(np.asarray(sd["end_conv1x1.weight"])[:, :, 0])},
        "output": {"w": _t(np.asarray(sd["output.0.weight"])[:, :, 0]),
                   "b": np.asarray(sd["output.0.bias"])},
        "output_gate": {"w": _t(np.asarray(sd["output_gate.0.weight"])[:, :, 0]),
                        "b": np.asarray(sd["output_gate.0.bias"])},
        "prelu": {"alpha": np.asarray(sd["prelu.weight"])[0]},
        "blocks": {},
    }
    for i in range(num_layers):
        pre = f"dual_mdl.{i}."
        params["blocks"][str(i)] = {
            "intra": {"encoder": convert_transformer_encoder(
                sd, num_tlayers, d_model, prefix=pre + "intra_mdl.mdl.")},
            "inter": {"encoder": convert_transformer_encoder(
                sd, num_tlayers, d_model, prefix=pre + "inter_mdl.mdl.")},
            "intra_norm": _affine(sd, pre + "intra_norm."),
            "inter_norm": _affine(sd, pre + "inter_norm."),
            "intra_linear": _sb_lin(sd, pre + "intra_linear."),
            "inter_linear": _sb_lin(sd, pre + "inter_linear."),
        }
    return params


def convert_rca_layer(sd, prefix, d_model):
    """Reference ``RCALayer`` (``N20EMv2/audio_visual/fusion.py:82-183``) →
    our ``models.fusion.RCALayer`` params (one shared MHA used for both the
    self- and cross-attention passes)."""
    return {
        "self_att": _mha(sd, prefix + "self_att.att.", d_model),
        "pos_ffn": {"ffn1": _lin(sd, prefix + "pos_ffn.ffn.0."),
                    "ffn2": _lin(sd, prefix + "pos_ffn.ffn.3.")},
        "norm1": _affine(sd, prefix + "norm1.norm."),
        "norm2": _affine(sd, prefix + "norm2.norm."),
    }


def convert_rca_fusion(sd, d_model=1024, prefix=""):
    """Reference ``FusionRCA`` (``N20EMv2/audio_visual/fusion.py:186-210``)
    → our ``models.fusion.FusionRCA`` params. For a bare ``RCANet`` state
    dict pass ``prefix=""`` and take ``result["fusion"]``. Reference
    checkpoints save the recipe's ``model`` ModuleList as
    ``0.fusion.layer1...`` (fusion) + the head separately — pass
    ``prefix="0."`` for that layout."""
    return {"fusion": {
        "layer1": convert_rca_layer(sd, prefix + "fusion.layer1.", d_model),
        "layer2": convert_rca_layer(sd, prefix + "fusion.layer2.", d_model),
    }}


def convert_ligru(sd, num_layers):
    """Reference ``LiGRU`` → (params, state) for ``nnet.rnn.LiGRU``."""
    params, state = {}, {}
    for i in range(num_layers):
        pre = f"rnn.{i}."
        norm_p, norm_s = _bn(sd, pre + "norm.")
        params[f"l{i}"] = {"w": _t(sd[pre + "w.weight"]),
                           "u": _t(sd[pre + "u.weight"]),
                           "norm": norm_p}
        state[f"l{i}"] = norm_s
    return params, state


def convert_rnnlm(sd, rnn_layers=2, dnn_blocks=1):
    """Reference ``RNNLM`` lobe → our ``models.rnnlm.RNNLM`` params.
    torch LSTM packs gates (i, f, g, o) rows — same order our LSTM uses."""
    params = {"embedding": {"table": np.asarray(sd["embedding.Embedding.weight"])}}
    rnn = {}
    for layer in range(rnn_layers):
        rnn[f"l{layer}"] = {
            "w_ih": _t(sd[f"rnn.rnn.weight_ih_l{layer}"]),
            "w_hh": _t(sd[f"rnn.rnn.weight_hh_l{layer}"]),
            "b_ih": np.asarray(sd[f"rnn.rnn.bias_ih_l{layer}"]),
            "b_hh": np.asarray(sd[f"rnn.rnn.bias_hh_l{layer}"]),
        }
    params["rnn"] = rnn
    for i in range(dnn_blocks):
        pre = "dnn." if dnn_blocks == 1 else f"dnn.block_{i}."
        if pre + "linear.w.weight" not in sd:
            pre = f"dnn.block_{i}."
        params[f"dnn{i}"] = {"linear": _sb_lin(sd, pre + "linear."),
                             "norm": _affine(sd, pre + "norm.norm.")}
    params["out"] = _sb_lin(sd, "out.")
    return params
