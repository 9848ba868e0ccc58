"""Tensor-parallel sharding rules for the SSL encoders and seq2seq decoder.

The reference has no tensor parallelism (SURVEY.md §2.4 — pure data
parallelism); on TPU it falls out of the sharding system: annotate the big
matrices over a "model" mesh axis and XLA partitions the matmuls and inserts
the all-reduces over ICI (Megatron-style column/row parallel FFN + per-head
attention sharding).

Rules (per transformer layer, hidden d, ffn f, heads h over axis "model"):
- ffn1 w (d, f): shard f  → column parallel; ffn2 w (f, d): shard f → row
  parallel (the pair needs ONE psum, which XLA inserts);
- attention q/k/v w (d, d): shard output dim (head-parallel); out w (d, d):
  shard input dim;
- everything else (norms, convs, biases on the row-parallel side) replicated.
"""
from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _spec_for_path(path, model_axis):
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    if "layers" in keys:
        leaf = keys[-1]
        parent = keys[-2] if len(keys) >= 2 else None
        # encoder layers name these ffn1/ffn2 + attn; the seq2seq decoder
        # (models/seq2seq_decoder.py) fc1/fc2 + self_attn/encoder_attn —
        # same Megatron column/row/head-parallel rules
        if parent in ("ffn1", "fc1") and leaf == "w":
            return P(None, model_axis)
        if parent in ("ffn1", "fc1") and leaf == "b":
            return P(model_axis)
        if parent in ("ffn2", "fc2") and leaf == "w":
            return P(model_axis, None)
        if parent in ("attn", "self_attn", "encoder_attn") \
                and leaf in ("wq", "wk", "wv"):
            return P(None, model_axis)
        if parent in ("attn", "self_attn", "encoder_attn") \
                and leaf in ("bq", "bk", "bv"):
            return P(model_axis)
        if parent in ("attn", "self_attn", "encoder_attn") and leaf == "wo":
            return P(model_axis, None)
    return P()


def encoder_tp_shardings(params, mesh, model_axis="model"):
    """NamedSharding pytree for wav2vec2/AV-HuBERT encoder params: column/row
    parallel FFN + head-parallel attention over ``model_axis``.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> from svt_speechbrain_tpu.parallel.mesh import make_mesh
    >>> mesh = make_mesh(axis_names=("data", "model"), shape=(2, 4))
    >>> params = {"layers": {"0": {
    ...     "ffn1": {"w": jnp.ones((8, 16))}, "ffn2": {"w": jnp.ones((16, 8))},
    ...     "attn": {"wq": jnp.ones((8, 8)), "wo": jnp.ones((8, 8))},
    ...     "norm": {"scale": jnp.ones((8,))}}}}
    >>> sh = encoder_tp_shardings(params, mesh)["layers"]["0"]
    >>> sh["ffn1"]["w"].spec, sh["ffn2"]["w"].spec    # column, then row
    (PartitionSpec(None, 'model'), PartitionSpec('model', None))
    >>> sh["attn"]["wq"].spec, sh["attn"]["wo"].spec  # head-parallel
    (PartitionSpec(None, 'model'), PartitionSpec('model', None))
    >>> sh["norm"]["scale"].spec                      # norms replicated
    PartitionSpec()
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for_path(path, model_axis)),
        params)


def apply_tp(params, mesh, model_axis="model"):
    """Place params on the mesh under the TP rules."""
    shardings = encoder_tp_shardings(params, mesh, model_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
