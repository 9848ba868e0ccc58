"""Pallas TPU flash attention.

Fuses scores → softmax → values into one kernel so the (Tq, Tk) score matrix
never round-trips HBM — q is processed in VMEM blocks against K/V panels.
This is the long-window path for the AMT encoders (5 s chunks are only ~249
frames, where XLA's fused attention is already near-optimal; whole-song
windows of thousands of frames are where this kernel pays, SURVEY.md §5.7).

Forward is a Pallas kernel; backward falls back to the XLA einsum attention
VJP (standard recompute — attention backward is not on the AMT hot path).

Usage: ``nnet.attention.MultiheadAttention`` dispatches here automatically on
TPU for long unmasked sequences, or explicitly via
``scaled_dot_product_attention(..., impl="flash")``.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_k):
    """One (batch*head, q-block) program: stream K/V panels with running
    max/sum (the flash-attention recurrence). Matmul inputs stay in the
    input dtype (bf16 on the MXU fast path) with f32 accumulation."""
    q = q_ref[0]  # (BQ, D), input dtype
    bq = q.shape[0]
    d = q.shape[1]

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]  # (BK, D)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    n_k = seq_k // block_k
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l_final, acc = jax.lax.fori_loop(0, n_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / l_final[:, None]).astype(o_ref.dtype)


def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32)).astype(v.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x, size
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads), size


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale=None, block_q=256, block_k=512, interpret=False):
    """q, k, v: (B, H, T, D) → (B, H, Tq, D). Unmasked full attention.

    Defaults (block_q=256, block_k=512) measured fastest on v5e (≈1.6× XLA
    at T=2048; larger blocks thrash VMEM). ``interpret=True`` runs the Pallas
    interpreter (CPU tests)."""
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret)


def _flash_forward(q, k, v, scale, block_q, block_k, interpret=False):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    block_q = min(block_q, max(tq, 8))
    block_k = min(block_k, max(tk, 128))

    # padded K columns would corrupt the softmax, so a non-multiple Tk takes
    # the XLA path (our fixed-shape pipelines pick block-multiple frames);
    # q rows pad freely — extra rows are computed and trimmed.
    if tk % block_k:
        return _xla_attention(q, k, v, scale)
    q, tq0 = _pad_to(q, 2, block_q)
    tq_pad = q.shape[2]

    bh = b * h
    qf = q.reshape(bh, tq_pad, d)
    kf = k.reshape(bh, k.shape[2], d)
    vf = v.reshape(bh, v.shape[2], d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k,
                          seq_k=kf.shape[1]),
        grid=(bh, tq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kf.shape[1], d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vf.shape[1], d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    out = out.reshape(b, h, tq_pad, d)
    return out[:, :, :tq0]


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret=False):
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret), (q, k, v)


def _flash_bwd(scale, block_q, block_k, interpret, residuals, g):
    q, k, v = residuals
    d = q.shape[-1]
    s = scale if scale is not None else 1.0 / np.sqrt(d)
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, s), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_available():
    return jax.default_backend() == "tpu"
