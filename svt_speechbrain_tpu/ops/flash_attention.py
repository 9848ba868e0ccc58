"""Pallas TPU flash attention with per-row valid-length masking.

Fuses scores → softmax → values into one kernel so the (Tq, Tk) score matrix
never round-trips HBM — q is processed in VMEM blocks against K/V panels.
At the AMT encoder's 5 s windows (B=64, H=16, T=249) the XLA einsum path
materializes a 254 MB f32 score tensor per layer; this kernel keeps it in
VMEM. For whole-song windows of thousands of frames it is also the only
path that doesn't OOM (SURVEY.md §5.7).

Masking: every padding pattern in this framework is a *prefix* pattern (the
loaders right-pad), so instead of a boolean (B, Tk) mask the kernel takes a
per-row ``lengths`` vector. Each (batch·head, q-block) program reads its
row's length from SMEM, runs the K-panel loop only up to the last valid
panel (padded rows cost nothing), and masks the tail panel's columns. This
also lifts the old restriction that Tk be a block multiple — K/V pad freely.

Forward is a Pallas kernel; backward falls back to the XLA einsum attention
VJP (standard recompute — attention backward is not on the AMT hot path).

Usage: ``nnet.attention.MultiheadAttention`` dispatches here automatically
on TPU when attention weights aren't requested (pass ``key_lengths`` instead
of a boolean ``key_padding_mask`` to keep the fused path on padded batches),
or explicitly via ``scaled_dot_product_attention(..., impl="flash")``.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return -(-x // m) * m


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale, block_k,
                  seq_k_pad):
    """One (batch*head, q-block) program: stream K/V panels with running
    max/sum (the flash-attention recurrence). Matmul inputs stay in the
    input dtype (bf16 on the MXU fast path) with f32 accumulation. Panels
    beyond this row's valid length are skipped; the boundary panel's
    columns are masked."""
    q = q_ref[0]  # (BQ, D), input dtype
    bq, d = q.shape
    length = len_ref[pl.program_id(0)]  # this row's valid key count

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]  # (BK, D)
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        s = jnp.where(col < length, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    # only the panels that contain valid keys run (zero-length rows skip all)
    n_k = jnp.minimum((length + block_k - 1) // block_k, seq_k_pad // block_k)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l_final, acc = jax.lax.fori_loop(0, n_k, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l_final, 1e-30)[:, None]).astype(o_ref.dtype)


def _xla_attention(q, k, v, scale, lengths=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if lengths is not None:
        col = jnp.arange(k.shape[2])
        s = jnp.where(col[None, None, None, :] < lengths[:, None, None, None],
                      s, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    if lengths is not None:
        # fully-padded rows (lengths == 0): softmax over an all-NEG_INF row
        # is uniform; zero those rows so this path agrees with the Pallas
        # kernel, which skips every key panel and emits zeros
        w = jnp.where((lengths > 0)[:, None, None, None], w, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32)).astype(v.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    target = _round_up(size, multiple)
    if target == size:
        return x, size
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads), size


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(q, k, v, lengths=None, scale=None, block_q=256,
                    block_k=512, interpret=False):
    """q, k, v: (B, H, T, D) → (B, H, Tq, D). Full attention over each row's
    first ``lengths[b]`` keys (``lengths`` (B,) int; None = all Tk valid).

    Defaults (block_q=256, block_k=512) measured fastest on v5e (≈1.6× XLA
    at T=2048; larger blocks thrash VMEM). ``interpret=True`` runs the Pallas
    interpreter (CPU tests)."""
    return _flash_forward(q, k, v, lengths, scale, block_q, block_k, interpret)


def _flash_forward(q, k, v, lengths, scale, block_q, block_k, interpret=False):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    block_q = min(block_q, _round_up(max(tq, 8), 8))
    block_k = min(block_k, _round_up(max(tk, 128), 128))

    q, tq0 = _pad_to(q, 2, block_q)
    k, _ = _pad_to(k, 2, block_k)
    v, _ = _pad_to(v, 2, block_k)
    tq_pad, tk_pad = q.shape[2], k.shape[2]

    if lengths is None:
        lengths = jnp.full((b,), tk, jnp.int32)
    lens_bh = jnp.repeat(jnp.asarray(lengths, jnp.int32), h)  # (B*H,)

    bh = b * h
    qf = q.reshape(bh, tq_pad, d)
    kf = k.reshape(bh, tk_pad, d)
    vf = v.reshape(bh, tk_pad, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k,
                          seq_k_pad=tk_pad),
        grid=(bh, tq_pad // block_q),
        in_specs=[
            # whole lengths vector in SMEM; each program indexes its row
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
        interpret=interpret,
    )(lens_bh, qf, kf, vf)
    out = out.reshape(b, h, tq_pad, d)
    return out[:, :, :tq0]


def _flash_fwd(q, k, v, lengths, scale, block_q, block_k, interpret=False):
    return (_flash_forward(q, k, v, lengths, scale, block_q, block_k, interpret),
            (q, k, v, lengths))


def _flash_bwd(scale, block_q, block_k, interpret, residuals, g):
    q, k, v, lengths = residuals
    d = q.shape[-1]
    s = scale if scale is not None else 1.0 / np.sqrt(d)
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_attention(q_, k_, v_, s, lengths), q, k, v)
    dq, dk, dv = vjp(g)
    dlen = (None if lengths is None
            else np.zeros(np.shape(lengths), jax.dtypes.float0))
    return dq, dk, dv, dlen


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_available():
    return jax.default_backend() == "tpu"
