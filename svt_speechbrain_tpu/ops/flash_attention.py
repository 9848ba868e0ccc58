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

Forward and backward are both Pallas kernels (FlashAttention-2 schedule):
the forward additionally emits the per-row logsumexp when taken under
``jax.grad``; the backward recomputes probability panels from (q, k, lse)
and runs two programs — dQ over (row, q-block) streaming K/V panels, and
dK/dV over (row, k-block) streaming Q/dO panels — so *training* never
materializes a (Tq, Tk) score tensor either. Per-row length masking
applies in every kernel; padded key panels are skipped, not computed.

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


# ---------------------------------------------------------------------------
# In-kernel attention dropout
# ---------------------------------------------------------------------------
#
# The dropout mask is a pure function of (seed, row, q_idx, k_idx) built from
# chained murmur3 finalizers (fmix32) over GLOBAL score coordinates, in plain
# uint32 jnp ops. Three consequences the TPU-builtin PRNG can't give:
#   * the forward, dQ and dK/dV kernels regenerate identical bits no matter
#     how their grids/loops tile the score matrix (coordinates, not call
#     order, define the stream);
#   * the same function runs under the Pallas interpreter and in XLA, so CPU
#     tests can compare the flash path against an einsum path using the
#     exact same mask (pltpu.prng_random_bits is stubbed to zeros in
#     interpret mode);
#   * masks are reproducible from Python for debugging.
# Cost: ~12 VPU ops per score element, noise next to the panel matmuls.

_FMIX_C1 = np.uint32(0x85EBCA6B)
_FMIX_C2 = np.uint32(0xC2B2AE35)
_GOLDEN = np.uint32(0x9E3779B9)


def _fmix32(h):
    """murmur3 avalanche finalizer on uint32."""
    h = h ^ (h >> 16)
    h = h * _FMIX_C1
    h = h ^ (h >> 13)
    h = h * _FMIX_C2
    h = h ^ (h >> 16)
    return h


def _dropout_bits(seed, row, q_idx, k_idx):
    """uint32 bits for score positions (q_idx, k_idx) of flattened row
    ``row``. ``seed``/``row`` are scalars; q_idx/k_idx broadcastable int32
    arrays. All inputs are hashed, not concatenated, so no counter overflow
    at whole-song sizes."""
    h0 = _fmix32(jnp.asarray(seed).astype(jnp.uint32)
                 ^ (jnp.asarray(row).astype(jnp.uint32) * _GOLDEN))
    hq = _fmix32(q_idx.astype(jnp.uint32) * _FMIX_C2 ^ h0)
    return _fmix32(k_idx.astype(jnp.uint32) * _FMIX_C1 ^ hq)


def _keep_scale(bits, rate):
    """0 where dropped, 1/(1-rate) where kept (drop prob = ``rate``)."""
    thresh = np.uint32(min(int(rate * 2 ** 32), 2 ** 32 - 1))
    return jnp.where(bits >= thresh, np.float32(1.0 / (1.0 - rate)),
                     np.float32(0.0))


def attention_dropout_mask(seed, b, h, tq, tk, rate):
    """XLA twin of the in-kernel mask for row-major (B, H) flattening:
    (B, H, Tq, Tk) multiplier array (0 or 1/(1-rate)). Used by equivalence
    tests and by einsum fallbacks that must match the flash path bit for
    bit.

    Example
    -------
    >>> import numpy as np
    >>> m = attention_dropout_mask(seed=7, b=1, h=2, tq=8, tk=8, rate=0.5)
    >>> m.shape
    (1, 2, 8, 8)
    >>> sorted(set(np.asarray(m).ravel().tolist()))   # dropped or 1/(1-p)
    [0.0, 2.0]
    """
    seed = jnp.asarray(seed, jnp.uint32)
    rows = jnp.arange(b * h, dtype=jnp.uint32).reshape(b * h, 1, 1)
    q_idx = jnp.arange(tq, dtype=jnp.int32).reshape(1, tq, 1)
    k_idx = jnp.arange(tk, dtype=jnp.int32).reshape(1, 1, tk)
    h0 = _fmix32(seed ^ (rows * _GOLDEN))
    hq = _fmix32(q_idx.astype(jnp.uint32) * _FMIX_C2 ^ h0)
    bits = _fmix32(k_idx.astype(jnp.uint32) * _FMIX_C1 ^ hq)
    return _keep_scale(bits, rate).reshape(b, h, tq, tk)


def _fwd_recurrence(len_ref, seed_ref, q_ref, k_ref, v_ref, *, scale,
                    block_k, seq_k_pad, dropout_rate):
    """Shared forward body: stream K/V panels with running max/sum (the
    flash-attention recurrence). Matmul inputs stay in the input dtype
    (bf16 on the MXU fast path) with f32 accumulation. Panels beyond this
    row's valid length are skipped; the boundary panel's columns are
    masked. Returns (out_block, m_final, l_final).

    With ``dropout_rate`` > 0 the accumulator uses mask-scaled
    probabilities while ``l`` keeps the un-dropped sum: dropout applies
    AFTER softmax normalization, and normalization is the per-row scalar
    ``l`` — so out = (softmax(S) ∘ M/(1-p)) · V exactly, panel by panel."""
    q = q_ref[0]  # (BQ, D), input dtype
    bq, d = q.shape
    row = pl.program_id(0)
    length = len_ref[row]  # this row's valid key count
    qb = pl.program_id(1)

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
        p_acc = p
        if dropout_rate > 0.0:
            q_idx = qb * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            bits = _dropout_bits(seed_ref[0], row, q_idx, col)
            p_acc = p * _keep_scale(bits, dropout_rate)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p_acc.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    # only the panels that contain valid keys run (zero-length rows skip all)
    n_k = jnp.minimum((length + block_k - 1) // block_k, seq_k_pad // block_k)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m_final, l_final, acc = jax.lax.fori_loop(0, n_k, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l_final, 1e-30)[:, None]
    return out, m_final, l_final


def _flash_kernel(len_ref, seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale,
                  block_k, seq_k_pad, dropout_rate):
    out, _, _ = _fwd_recurrence(len_ref, seed_ref, q_ref, k_ref, v_ref,
                                scale=scale, block_k=block_k,
                                seq_k_pad=seq_k_pad,
                                dropout_rate=dropout_rate)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_kernel_lse(len_ref, seed_ref, q_ref, k_ref, v_ref, o_ref,
                      lse_ref, *, scale, block_k, seq_k_pad, dropout_rate):
    """Training-path forward: also emit the per-row logsumexp
    L = m + log(l) the backward needs to rebuild probability panels.

    ``lse_ref`` is a full (1, 1, Tq_pad) row block shared by all q-block
    programs of the same row (Mosaic constrains trailing block dims to
    (8k, 128k) or the exact array dims — a (1, block_q) vector block is
    rejected); each program writes its slice."""
    out, m_final, l_final = _fwd_recurrence(
        len_ref, seed_ref, q_ref, k_ref, v_ref, scale=scale,
        block_k=block_k, seq_k_pad=seq_k_pad, dropout_rate=dropout_rate)
    o_ref[0] = out.astype(o_ref.dtype)
    bq = out.shape[0]
    j = pl.program_id(1)
    lse_ref[0, 0, pl.ds(j * bq, bq)] = jnp.where(
        l_final > 0.0, m_final + jnp.log(jnp.maximum(l_final, 1e-30)),
        NEG_INF)


def _flash_bwd_dq_kernel(len_ref, seed_ref, q_ref, do_ref, lse_ref,
                         delta_ref, k_ref, v_ref, dq_ref, *, scale, block_k,
                         seq_k_pad, dropout_rate):
    """dQ program for one (row, q-block): stream K/V panels, rebuild
    P = exp(S − L), dS = P ∘ (dO·Vᵀ − Δ), accumulate dQ += scale · dS·K.
    Same skip/mask schedule as the forward. With dropout, dO·Vᵀ is
    mask-scaled before the softmax vjp (Δ = rowsum(dO ∘ O) already sums
    the DROPPED weights since O was computed with them, so the identity
    Σ_j W_j dW_j = Δ still holds)."""
    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    bq, d = q.shape
    row = pl.program_id(0)
    j = pl.program_id(1)
    lse = lse_ref[0, 0, pl.ds(j * bq, bq)]
    delta = delta_ref[0, 0, pl.ds(j * bq, bq)]
    length = len_ref[row]

    def body(ki, acc):
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        valid = col < length
        # explicit where (not exp of NEG_INF−NEG_INF) so fully-masked rows
        # stay exactly zero
        p = jnp.where(valid, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            q_idx = j * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            bits = _dropout_bits(seed_ref[0], row, q_idx, col)
            dp = dp * _keep_scale(bits, dropout_rate)
        ds = p * (dp - delta[:, None]) * scale
        return acc + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    n_k = jnp.minimum((length + block_k - 1) // block_k, seq_k_pad // block_k)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    acc = jax.lax.fori_loop(0, n_k, body, acc0)
    dq_ref[0] = acc.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(len_ref, seed_ref, q_ref, do_ref, lse_ref,
                          delta_ref, k_ref, v_ref, dk_ref, dv_ref, *, scale,
                          block_q, seq_q_pad, dropout_rate):
    """dK/dV program for one (row, k-block): stream Q/dO panels,
    dV += Pᵀ·dO and dK += scale · dSᵀ·Q. A k-block entirely beyond this
    row's valid length writes zeros without compute. With dropout,
    dV accumulates the mask-scaled probabilities (the weights the forward
    actually used) and dK's dS gets the mask-scaled dO·Vᵀ — masks
    regenerate bit-identically from global coordinates."""
    k = k_ref[0]
    v = v_ref[0]
    bk, d = k.shape
    i = pl.program_id(0)
    j = pl.program_id(1)
    length = len_ref[i]
    col = j * bk + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)[0]

    @pl.when(j * bk >= length)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    @pl.when(j * bk < length)
    def _():
        def body(qi, carry):
            dk_acc, dv_acc = carry
            q = q_ref[0, pl.ds(qi * block_q, block_q), :]
            do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
            lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)]
            delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            valid = col[None, :] < length
            p = jnp.where(valid, jnp.exp(s - lse[:, None]), 0.0)
            dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            p_v = p
            if dropout_rate > 0.0:
                q_idx = qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, bk), 0)
                k_idx = col[None, :] + jnp.zeros((block_q, bk), jnp.int32)
                bits = _dropout_bits(seed_ref[0], i, q_idx, k_idx)
                m = _keep_scale(bits, dropout_rate)
                p_v = p * m
                dp = dp * m
            dv_acc = dv_acc + jax.lax.dot_general(
                p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - delta[:, None]) * scale
            dk_acc = dk_acc + jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return dk_acc, dv_acc

        n_q = seq_q_pad // block_q
        z = jnp.zeros((bk, d), jnp.float32)
        dk_acc, dv_acc = jax.lax.fori_loop(0, n_q, body, (z, z))
        dk_ref[0] = dk_acc.astype(dk_ref.dtype)
        dv_ref[0] = dv_acc.astype(dv_ref.dtype)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 9))
def flash_attention(q, k, v, lengths=None, scale=None, block_q=256,
                    block_k=512, interpret=False, dropout_seed=None,
                    dropout_rate=0.0):
    """q, k, v: (B, H, T, D) → (B, H, Tq, D). Full attention over each row's
    first ``lengths[b]`` keys (``lengths`` (B,) int; None = all Tk valid).

    Defaults (block_q=256, block_k=512) measured fastest on v5e (≈1.6× XLA
    at T=2048; larger blocks thrash VMEM). ``interpret=True`` runs the Pallas
    interpreter (CPU tests).

    ``dropout_rate`` > 0 applies attention dropout INSIDE the kernels
    (forward and both backward programs regenerate the identical mask from
    ``dropout_seed`` + global score coordinates), so training configs with
    ``attention_dropout`` keep the fused path. ``dropout_seed``: int32
    scalar (fold a fresh one per step from the step rng);
    ``attention_dropout_mask`` reproduces the mask in XLA for tests.

    Example
    -------
    >>> import jax, jax.numpy as jnp, numpy as np
    >>> q, k, v = (jax.random.normal(kk, (1, 2, 64, 16))
    ...            for kk in jax.random.split(jax.random.PRNGKey(0), 3))
    >>> out = flash_attention(q, k, v, interpret=True,  # interpret: CPU test
    ...                       block_q=32, block_k=32)
    >>> ref = _xla_attention(q, k, v, scale=1 / np.sqrt(16))
    >>> out.shape, bool(jnp.allclose(out, ref, atol=1e-5))
    ((1, 2, 64, 16), True)
    """
    if dropout_rate > 0.0 and dropout_seed is None:
        # a silent seed-0 default would apply the SAME structured mask at
        # every training step — systematic link removal, not dropout
        raise ValueError(
            "flash_attention: dropout_rate > 0 requires dropout_seed "
            "(fold a fresh int32 seed per step from the step rng)")
    return _flash_forward(q, k, v, lengths, scale, block_q, block_k,
                          interpret, dropout_seed=dropout_seed,
                          dropout_rate=dropout_rate)


def _prepare(q, k, v, lengths, scale, block_q, block_k):
    """Shared padding/flattening for forward and backward pallas calls."""
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
    return (qf, kf, vf, lens_bh, scale, block_q, block_k,
            b, h, tq0, tq_pad, tk_pad, d)


def _seed_arr(dropout_seed):
    if dropout_seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(dropout_seed, jnp.int32).reshape(1)


def _flash_forward(q, k, v, lengths, scale, block_q, block_k,
                   interpret=False, return_lse=False, dropout_seed=None,
                   dropout_rate=0.0):
    (qf, kf, vf, lens_bh, scale, block_q, block_k,
     b, h, tq0, tq_pad, tk_pad, d) = _prepare(
        q, k, v, lengths, scale, block_q, block_k)
    bh = b * h

    qspec = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, tk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    common = dict(
        grid=(bh, tq_pad // block_q),
        in_specs=[
            # whole lengths vector + dropout seed in SMEM
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec, kspec, kspec,
        ],
        interpret=interpret,
    )
    seed = _seed_arr(dropout_seed)
    if return_lse:
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel_lse, scale=scale,
                              block_k=block_k, seq_k_pad=tk_pad,
                              dropout_rate=dropout_rate),
            out_specs=(qspec,
                       pl.BlockSpec((1, 1, tq_pad), lambda i, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
                       jax.ShapeDtypeStruct((bh, 1, tq_pad), jnp.float32)),
            **common,
        )(lens_bh, seed, qf, kf, vf)
        return out.reshape(b, h, tq_pad, d)[:, :, :tq0], lse
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k,
                          seq_k_pad=tk_pad, dropout_rate=dropout_rate),
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
        **common,
    )(lens_bh, seed, qf, kf, vf)
    return out.reshape(b, h, tq_pad, d)[:, :, :tq0]


def _flash_fwd(q, k, v, lengths, scale, block_q, block_k, interpret,
               dropout_seed, dropout_rate):
    out, lse = _flash_forward(q, k, v, lengths, scale, block_q, block_k,
                              interpret, return_lse=True,
                              dropout_seed=dropout_seed,
                              dropout_rate=dropout_rate)
    return out, (q, k, v, lengths, dropout_seed, out, lse)


def _flash_bwd(scale, block_q, block_k, interpret, dropout_rate,
               residuals, g):
    """FlashAttention-2 backward: Δ = rowsum(dO ∘ O) in XLA (one fused
    elementwise-reduce), then two Pallas programs — dQ over (row, q-block)
    and dK/dV over (row, k-block) — rebuilding probability panels from the
    saved logsumexp. No (Tq, Tk) tensor is ever materialized."""
    q, k, v, lengths, dropout_seed, out, lse = residuals
    had_lengths = lengths is not None
    had_seed = dropout_seed is not None
    seed = _seed_arr(dropout_seed)
    (qf, kf, vf, lens_bh, scale, block_q, block_k,
     b, h, tq0, tq_pad, tk_pad, d) = _prepare(
        q, k, v, lengths, scale, block_q, block_k)
    bh = b * h

    g_pad, _ = _pad_to(g, 2, block_q)
    o_pad, _ = _pad_to(out, 2, block_q)
    dof = g_pad.reshape(bh, tq_pad, d)
    of = o_pad.reshape(bh, tq_pad, d)
    delta = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                    axis=-1)[:, None, :]  # (bh, 1, tq_pad), like lse

    len_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    q_block = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    q_all = pl.BlockSpec((1, tq_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    k_block = pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    k_all = pl.BlockSpec((1, tk_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    row_all = pl.BlockSpec((1, 1, tq_pad), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale,
                          block_k=block_k, seq_k_pad=tk_pad,
                          dropout_rate=dropout_rate),
        grid=(bh, tq_pad // block_q),
        in_specs=[len_spec, len_spec, q_block, q_block, row_all, row_all,
                  k_all, k_all],
        out_specs=q_block,
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
        interpret=interpret,
    )(lens_bh, seed, qf, dof, lse, delta, kf, vf)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          block_q=block_q, seq_q_pad=tq_pad,
                          dropout_rate=dropout_rate),
        grid=(bh, tk_pad // block_k),
        in_specs=[len_spec, len_spec, q_all, q_all, row_all, row_all,
                  k_block, k_block],
        out_specs=(k_block, k_block),
        out_shape=(jax.ShapeDtypeStruct((bh, tk_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, tk_pad, d), v.dtype)),
        interpret=interpret,
    )(lens_bh, seed, qf, dof, lse, delta, kf, vf)

    tk0 = k.shape[2]
    dq = dq.reshape(b, h, tq_pad, d)[:, :, :tq0]
    dk = dk.reshape(b, h, tk_pad, d)[:, :, :tk0]
    dv = dv.reshape(b, h, tk_pad, d)[:, :, :tk0]
    dlen = (None if not had_lengths
            else np.zeros(np.shape(lengths), jax.dtypes.float0))
    dseed = (None if not had_seed
             else np.zeros(np.shape(dropout_seed), jax.dtypes.float0))
    return dq, dk, dv, dlen, dseed


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention_available():
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Short-sequence fused attention
# ---------------------------------------------------------------------------
#
# The streaming kernel above launches one program per (batch·head, q-block).
# At the AMT recipe's 5 s windows (B=192, H=16, T=249) that is 3072 programs
# of ~2 µs each — grid overhead alone costs more than the XLA einsum path
# (measured 6.7 ms vs 6.0 ms on v5e). But the einsum path materializes the
# (B, H, T, T) f32 score tensor in HBM (762 MB at these shapes), so ~3.3 ms
# of its in-context time is pure bandwidth. For short rows the whole
# (T, T) score tile fits in VMEM: this kernel processes GROUP heads per
# program (grid B·H/GROUP), computing each head's scores → masked softmax →
# context entirely on-chip. Measured 4.6× faster than the einsum chain at
# the flagship shapes (0.72 ms vs 3.3 ms per layer's attention core).

SHORT_T_MAX = 512  # rows longer than this stream K/V panels instead


def _flash_short_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale, group):
    """One program = GROUP consecutive (batch·head) rows, full attention in
    VMEM. The per-head matmuls are (Tq, D)·(D, Tk) with D=64 — individually
    small for the MXU, which is why several heads share one program."""
    i = pl.program_id(0)
    for g in range(group):
        q = q_ref[g]                            # (Tq_pad, D)
        k = k_ref[g]
        v = v_ref[g]
        length = len_ref[i * group + g]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = col < length
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        # explicit where: for fully-padded rows (length == 0) every s == m ==
        # NEG_INF (finite), so exp(s - m) would be 1 — mask to emit zeros
        # like the streaming kernel
        p = jnp.where(valid, jnp.exp(s - m), 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.maximum(l, 1e-30)
        o_ref[g] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _short_forward(q, k, v, lengths, scale, group, interpret):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    # pad Tq to sublane multiple, Tk to lane multiple
    q, tq0 = _pad_to(q, 2, 8)
    k, _ = _pad_to(k, 2, 128)
    v, _ = _pad_to(v, 2, 128)
    tq_pad, tk_pad = q.shape[2], k.shape[2]
    if lengths is None:
        lengths = jnp.full((b,), tk, jnp.int32)
    lens_bh = jnp.repeat(jnp.asarray(lengths, jnp.int32), h)
    bh = b * h
    g = group
    # VMEM budget: keep the program's K/V panels ≤ ~16 grouped rows at
    # Tk≤256 (measured fastest on v5e; group=32 OOMs), half that at 512
    while g > 1 and g * tk_pad > 16 * 256:
        g //= 2
    while bh % g:
        g //= 2
    qf = q.reshape(bh, tq_pad, d)
    kf = k.reshape(bh, tk_pad, d)
    vf = v.reshape(bh, tk_pad, d)
    out = pl.pallas_call(
        functools.partial(_flash_short_kernel, scale=scale, group=g),
        grid=(bh // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((g, tq_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tk_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tk_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, tq_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
        interpret=interpret,
    )(lens_bh, qf, kf, vf)
    return out.reshape(b, h, tq_pad, d)[:, :, :tq0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_short(q, k, v, lengths=None, scale=None, group=16,
                          interpret=False):
    """Fused short-row attention: q, k, v (B, H, T, D) → (B, H, Tq, D), full
    softmax over each row's first ``lengths[b]`` keys. Use when
    Tk ≤ ``SHORT_T_MAX``; the backward differentiates the einsum formulation
    (materializing (T, T) is fine at these sizes, and the backward only runs
    in training where the einsum path is used anyway)."""
    return _short_forward(q, k, v, lengths, scale, group, interpret)


def _short_fwd(q, k, v, lengths, scale, group, interpret):
    out = _short_forward(q, k, v, lengths, scale, group, interpret)
    return out, (q, k, v, lengths)


def _short_bwd(scale, group, interpret, residuals, grad):
    q, k, v, lengths = residuals
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale,
                                                       lengths), q, k, v)
    dq, dk, dv = vjp(grad)
    dlen = (None if lengths is None
            else np.zeros(np.shape(lengths), jax.dtypes.float0))
    return dq, dk, dv, dlen


flash_attention_short.defvjp(_short_fwd, _short_bwd)
