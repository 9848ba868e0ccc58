"""Pallas TPU fused wav2vec2 conv frontend.

The 7-layer strided-conv waveform extractor (k=(10,3,3,3,3,2,2),
s=(5,2,2,2,2,2,2), 512 channels, per-frame LayerNorm + GELU after every
layer — HF ``Wav2Vec2FeatureEncoder``, "layer" norm mode) is the second-
biggest block of the AMT forward (~23% at batch 64 on v5e). XLA runs each
conv as its own HBM round trip: the layer-1 activation alone is
(B, ~16k, 512) — gigabytes of traffic per batch across the stack.

This kernel computes a TILE of final frames end-to-end in VMEM: each output
frame depends on only 400 input samples (total stride 320), so a tile of F
frames needs a 320·F+80-sample input span; all seven layers run as matmuls
on the MXU with conv bias + LayerNorm + GELU fused between them, and only
the (F, 512) result is written back. Strided k=3/k=2 windows are built by
an even/odd row split (reshape to (n/2, 2, C)) — no gather:

    out[i] = h[2i]·W0 + h[2i+1]·W1 (+ h[2i+2]·W2)
           = even[i]·W0 + odd[i]·W1 (+ even[i+1]·W2)

Forward-only: training keeps the XLA convs (autodiff); inference and
stop-gradient forwards (e.g. the frozen feature extractor of the MIR-ST500
recipe) can dispatch here.

Tile size F=32 fits the whole weight stack (bf16, ~8 MB) plus the deepest
intermediate (~2 MB) in VMEM.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

KERNELS = (10, 3, 3, 3, 3, 2, 2)
STRIDES = (5, 2, 2, 2, 2, 2, 2)
TOTAL_STRIDE = int(np.prod(STRIDES))          # 320
RECEPTIVE = 400                                # samples per output frame
TILE_F = 32                                    # output frames per program


def tile_input_len(f):
    return TOTAL_STRIDE * f + (RECEPTIVE - TOTAL_STRIDE)  # 320F + 80


def _layer_lens(span):
    """Static per-layer output lengths for one tile."""
    lens = []
    n = span
    for k, s in zip(KERNELS, STRIDES):
        n = (n - k) // s + 1
        lens.append(n)
    return lens


def _ln_gelu(h32, scale, bias, eps=1e-5, use_tanh=False):
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h32 - mean), axis=-1, keepdims=True)
    y = (h32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    if use_tanh:
        # tanh GELU: sub-ULP-equal to erf GELU at bf16 output precision
        # (see nnet.activations.fast_gelu) and ~25% faster for the whole
        # frontend — the VPU transcendental is the kernel's bottleneck
        # (measured 66.4 → 49.8 ms at B=192, 5 s windows on v5e)
        return 0.5 * y * (1.0 + jnp.tanh(
            0.7978845608028654 * (y + 0.044715 * y * y * y)))
    return 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7 — below f32
    gelu noise); Mosaic has no erf/erfc primitive."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _frontend_kernel(win_ref, w0_ref, wk_ref, bias_ref, ln_ref, out_ref,
                     *, dtype, lens, tile_f, fold0=1, c=512):
    """One (batch, tile) program: layer-0 windows (1, n1, 16) → frames
    (1, F, C). The first-layer im2col happens outside (the sample tensor is
    tiny); everything from the first matmul on stays in VMEM.

    ``fold0 > 1`` widens the layer-0 contraction (docs/PERF.md residual
    lever): ``fold0`` consecutive outputs share one window row, so the dot
    is (n1/fold0, 5·fold0+5↑16)·(K, fold0·C) — K grows as fast as the MXU
    contraction fills — and the result reshapes back to (n1, C) rows."""
    use_tanh = dtype == jnp.bfloat16
    win = win_ref[0]                           # (n1/fold0, K)
    h32 = jax.lax.dot(win.astype(dtype), w0_ref[...].astype(dtype),
                      preferred_element_type=jnp.float32)
    if fold0 > 1:                              # (g, fold0*C) -> (g*fold0, C)
        h32 = h32.reshape(h32.shape[0] * fold0, c)
    h32 = h32 + bias_ref[0].astype(jnp.float32)
    h = _ln_gelu(h32, ln_ref[0, 0].astype(jnp.float32),
                 ln_ref[0, 1].astype(jnp.float32),
                 use_tanh=use_tanh).astype(dtype)
    h = h[:lens[0]]

    for i, k in enumerate(KERNELS[1:], start=1):
        n_out = lens[i]
        c = h.shape[1]
        if h.shape[0] % 2:
            h = jnp.concatenate([h, jnp.zeros((1, c), h.dtype)], 0)
        # even/odd rows via the contiguous (n, C) -> (n/2, 2C) view: row
        # pairs become lane halves (128-aligned lane slices, no gather)
        pairs = h.reshape(h.shape[0] // 2, 2 * c)
        even = jax.lax.slice(pairs, (0, 0), (pairs.shape[0], c))
        odd = jax.lax.slice(pairs, (0, c), (pairs.shape[0], 2 * c))
        acc = jax.lax.dot(even[:n_out], wk_ref[i - 1, 0].astype(dtype),
                          preferred_element_type=jnp.float32)
        acc += jax.lax.dot(odd[:n_out], wk_ref[i - 1, 1].astype(dtype),
                           preferred_element_type=jnp.float32)
        if k == 3:
            acc += jax.lax.dot(even[1:n_out + 1],
                               wk_ref[i - 1, 2].astype(dtype),
                               preferred_element_type=jnp.float32)
        acc = acc + bias_ref[i].astype(jnp.float32)
        h = _ln_gelu(acc, ln_ref[i, 0].astype(jnp.float32),
                     ln_ref[i, 1].astype(jnp.float32),
                     use_tanh=use_tanh).astype(dtype)

    out_ref[0] = h[:tile_f].astype(out_ref.dtype)


def _fold_k(fold0):
    """Layer-0 window width for a fold: 5·(fold0-1)+10 samples, 16-aligned."""
    return -(-(5 * (fold0 - 1) + 10) // 16) * 16


def pack_weights(params, conv_dim=(512,) * 7, dtype=jnp.bfloat16, fold0=1):
    """Framework conv-extractor params ("layer" norm mode) → packed kernel
    arrays: w0 (16, C) (k=10 zero-padded), wk (6, 3, C, C) per-tap matrices
    (zero third tap for the k=2 layers), bias (7, C), ln (7, 2, C).

    ``fold0 > 1`` packs w0 as the widened (K, fold0·C) block-shift matrix:
    output j of a fold reads samples [5j, 5j+10), so column block j holds
    the 10 conv taps at row offset 5j."""
    c = conv_dim[0]
    w0_taps = jnp.asarray(params["0"]["conv"]["w"], jnp.float32)[:, 0, :]
    if fold0 == 1:
        w0 = jnp.zeros((16, c), jnp.float32).at[:10].set(w0_taps)
    else:
        w0 = jnp.zeros((_fold_k(fold0), fold0 * c), jnp.float32)
        for j in range(fold0):
            w0 = w0.at[5 * j:5 * j + 10, j * c:(j + 1) * c].set(w0_taps)
    wk_rows, bias_rows = [], []
    for i in range(7):
        conv = params[str(i)]["conv"]
        bias_rows.append(jnp.asarray(conv["b"], jnp.float32) if "b" in conv
                         else jnp.zeros((c,), jnp.float32))
        if i >= 1:
            w = jnp.asarray(conv["w"], jnp.float32)  # (k, C, C)
            if w.shape[0] < 3:
                w = jnp.concatenate(
                    [w, jnp.zeros((3 - w.shape[0], c, c), jnp.float32)], 0)
            wk_rows.append(w)
    wk = jnp.stack(wk_rows)
    bias = jnp.stack(bias_rows)
    lns = jnp.stack([
        jnp.stack([jnp.asarray(params[str(i)]["layer_norm"]["scale"], jnp.float32),
                   jnp.asarray(params[str(i)]["layer_norm"]["bias"], jnp.float32)])
        for i in range(7)])
    return (w0.astype(dtype), wk.astype(dtype), bias, lns)


def fused_conv_frontend(params, wav, conv_dim=(512,) * 7, interpret=False,
                        tile_f=TILE_F, packed=None, fold0=1):
    """wav (B, T) → frames (B, F_total, C) through the fused kernel
    ("layer" norm mode only; group-norm frontends need global time
    statistics and stay on the XLA path). ``fold0`` widens the layer-0
    contraction (see ``_frontend_kernel``); ``packed`` must then come from
    ``pack_weights(..., fold0=fold0)``.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> c, kernels = 8, (10, 3, 3, 3, 3, 2, 2)
    >>> keys = jax.random.split(jax.random.PRNGKey(1), 7)
    >>> params = {str(i): {
    ...     "conv": {"w": 0.3 * jax.random.normal(
    ...                  keys[i], (kernels[i], 1 if i == 0 else c, c)),
    ...              "b": jnp.zeros((c,))},
    ...     "layer_norm": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}}
    ...     for i in range(7)}
    >>> wav = jax.random.normal(jax.random.PRNGKey(2), (1, 1120))
    >>> out = fused_conv_frontend(params, wav, conv_dim=(c,) * 7,
    ...                           interpret=True, tile_f=4)
    >>> ref = _xla_reference(params, wav, (c,) * 7)
    >>> out.shape, bool(jnp.allclose(out, ref, atol=1e-3))
    ((1, 3, 8), True)
    """
    b, t = wav.shape
    c = conv_dim[0]
    interpret = interpret or jax.default_backend() != "tpu"
    f_total = (t - RECEPTIVE) // TOTAL_STRIDE + 1
    n_tiles = -(-f_total // tile_f)
    span = tile_input_len(tile_f)
    lens = _layer_lens(span)
    # overlapped tile views (cheap: duplicates only the 80-sample halo)
    starts = np.arange(n_tiles) * (tile_f * TOTAL_STRIDE)
    pad_to = int(starts[-1]) + span
    wav_p = jnp.pad(wav, ((0, 0), (0, max(0, pad_to - t))))
    idx = starts[:, None] + np.arange(span)[None, :]
    tiles = wav_p[:, idx]                      # (B, n_tiles, span)

    dtype = jnp.bfloat16 if wav.dtype == jnp.bfloat16 else jnp.float32
    # layer-0 im2col outside the kernel: the windows tensor is tiny
    # (BN, n1, 16) vs the 512-channel activations the kernel keeps in VMEM
    bn_ = b * n_tiles
    a = tiles.reshape(bn_, span // 5, 5)
    if fold0 == 1:
        win = jnp.concatenate(
            [a[:, :-1], a[:, 1:],
             jnp.zeros((bn_, a.shape[1] - 1, 6), tiles.dtype)], axis=-1)
    else:
        # one window row per fold of fold0 outputs: fold g reads a-rows
        # [g*fold0, g*fold0 + fold0] (5·fold0+5 samples), zero-padded to K
        kf = _fold_k(fold0)
        n_groups = -(-lens[0] // fold0)
        need = n_groups * fold0 + 1
        if need > a.shape[1]:
            a = jnp.pad(a, ((0, 0), (0, need - a.shape[1]), (0, 0)))
        rows = (np.arange(n_groups) * fold0)[:, None] + np.arange(fold0 + 1)
        win = a[:, rows].reshape(bn_, n_groups, 5 * (fold0 + 1))
        win = jnp.pad(win, ((0, 0), (0, 0), (0, kf - win.shape[2])))
    if packed is None:
        packed = pack_weights(params, conv_dim, dtype, fold0=fold0)
    w0, wk, bias, lns = packed

    kern = functools.partial(_frontend_kernel, dtype=dtype, lens=lens,
                             tile_f=tile_f, fold0=fold0, c=c)
    bn = b * n_tiles
    out = pl.pallas_call(
        kern,
        grid=(bn,),
        in_specs=[
            pl.BlockSpec((1, win.shape[1], win.shape[2]),
                         lambda i: (i, 0, 0)),
            pl.BlockSpec(w0.shape, lambda i: (0, 0)),
            pl.BlockSpec((6, 3, c, c), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((7, c), lambda i: (0, 0)),
            pl.BlockSpec((7, 2, c), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_f, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bn, tile_f, c), wav.dtype),
        interpret=interpret,
    )(win, w0, wk, bias, lns)
    return out.reshape(b, n_tiles * tile_f, c)[:, :f_total]


def _xla_reference(params, wav, conv_dim):
    """The plain XLA conv path (same math as
    ``models.wav2vec2.ConvFeatureExtractor`` in "layer" mode) — used as the
    recompute backward for the fused forward."""
    from svt_speechbrain_tpu.nnet.cnn import Conv1d
    from svt_speechbrain_tpu.nnet.normalization import layer_norm

    x = wav[..., None]
    in_ch = 1
    for i, (dim, k, s) in enumerate(zip(conv_dim, KERNELS, STRIDES)):
        conv = Conv1d(dim, k, in_ch, stride=s, padding="valid",
                      bias="b" in params[str(i)]["conv"])
        x = conv(params[str(i)]["conv"], x)
        x = layer_norm(x, params[str(i)]["layer_norm"]["scale"],
                       params[str(i)]["layer_norm"]["bias"])
        from svt_speechbrain_tpu.nnet.activations import fast_gelu
        x = fast_gelu(x)
        in_ch = dim
    return x


@jax.custom_vjp
def fused_conv_frontend_vjp(params, wav):
    """Fused Pallas forward with an XLA-recompute backward, so the fast
    inference kernel is safe to leave in a differentiated graph (e.g. an
    unfrozen extractor): the backward re-runs the standard conv VJP."""
    return fused_conv_frontend(params, wav,
                               conv_dim=_conv_dim_of(params))


def _conv_dim_of(params):
    return tuple(params[str(i)]["conv"]["w"].shape[-1]
                 for i in range(len(params)))


def _fused_fwd(params, wav):
    return fused_conv_frontend(params, wav,
                               conv_dim=_conv_dim_of(params)), (params, wav)


def _fused_bwd(res, g):
    params, wav = res
    _, vjp = jax.vjp(
        lambda p, w: _xla_reference(p, w, _conv_dim_of(p)), params, wav)
    return vjp(g)


fused_conv_frontend_vjp.defvjp(_fused_fwd, _fused_bwd)


def can_fuse(config, wav):
    """Dispatch predicate: TPU backend, "layer" norm mode, the wav2vec2
    kernel/stride schedule, uniform lane-aligned channels, and at least one
    full receptive field of samples. Channels must be a multiple of the
    128-lane tile: the kernel's even/odd row split is a (n, C) → (n/2, 2C)
    reshape, which Mosaic only supports when C is lane-aligned (otherwise
    "unsupported shape cast" at compile time — e.g. tiny test configs)."""
    return (jax.default_backend() == "tpu"
            and config.feat_extract_norm == "layer"
            and tuple(config.conv_kernel) == KERNELS
            and tuple(config.conv_stride) == STRIDES
            and len(set(config.conv_dim)) == 1
            and config.conv_dim[0] % 128 == 0
            and wav.ndim == 2 and wav.shape[1] >= RECEPTIVE)
