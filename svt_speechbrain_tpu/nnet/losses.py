"""Length-masked losses (analogue of reference ``speechbrain/nnet/losses.py``).

The reference computes every sequence loss with a uniform scheme
(``compute_masked_loss``, ``losses.py:620-684``): an element-wise loss is
multiplied by a mask derived from *relative* lengths, then reduced as

- ``mean``      : sum(loss*mask) / sum(mask)
- ``batchmean`` : sum(loss*mask) / batch_size
- ``batch``     : per-item sum / per-item mask sum
- ``sum``       : sum(loss*mask)
- anything else : the unreduced masked loss

This module replicates those semantics as pure jnp functions. Time-length
mismatches up to ``allowed_len_diff`` frames are truncated away
(``losses.py:594-617``) — this happens at trace time on static shapes, so it
costs nothing under jit.

The AMT recipe's four loss terms are ``bce_loss`` (onset with pos_weight=15,
offset) and ``nll_loss`` (octave, pitch-class) — see
``MIR_ST500/train_audio_ssl.py:64-76``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def length_to_mask(length, max_len=None, dtype=jnp.float32):
    """Binary mask from absolute lengths (reference ``dataio/dataio.py:661``).

    ``mask[i, t] = t < length[i]`` — float lengths compare without rounding,
    matching the reference exactly.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> length_to_mask(jnp.asarray([2, 3]), max_len=4)
    Array([[1., 1., 0., 0.],
           [1., 1., 1., 0.]], dtype=float32)
    """
    length = jnp.asarray(length)
    if max_len is None:
        raise ValueError("max_len must be static under jit")
    ar = jnp.arange(max_len, dtype=jnp.float32)
    return (ar[None, :] < length[:, None].astype(jnp.float32)).astype(dtype)


def truncate(predictions, targets, allowed_len_diff=3):
    """Trim the time axis (axis 1) so both tensors match
    (reference ``losses.py:594-617``). Static-shape operation."""
    len_diff = predictions.shape[1] - targets.shape[1]
    if len_diff == 0:
        return predictions, targets
    if abs(len_diff) > allowed_len_diff:
        raise ValueError(
            f"Predictions and targets should be same length, but got "
            f"{predictions.shape[1]} and {targets.shape[1]} respectively."
        )
    if len_diff < 0:
        return predictions, targets[:, : predictions.shape[1]]
    return predictions[:, : targets.shape[1]], targets


def compute_masked_loss(loss_fn, predictions, targets, length=None,
                        label_smoothing=0.0, reduction="mean"):
    """Reference ``losses.py:620-684`` semantics. ``length`` is relative
    (len / max_len) as produced by the padded-batch collate."""
    mask = jnp.ones_like(targets, dtype=jnp.float32)
    if length is not None:
        length_mask = length_to_mask(
            jnp.asarray(length) * targets.shape[1], max_len=targets.shape[1]
        )
        # broadcast over any trailing dims
        while length_mask.ndim < mask.ndim:
            length_mask = length_mask[..., None]
        mask = mask * length_mask

    loss = loss_fn(predictions, targets) * mask
    n = loss.shape[0]
    # denominators clamp to >=1: a fully-masked (device-padding) micro-batch
    # must yield 0 loss, not NaN
    if reduction == "mean":
        out = jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)
    elif reduction == "batchmean":
        out = jnp.sum(loss) / n
    elif reduction == "batch":
        out = loss.reshape(n, -1).sum(1) / jnp.maximum(mask.reshape(n, -1).sum(1), 1.0)
    elif reduction == "sum":
        out = jnp.sum(loss)
    else:
        out = loss

    if label_smoothing == 0:
        return out
    # NLL-style smoothing regularizer (reference ``losses.py:672-684``):
    # mean over the CLASS axis (the reference holds (B, C, T)-transposed
    # predictions, so its dim=1 is the class axis; ours are (B, ..., C))
    loss_reg = jnp.mean(predictions, axis=-1) * mask
    if reduction == "mean":
        loss_reg = jnp.sum(loss_reg) / jnp.sum(mask)
    elif reduction == "batchmean":
        loss_reg = jnp.sum(loss_reg) / targets.shape[0]
    elif reduction == "batch":
        loss_reg = loss_reg.sum(1) / mask.sum(1)
    return -label_smoothing * loss_reg + (1 - label_smoothing) * out


def bce_loss(inputs, targets, length=None, weight=None, pos_weight=None,
             reduction="mean", allowed_len_diff=3, label_smoothing=0.0):
    """Binary cross-entropy with logits (reference ``losses.py:452``).

    Numerically-stable formulation:
    ``pos_weight * y * softplus(-x) + (1 - y) * softplus(x)``.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> logits = jnp.asarray([[0.0, 10.0]])
    >>> targets = jnp.asarray([[0.0, 1.0]])
    >>> round(float(bce_loss(logits, targets)), 4)   # softplus(0)/2 ~ 0.3466
    0.3466
    >>> # padding masked out by relative length:
    >>> round(float(bce_loss(logits, targets, length=jnp.asarray([0.5]))), 4)
    0.6931
    """
    if inputs.ndim == targets.ndim + 1:
        inputs = inputs.squeeze(-1)
    if inputs.ndim >= 2:
        inputs, targets = truncate(inputs, targets, allowed_len_diff)
    elif length is not None:
        raise ValueError("length can be passed only for >= 2D inputs.")

    def loss_fn(x, y):
        y = y.astype(jnp.float32)
        x = x.astype(jnp.float32)
        pw = 1.0 if pos_weight is None else jnp.asarray(pos_weight, jnp.float32)
        loss = pw * y * jax.nn.softplus(-x) + (1.0 - y) * jax.nn.softplus(x)
        if weight is not None:
            loss = loss * jnp.asarray(weight, jnp.float32)
        return loss

    return compute_masked_loss(loss_fn, inputs, targets, length,
                               label_smoothing=label_smoothing, reduction=reduction)


def nll_loss(log_probabilities, targets, length=None, label_smoothing=0.0,
             allowed_len_diff=3, reduction="mean"):
    """Negative log-likelihood over log-probabilities
    (reference ``losses.py:402``). Inputs (B, C) + targets (B,) or
    (B, T, C) + targets (B, T).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> logp = jax.nn.log_softmax(jnp.asarray([[0.0, 0.0]]))
    >>> round(float(nll_loss(logp, jnp.asarray([1]))), 4)
    0.6931
    """
    if log_probabilities.ndim == 3:
        log_probabilities, targets = truncate(log_probabilities, targets, allowed_len_diff)

    def loss_fn(logp, tgt):
        return -jnp.take_along_axis(
            logp.astype(jnp.float32), tgt.astype(jnp.int32)[..., None], axis=-1
        ).squeeze(-1)

    return compute_masked_loss(loss_fn, log_probabilities, targets, length,
                               label_smoothing=label_smoothing, reduction=reduction)


def mse_loss(predictions, targets, length=None, allowed_len_diff=3, reduction="mean"):
    """Masked mean-squared error (reference ``losses.py:329``)."""
    predictions, targets = truncate(predictions, targets, allowed_len_diff)
    return compute_masked_loss(lambda p, t: jnp.square(p - t), predictions, targets,
                               length, reduction=reduction)


def l1_loss(predictions, targets, length=None, allowed_len_diff=3, reduction="mean"):
    """Masked L1 error (reference ``losses.py:295``)."""
    predictions, targets = truncate(predictions, targets, allowed_len_diff)
    return compute_masked_loss(lambda p, t: jnp.abs(p - t), predictions, targets,
                               length, reduction=reduction)


def classification_error(probabilities, targets, length=None, allowed_len_diff=3,
                         reduction="mean"):
    """Frame/batch classification error rate (reference ``losses.py:560``)."""
    if probabilities.ndim == 3 and targets.ndim == 2:
        probabilities, targets = truncate(probabilities, targets, allowed_len_diff)

    def loss_fn(probs, tgt):
        pred = jnp.argmax(probs, axis=-1)
        return (pred != tgt).astype(jnp.float32)

    return compute_masked_loss(loss_fn, probabilities, targets, length, reduction=reduction)


def kldiv_loss(log_probabilities, targets, length=None, label_smoothing=0.0,
               allowed_len_diff=3, pad_idx=0, reduction="mean"):
    """KL-divergence loss with optional label smoothing
    (reference ``losses.py:522``). With smoothing, the target distribution puts
    ``1 - ls`` on the target class and ``ls/(C-1)`` elsewhere; pad positions
    (``targets == pad_idx``) are ignored."""
    if label_smoothing <= 0:
        return nll_loss(log_probabilities, targets, length, reduction=reduction)

    bz, time, n_class = log_probabilities.shape
    logp = log_probabilities.reshape(-1, n_class).astype(jnp.float32)
    tgt = targets.reshape(-1).astype(jnp.int32)
    confidence = 1.0 - label_smoothing
    ignore = tgt == pad_idx
    tgt_safe = jnp.where(ignore, 0, tgt)
    true_dist = jnp.full_like(logp, label_smoothing / (n_class - 1))
    true_dist = true_dist.at[jnp.arange(logp.shape[0]), tgt_safe].set(confidence)
    # F.kl_div(logp, q, reduction='none') = q * (log q - logp)
    eps = 1e-20
    loss = true_dist * (jnp.log(true_dist + eps) - logp)
    loss = jnp.where(ignore[:, None], 0.0, loss)

    if reduction == "mean":
        return jnp.sum(loss)  # matches reference's loss.sum().mean()
    if reduction == "batchmean":
        return jnp.sum(loss) / bz
    if reduction == "batch":
        return loss.reshape(bz, -1).sum(1) / jnp.asarray(length)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def ctc_loss(log_probs, targets, input_lens, target_lens, blank_index, reduction="mean"):
    """CTC loss (reference ``losses.py:243``). ``input_lens``/``target_lens``
    are relative lengths; blank handling matches torch's ``ctc_loss``.

    Implemented with ``optax.ctc_loss`` (an XLA-friendly log-space DP), which
    expects paddings instead of lengths and blank id 0 — we remap.
    """
    import optax

    b, t, c = log_probs.shape
    u = targets.shape[1]
    in_len = jnp.round(jnp.asarray(input_lens) * t)
    tg_len = jnp.round(jnp.asarray(target_lens) * u)
    logit_paddings = (jnp.arange(t)[None, :] >= in_len[:, None]).astype(jnp.float32)
    label_paddings = (jnp.arange(u)[None, :] >= tg_len[:, None]).astype(jnp.float32)

    if blank_index != 0:
        # optax assumes blank=0: rotate the class axis so blank lands at 0
        perm = jnp.concatenate([jnp.array([blank_index]),
                                jnp.array([i for i in range(c) if i != blank_index])])
        log_probs = log_probs[:, :, perm]
        remap = jnp.zeros((c,), jnp.int32)
        remap = remap.at[jnp.asarray([i for i in range(c) if i != blank_index])].set(
            jnp.arange(1, c, dtype=jnp.int32))
        targets = remap[targets]

    per_seq = optax.ctc_loss(log_probs, logit_paddings, targets, label_paddings)
    if reduction == "mean":
        return jnp.mean(per_seq / jnp.maximum(tg_len, 1))
    if reduction in ("batchmean", "batch"):
        return per_seq if reduction == "batch" else jnp.mean(per_seq)
    if reduction == "sum":
        return jnp.sum(per_seq)
    return per_seq


def cal_si_snr(source, estimate_source, eps=1e-8):
    """Scale-invariant SNR per (batch, source) in dB
    (reference ``losses.py:130`` cal_si_snr). Shapes (B, T, C)."""
    source = jnp.asarray(source, jnp.float32)
    estimate_source = jnp.asarray(estimate_source, jnp.float32)
    s = source - jnp.mean(source, axis=1, keepdims=True)
    e = estimate_source - jnp.mean(estimate_source, axis=1, keepdims=True)
    dot = jnp.sum(e * s, axis=1, keepdims=True)
    s_energy = jnp.sum(s * s, axis=1, keepdims=True) + eps
    proj = dot * s / s_energy
    noise = e - proj
    ratio = jnp.sum(proj ** 2, axis=1) / (jnp.sum(noise ** 2, axis=1) + eps)
    return 10 * jnp.log10(ratio + eps)  # (B, C)


class PitWrapper:
    """Permutation-invariant training wrapper (reference ``losses.py:86``):
    evaluates ``base_loss`` under every source permutation and takes the best.
    ``base_loss(source, estimate)`` must return per-(batch, source) losses."""

    def __init__(self, base_loss):
        self.base_loss = base_loss

    def __call__(self, source, estimate_source):
        import itertools

        n_src = source.shape[-1]
        losses = []
        for perm in itertools.permutations(range(n_src)):
            permuted = estimate_source[..., list(perm)]
            losses.append(jnp.mean(self.base_loss(source, permuted), axis=-1))
        all_perms = jnp.stack(losses, axis=-1)  # (B, n_perms)
        return jnp.min(all_perms, axis=-1)


def get_si_snr_with_pitwrapper(source, estimate_source):
    """Negative SI-SNR with PIT (reference ``losses.py:760``); scalar mean."""
    pit = PitWrapper(lambda s, e: -cal_si_snr(s, e))
    return jnp.mean(pit(source, estimate_source))


class AngularMargin:
    """Angular-margin scoring for speaker verification heads
    (reference ``losses.py:823``): ``cos(θ)·scale - margin`` on positives."""

    def __init__(self, margin=0.0, scale=1.0):
        self.margin = margin
        self.scale = scale

    def __call__(self, outputs, targets):
        outputs = outputs - self.margin * targets
        return self.scale * outputs


class AdditiveAngularMargin(AngularMargin):
    """ArcFace-style additive angular margin (reference ``losses.py:877``)."""

    def __init__(self, margin=0.0, scale=1.0, easy_margin=False):
        super().__init__(margin, scale)
        import math

        self.easy_margin = easy_margin
        self.cos_m = math.cos(self.margin)
        self.sin_m = math.sin(self.margin)
        self.th = math.cos(math.pi - self.margin)
        self.mm = math.sin(math.pi - self.margin) * self.margin

    def __call__(self, outputs, targets):
        cosine = jnp.clip(outputs, -1 + 1e-7, 1 - 1e-7)
        sine = jnp.sqrt(1.0 - cosine ** 2)
        phi = cosine * self.cos_m - sine * self.sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            phi = jnp.where(cosine > self.th, phi, cosine - self.mm)
        outputs = targets * phi + (1.0 - targets) * cosine
        return self.scale * outputs


class LogSoftmaxWrapper:
    """Wrap a margin module into an NLL criterion
    (reference ``losses.py:936``): one-hot targets → margin logits → CE."""

    def __init__(self, loss_fn):
        self.loss_fn = loss_fn

    def __call__(self, outputs, targets, length=None):
        outputs = outputs.squeeze(1) if outputs.ndim == 3 else outputs
        targets = jnp.asarray(targets).reshape(-1)
        one_hot = jax.nn.one_hot(targets, outputs.shape[-1])
        logits = self.loss_fn(outputs, one_hot)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(logp * one_hot, axis=-1))


def ce_kd(inp, target):
    """Elementwise knowledge-distillation CE (reference ``losses.py:999``):
    -(teacher_probs · student_log_probs)."""
    return -jnp.sum(target * inp, axis=-1)


def nll_loss_kd(probabilities, targets, rel_lab_lengths):
    """KD NLL over teacher distributions (reference ``losses.py:1020``)."""
    probabilities = jnp.asarray(probabilities)
    targets = jnp.asarray(targets)
    loss = ce_kd(probabilities, targets)  # (B, U)
    return _masked_mean(loss, rel_lab_lengths)


def _masked_mean(elem, length):
    t = elem.shape[1]
    mask = length_to_mask(jnp.asarray(length) * t, max_len=t)
    return jnp.sum(elem * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def ctc_loss_kd(log_probs, targets, input_lens, blank_index, device=None):
    """KD CTC (reference ``losses.py:1047``): CE between teacher and student
    frame posteriors (the sequence-level term uses the teacher's alignment)."""
    return _masked_mean(ce_kd(log_probs, targets), input_lens)


def get_mask(source, source_lengths):
    """Binary mask of real frames, (B, T, C) × (B,) absolute lengths →
    (B, T, 1) (reference ``losses.py:783``; reference layout is the same with
    batch second — ours is batch-first throughout)."""
    t = source.shape[1]
    mask = (jnp.arange(t)[None, :] < jnp.asarray(source_lengths)[:, None])
    return mask[..., None].astype(source.dtype)
