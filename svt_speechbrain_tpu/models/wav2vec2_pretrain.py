"""wav2vec 2.0 self-supervised pretraining (twin of the reference's
``HuggingFaceWav2Vec2Pretrain``, ``speechbrain/lobes/models/
huggingface_wav2vec.py:292``).

Components:
- Gumbel-softmax vector quantizer (groups × codebook entries) producing
  quantized targets from the unmasked conv features;
- span masking (fairseq-style indices, sampled host-side via
  ``processing.video.compute_mask_indices`` and passed in as a bool array —
  static shapes under jit);
- contrastive loss over in-utterance negatives + codebook diversity loss.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs, glorot_uniform
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder


class GumbelVectorQuantizer(Module):
    """Product-codebook Gumbel quantizer (HF ``Wav2Vec2GumbelVectorQuantizer``)."""

    def __init__(self, input_dim, num_groups=2, num_vars=320, codevector_dim=256):
        if codevector_dim % num_groups:
            raise ValueError("codevector_dim must divide num_groups")
        self.num_groups = num_groups
        self.num_vars = num_vars
        self.codevector_dim = codevector_dim
        self.proj = Linear(num_groups * num_vars, input_dim)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {
            "proj": self.proj.init(k1),
            "codevectors": glorot_uniform(
                k2, (1, self.num_groups * self.num_vars,
                     self.codevector_dim // self.num_groups)),
        }

    def __call__(self, params, x, temperature=2.0, rng=None, train=False):
        """x: (B, T, D) → (quantized (B, T, codevector_dim), perplexity)."""
        b, t, _ = x.shape
        g, v = self.num_groups, self.num_vars
        logits = self.proj(params["proj"], x).reshape(b * t * g, v)
        if train and rng is not None:
            gumbel = -jnp.log(-jnp.log(
                jax.random.uniform(rng, logits.shape, minval=1e-9, maxval=1.0)))
            y_soft = jax.nn.softmax((logits + gumbel) / temperature, axis=-1)
            # straight-through hard one-hot
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, v)
            probs = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
        else:
            idx = jnp.argmax(logits, axis=-1)
            probs = jax.nn.one_hot(idx, v)
        # perplexity (codebook usage) from the marginal softmax
        marginal = jax.nn.softmax(logits.reshape(b * t, g, v), axis=-1).mean(axis=0)
        perplexity = jnp.exp(-jnp.sum(marginal * jnp.log(marginal + 1e-7),
                                      axis=-1)).sum()
        codevectors = (probs.reshape(b * t, g * v)[:, :, None]
                       * params["codevectors"][0][None])  # (B*T, g*v, d/g)
        quantized = codevectors.reshape(b * t, g, v, -1).sum(axis=2).reshape(b, t, -1)
        return quantized, perplexity


def sample_negative_indices(batch_size, seq_len, num_negatives, mask, rng):
    """Sample in-utterance negatives among masked positions (host-side,
    HF ``_sample_negative_indices``).

    Example
    -------
    >>> import numpy as np
    >>> mask = np.ones((1, 6), bool)
    >>> negs = sample_negative_indices(1, 6, num_negatives=4, mask=mask,
    ...                                rng=np.random.default_rng(0))
    >>> negs.shape
    (1, 6, 4)
    >>> bool((negs[0] != np.arange(6)[:, None]).all())  # never its own pos
    True
    """
    out = np.zeros((batch_size, seq_len, num_negatives), dtype=np.int64)
    for b in range(batch_size):
        masked = np.flatnonzero(mask[b])
        if len(masked) <= 1:
            continue
        for ti, t in enumerate(masked):
            cands = masked[masked != t]
            out[b, t] = rng.choice(cands, size=num_negatives, replace=True)
    return out


class Wav2Vec2Pretrain(Module):
    """Full pretraining model: conv features → (mask) → encoder → project_hid;
    quantized unmasked features → project_q; contrastive + diversity loss."""

    def __init__(self, config: Wav2Vec2Config = None, codevector_dim=256,
                 num_negatives=100, contrastive_logits_temperature=0.1,
                 diversity_loss_weight=0.1, mask_prob=0.65, mask_length=10):
        self.config = config or Wav2Vec2Config.base()
        self.encoder = Wav2Vec2Encoder(self.config)
        self.quantizer = GumbelVectorQuantizer(
            self.config.conv_dim[-1], codevector_dim=codevector_dim)
        self.project_hid = Linear(codevector_dim, self.config.hidden_size)
        self.project_q = Linear(codevector_dim, codevector_dim)
        self.num_negatives = num_negatives
        self.temperature = contrastive_logits_temperature
        self.diversity_loss_weight = diversity_loss_weight
        self.mask_prob = mask_prob
        self.mask_length = mask_length

    def init(self, rng):
        k1, k2, k3, k4, k5 = split_rngs(rng, 5)
        return {
            "encoder": self.encoder.init(k1),
            "quantizer": self.quantizer.init(k2),
            "project_hid": self.project_hid.init(k3),
            "project_q": self.project_q.init(k4),
            "mask_emb": jax.random.uniform(k5, (self.config.hidden_size,)),
        }

    def sample_masks(self, batch_size, num_frames, rng=None):
        """Host-side span-mask sampling (call per batch)."""
        from svt_speechbrain_tpu.processing.video import compute_mask_indices

        rng = rng or np.random.default_rng()
        mask, *_ = compute_mask_indices(
            (batch_size, num_frames), None, self.mask_prob, self.mask_length,
            rng=rng, min_masks=2)
        negatives = sample_negative_indices(batch_size, num_frames,
                                            self.num_negatives, mask, rng)
        return mask, negatives

    def __call__(self, params, wav, mask, negative_indices, rng=None, train=False,
                 gumbel_temperature=2.0):
        """Returns (contrastive_loss + diversity penalty, aux dict)."""
        c = self.config
        feats = self.encoder.feature_extractor(
            params["encoder"]["feature_extractor"], wav)  # (B, T, 512)
        mask = mask[:, : feats.shape[1]]
        negative_indices = negative_indices[:, : feats.shape[1]]

        # quantized targets from UNMASKED conv features
        rngs = split_rngs(rng, 2) if rng is not None else [None, None]
        quantized, perplexity = self.quantizer(
            params["quantizer"], feats, temperature=gumbel_temperature,
            rng=rngs[0], train=train)
        quantized = self.project_q(params["project_q"], quantized)

        # context network over masked features
        x = self.encoder.feat_proj_ln(params["encoder"]["feat_proj_ln"], feats)
        x = self.encoder.feat_proj(params["encoder"]["feat_proj"], x)
        x = jnp.where(mask[..., None], params["mask_emb"][None, None].astype(x.dtype), x)
        x = x + self.encoder.pos_conv(params["encoder"]["pos_conv"], x)
        if not c.do_stable_layer_norm:
            x = self.encoder.encoder_ln(params["encoder"]["encoder_ln"], x)
        layer_rngs = (split_rngs(rngs[1], len(self.encoder.layers))
                      if rngs[1] is not None else [None] * len(self.encoder.layers))
        for i, layer in enumerate(self.encoder.layers):
            x = layer(params["encoder"]["layers"][str(i)], x,
                      rng=layer_rngs[i], train=train)
        if c.do_stable_layer_norm:
            x = self.encoder.encoder_ln(params["encoder"]["encoder_ln"], x)
        pred = self.project_hid(params["project_hid"], x)  # (B, T, codevec)

        # contrastive logits: positive = quantized target, negatives gathered
        # negative_indices (B, T, K) index the time axis of ``quantized``
        neg = jnp.take_along_axis(
            quantized[:, None].repeat(negative_indices.shape[-1], axis=1),
            negative_indices.transpose(0, 2, 1)[..., None].astype(jnp.int32),
            axis=2)  # (B, K, T, D)
        targets = jnp.concatenate([quantized[:, None], neg], axis=1)  # (B, K+1, T, D)

        def cos(a, b):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
            return jnp.sum(a * b, axis=-1)

        logits = cos(pred[:, None], targets) / self.temperature  # (B, K+1, T)
        # negatives that collide with the positive codevector can't be
        # distinguished — mask them out (HF's ``neg_is_pos`` correction)
        neg_is_pos = jnp.all(jnp.isclose(neg, quantized[:, None]), axis=-1)  # (B,K,T)
        logits = jnp.concatenate(
            [logits[:, :1], jnp.where(neg_is_pos, -1e9, logits[:, 1:])], axis=1)
        log_probs = jax.nn.log_softmax(logits, axis=1)
        per_pos = -log_probs[:, 0]  # (B, T)
        mask_f = mask.astype(jnp.float32)
        contrastive = jnp.sum(per_pos * mask_f) / jnp.maximum(jnp.sum(mask_f), 1.0)

        g, v = self.quantizer.num_groups, self.quantizer.num_vars
        diversity = (g * v - perplexity) / (g * v)
        loss = contrastive + self.diversity_loss_weight * diversity
        return loss, {"contrastive_loss": contrastive, "diversity_loss": diversity,
                      "codebook_perplexity": perplexity}


class HuggingFaceWav2Vec2Pretrain(Module):
    """Bridge twin of the reference ``HuggingFaceWav2Vec2Pretrain``
    (``huggingface_wav2vec.py:292``): wraps ``Wav2Vec2Pretrain`` with
    the wav-normalization convention."""

    def __init__(self, source=None, save_path=None, mask_prob=0.65,
                 mask_length=10, normalize_wav=True, arch_overrides=None):
        config = (Wav2Vec2Config.base() if source and "base" in str(source)
                  else Wav2Vec2Config.large_lv60())
        if arch_overrides:
            config = dataclasses.replace(config, **{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in arch_overrides.items()})
        self.model = Wav2Vec2Pretrain(config, mask_prob=mask_prob,
                                      mask_length=mask_length)
        self.normalize_wav = normalize_wav
        self.config = config

    def init(self, rng):
        return {"model": self.model.init(rng)}

    def sample_masks(self, batch_size, num_samples, rng=None):
        frames = self.config.output_length(num_samples)
        return self.model.sample_masks(batch_size, frames, rng)

    def __call__(self, params, wav, mask, negative_indices, rng=None, train=False,
                 **kw):
        if self.normalize_wav:
            from svt_speechbrain_tpu.nnet.normalization import global_layer_norm

            wav = global_layer_norm(wav)
        return self.model(params["model"], wav, mask, negative_indices,
                          rng=rng, train=train, **kw)
