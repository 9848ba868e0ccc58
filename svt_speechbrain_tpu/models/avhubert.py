"""TPU-native AV-HuBERT encoder (video/audio/audio-visual SSL).

Rebuild of the vendored AV-HuBERT stack the reference uses for the
video-only AMT recipe (``N20EMv2/video_only/hubert.py``; framework twin
``speechbrain/lobes/models/hubert.py``), with the fairseq-specific plumbing
(task registry, dataclass II, GradMultiply) replaced by plain functional
modules:

- dual-stream feature extractors: video = ``ResEncoder`` (Conv3D +
  ResNet-18) + linear proj; audio = linear proj (``hubert.py:311-327``);
- a missing modality is zero-filled at the fused width
  (``hubert.py:697-705``);
- modality fuse: channel concat (default) or add → layer_norm →
  ``post_extract_proj`` (2048→1024 for "concat") (``hubert.py:707-721``);
- wav2vec2-style transformer encoder (conv positional embedding + pre/post-LN
  layers) (``hubert.py:733``);
- ``extract_finetune`` is the inference entry (``hubert.py:688-739``).

BatchNorm state (in the visual frontend) is threaded explicitly:
``model(params, state, batch, train) → (feats, new_state)``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs, normal_init
from svt_speechbrain_tpu.nnet.linear import Linear
from svt_speechbrain_tpu.nnet.normalization import LayerNorm
from svt_speechbrain_tpu.models.resnet import ResEncoder
from svt_speechbrain_tpu.models.wav2vec2 import (
    Wav2Vec2Config, ConvPositionalEmbedding, TransformerLayer,
)
from svt_speechbrain_tpu.nnet.dropout import dropout as _dropout


@dataclasses.dataclass
class AVHubertConfig:
    """Subset of the reference's ``AVHubertConfig`` (``hubert.py:59-260``)
    relevant at fine-tune/inference time. Defaults = AV-HuBERT large."""

    encoder_layers: int = 24
    encoder_embed_dim: int = 1024
    encoder_ffn_embed_dim: int = 4096
    encoder_attention_heads: int = 16
    audio_feat_dim: int = 104
    video_feat_dim: int = 512
    modality_fuse: str = "concat"  # "concat" | "add"
    conv_pos: int = 128
    conv_pos_groups: int = 16
    layer_norm_first: bool = True
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    dropout_input: float = 0.1
    relu_type: str = "prelu"

    @classmethod
    def large(cls):
        return cls()

    @classmethod
    def base(cls):
        return cls(encoder_layers=12, encoder_embed_dim=768,
                   encoder_ffn_embed_dim=3072, encoder_attention_heads=12,
                   layer_norm_first=False)

    def encoder_cfg(self) -> Wav2Vec2Config:
        return Wav2Vec2Config(
            hidden_size=self.encoder_embed_dim,
            num_layers=self.encoder_layers,
            num_heads=self.encoder_attention_heads,
            ffn_size=self.encoder_ffn_embed_dim,
            num_conv_pos_embeddings=self.conv_pos,
            num_conv_pos_embedding_groups=self.conv_pos_groups,
            do_stable_layer_norm=self.layer_norm_first,
            hidden_dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
        )


class AudioSubModel(Module):
    """Audio-stream feature extractor: linear proj of precomputed features
    (reference ``hubert.py:311-327`` with ``resnet=None``)."""

    def __init__(self, config: AVHubertConfig):
        self.proj = Linear(config.encoder_embed_dim, config.audio_feat_dim)

    def init(self, rng):
        return {"proj": self.proj.init(rng)}

    def __call__(self, params, x):
        # x: (B, T, audio_feat_dim) → (B, T, D)
        return self.proj(params["proj"], x)


class VideoSubModel(Module):
    """Video-stream feature extractor: ResEncoder + linear proj."""

    def __init__(self, config: AVHubertConfig):
        self.resnet = ResEncoder(relu_type=config.relu_type)
        self.proj = Linear(config.encoder_embed_dim, config.video_feat_dim)

    def init(self, rng):
        k1, k2 = split_rngs(rng, 2)
        return {"resnet": self.resnet.init(k1), "proj": self.proj.init(k2)}

    def init_state(self):
        return {"resnet": self.resnet.init_state()}

    def __call__(self, params, state, x, train=False, axis_name=None):
        feats, resnet_state = self.resnet(params["resnet"], state["resnet"], x,
                                          train=train, axis_name=axis_name)
        return self.proj(params["proj"], feats), {"resnet": resnet_state}


class AVHubertModel(Module):
    """Dual-stream AV-HuBERT encoder (reference ``hubert.py:329-739``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> cfg = AVHubertConfig(encoder_layers=1, encoder_embed_dim=16,
    ...                      encoder_ffn_embed_dim=32,
    ...                      encoder_attention_heads=4, audio_feat_dim=10,
    ...                      modality_fuse="concat", conv_pos=8,
    ...                      conv_pos_groups=2)
    >>> m = AVHubertModel(cfg)
    >>> params = m.init(jax.random.PRNGKey(0))
    >>> feats, _ = m.extract_finetune(params, m.init_state(),
    ...                               {"audio": jnp.ones((2, 7, 10))})
    >>> feats.shape           # missing video stream is zero-filled
    (2, 7, 16)
    """

    def __init__(self, config: AVHubertConfig = None):
        self.config = config or AVHubertConfig.large()
        c = self.config
        self.feature_extractor_audio = AudioSubModel(c)
        self.feature_extractor_video = VideoSubModel(c)
        self.embed = c.encoder_embed_dim * 2 if c.modality_fuse == "concat" else c.encoder_embed_dim
        self.layer_norm = LayerNorm(self.embed)
        self.post_extract_proj = (Linear(c.encoder_embed_dim, self.embed)
                                  if self.embed != c.encoder_embed_dim else None)
        enc_cfg = c.encoder_cfg()
        self.enc_cfg = enc_cfg
        self.pos_conv = ConvPositionalEmbedding(enc_cfg)
        self.encoder_ln = LayerNorm(c.encoder_embed_dim)
        self.layers = [TransformerLayer(enc_cfg) for _ in range(c.encoder_layers)]

    def init(self, rng):
        keys = split_rngs(rng, 6 + len(self.layers))
        params = {
            "feature_extractor_audio": self.feature_extractor_audio.init(keys[0]),
            "feature_extractor_video": self.feature_extractor_video.init(keys[1]),
            "layer_norm": self.layer_norm.init(None),
            "pos_conv": self.pos_conv.init(keys[2]),
            "encoder_ln": self.encoder_ln.init(None),
            "layers": {str(i): l.init(k) for i, (l, k)
                       in enumerate(zip(self.layers, keys[6:]))},
            # mask embedding exists for checkpoint compatibility (pretraining)
            "mask_emb": jax.random.uniform(keys[3], (self.config.audio_feat_dim,)),
        }
        if self.post_extract_proj is not None:
            params["post_extract_proj"] = self.post_extract_proj.init(keys[4])
        return params

    def init_state(self):
        return {"feature_extractor_video": self.feature_extractor_video.init_state()}

    def extract_finetune(self, params, state, source, train=False, rng=None,
                         axis_name=None):
        """``source``: dict with "video" (B, T, H, W, 1) and/or "audio"
        (B, T, F); a missing modality is zero-filled. Returns
        ``(features (B, T, D), new_state)``. Reference ``hubert.py:688-739``.
        """
        c = self.config
        src_audio = source.get("audio")
        src_video = source.get("video")
        new_state = state

        if src_audio is not None and src_video is None:
            feats_audio = self.feature_extractor_audio(params["feature_extractor_audio"], src_audio)
            feats_video = jnp.zeros_like(feats_audio)
        elif src_audio is None and src_video is not None:
            feats_video, vs = self.feature_extractor_video(
                params["feature_extractor_video"], state["feature_extractor_video"],
                src_video, train=train, axis_name=axis_name)
            new_state = {"feature_extractor_video": vs}
            feats_audio = jnp.zeros_like(feats_video)
        else:
            feats_video, vs = self.feature_extractor_video(
                params["feature_extractor_video"], state["feature_extractor_video"],
                src_video, train=train, axis_name=axis_name)
            new_state = {"feature_extractor_video": vs}
            feats_audio = self.feature_extractor_audio(params["feature_extractor_audio"], src_audio)

        if c.modality_fuse == "concat":
            features = jnp.concatenate([feats_audio, feats_video], axis=-1)
        else:
            features = feats_audio + feats_video

        features = self.layer_norm(params["layer_norm"], features)
        if self.post_extract_proj is not None:
            features = self.post_extract_proj(params["post_extract_proj"], features)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            features = _dropout(features, c.dropout_input, sub, train)

        x = features + self.pos_conv(params["pos_conv"], features)
        if not c.layer_norm_first:
            x = self.encoder_ln(params["encoder_ln"], x)
        if rng is not None:
            rng, sub = jax.random.split(rng)
            x = _dropout(x, c.dropout, sub, train)
        layer_rngs = split_rngs(rng, len(self.layers)) if rng is not None else [None] * len(self.layers)
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][str(i)], x, rng=layer_rngs[i], train=train)
        if c.layer_norm_first:
            x = self.encoder_ln(params["encoder_ln"], x)
        return x, new_state


class FairseqAVHubert(Module):
    """Bridge with the reference's fairseq-interface semantics
    (``N20EMv2/video_only/fairseq_interface.py:198,350``): freeze switch,
    pretrained-checkpoint loading, ``extract_features`` over a modality dict.
    """

    def __init__(self, source=None, save_path=None, config: AVHubertConfig = None,
                 freeze=False, output_norm=False, arch_overrides=None):
        if isinstance(source, AVHubertConfig):
            config, source = source, None
        config = config or AVHubertConfig.large()
        if arch_overrides:
            config = dataclasses.replace(config, **arch_overrides)
        self.config = config
        self.source = source
        self.save_path = save_path
        self.freeze = freeze
        self.output_norm = output_norm
        self.model = AVHubertModel(config)

    def init(self, rng):
        return {"model": self.model.init(rng)}

    def init_state(self):
        return {"model": self.model.init_state()}

    def __call__(self, params, state, source, train=False, rng=None, axis_name=None):
        if self.freeze:
            params = jax.lax.stop_gradient(params)
            train = False
        out, new_state = self.model.extract_finetune(
            params["model"], state["model"], source, train=train, rng=rng,
            axis_name=axis_name)
        if self.output_norm:
            from svt_speechbrain_tpu.nnet.normalization import global_layer_norm

            out = global_layer_norm(out)
        return out, {"model": new_state}

    def extract_features(self, params, state, source, **kw):
        return self(params, state, source, **kw)

    def load_pretrained(self):
        """Convert a local fairseq AV-HuBERT checkpoint; returns
        ``(params, state)`` trees or None."""
        import os

        from svt_speechbrain_tpu.models.convert_fairseq import load_avhubert

        for candidate in (self.save_path, self.source):
            if candidate and os.path.exists(str(candidate)):
                params, state = load_avhubert(candidate, self.config)
                return {"model": params}, {"model": state}
        return None


class AVHubertPretrain(Module):
    """AV-HuBERT masked-prediction pretraining (reference ``hubert.py:585``
    ``AVHubertModel.forward``): fuse the two streams, replace masked
    positions with the learned mask embedding, encode, and classify each
    frame against cluster-label embeddings with separate masked/unmasked
    cross-entropies (Hsu et al.).

    Span masks are sampled host-side (``sample_masks``) like the wav2vec2
    pretrainer; cluster targets come from an external teacher (e.g. MFCC
    k-means), as in the reference's task setup.
    """

    def __init__(self, config: AVHubertConfig = None, num_classes=500,
                 final_dim=256, masked_weight=1.0, unmasked_weight=0.0,
                 logit_temp=0.1, mask_prob=0.8, mask_length=10):
        self.config = config or AVHubertConfig.large()
        self.model = AVHubertModel(self.config)
        self.final_proj = Linear(final_dim, self.config.encoder_embed_dim)
        self.num_classes = num_classes
        self.final_dim = final_dim
        self.masked_weight = masked_weight
        self.unmasked_weight = unmasked_weight
        self.logit_temp = logit_temp
        self.mask_prob = mask_prob
        self.mask_length = mask_length

    def init(self, rng):
        k1, k2, k3, k4 = split_rngs(rng, 4)
        return {
            "model": self.model.init(k1),
            "final_proj": self.final_proj.init(k2),
            "label_embs": jax.random.normal(
                k3, (self.num_classes, self.final_dim)) * 0.02,
            "mask_emb": jax.random.uniform(k4, (self.config.encoder_embed_dim,)),
        }

    def init_state(self):
        return {"model": self.model.init_state()}

    def sample_masks(self, batch_size, num_frames, rng=None):
        from svt_speechbrain_tpu.processing.video import compute_mask_indices

        import numpy as np

        rng = rng or np.random.default_rng()
        mask, *_ = compute_mask_indices((batch_size, num_frames), None,
                                        self.mask_prob, self.mask_length,
                                        rng=rng, min_masks=1)
        return mask

    def __call__(self, params, state, source, targets, mask, rng=None, train=False):
        """source: modality dict; targets (B, T) cluster ids; mask (B, T)
        bool. Returns (loss, aux, new_state)."""
        import jax.numpy as jnp

        c = self.config
        m = self.model
        mp = params["model"]
        src_audio, src_video = source.get("audio"), source.get("video")
        new_state = state
        if src_video is not None:
            feats_video, vs = m.feature_extractor_video(
                mp["feature_extractor_video"],
                state["model"]["feature_extractor_video"], src_video,
                train=train)
            new_state = {"model": {"feature_extractor_video": vs}}
        else:
            feats_video = None
        feats_audio = (m.feature_extractor_audio(mp["feature_extractor_audio"],
                                                 src_audio)
                       if src_audio is not None else None)
        if feats_audio is None:
            feats_audio = jnp.zeros_like(feats_video)
        if feats_video is None:
            feats_video = jnp.zeros_like(feats_audio)
        if c.modality_fuse == "concat":
            features = jnp.concatenate([feats_audio, feats_video], axis=-1)
        else:
            features = feats_audio + feats_video
        features = m.layer_norm(mp["layer_norm"], features)
        if m.post_extract_proj is not None:
            features = m.post_extract_proj(mp["post_extract_proj"], features)

        # feature-space masking with the learned mask embedding
        mask = mask[:, : features.shape[1]]
        x = jnp.where(mask[..., None],
                      params["mask_emb"][None, None].astype(features.dtype),
                      features)

        x = x + m.pos_conv(mp["pos_conv"], x)
        if not c.layer_norm_first:
            x = m.encoder_ln(mp["encoder_ln"], x)
        layer_rngs = (split_rngs(rng, len(m.layers)) if rng is not None
                      else [None] * len(m.layers))
        for i, layer in enumerate(m.layers):
            x = layer(mp["layers"][str(i)], x, rng=layer_rngs[i], train=train)
        if c.layer_norm_first:
            x = m.encoder_ln(mp["encoder_ln"], x)

        proj = self.final_proj(params["final_proj"], x)  # (B, T, final_dim)
        embs = params["label_embs"]

        def cos_logits(p):
            p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
            e = embs / (jnp.linalg.norm(embs, axis=-1, keepdims=True) + 1e-8)
            return (p @ e.T) / self.logit_temp

        logits = cos_logits(proj)  # (B, T, num_classes)
        logp = jax.nn.log_softmax(logits, axis=-1)
        targets = targets[:, : logp.shape[1]].astype(jnp.int32)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        mask_f = mask.astype(jnp.float32)
        masked_loss = jnp.sum(nll * mask_f) / jnp.maximum(jnp.sum(mask_f), 1.0)
        unmasked_loss = jnp.sum(nll * (1 - mask_f)) / jnp.maximum(
            jnp.sum(1 - mask_f), 1.0)
        loss = self.masked_weight * masked_loss + self.unmasked_weight * unmasked_loss
        acc = jnp.sum((jnp.argmax(logits, -1) == targets) * mask_f) / jnp.maximum(
            jnp.sum(mask_f), 1.0)
        return loss, {"masked_loss": masked_loss, "unmasked_loss": unmasked_loss,
                      "masked_acc": acc}, new_state


# Reference public names (``fairseq_wav2vec.py`` / ``hubert.py``): the
# finetune/pretrain bridges carry the reference fairseq-facing names too.
SubModel = AudioSubModel
FairseqAVHubertFinetune = FairseqAVHubert
FairseqAVHubertPretrain = AVHubertPretrain


class FairseqWav2Vec2(Module):
    """wav2vec 2.0 encoder loaded from a *fairseq* checkpoint
    (reference ``fairseq_wav2vec.py:26`` FairseqWav2Vec2): same architecture
    as the HF bridge, different checkpoint key naming. ``load_pretrained``
    reads a local fairseq ``.pt`` via ``convert_fairseq``."""

    def __init__(self, pretrained_path=None, output_norm=True, freeze=False,
                 config=None):
        from svt_speechbrain_tpu.models.wav2vec2 import (HuggingFaceWav2Vec2,
                                                         Wav2Vec2Config)

        self.pretrained_path = pretrained_path
        self.bridge = HuggingFaceWav2Vec2(
            config=config or Wav2Vec2Config.large_lv60(),
            output_norm=output_norm, freeze=freeze)

    @property
    def config(self):
        return self.bridge.config

    def init(self, rng):
        return self.bridge.init(rng)

    def load_pretrained(self):
        import os

        from svt_speechbrain_tpu.models.convert_fairseq import (
            convert_wav2vec2_fairseq_state_dict, load_fairseq_state_dict)

        if self.pretrained_path and os.path.exists(self.pretrained_path):
            sd = load_fairseq_state_dict(self.pretrained_path)
            return {"encoder": convert_wav2vec2_fairseq_state_dict(
                sd, self.bridge.config)}
        return None

    def __call__(self, params, wav, **kwargs):
        return self.bridge(params, wav, **kwargs)

    def extract_features(self, params, wav, **kwargs):
        return self(params, wav, **kwargs)


class FairseqWav2Vec1(Module):
    """wav2vec 1.0 (reference ``fairseq_wav2vec.py:502``): conv feature
    encoder + conv context network, no transformer."""

    def __init__(self, conv_dim=(64,) * 5, conv_kernel=(10, 8, 4, 4, 4),
                 conv_stride=(5, 4, 2, 2, 2), context_layers=9,
                 context_kernel=3, embedding_dim=512):
        from svt_speechbrain_tpu.nnet.cnn import Conv1d

        self.feature_convs = []
        in_ch = 1
        for dim, k, s in zip(conv_dim, conv_kernel, conv_stride):
            self.feature_convs.append(Conv1d(dim, k, in_ch, stride=s,
                                             padding="valid"))
            in_ch = dim
        self.context_convs = [
            Conv1d(embedding_dim, context_kernel,
                   in_ch if i == 0 else embedding_dim, padding="causal")
            for i in range(context_layers)]

    def init(self, rng):
        keys = split_rngs(rng, len(self.feature_convs) + len(self.context_convs))
        params = {}
        for i, c in enumerate(self.feature_convs):
            params[f"feat{i}"] = c.init(keys[i])
        for i, c in enumerate(self.context_convs):
            params[f"ctx{i}"] = c.init(keys[len(self.feature_convs) + i])
        return params

    def __call__(self, params, wav):
        x = wav[..., None]
        for i, c in enumerate(self.feature_convs):
            x = jax.nn.relu(c(params[f"feat{i}"], x))
        for i, c in enumerate(self.context_convs):
            x = jax.nn.relu(c(params[f"ctx{i}"], x))
        return x


def load_label(label_path, inds, tot):
    """Select label lines by index (reference ``hubert_dataset.py:80``)."""
    with open(label_path) as f:
        labels = [line.rstrip() for line in f]
    assert len(labels) == tot, \
        f"number of labels does not match ({len(labels)} != {tot})"
    return [labels[i] for i in inds]


def load_label_offset(label_path, inds, tot):
    """Byte offsets of selected label lines
    (reference ``hubert_dataset.py:90``)."""
    import itertools

    with open(label_path) as f:
        code_lengths = [len(line.encode("utf-8")) for line in f]
    assert len(code_lengths) == tot, \
        f"number of labels does not match ({len(code_lengths)} != {tot})"
    offsets = list(itertools.accumulate([0] + code_lengths))
    return [(offsets[i], offsets[i + 1]) for i in inds]


def verify_label_lengths(audio_sizes, audio_rate, label_path, label_rate,
                         inds, tot, tol=0.1):
    """Warn when audio and frame-label durations disagree by more than
    ``tol`` seconds (reference ``hubert_dataset.py:101``); returns the number
    of mismatches."""
    import logging

    if label_rate < 0:
        return 0
    with open(label_path) as f:
        lengths = [len(line.rstrip().split()) for line in f]
    assert len(lengths) == tot
    num_invalid = 0
    for i, ind in enumerate(inds):
        dur_from_audio = audio_sizes[i] / audio_rate
        dur_from_label = lengths[ind] / label_rate
        if abs(dur_from_audio - dur_from_label) > tol:
            logging.getLogger(__name__).warning(
                "audio and label duration differ: audio=%.3f label=%.3f",
                dur_from_audio, dur_from_label)
            num_invalid += 1
    return num_invalid


def load_audio_visual(manifest_path, max_keep, min_keep, frame_rate,
                      label_paths=None, label_rates=None, tol=0.1):
    """Read an AV-HuBERT tsv manifest (root line, then
    ``id<TAB>video<TAB>audio<TAB>n_video_frames<TAB>n_audio_samples`` rows),
    filtering by audio length (reference ``hubert_dataset.py:30``).
    Returns (root, names=[(video, audio)], inds, tot, sizes)."""
    names, inds, sizes = [], [], []
    with open(manifest_path) as f:
        root = f.readline().strip()
        for ind, line in enumerate(f):
            items = line.strip().split("\t")
            sz = int(items[-1])
            if min_keep is not None and sz < min_keep:
                continue
            if max_keep is not None and sz > max_keep:
                continue
            names.append((items[1], items[2]))
            inds.append(ind)
            sizes.append(sz)
    tot = ind + 1
    if label_paths is not None:
        for lp, lr in zip(label_paths, label_rates or [frame_rate] * len(label_paths)):
            verify_label_lengths(sizes, 16000, lp, lr, inds, tot, tol=tol)
    return root, names, inds, tot, sizes


class AVHubertDataset:
    """Minimal AV dataset over a tsv manifest + label files (reference
    ``hubert_dataset.py:140``): items provide audio samples, video frames
    (via ``processing.video.load_video``) and the frame labels."""

    def __init__(self, manifest_path, sample_rate=16000, label_paths=(),
                 label_rates=(), max_keep_sample_size=None,
                 min_keep_sample_size=None, video_transform=None):
        self.root, self.names, self.inds, tot, self.sizes = load_audio_visual(
            manifest_path, max_keep_sample_size, min_keep_sample_size,
            sample_rate, label_paths=list(label_paths) or None,
            label_rates=list(label_rates) or None)
        self.sample_rate = sample_rate
        self.video_transform = video_transform
        self.labels = [load_label(lp, self.inds, tot) for lp in label_paths]

    def __len__(self):
        return len(self.names)

    def __getitem__(self, index):
        import os

        from svt_speechbrain_tpu.dataio.dataio import read_audio

        video_name, audio_name = self.names[index]
        item = {"id": index}
        audio_path = os.path.join(self.root, audio_name)
        if os.path.exists(audio_path):
            item["audio"] = read_audio(audio_path)
        video_path = os.path.join(self.root, video_name)
        if os.path.exists(video_path):
            from svt_speechbrain_tpu.processing.video import load_video

            video = load_video(video_path)
            if self.video_transform is not None:
                video = self.video_transform(video)
            item["video"] = video
        for i, labels in enumerate(self.labels):
            item[f"label{i}"] = labels[index]
        return item
