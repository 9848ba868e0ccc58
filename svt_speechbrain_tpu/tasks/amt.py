"""AMT (singing-voice note transcription) task brains.

The reference implements near-identical ``AMT(sb.Brain)`` classes in four
recipe families (``MIR_ST500/train_audio_ssl.py``,
``N20EMv2/audio_only/train_audio_ssl.py`` + ``extract_ssl_feats.py``,
``N20EMv2/video_only/train_video_ssl.py``,
``N20EMv2/audio_visual/train_rca_{av,a}.py``). Here the shared machinery —
the 4-term frame loss, song-stitched evaluation with COnPOff/COnP/COn(/COff)
scoring, NewBob annealing, checkpoint policies, feature/prediction dumps —
lives in ``AMTBrainBase``; the per-modality brains specialize the forward
pass and optimizer layout. Recipes stay thin.

All device compute is jit-compiled through the engine; the stitching/scoring
runs host-side on compact per-frame arrays.
"""
from __future__ import annotations

import functools
import logging
import os

import numpy as np

import jax
import optax
from flax import serialization

from svt_speechbrain_tpu.core import Brain, Stage
from svt_speechbrain_tpu.utils.amt import frame2note, AverageMeter
from svt_speechbrain_tpu.utils import transcription_eval

logger = logging.getLogger(__name__)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))


def save_msgpack(tree, path):
    """Serialize a param pytree to msgpack (the recipes' feature-extractor
    export format — the TPU-side equivalent of the reference's ``.pt``
    dumps, ``MIR_ST500/extract_ssl_feats.py``).

    Example
    -------
    >>> import os, tempfile, jax.numpy as jnp
    >>> path = os.path.join(tempfile.mkdtemp(), "model.msgpack")
    >>> save_msgpack({"w": jnp.arange(3.0)}, path)
    >>> load_msgpack(path)
    {'w': array([0., 1., 2.], dtype=float32)}
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(tree)))


def load_msgpack(path):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


class AMTBrainBase(Brain):
    """Shared AMT machinery. Subclasses define ``compute_forward``,
    ``init_optimizers`` (+ ``annealing`` spec) and ``_true_frames``."""

    #: (scheduler hparams attr, optimizer name, log key) — set by subclass
    annealing = ()

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.host_only_keys = {"ref_intervals", "ref_pitchs", "cur_utter", "all_utter"}
        self.compute_coff = bool(getattr(self.hparams, "compute_coff", False))
        # checkpoint-selection policy: "min_loss" (MIR-ST500) or
        # "max_COnPOff_f1" (N20EMv2, reference audio_only :359)
        self.ckpt_policy = getattr(self.hparams, "ckpt_policy", "min_loss")
        self.return_feats = False  # extract_ssl_feats mode

    # ------------------------------------------------------------- metrics
    @property
    def metric_names(self):
        names = ["COnPOff", "COnP", "COn"]
        if self.compute_coff:
            names.append("COff")
        return names

    def _reset_song_state(self):
        self.last_utter = 0
        self.song_pred = []
        self.song_feats = []
        for name in self.metric_names:
            for kind in ("precis", "recall", "f1"):
                setattr(self, f"{name}_{kind}", AverageMeter())

    def on_stage_start(self, stage, epoch=None):
        self.onset_loss_metric = self.hparams.onset_stats()
        self.offset_loss_metric = self.hparams.offset_stats()
        if stage != Stage.TRAIN:
            self._reset_song_state()
        else:
            self.configure_freezing(epoch)

    def configure_freezing(self, epoch):
        """Linear-probe schedule hook; default none."""

    # -------------------------------------------------------------- losses
    def compute_objectives(self, predictions, batch, stage):
        """4-term masked loss (reference ``train_audio_ssl.py:50-76``)."""
        onset_logits, offset_logits, octave_logits, class_logits = predictions[:4]
        anno, anno_lens = batch["anno"]
        onset_gt = anno[:, :, 0].astype(np.float32)
        offset_gt = anno[:, :, 1].astype(np.float32)
        octave_gt = anno[:, :, 2].astype(np.int32)
        pitch_gt = anno[:, :, 3].astype(np.int32)

        onset_loss = self.hparams.onset_criterion(
            onset_logits, onset_gt, length=anno_lens,
            pos_weight=self.hparams.onset_positive_weight)
        offset_pw = getattr(self.hparams, "offset_positive_weight", 1.0)
        offset_loss = self.hparams.offset_criterion(
            offset_logits, offset_gt, length=anno_lens, pos_weight=offset_pw)
        octave_lp = self.hparams.log_softmax(None, octave_logits)
        octave_loss = self.hparams.octave_criterion(octave_lp, octave_gt, length=anno_lens)
        class_lp = self.hparams.log_softmax(None, class_logits)
        pitch_loss = self.hparams.pitch_criterion(class_lp, pitch_gt, length=anno_lens)
        return onset_loss + offset_loss + octave_loss + pitch_loss

    # ------------------------------------------------------- eval stitching
    def _true_frames(self, batch, padded_frames):
        """Frames of real (unpadded) content in this utterance."""
        rel = float(np.asarray(batch["sig"].lengths)[0])
        return int(round(rel * padded_frames))

    def on_evaluate_batch_end(self, batch, predictions, loss, stage):
        """Song stitching + decode + scoring (reference ``:78-141``)."""
        if stage == Stage.TRAIN:
            return
        onset_logits, offset_logits, octave_logits, class_logits = predictions[:4]
        anno_np = np.asarray(batch["anno"].data)
        ids = batch.id
        self.onset_loss_metric.append(
            ids, onset_logits, anno_np[:, :, 0].astype(np.float32),
            length=batch["anno"].lengths,
            pos_weight=self.hparams.onset_positive_weight)
        self.offset_loss_metric.append(
            ids, offset_logits, anno_np[:, :, 1].astype(np.float32),
            length=batch["anno"].lengths,
            pos_weight=getattr(self.hparams, "offset_positive_weight", 1.0))

        cur_utter = int(np.asarray(batch.cur_utter)[0])
        all_utter = int(np.asarray(batch.all_utter)[0])
        assert cur_utter == self.last_utter + 1 or cur_utter == 1
        assert onset_logits.shape[0] == 1, "eval expects batch_size 1 in song order"

        frames = self._true_frames(batch, onset_logits.shape[1])
        chunk = np.stack([
            _sigmoid(onset_logits[0][:frames]),
            _sigmoid(offset_logits[0][:frames]),
            np.argmax(octave_logits[0][:frames], axis=-1).astype(np.float64),
            np.argmax(class_logits[0][:frames], axis=-1).astype(np.float64),
        ], axis=-1)
        self.song_pred.append(chunk)
        if self.return_feats and len(predictions) > 4:
            self.song_feats.append(np.asarray(predictions[-1][0][:frames]))

        if cur_utter == all_utter:
            frame_info = np.concatenate(self.song_pred, axis=0)
            est_result = frame2note(
                frame_info, onset_thres=self.hparams.onset_threshold,
                offset_thres=self.hparams.offset_threshold,
                frame_size=1 / self.hparams.frame_rate)
            est_np = np.array(est_result) if est_result else np.zeros((0, 3))
            self.on_song_end(batch, est_np)
            ref_intervals = np.asarray(batch.ref_intervals.data[0], dtype=np.float64)
            ref_pitchs = np.asarray(batch.ref_pitchs.data[0], dtype=np.float64)
            self._score_song(est_np, ref_intervals, ref_pitchs)
            self.song_pred = []
            self.song_feats = []
        self.last_utter = cur_utter

    def on_song_end(self, batch, est_np):
        """Hook at whole-song completion (feature/prediction dumps)."""

    def _score_song(self, est_np, ref_intervals, ref_pitchs):
        if est_np.shape[0] == 0:
            # zero-metrics guard (reference audio_only ``:108-124``)
            logger.info("There are no detected note events! "
                        "All metrics for this song are set as zero!")
            for name in self.metric_names:
                for kind in ("precis", "recall", "f1"):
                    getattr(self, f"{name}_{kind}").update(0.0)
            return
        raw = transcription_eval.evaluate(
            ref_intervals, transcription_eval.midi_to_hz(ref_pitchs),
            est_np[:, :2], transcription_eval.midi_to_hz(est_np[:, 2]),
            onset_tolerance=self.hparams.onset_tolerance,
            pitch_tolerance=self.hparams.pitch_tolerance)
        key_map = {
            "COnPOff": ("Precision", "Recall", "F-measure"),
            "COnP": ("Precision_no_offset", "Recall_no_offset", "F-measure_no_offset"),
            "COn": ("Onset_Precision", "Onset_Recall", "Onset_F-measure"),
            "COff": ("Offset_Precision", "Offset_Recall", "Offset_F-measure"),
        }
        for name in self.metric_names:
            p, r, f = key_map[name]
            getattr(self, f"{name}_precis").update(raw[p])
            getattr(self, f"{name}_recall").update(raw[r])
            getattr(self, f"{name}_f1").update(raw[f])

    # --------------------------------------------------------- stage ends
    def on_stage_end(self, stage, stage_loss, epoch=None):
        stage_stats = {"loss": stage_loss}
        if stage == Stage.TRAIN:
            self.train_stats = stage_stats
            return
        for name in self.metric_names:
            for kind in ("precis", "recall", "f1"):
                stage_stats[f"{name}_{kind}"] = getattr(self, f"{name}_{kind}").avg

        if stage == Stage.VALID:
            meta = {"epoch": epoch}
            for sched_attr, opt_name, log_key in self.annealing:
                old_lr, new_lr = getattr(self.hparams, sched_attr)(stage_stats["loss"])
                self.set_learning_rate(opt_name, new_lr)
                meta[log_key] = old_lr
            self.hparams.train_logger.log_stats(
                stats_meta=meta,
                train_stats=self.train_stats,
                valid_stats={
                    "loss": stage_loss,
                    "onset_loss": self.onset_loss_metric.summarize("average"),
                    "offset_loss": self.offset_loss_metric.summarize("average"),
                    **{k: v for k, v in stage_stats.items() if k != "loss"},
                })
            if self.checkpointer is not None:
                if self.ckpt_policy == "max_COnPOff_f1":
                    self.checkpointer.save_and_keep_only(
                        meta={"COnPOff_f1": stage_stats["COnPOff_f1"]},
                        max_keys=["COnPOff_f1"])
                else:
                    self.checkpointer.save_and_keep_only(
                        meta={"loss": stage_stats["loss"]}, min_keys=["loss"])
        elif stage == Stage.TEST:
            self.hparams.train_logger.log_stats(
                stats_meta={"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss,
                            **{f"{n}_f1": stage_stats[f"{n}_f1"]
                               for n in self.metric_names}})


class AudioAMT(AMTBrainBase):
    """wav2vec2 + linear head audio AMT
    (reference ``MIR_ST500/train_audio_ssl.py`` and the N20EMv2 audio twin)."""

    annealing = (("lr_annealing_wav2vec", "wav2vec", "lr_wav2vec"),
                 ("lr_annealing_model", "model", "lr_model"))

    def compute_forward(self, params, batch, stage, rng=None):
        wavs, wav_lens = batch["sig"]
        if stage == Stage.TRAIN:
            # train matches the reference: padding attended, batch-mixed norms
            feats = self.modules.wav2vec2(
                params["wav2vec2"], wavs, rng=rng, train=True,
                row_mask=batch.get("valid_rows"))
        else:
            # eval matches the reference's unpadded batch-1 regime exactly:
            # masked norms + masked attention make the padded computation
            # bit-equal to running each utterance unpadded
            feats = self.modules.wav2vec2(
                params["wav2vec2"], wavs, train=False, wav_lens=wav_lens)
        logits = self.modules.model(params["model"], feats)
        n_oct = self.hparams.pitch_octave_num
        out = (logits[:, :, 0], logits[:, :, 1],
               logits[:, :, 2:3 + n_oct], logits[:, :, 3 + n_oct:])
        if self.return_feats:
            return out + (wav_lens, feats)
        return out + (wav_lens,)

    def _true_frames(self, batch, padded_frames):
        # audio frames derive from conv striding over the true sample count
        wav_rel = float(np.asarray(batch["sig"].lengths)[0])
        true_samples = int(round(wav_rel * batch["sig"].data.shape[1]))
        return self.modules.wav2vec2.config.output_length(true_samples)

    def configure_freezing(self, epoch):
        if epoch is not None and epoch <= getattr(self.hparams, "linear_prob_epochs", 0):
            logger.info("Stage for linear probing")
            self.set_frozen_modules(["wav2vec2"])
        else:
            logger.info("Stage for full finetuning")
            self.set_frozen_modules([])

    def init_optimizers(self):
        self.add_optimizer("wav2vec", functools.partial(optax.adam),
                           ["wav2vec2"], lr=self.hparams.lr_wav2vec)
        self.add_optimizer("model", functools.partial(optax.adadelta, rho=0.95, eps=1e-8),
                           ["model"], lr=self.hparams.lr)

    def on_fit_start(self):
        super().on_fit_start()
        pretrained = self.modules.wav2vec2.load_pretrained()
        if pretrained is not None:
            logger.info("Loaded converted HF wav2vec2 weights")
            self.load_module_params("wav2vec2", pretrained)
        if getattr(self.hparams, "pretrain", False):
            folder = self.hparams.pretrain_folder
            logger.info(f"Load wav2vec 2.0 model weights from the folder: {folder}")
            self.load_module_params("wav2vec2", load_msgpack(
                os.path.join(folder, "wav2vec2.msgpack")))
            head_path = os.path.join(folder, "model.msgpack")
            if os.path.exists(head_path):
                self.load_module_params("model", load_msgpack(head_path))

    def on_evaluate_start(self, max_key=None, min_key=None):
        super().on_evaluate_start(max_key=max_key, min_key=min_key)
        # raw param export feeding stage-2 fusion (reference
        # ``extract_ssl_feats.py:227-232``)
        if getattr(self.hparams, "save_model", False):
            folder = self.hparams.save_model_folder
            save_msgpack(self.params["wav2vec2"], os.path.join(folder, "wav2vec2.msgpack"))
            save_msgpack(self.params["model"], os.path.join(folder, "model.msgpack"))
            logger.info(f"Save wav2vec 2.0 and classifier to the folder: {folder}")

    def on_song_end(self, batch, est_np):
        """Feature dump at song end (reference ``extract_ssl_feats.py:106-116``)."""
        if not self.return_feats or not self.song_feats:
            return
        feats = np.concatenate(self.song_feats, axis=0)
        wav_path = batch.wav[0] if hasattr(batch, "wav") else None
        if wav_path is None:
            return
        folder = os.path.join(os.path.dirname(wav_path), "noise_data")
        if getattr(self.hparams, "add_noise", False):
            path = os.path.join(folder, self.hparams.noise_type,
                                f"SNR_{self.hparams.snr_db}dB_feats.npy")
        else:
            path = os.path.join(folder, "clean_feats.npy")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, feats)


class VideoAMT(AMTBrainBase):
    """AV-HuBERT visual encoder + linear head video AMT
    (reference ``N20EMv2/video_only/train_video_ssl.py``)."""

    annealing = (("lr_annealing_encoder", "encoder", "lr_encoder"),
                 ("lr_annealing_head", "head", "lr_head"))

    def compute_forward(self, params, states, batch, stage, rng=None):
        video, video_lens = batch["sig"]  # (B, T, H, W, 1)
        feats, new_state = self.modules.encoder(
            params["encoder"], states["encoder"], {"video": video, "audio": None},
            train=stage == Stage.TRAIN, rng=rng)
        logits = self.modules.head(params["head"], feats)
        n_oct = self.hparams.pitch_octave_num
        out = (logits[:, :, 0], logits[:, :, 1],
               logits[:, :, 2:3 + n_oct], logits[:, :, 3 + n_oct:], video_lens)
        if self.return_feats:
            out = out + (feats,)
        return out, {"encoder": new_state}

    def configure_freezing(self, epoch):
        if epoch is not None and epoch <= getattr(self.hparams, "linear_prob_epochs", 0):
            logger.info("Stage for linear probing")
            self.set_frozen_modules(["encoder"])
        else:
            logger.info("Stage for full finetuning")
            self.set_frozen_modules([])

    def init_optimizers(self):
        self.add_optimizer("encoder", functools.partial(optax.adam),
                           ["encoder"], lr=self.hparams.lr_encoder)
        self.add_optimizer("head", functools.partial(optax.adadelta, rho=0.95, eps=1e-8),
                           ["head"], lr=self.hparams.lr)

    def on_fit_start(self):
        super().on_fit_start()
        pretrained = self.modules.encoder.load_pretrained()
        if pretrained is not None:
            params, state = pretrained
            logger.info("Loaded converted AV-HuBERT weights")
            self.load_module_params("encoder", params)
            self.load_module_state("encoder", state)

    def on_song_end(self, batch, est_np):
        if not self.return_feats or not self.song_feats:
            return
        feats = np.concatenate(self.song_feats, axis=0)
        video_path = batch.video[0] if hasattr(batch, "video") else None
        if video_path is None:
            return
        path = os.path.join(os.path.dirname(video_path), "noise_data", "video_feats.npy")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, feats)


class FusionAMT(AMTBrainBase):
    """Stage-2 RCA fusion over pre-extracted features
    (reference ``N20EMv2/audio_visual/train_rca_av.py`` and the audio-only
    control ``train_rca_a.py`` with zeroed video)."""

    annealing = (("lr_annealing_model", "model", "lr_model"),)

    def __init__(self, *args, zero_video=False, **kwargs):
        super().__init__(*args, **kwargs)
        self.zero_video = zero_video

    def compute_forward(self, params, batch, stage, rng=None):
        import jax.numpy as jnp

        audio_feats, wav_lens = batch["sig1"]
        video_feats, _ = batch["sig2"]
        if self.zero_video:
            video_feats = jnp.zeros_like(video_feats)
        feats = self.modules.fusion(params["fusion"], audio_feats, video_feats,
                                    rng=rng, train=stage == Stage.TRAIN)
        logits = self.modules.head(params["head"], feats)
        n_oct = self.hparams.pitch_octave_num
        return (logits[:, :, 0], logits[:, :, 1],
                logits[:, :, 2:3 + n_oct], logits[:, :, 3 + n_oct:], wav_lens)

    def _true_frames(self, batch, padded_frames):
        rel = float(np.asarray(batch["sig1"].lengths)[0])
        return int(round(rel * batch["sig1"].data.shape[1]))

    def init_optimizers(self):
        self.add_optimizer("model", functools.partial(optax.adadelta, rho=0.95, eps=1e-8),
                           ["fusion", "head"], lr=self.hparams.lr)

    def on_fit_start(self):
        super().on_fit_start()
        if getattr(self.hparams, "pretrain", False):
            path = os.path.join(self.hparams.pretrain_folder, "model.msgpack")
            if os.path.exists(path):
                logger.info(f"Load classifier model weights from: {path}")
                self.load_module_params("head", load_msgpack(path))
            else:
                logger.warning(f"pretrain=True but {path} not found")

    def on_song_end(self, batch, est_np):
        """Per-song prediction dump. The tag distinguishes the AV recipe
        ("av", reference ``train_rca_av.py:113-123``) from the audio-only
        control ("audio", ``train_rca_a.py:118-125``) so the noise sweep can
        compare both artifacts side by side."""
        audio_path = batch.audio[0] if hasattr(batch, "audio") else None
        if audio_path is None:
            return
        tag = "audio" if self.zero_video else "av"
        folder = os.path.dirname(audio_path)
        if getattr(self.hparams, "add_noise", False):
            path = os.path.join(folder, self.hparams.noise_type,
                                f"SNR_{self.hparams.snr_db}dB_{tag}_pred.npy")
        else:
            path = os.path.join(folder, f"clean_{tag}_pred.npy")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, est_np)
