#!/usr/bin/env python3
"""Recipe: wav2vec2-based AMT on the MIR-ST500 dataset (TPU-native).

Behavioural twin of the reference recipe
(``/root/reference/MIR_ST500/train_audio_ssl.py``): wav2vec2 encoder + 20-dim
linear head; 4-term loss (onset BCE pos_weight, offset BCE, octave NLL,
pitch-class NLL); two optimizers (Adam on the encoder, Adadelta on the head);
linear-probe → finetune schedule; NewBob lr annealing on valid loss;
song-stitched whole-song eval scored with COnPOff/COnP/COn F1.

Run:
> python train_audio_ssl.py hparams/train_audio_ssl.yaml --data_folder=/path
"""
import functools
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax  # noqa: E402
import optax  # noqa: E402

import svt_speechbrain_tpu as sb  # noqa: E402
from svt_speechbrain_tpu.config import load_hyperyaml  # noqa: E402
from svt_speechbrain_tpu.dataio import dataio, dataset  # noqa: E402
from svt_speechbrain_tpu.utils.amt import frame2note, AverageMeter  # noqa: E402
from svt_speechbrain_tpu.utils import transcription_eval  # noqa: E402
from svt_speechbrain_tpu.utils.metric_stats import MetricStats  # noqa: E402
from svt_speechbrain_tpu.parallel.distributed import run_on_main  # noqa: E402

logger = logging.getLogger(__name__)


class AMT(sb.Brain):
    """AMT training engine (reference ``MIR_ST500/train_audio_ssl.py:27``)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # whole-song note references are variable-length → host-side only
        self.host_only_keys = {"ref_intervals", "ref_pitchs", "cur_utter", "all_utter"}

    def compute_forward(self, params, batch, stage, rng=None):
        """Waveforms → per-frame onset/offset/octave/pitch logits
        (reference ``:28-48``); pure jit function."""
        wavs, wav_lens = batch["sig"]
        feats = self.modules.wav2vec2(
            params["wav2vec2"], wavs, rng=rng, train=stage == sb.Stage.TRAIN,
            row_mask=batch.get("valid_rows"))
        logits = self.modules.model(params["model"], feats)

        pitch_octave_num = self.hparams.pitch_octave_num
        onset_logits = logits[:, :, 0]
        offset_logits = logits[:, :, 1]
        pitch_out = logits[:, :, 2:]
        pitch_octave_logits = pitch_out[:, :, 0:pitch_octave_num + 1]
        pitch_class_logits = pitch_out[:, :, pitch_octave_num + 1:]
        return onset_logits, offset_logits, pitch_octave_logits, pitch_class_logits, wav_lens

    def compute_objectives(self, predictions, batch, stage):
        """4-term masked loss (reference ``:50-76``). Masks use the *frame*
        lengths from the padded annotation (the reference used wav_lens; with
        independent shape-bucketing of wav and anno the annotation's own
        relative lengths are the correct mask source)."""
        onset_logits, offset_logits, pitch_octave_logits, pitch_class_logits, _ = predictions
        anno, anno_lens = batch["anno"]
        onset_gt = anno[:, :, 0].astype(np.float32)
        offset_gt = anno[:, :, 1].astype(np.float32)
        octave_gt = anno[:, :, 2].astype(np.int32)
        pitch_gt = anno[:, :, 3].astype(np.int32)

        onset_loss = self.hparams.onset_criterion(
            onset_logits, onset_gt, length=anno_lens,
            pos_weight=self.hparams.onset_positive_weight)
        offset_loss = self.hparams.offset_criterion(offset_logits, offset_gt, length=anno_lens)
        octave_log_prob = self.hparams.log_softmax(None, pitch_octave_logits)
        octave_loss = self.hparams.octave_criterion(octave_log_prob, octave_gt, length=anno_lens)
        pitch_log_prob = self.hparams.log_softmax(None, pitch_class_logits)
        pitch_loss = self.hparams.pitch_criterion(pitch_log_prob, pitch_gt, length=anno_lens)
        return onset_loss + offset_loss + octave_loss + pitch_loss

    # ----------------------------------------------------- host-side eval
    def on_evaluate_batch_end(self, batch, predictions, loss, stage):
        """Song stitching + note decoding + scoring (reference ``:78-141``)."""
        if stage == sb.Stage.TRAIN:
            return
        onset_logits, offset_logits, octave_logits, class_logits, wav_lens = predictions
        ids = batch.id
        anno, _ = batch["anno"]
        # loss-term metrics (reference :80-83)
        anno_np = np.asarray(anno)
        self.onset_loss_metric.append(
            ids, onset_logits, anno_np[:, :, 0].astype(np.float32),
            length=batch["anno"].lengths, pos_weight=self.hparams.onset_positive_weight)
        self.offset_loss_metric.append(
            ids, offset_logits, anno_np[:, :, 1].astype(np.float32),
            length=batch["anno"].lengths)

        cur_utter = int(np.asarray(batch.cur_utter)[0])
        all_utter = int(np.asarray(batch.all_utter)[0])
        assert cur_utter == self.last_utter + 1 or cur_utter == 1
        assert onset_logits.shape[0] == 1, "eval expects batch_size 1 in song order"

        # trim padding: true frame count derives from the true sample count
        wav_rel = float(np.asarray(batch["sig"].lengths)[0])
        true_samples = int(round(wav_rel * batch["sig"].data.shape[1]))
        frames = self.modules.wav2vec2.config.output_length(true_samples)

        onset_probs = _sigmoid(onset_logits[0][:frames])
        offset_probs = _sigmoid(offset_logits[0][:frames])
        octave_idx = np.argmax(octave_logits[0][:frames], axis=-1)
        class_idx = np.argmax(class_logits[0][:frames], axis=-1)
        for f in range(frames):
            self.song_pred.append(
                (float(onset_probs[f]), float(offset_probs[f]),
                 int(octave_idx[f]), int(class_idx[f])))

        if cur_utter == all_utter:
            est_result = frame2note(
                self.song_pred, onset_thres=self.hparams.onset_threshold,
                offset_thres=self.hparams.offset_threshold,
                frame_size=1 / self.hparams.frame_rate)
            ref_intervals = np.asarray(batch.ref_intervals.data[0], dtype=np.float64)
            ref_pitchs = np.asarray(batch.ref_pitchs.data[0], dtype=np.float64)
            self._score_song(est_result, ref_intervals, ref_pitchs)
            self.song_pred = []
        self.last_utter = cur_utter

    def _score_song(self, est_result, ref_intervals, ref_pitchs):
        est_np = np.array(est_result) if est_result else np.zeros((0, 3))
        raw = transcription_eval.evaluate(
            ref_intervals, transcription_eval.midi_to_hz(ref_pitchs),
            est_np[:, :2], transcription_eval.midi_to_hz(est_np[:, 2]),
            onset_tolerance=self.hparams.onset_tolerance,
            pitch_tolerance=self.hparams.pitch_tolerance)
        self.COnPOff_precis.update(raw["Precision"])
        self.COnPOff_recall.update(raw["Recall"])
        self.COnPOff_f1.update(raw["F-measure"])
        self.COnP_precis.update(raw["Precision_no_offset"])
        self.COnP_recall.update(raw["Recall_no_offset"])
        self.COnP_f1.update(raw["F-measure_no_offset"])
        self.COn_precis.update(raw["Onset_Precision"])
        self.COn_recall.update(raw["Onset_Recall"])
        self.COn_f1.update(raw["Onset_F-measure"])

    # ------------------------------------------------------------- stages
    def on_stage_start(self, stage, epoch=None):
        """Fresh metrics; linear-probe freezing (reference ``:165-199``)."""
        self.onset_loss_metric = self.hparams.onset_stats()
        self.offset_loss_metric = self.hparams.offset_stats()
        if stage != sb.Stage.TRAIN:
            self.last_utter = 0
            self.song_pred = []
            for name in ("COnPOff", "COnP", "COn"):
                for kind in ("precis", "recall", "f1"):
                    setattr(self, f"{name}_{kind}", AverageMeter())
        else:
            if epoch is not None and epoch <= self.hparams.linear_prob_epochs:
                logger.info("Stage for linear probing")
                self.set_frozen_modules(["wav2vec2"])
            else:
                logger.info("Stage for full finetuning")
                self.set_frozen_modules([])

    def on_fit_start(self):
        """Init optimizers, resume, optionally warm-start the encoder
        (reference ``:209-236``)."""
        super().on_fit_start()
        pretrained = self.modules.wav2vec2.load_pretrained()
        if pretrained is not None:
            logger.info(f"Loaded wav2vec2 weights from "
                        f"{self.modules.wav2vec2.save_path or self.modules.wav2vec2.source}")
            self.load_module_params("wav2vec2", pretrained)
        elif getattr(self.hparams, "pretrain", False):
            path = os.path.join(self.hparams.pretrain_folder, "wav2vec2.msgpack")
            from flax import serialization

            with open(path, "rb") as f:
                tree = serialization.msgpack_restore(f.read())
            self.load_module_params("wav2vec2", tree)
            logger.info(f"Loaded wav2vec 2.0 model weights from: {path}")
        else:
            logger.info("No wav2vec 2.0 to be transferred")

    def init_optimizers(self):
        """Adam on the encoder + Adadelta on the head (reference ``:307-318``)."""
        self.add_optimizer(
            "wav2vec", functools.partial(optax.adam), ["wav2vec2"],
            lr=self.hparams.lr_wav2vec)
        self.add_optimizer(
            "model", functools.partial(optax.adadelta, rho=0.95, eps=1e-8),
            ["model"], lr=self.hparams.lr)

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """NewBob annealing + logging + checkpointing (reference ``:238-305``)."""
        stage_stats = {"loss": stage_loss}
        if stage == sb.Stage.TRAIN:
            self.train_stats = stage_stats
            return
        for name in ("COnPOff", "COnP", "COn"):
            for kind in ("precis", "recall", "f1"):
                stage_stats[f"{name}_{kind}"] = getattr(self, f"{name}_{kind}").avg

        if stage == sb.Stage.VALID:
            old_lr_model, new_lr_model = self.hparams.lr_annealing_model(stage_stats["loss"])
            old_lr_wav2vec, new_lr_wav2vec = self.hparams.lr_annealing_wav2vec(stage_stats["loss"])
            self.set_learning_rate("model", new_lr_model)
            self.set_learning_rate("wav2vec", new_lr_wav2vec)
            self.hparams.train_logger.log_stats(
                stats_meta={"epoch": epoch, "lr_model": old_lr_model,
                            "lr_wav2vec": old_lr_wav2vec},
                train_stats=self.train_stats,
                valid_stats={
                    "loss": stage_loss,
                    "onset_loss": self.onset_loss_metric.summarize("average"),
                    "offset_loss": self.offset_loss_metric.summarize("average"),
                    **{k: v for k, v in stage_stats.items() if k != "loss"},
                })
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"loss": stage_stats["loss"]}, min_keys=["loss"])
        elif stage == sb.Stage.TEST:
            self.hparams.train_logger.log_stats(
                stats_meta={"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={
                    "loss": stage_loss,
                    "COnPOff_f1": stage_stats["COnPOff_f1"],
                    "COnP_f1": stage_stats["COnP_f1"],
                    "COn_f1": stage_stats["COn_f1"],
                })


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))


def dataio_prepare(hparams):
    """Datasets + host pipelines (reference ``:321-433``)."""
    data_folder = hparams["data_folder"]
    train_data = dataset.DynamicItemDataset.from_csv(
        csv_path=hparams["train_csv"], replacements={"data_root": data_folder})

    if hparams["sorting"] in ("ascending", "descending"):
        train_data = train_data.filtered_sorted(
            sort_key="duration", reverse=hparams["sorting"] == "descending")
        hparams["train_dataloader_opts"]["shuffle"] = False
    elif hparams["sorting"] != "random":
        raise NotImplementedError("sorting must be random, ascending or descending")

    valid_data = dataset.DynamicItemDataset.from_csv(
        csv_path=hparams["valid_csv"], replacements={"data_root": data_folder})
    # NOTE: never filter/sort eval sets: utterances of each song must stay together

    test_datasets = {}
    for csv_file in hparams["test_csv"]:
        name = os.path.splitext(os.path.basename(csv_file))[0]
        test_datasets[name] = dataset.DynamicItemDataset.from_csv(
            csv_path=csv_file, replacements={"data_root": data_folder})

    datasets = [train_data, valid_data] + [i for k, i in test_datasets.items()]

    dur_threshold = hparams["dur_threshold"]
    sample_rate = hparams["sample_rate"]
    frame_rate = hparams["frame_rate"]

    def audio_pipeline(wav, utter_id, utter_num):
        """Read + utterance slice (reference ``:373-392``)."""
        sig = dataio.read_audio(wav)
        assert sig.ndim == 1
        utter_id, utter_num = int(utter_id), int(utter_num)
        start = round((utter_id - 1) * sample_rate * dur_threshold)
        if utter_id == utter_num:
            return sig[start:]
        stop = round(utter_id * sample_rate * dur_threshold)
        return sig[start:stop]

    dataset.add_dynamic_item(datasets, audio_pipeline,
                             takes=["wav", "utter_id", "utter_num"], provides="sig")

    def anno_items(frame_anno, song_anno, utter_id, utter_num):
        """Frame labels + whole-song note references (reference ``:395-424``)."""
        utter_id, utter_num = int(utter_id), int(utter_num)
        with open(song_anno) as json_data:
            song = json.load(json_data)
        song_np = np.array(song, dtype=np.float64)
        ref_intervals = song_np[:, :2]
        ref_pitchs = song_np[:, 2]
        anno = np.load(frame_anno)
        start = round((utter_id - 1) * frame_rate * dur_threshold)
        if utter_id == utter_num:
            anno = anno[start:]
        else:
            stop = round(utter_id * frame_rate * dur_threshold)
            anno = anno[start:stop]
        return anno, utter_id, utter_num, ref_intervals, ref_pitchs

    dataset.add_dynamic_item(
        datasets, anno_items,
        takes=["frame_anno", "song_anno", "utter_id", "utter_num"],
        provides=["anno", "cur_utter", "all_utter", "ref_intervals", "ref_pitchs"])

    dataset.set_output_keys(
        datasets,
        ["id", "sig", "anno", "cur_utter", "all_utter", "ref_intervals", "ref_pitchs"])
    return train_data, valid_data, test_datasets


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])

    from svt_speechbrain_tpu.parallel.distributed import ddp_init_group

    ddp_init_group(run_opts)

    with open(hparams_file) as fin:
        hparams = load_hyperyaml(fin, overrides)

    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file,
        overrides=overrides,
    )

    train_data, valid_data, test_datasets = dataio_prepare(hparams)

    amt_brain = AMT(
        modules=hparams["modules"],
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=hparams["checkpointer"],
    )

    amt_brain.fit(
        amt_brain.hparams.epoch_counter,
        train_data,
        valid_data,
        train_loader_kwargs=hparams["train_dataloader_opts"],
        valid_loader_kwargs=hparams["valid_dataloader_opts"],
    )

    for k in test_datasets.keys():
        amt_brain.evaluate(
            test_datasets[k],
            min_key="loss",
            test_loader_kwargs=hparams["test_dataloader_opts"],
        )
