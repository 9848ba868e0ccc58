#!/usr/bin/env python3
"""Recipe: AV-HuBERT visual-encoder AMT over 50 fps lip-ROI video.

Twin of ``/root/reference/N20EMv2/video_only/train_video_ssl.py``: AV-HuBERT
visual encoder (video modality only, zero-filled audio stream) + linear
head; train-time video transforms Normalize(0,255) → RandomCrop 88 →
HorizontalFlip(0.5) → Normalize(0.421, 0.165), eval CenterCrop; optional
random chunk-boundary jitter (``split_noise``); COff metrics; best ckpt by
valid COnPOff_f1.
"""
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

import svt_speechbrain_tpu as sb  # noqa: E402
from svt_speechbrain_tpu.config import load_hyperyaml  # noqa: E402
from svt_speechbrain_tpu.dataio import dataset  # noqa: E402
from svt_speechbrain_tpu.processing.video import (  # noqa: E402
    Compose, Normalize, CenterCrop, RandomCrop, HorizontalFlip,
)
from svt_speechbrain_tpu.tasks.amt import VideoAMT  # noqa: E402

logger = logging.getLogger(__name__)


class AMT(VideoAMT):
    """N20EMv2 video AMT (reference ``video_only/train_video_ssl.py:26``)."""


def dataio_prepare(hparams, extract=False):
    """Datasets + video pipelines (reference ``:420-560``)."""
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
    test_datasets = {}
    for csv_file in hparams["test_csv"]:
        name = os.path.splitext(os.path.basename(csv_file))[0]
        test_datasets[name] = dataset.DynamicItemDataset.from_csv(
            csv_path=csv_file, replacements={"data_root": data_folder})
    eval_datasets = [valid_data] + [i for k, i in test_datasets.items()]

    dur_threshold = hparams["dur_threshold"]
    sample_rate = hparams["sample_rate"]  # 50 video frames per second
    frame_rate = hparams["frame_rate"]
    split_noise = hparams["split_noise"]
    overlap = hparams.get("overlap", 0)
    stride = dur_threshold - overlap

    image_crop_size = 88
    image_mean = 0.421
    image_std = 0.165
    rng = np.random.default_rng(hparams["seed"])
    transform_train = Compose([
        Normalize(0.0, 255.0),
        RandomCrop((image_crop_size, image_crop_size), rng=rng),
        HorizontalFlip(0.5, rng=rng),
        Normalize(image_mean, image_std)])
    transform_eval = Compose([
        Normalize(0.0, 255.0),
        CenterCrop((image_crop_size, image_crop_size)),
        Normalize(image_mean, image_std)])

    def _slice(arr, rate, utter_id, utter_num, duration, shift):
        """Boundary slice with optional jitter (reference ``:461-529``)."""
        if utter_id == 1:
            n1 = round(rate * abs(shift))
            return arr[n1:n1 + round(rate * dur_threshold)]
        if utter_id == utter_num:
            if duration < dur_threshold:
                n = round((utter_id - 1) * rate * stride - rate * abs(shift))
            else:
                n = round((utter_id - 1) * rate * stride + rate * abs(shift))
            return arr[n:]
        n1 = round((utter_id - 1) * rate * stride + rate * shift)
        n2 = round((utter_id - 1) * rate * stride + rate * shift + rate * dur_threshold)
        return arr[n1:n2]

    def utterance_train_pipeline(video, duration, frame_anno, utter_id, utter_num):
        shift = float(rng.random()) * stride - stride / 2 if split_noise else 0.0
        sig = np.load(video)  # (T, H, W)
        sig = transform_train(sig)
        sig = np.expand_dims(sig, axis=-1).astype(np.float32)  # (T, H, W, 1)
        utter_id, utter_num = int(utter_id), int(utter_num)
        duration = float(duration)
        sig = _slice(sig, sample_rate, utter_id, utter_num, duration, shift)
        anno = np.load(frame_anno)
        anno = _slice(anno, frame_rate, utter_id, utter_num, duration, shift)
        return sig, anno, utter_id, utter_num

    def utterance_eval_pipeline(video, frame_anno, song_anno, utter_id, utter_num):
        sig = np.load(video)
        sig = transform_eval(sig)
        sig = np.expand_dims(sig, axis=-1).astype(np.float32)
        utter_id, utter_num = int(utter_id), int(utter_num)
        start = round((utter_id - 1) * sample_rate * dur_threshold)
        if utter_id == utter_num:
            sig = sig[start:]
        else:
            sig = sig[start:round(utter_id * sample_rate * dur_threshold)]
        anno = np.load(frame_anno)
        astart = round((utter_id - 1) * frame_rate * dur_threshold)
        if utter_id == utter_num:
            anno = anno[astart:]
        else:
            anno = anno[astart:round(utter_id * frame_rate * dur_threshold)]
        with open(song_anno) as f:
            song = json.load(f)
        song_np = np.array(song, dtype=np.float64)
        return sig, anno, utter_id, utter_num, song_np[:, :2], song_np[:, 2]

    dataset.add_dynamic_item(
        [train_data], utterance_train_pipeline,
        takes=["video", "duration", "frame_anno", "utter_id", "utter_num"],
        provides=["sig", "anno", "cur_utter", "all_utter"])
    dataset.add_dynamic_item(
        eval_datasets, utterance_eval_pipeline,
        takes=["video", "frame_anno", "song_anno", "utter_id", "utter_num"],
        provides=["sig", "anno", "cur_utter", "all_utter", "ref_intervals", "ref_pitchs"])

    dataset.set_output_keys([train_data], ["id", "sig", "anno", "cur_utter", "all_utter"])
    eval_keys = ["id", "sig", "anno", "cur_utter", "all_utter", "ref_intervals", "ref_pitchs"]
    if extract:
        eval_keys.append("video")
    dataset.set_output_keys(eval_datasets, eval_keys)
    return train_data, valid_data, test_datasets


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from svt_speechbrain_tpu.parallel.distributed import ddp_init_group

    ddp_init_group(run_opts)
    with open(hparams_file) as fin:
        hparams = load_hyperyaml(fin, overrides)
    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file, overrides=overrides)

    train_data, valid_data, test_datasets = dataio_prepare(hparams)
    amt_brain = AMT(modules=hparams["modules"], hparams=hparams,
                    run_opts=run_opts, checkpointer=hparams["checkpointer"])
    amt_brain.fit(
        amt_brain.hparams.epoch_counter, train_data, valid_data,
        train_loader_kwargs=hparams["train_dataloader_opts"],
        valid_loader_kwargs=hparams["valid_dataloader_opts"])
    for k in test_datasets.keys():
        amt_brain.evaluate(test_datasets[k], max_key="COnPOff_f1",
                           test_loader_kwargs=hparams["test_dataloader_opts"])
