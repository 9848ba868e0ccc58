#!/usr/bin/env python3
"""Recipe: stage-2 RCA audio-visual fusion AMT over pre-extracted features.

Twin of ``/root/reference/N20EMv2/audio_visual/train_rca_av.py``: residual
cross-attention fusion of frozen wav2vec2 audio features (49.8 Hz) and
AV-HuBERT visual features (50 Hz), single Adadelta over fusion + head, head
warm-started from the stage-1 classifier; saves per-song note predictions;
noise-robustness sweep via the ``add_noise``/``noise_type``/``snr_db``
switches.
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
from svt_speechbrain_tpu.tasks.amt import FusionAMT  # noqa: E402

logger = logging.getLogger(__name__)


class AMT(FusionAMT):
    """AV fusion AMT (reference ``train_rca_av.py:26``)."""


def _load_feats(path):
    """Load a feature dump (.npy from this framework, .pt from the reference)."""
    if path.endswith(".npy"):
        return np.load(path)
    import torch

    return torch.load(path, map_location="cpu").numpy()


def dataio_prepare(hparams):
    """Datasets + feature pipelines (reference ``:390-470``)."""
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
    datasets = [train_data, valid_data] + [i for k, i in test_datasets.items()]

    dur_threshold = hparams["dur_threshold"]
    rate1 = hparams["audio_sample_rate"]   # 49.8 feature fps
    rate2 = hparams["video_sample_rate"]   # 50 feature fps
    frame_rate = hparams["frame_rate"]

    def audio_visual_pipeline(audio, video, utter_id, utter_num):
        """Per-utterance feature slices + 49.8/50 Hz alignment
        (reference ``:399-441``)."""
        if hparams.get("add_noise"):
            folder = os.path.dirname(audio)
            stem = f"SNR_{hparams['snr_db']}dB_feats"
            for ext in (".npy", ".pt"):
                cand = os.path.join(folder, hparams["noise_type"], stem + ext)
                if os.path.exists(cand):
                    audio = cand
                    break
        sig1 = _load_feats(audio)   # (frames1, 1024)
        sig2 = _load_feats(video)   # (frames2, 1024)
        utter_id, utter_num = int(utter_id), int(utter_num)
        if utter_id == utter_num:
            sig1 = sig1[round((utter_id - 1) * rate1 * dur_threshold):]
            sig2 = sig2[round((utter_id - 1) * rate2 * dur_threshold):]
        else:
            sig1 = sig1[round((utter_id - 1) * rate1 * dur_threshold):
                        round(utter_id * rate1 * dur_threshold)]
            sig2 = sig2[round((utter_id - 1) * rate2 * dur_threshold):
                        round(utter_id * rate2 * dur_threshold)]
        # align: truncate/zero-pad video to the audio frame count
        frame1, frame2 = sig1.shape[0], sig2.shape[0]
        if frame1 < frame2:
            sig2 = sig2[:frame1]
        elif frame1 > frame2:
            sig2 = np.concatenate(
                [sig2, np.zeros((frame1 - frame2, sig2.shape[1]), sig2.dtype)], axis=0)
        return sig1.astype(np.float32), sig2.astype(np.float32)

    dataset.add_dynamic_item(datasets, audio_visual_pipeline,
                             takes=["audio", "video", "utter_id", "utter_num"],
                             provides=["sig1", "sig2"])

    def anno_items(frame_anno, song_anno, utter_id, utter_num):
        utter_id, utter_num = int(utter_id), int(utter_num)
        with open(song_anno) as f:
            song = json.load(f)
        song_np = np.array(song, dtype=np.float64)
        anno = np.load(frame_anno)
        start = round((utter_id - 1) * frame_rate * dur_threshold)
        if utter_id == utter_num:
            anno = anno[start:]
        else:
            anno = anno[start:round(utter_id * frame_rate * dur_threshold)]
        return anno, utter_id, utter_num, song_np[:, :2], song_np[:, 2]

    dataset.add_dynamic_item(
        datasets, anno_items,
        takes=["frame_anno", "song_anno", "utter_id", "utter_num"],
        provides=["anno", "cur_utter", "all_utter", "ref_intervals", "ref_pitchs"])

    dataset.set_output_keys(
        datasets,
        ["id", "sig1", "sig2", "anno", "cur_utter", "all_utter",
         "ref_intervals", "ref_pitchs", "audio"])
    return train_data, valid_data, test_datasets


def main(brain_cls):
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from svt_speechbrain_tpu.parallel.distributed import ddp_init_group

    ddp_init_group(run_opts)
    with open(hparams_file) as fin:
        hparams = load_hyperyaml(fin, overrides)
    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file, overrides=overrides)

    train_data, valid_data, test_datasets = dataio_prepare(hparams)
    amt_brain = brain_cls(modules=hparams["modules"], hparams=hparams,
                          run_opts=run_opts, checkpointer=hparams["checkpointer"])
    amt_brain.fit(
        amt_brain.hparams.epoch_counter, train_data, valid_data,
        train_loader_kwargs=hparams["train_dataloader_opts"],
        valid_loader_kwargs=hparams["valid_dataloader_opts"])
    for k in test_datasets.keys():
        amt_brain.evaluate(test_datasets[k], max_key="COnPOff_f1",
                           test_loader_kwargs=hparams["test_dataloader_opts"])


if __name__ == "__main__":
    main(AMT)
