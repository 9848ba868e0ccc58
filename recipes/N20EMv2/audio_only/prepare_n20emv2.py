#!/usr/bin/env python3
"""N20EMv2 audio data preparation — TPU-build port of
``/root/reference/N20EMv2/audio_only/prepare_n20emv2.py``.

Dataset layout: ``<root>/annotations.json`` (entry → {"midi": notes,
"split": train/valid/test}) + ``<root>/data/<entry>/vocals.wav``. Produces
per-song ``note_anno.json`` + ``frame_anno.npy`` at 49.8 fps and split CSVs,
then merges ``mir_st500_train.csv`` + ``n20em_train.csv`` → ``mix_train.csv``.
"""
import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from svt_speechbrain_tpu.dataio.dataio import _read_wav, merge_csvs  # noqa: E402
from svt_speechbrain_tpu.utils.amt import note2frame  # noqa: E402

SAMPLERATE = 16000


def prepare_frame_anno(folder, frame_rate=49.8):
    """Per-song note/frame annotations (reference ``:19-50``)."""
    with open(os.path.join(folder, "annotations.json")) as f:
        annotations = json.load(f)
    folder_data = os.path.join(folder, "data")
    for entry in annotations:
        anno = annotations[entry]["midi"]
        with open(os.path.join(folder_data, entry, "note_anno.json"), "w") as f:
            json.dump(anno, f)
        audio, fs = _read_wav(os.path.join(folder_data, entry, "vocals.wav"))
        assert fs == SAMPLERATE and audio.shape[1] == 1
        duration = audio.shape[0] / SAMPLERATE
        length = round(duration * frame_rate)
        frame_label = note2frame(gt_data=anno, length=length, frame_size=1 / frame_rate)
        assert frame_label.shape[0] == length
        np.save(os.path.join(folder_data, entry, "frame_anno.npy"), frame_label)


def prepare_csv_n20emv2(folder, csv_folder="./data", dur_thrd=5):
    """Split CSVs with the song → utterance split (reference ``:53-120``)."""
    header = ["ID", "duration", "wav", "utter_id", "utter_num", "frame_anno", "song_anno"]
    lines = {"train": [header], "valid": [header], "test": [header]}
    with open(os.path.join(folder, "annotations.json")) as f:
        annotations = json.load(f)
    folder_data = os.path.join(folder, "data")
    for entry in annotations:
        split = annotations[entry]["split"]
        audio_path = os.path.join(folder_data, entry, "vocals.wav")
        anno_path = os.path.join(folder_data, entry, "frame_anno.npy")
        song_anno_path = os.path.join(folder_data, entry, "note_anno.json")
        audio, fs = _read_wav(audio_path)
        assert fs == SAMPLERATE
        duration = audio.shape[0] / SAMPLERATE
        utter_num = max(1, round(duration / dur_thrd))
        for i in range(1, utter_num + 1):
            if i == utter_num:
                dur = duration - (utter_num - 1) * dur_thrd
                assert 0 < dur <= dur_thrd * 3 / 2
            else:
                dur = dur_thrd
            lines[split].append([f"{entry}_{i}", str(dur), audio_path, str(i),
                                 str(utter_num), anno_path, song_anno_path])
    save_folder = os.path.join(csv_folder, f"dur_{dur_thrd}s")
    os.makedirs(save_folder, exist_ok=True)
    for split, rows in lines.items():
        with open(os.path.join(save_folder, f"n20em_{split}.csv"), "w", newline="") as f:
            csv.writer(f, delimiter=",", quotechar='"', quoting=csv.QUOTE_MINIMAL).writerows(rows)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--duration", type=int, default=5)
    parser.add_argument("--frame_rate", type=float, default=49.8)
    parser.add_argument("--n20emv2", type=str, default="/path/to/N20EMv2")
    args = parser.parse_args()

    prepare_frame_anno(folder=args.n20emv2, frame_rate=args.frame_rate)
    prepare_csv_n20emv2(folder=args.n20emv2, dur_thrd=args.duration)
    save_folder = os.path.join("./data", f"dur_{args.duration}s")
    merge_csvs(data_folder=save_folder,
               csv_lst=["mir_st500_train.csv", "n20em_train.csv"],
               merged_csv="mix_train.csv")
