#!/usr/bin/env python3
"""N20EMv2 video data preparation — TPU-build port of
``/root/reference/N20EMv2/video_only/prepare_n20emv2.py``.

Layout: ``<root>/data/<entry>/video_50fps.npy`` (T, H, W) lip ROIs. Writes
``note_anno.json`` + 50 fps frame annotations and split CSVs with columns
``ID,duration,video,utter_id,utter_num,frame_anno,song_anno``.
"""
import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from svt_speechbrain_tpu.utils.amt import note2frame  # noqa: E402


def prepare_frame_anno(folder, frame_rate=50):
    with open(os.path.join(folder, "annotations.json")) as f:
        annotations = json.load(f)
    folder_data = os.path.join(folder, "data")
    for entry in annotations:
        anno = annotations[entry]["midi"]
        with open(os.path.join(folder_data, entry, "note_anno.json"), "w") as f:
            json.dump(anno, f)
        video = np.load(os.path.join(folder_data, entry, f"video_{frame_rate}fps.npy"))
        length = video.shape[0]
        frame_label = note2frame(gt_data=anno, length=length, frame_size=1 / frame_rate)
        anno_dir = os.path.join(folder_data, entry, "video_anno", f"{frame_rate}fps")
        os.makedirs(anno_dir, exist_ok=True)
        np.save(os.path.join(anno_dir, "video_frame_anno.npy"), frame_label)


def prepare_csv_n20emv2(folder, csv_folder="./data", frame_rate=50, dur_thrd=5):
    header = ["ID", "duration", "video", "utter_id", "utter_num", "frame_anno", "song_anno"]
    lines = {"train": [header], "valid": [header], "test": [header]}
    with open(os.path.join(folder, "annotations.json")) as f:
        annotations = json.load(f)
    folder_data = os.path.join(folder, "data")
    for entry in annotations:
        split = annotations[entry]["split"]
        video_path = os.path.join(folder_data, entry, f"video_{frame_rate}fps.npy")
        anno_path = os.path.join(folder_data, entry, "video_anno", f"{frame_rate}fps",
                                 "video_frame_anno.npy")
        song_anno_path = os.path.join(folder_data, entry, "note_anno.json")
        video = np.load(video_path)
        duration = video.shape[0] / frame_rate
        utter_num = max(1, round(duration / dur_thrd))
        for i in range(1, utter_num + 1):
            if i == utter_num:
                dur = duration - (utter_num - 1) * dur_thrd
                assert 0 < dur <= dur_thrd * 3 / 2
            else:
                dur = dur_thrd
            lines[split].append([f"{entry}_{i}", str(dur), video_path, str(i),
                                 str(utter_num), anno_path, song_anno_path])
    save_folder = os.path.join(csv_folder, f"frame_rate{frame_rate}", f"dur_{dur_thrd}s")
    os.makedirs(save_folder, exist_ok=True)
    for split, rows in lines.items():
        with open(os.path.join(save_folder, f"n20em_{split}.csv"), "w", newline="") as f:
            csv.writer(f, delimiter=",", quotechar='"', quoting=csv.QUOTE_MINIMAL).writerows(rows)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--duration", type=int, default=5)
    parser.add_argument("--frame_rate", type=int, default=50)
    parser.add_argument("--n20emv2", type=str, default="/path/to/N20EMv2")
    args = parser.parse_args()
    prepare_frame_anno(folder=args.n20emv2, frame_rate=args.frame_rate)
    prepare_csv_n20emv2(folder=args.n20emv2, frame_rate=args.frame_rate,
                        dur_thrd=args.duration)
