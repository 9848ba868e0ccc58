#!/usr/bin/env python3
"""Data preparation for the AMT benchmark datasets (MIR-ST500 / TONAS /
ISMIR2014) — TPU-build port of ``/root/reference/MIR_ST500/prepare_benchmarks.py``.

Offline host-side tooling: 44.1 kHz → 16 kHz mono resampling (polyphase,
scipy), per-song frame-level annotation at 49.8 fps via ``note2frame``, and
CSV manifests with the song → 5 s utterance split (``utter_id``/``utter_num``
columns) that the training recipes consume.

Expected dataset layout (as the reference): ``<root>/<song>/vocals.wav`` plus
a top-level ``Annotations.json`` mapping song id → [[onset, offset, midi]...].
"""
import argparse
import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from svt_speechbrain_tpu.dataio.dataio import read_audio, write_audio, _read_wav  # noqa: E402
from svt_speechbrain_tpu.utils.amt import note2frame  # noqa: E402

SAMPLERATE = 16000


def resample_dataset(folder, save_folder):
    """44.1 kHz (or any rate) → 16 kHz mono (reference ``:49-73``)."""
    from scipy.signal import resample_poly
    from math import gcd

    os.makedirs(save_folder, exist_ok=True)
    for d in sorted(os.listdir(folder)):
        audio_path = os.path.join(folder, d, "vocals.wav")
        if not os.path.exists(audio_path):
            continue
        os.makedirs(os.path.join(save_folder, d), exist_ok=True)
        audio, fs = _read_wav(audio_path)  # (T, C)
        if audio.shape[1] > 1:
            audio = audio.mean(axis=1, keepdims=True)
        if fs != SAMPLERATE:
            g = gcd(SAMPLERATE, fs)
            audio = resample_poly(audio, SAMPLERATE // g, fs // g, axis=0)
        write_audio(os.path.join(save_folder, d, "vocals.wav"),
                    audio[:, 0], SAMPLERATE)


def prepare_frame_anno(gt_file, folder, frame_rate=49.8):
    """Per-song ``annotation.json`` + frame labels ``frame_anno.npy``
    (reference ``:75-101``)."""
    with open(gt_file) as json_data:
        gt = json.load(json_data)
    for d in sorted(os.listdir(folder)):
        if d not in gt:
            continue
        anno = gt[d]
        with open(os.path.join(folder, d, "annotation.json"), "w") as json_data:
            json.dump(anno, json_data)
        wav_file = os.path.join(folder, d, "vocals.wav")
        audio, fs = _read_wav(wav_file)
        assert fs == SAMPLERATE, f"{wav_file}: expected {SAMPLERATE} Hz, got {fs}"
        assert audio.shape[1] == 1, f"{wav_file}: expected mono"
        duration = audio.shape[0] / SAMPLERATE
        length = round(duration * frame_rate)
        frame_label = note2frame(gt_data=anno, length=length, frame_size=1 / frame_rate)
        assert frame_label.shape[0] == length
        np.save(os.path.join(folder, d, "frame_anno.npy"), frame_label)


def prepare_csv_benchmarks(folder, save_path, dur_thrd=5):
    """CSV manifest with the song → utterance split (reference ``:104-135``).

    Columns: ``ID,duration,wav,utter_id,utter_num,frame_anno,song_anno``;
    ``utter_num = round(duration / dur_thrd)`` with the last chunk up to
    1.5 × dur_thrd.
    """
    csv_lines = [["ID", "duration", "wav", "utter_id", "utter_num",
                  "frame_anno", "song_anno"]]
    for d in sorted(os.listdir(folder)):
        audio_path = os.path.join(folder, d, "vocals.wav")
        if not os.path.exists(audio_path):
            continue
        anno_path = os.path.join(folder, d, "frame_anno.npy")
        song_anno_path = os.path.join(folder, d, "annotation.json")
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
            csv_lines.append([f"{d}_{i}", str(dur), audio_path, str(i),
                              str(utter_num), anno_path, song_anno_path])
    with open(save_path, "w", newline="") as csv_f:
        writer = csv.writer(csv_f, delimiter=",", quotechar='"',
                            quoting=csv.QUOTE_MINIMAL)
        writer.writerows(csv_lines)


def prepare_all_AMT_datasets(args, save_folder="./data"):
    dur_thrd = args.duration
    csv_folder = os.path.join(save_folder, f"dur_{dur_thrd}s")
    os.makedirs(csv_folder, exist_ok=True)
    print(f"save to {csv_folder}")

    mir_train = os.path.join(args.mir_st500, "wav16kHz", "train")
    mir_test = os.path.join(args.mir_st500, "wav16kHz", "test")
    for split_dir in (mir_train, mir_test):
        prepare_frame_anno(os.path.join(args.mir_st500, "Annotations.json"),
                           split_dir, frame_rate=args.frame_rate)
    prepare_frame_anno(os.path.join(args.ismir, "Annotations.json"),
                       os.path.join(args.ismir, "wav16kHz"), frame_rate=args.frame_rate)
    prepare_frame_anno(os.path.join(args.tonas, "Annotations.json"),
                       os.path.join(args.tonas, "wav16kHz"), frame_rate=args.frame_rate)

    prepare_csv_benchmarks(mir_train, os.path.join(csv_folder, "mir_st500_train.csv"), dur_thrd)
    prepare_csv_benchmarks(mir_test, os.path.join(csv_folder, "mir_st500_test.csv"), dur_thrd)
    prepare_csv_benchmarks(os.path.join(args.ismir, "wav16kHz"),
                           os.path.join(csv_folder, "ismir2014.csv"), dur_thrd)
    prepare_csv_benchmarks(os.path.join(args.tonas, "wav16kHz"),
                           os.path.join(csv_folder, "tonas.csv"), dur_thrd)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--duration", type=int, default=5)
    parser.add_argument("--frame_rate", type=float, default=49.8)
    parser.add_argument("--mir_st500", type=str, default="/path/to/MIR_ST500")
    parser.add_argument("--ismir", type=str, default="/path/to/ISMIR2014")
    parser.add_argument("--tonas", type=str, default="/path/to/TONAS")
    args = parser.parse_args()
    prepare_all_AMT_datasets(args)
