#!/usr/bin/env python3
"""Noise synthesis for the robustness bench — TPU-build port of
``/root/reference/N20EMv2/audio_visual/synthesis_noise.py``.

Builds ``noise_data/<type>/SNR_{-10,-5,0,5,10}dB.wav`` per song for four
noise types:

- ``accomp``  — the paired accompaniment stem (reference ``:100-141``);
- ``white``   — gaussian noise (``:147-184``);
- ``babble``  — MUSAN speech babble mixes tiled in 10 s windows
  (``:190-310``);
- ``natural`` — MUSAN free-sound/sound-bible clips, split 3/4-1/8-1/8 across
  train/valid/test (``:314-472``).

SNR mixing uses the amplitude-factor formula from
``svt_speechbrain_tpu.processing.signal_processing.mix_at_snr`` (identical
to ``:126-137``). Note: the reference's babble synthesis selects the noise
pool with a stale loop variable; here the song's own split selects the pool
(the evident intent).
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from svt_speechbrain_tpu.dataio.dataio import _read_wav, write_audio  # noqa: E402
from svt_speechbrain_tpu.processing.signal_processing import mix_at_snr  # noqa: E402

SAMPLERATE = 16000
SNRS = (-10, -5, 0, 5, 10)


def _load_mono(path):
    audio, sr = _read_wav(path)
    assert sr == SAMPLERATE and audio.shape[1] == 1, path
    return audio[:, 0]


def _save_snr_sweep(out_dir, audio, noise):
    os.makedirs(out_dir, exist_ok=True)
    for snr_db in SNRS:
        mixed = np.asarray(mix_at_snr(audio, noise, snr_db))
        if mixed.ndim > 1:
            mixed = mixed[0]
        write_audio(os.path.join(out_dir, f"SNR_{snr_db}dB.wav"), mixed, SAMPLERATE)


def synthesis_accomp(folder):
    """Accompaniment-stem noise (reference ``:100-141``)."""
    with open(os.path.join(folder, "annotations.json")) as f:
        annotations = json.load(f)
    folder_data = os.path.join(folder, "data")
    for entry in annotations:
        audio = _load_mono(os.path.join(folder_data, entry, "vocals.wav"))
        accomp = _load_mono(os.path.join(folder_data, entry, "accomp.wav"))
        assert len(audio) == len(accomp)
        _save_snr_sweep(os.path.join(folder_data, entry, "noise_data", "accomp"),
                        audio, accomp)


def synthesis_white(folder, seed=0):
    """White-noise sweep (reference ``:147-184``)."""
    rng = np.random.default_rng(seed)
    with open(os.path.join(folder, "annotations.json")) as f:
        annotations = json.load(f)
    folder_data = os.path.join(folder, "data")
    for entry in annotations:
        audio = _load_mono(os.path.join(folder_data, entry, "vocals.wav"))
        white = rng.standard_normal(len(audio)).astype(np.float32)
        _save_snr_sweep(os.path.join(folder_data, entry, "noise_data", "white"),
                        audio, white)


def _tile_noise(pool, total_len, duration_thrd, rng):
    """Tile randomly-chosen ≤10 s clips (centered zero-padding) to cover
    ``total_len`` samples (reference ``:246-285``)."""
    window = round(SAMPLERATE * duration_thrd)
    n_windows = int(np.ceil(total_len / window))
    pieces = []
    keys = list(pool.keys())
    for w in range(n_windows):
        clip = pool[keys[rng.integers(len(keys))]]
        if w < n_windows - 1:
            assert len(clip) <= window
            pad1 = (window - len(clip)) // 2
            piece = np.zeros(window, np.float32)
            piece[pad1:pad1 + len(clip)] = clip
        else:
            remain = total_len - (n_windows - 1) * window
            if len(clip) <= remain:
                pad1 = (remain - len(clip)) // 2
                piece = np.zeros(remain, np.float32)
                piece[pad1:pad1 + len(clip)] = clip
            else:
                piece = clip[:remain]
        pieces.append(piece)
    noise = np.concatenate(pieces)
    assert len(noise) == total_len
    return noise


def _load_pools_by_split(noise_files, split_fn):
    pools = {"train": {}, "valid": {}, "test": {}}
    for file in noise_files:
        audio, sr = _read_wav(file)
        if sr != SAMPLERATE or audio.shape[1] != 1:
            continue
        split = split_fn(file)
        if split in pools:
            pools[split][file] = audio[:, 0]
    return pools


def synthesis_babble(folder, noise_folder, save_json_file="noise/babble.json",
                     duration_thrd=10, seed=0):
    """MUSAN-babble sweep (reference ``:190-310``). ``noise_folder`` holds
    10 s babble mixes named ``<split>-*.wav`` (see ``prepare_musan.py``)."""
    rng = np.random.default_rng(seed)
    noise_files = sorted(glob.glob(noise_folder + "/*/*wav"))
    json_data = {}
    for file in noise_files:
        noise, sr = _read_wav(file)
        if sr != SAMPLERATE:
            continue
        duration = noise.shape[0] / SAMPLERATE
        if duration == duration_thrd:
            json_data[os.path.basename(file)] = {
                "path": file,
                "split": os.path.basename(file).split("-")[0],
                "duration": duration,
            }
    os.makedirs(os.path.dirname(os.path.abspath(save_json_file)), exist_ok=True)
    with open(save_json_file, "w") as f:
        f.write(json.dumps(json_data, indent=2))

    pools = {"train": {}, "valid": {}, "test": {}}
    for entry, meta in json_data.items():
        audio, _ = _read_wav(meta["path"])
        pools[meta["split"]][entry] = audio[:, 0]

    with open(os.path.join(folder, "annotations.json")) as f:
        annotations = json.load(f)
    folder_data = os.path.join(folder, "data")
    for entry in annotations:
        split = annotations[entry].get("split", "train")
        audio = _load_mono(os.path.join(folder_data, entry, "vocals.wav"))
        noise = _tile_noise(pools[split], len(audio), duration_thrd, rng)
        out_dir = os.path.join(folder_data, entry, "noise_data", "babble")
        os.makedirs(out_dir, exist_ok=True)
        write_audio(os.path.join(out_dir, "noise.wav"), noise, SAMPLERATE)
        _save_snr_sweep(out_dir, audio, noise)


def synthesis_natural(folder, noise_folder, duration_thrd=10, seed=0):
    """MUSAN natural-noise sweep (reference ``:314-472``): free-sound /
    sound-bible clips split 3/4 train, 1/8 valid, 1/8 test by index."""
    rng = np.random.default_rng(seed)
    noise_files = sorted(glob.glob(noise_folder + "/*/*wav"))

    def split_fn(file):
        idx = noise_files.index(file)
        n = len(noise_files)
        if idx < n * 3 // 4:
            return "train"
        if idx < n * 7 // 8:
            return "valid"
        return "test"

    pools = _load_pools_by_split(noise_files, split_fn)
    with open(os.path.join(folder, "annotations.json")) as f:
        annotations = json.load(f)
    folder_data = os.path.join(folder, "data")
    for entry in annotations:
        split = annotations[entry].get("split", "train")
        audio = _load_mono(os.path.join(folder_data, entry, "vocals.wav"))
        noise = _tile_noise(pools[split], len(audio), duration_thrd, rng)
        out_dir = os.path.join(folder_data, entry, "noise_data", "natural")
        os.makedirs(out_dir, exist_ok=True)
        write_audio(os.path.join(out_dir, "noise.wav"), noise, SAMPLERATE)
        _save_snr_sweep(out_dir, audio, noise)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--n20emv2", type=str, default="/path/to/N20EMv2")
    parser.add_argument("--noise_type", type=str, default="accomp",
                        choices=["accomp", "white", "babble", "natural"])
    parser.add_argument("--musan_babble", type=str, default="noise/babble")
    parser.add_argument("--musan_natural", type=str, default="noise/natural")
    args = parser.parse_args()

    if args.noise_type == "accomp":
        synthesis_accomp(args.n20emv2)
    elif args.noise_type == "white":
        synthesis_white(args.n20emv2)
    elif args.noise_type == "babble":
        synthesis_babble(args.n20emv2, args.musan_babble)
    else:
        synthesis_natural(args.n20emv2, args.musan_natural)
