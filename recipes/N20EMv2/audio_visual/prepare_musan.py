#!/usr/bin/env python3
"""MUSAN preparation — TPU-build port of
``/root/reference/N20EMv2/audio_visual/prepare_musan.py``.

- ``split_musan``: cut MUSAN wavs into 10 s clips (reference ``:17``);
- ``make_musan_babble``: synthesize babble by summing 30-speaker mixes of
  random speech clips (reference ``:67``);
- ``count_frames``: total frame count sanity pass (reference ``:99``).

The reference shards this slurm-style; here a simple ``--shard i --nshards n``
split covers the same parallelism host-side.
"""
import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from svt_speechbrain_tpu.dataio.dataio import _read_wav, write_audio  # noqa: E402

SAMPLERATE = 16000


def split_musan(musan_root, out_root, clip_seconds=10, shard=0, nshards=1):
    files = sorted(glob.glob(os.path.join(musan_root, "*", "*", "*.wav")))
    files = files[shard::nshards]
    window = SAMPLERATE * clip_seconds
    for file in files:
        audio, sr = _read_wav(file)
        if sr != SAMPLERATE:
            from scipy.signal import resample_poly
            from math import gcd

            g = gcd(SAMPLERATE, sr)
            audio = resample_poly(audio, SAMPLERATE // g, sr // g, axis=0)
        audio = audio.mean(axis=1)
        rel = os.path.relpath(file, musan_root)
        stem = os.path.splitext(rel.replace(os.sep, "-"))[0]
        out_dir = os.path.join(out_root, os.path.dirname(rel))
        os.makedirs(out_dir, exist_ok=True)
        for i in range(len(audio) // window):
            clip = audio[i * window:(i + 1) * window]
            write_audio(os.path.join(out_dir, f"{stem}-{i}.wav"), clip, SAMPLERATE)


def make_musan_babble(speech_root, out_root, n_speakers=30, n_mixes=100,
                      clip_seconds=10, seed=0):
    rng = np.random.default_rng(seed)
    files = sorted(glob.glob(os.path.join(speech_root, "**", "*.wav"), recursive=True))
    window = SAMPLERATE * clip_seconds
    os.makedirs(out_root, exist_ok=True)
    splits = (["train"] * (n_mixes * 3 // 4) + ["valid"] * (n_mixes // 8))
    splits += ["test"] * (n_mixes - len(splits))
    for m in range(n_mixes):
        mix = np.zeros(window, np.float32)
        chosen = rng.choice(len(files), size=min(n_speakers, len(files)), replace=False)
        for idx in chosen:
            audio, sr = _read_wav(files[idx])
            clip = audio.mean(axis=1)
            if len(clip) < window:
                clip = np.pad(clip, (0, window - len(clip)))
            start = int(rng.integers(0, max(len(clip) - window, 0) + 1))
            mix += clip[start:start + window]
        mix /= max(np.abs(mix).max(), 1e-9)
        write_audio(os.path.join(out_root, f"{splits[m]}-babble-{m}.wav"),
                    mix * 0.9, SAMPLERATE)


def count_frames(root):
    total = 0
    for file in glob.glob(os.path.join(root, "**", "*.wav"), recursive=True):
        audio, _ = _read_wav(file)
        total += audio.shape[0]
    print(f"{total} frames under {root}")
    return total


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("command", choices=["split", "babble", "count"])
    parser.add_argument("--musan", type=str, default="/path/to/musan")
    parser.add_argument("--out", type=str, default="./noise")
    parser.add_argument("--shard", type=int, default=0)
    parser.add_argument("--nshards", type=int, default=1)
    args = parser.parse_args()
    if args.command == "split":
        split_musan(args.musan, args.out, shard=args.shard, nshards=args.nshards)
    elif args.command == "babble":
        make_musan_babble(os.path.join(args.musan, "speech"), args.out)
    else:
        count_frames(args.out)
