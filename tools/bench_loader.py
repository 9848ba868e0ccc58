#!/usr/bin/env python3
"""Loader I/O microbenchmark: native C++ WAV decode vs the numpy fallback.

The loader's hot path (RIFF parse → sliced PCM decode → int16 mono mixdown,
``svt_speechbrain_tpu/native/wav_loader.cpp``) runs in dataloader worker
threads; this tool measures its decode throughput against the pure-numpy
fallback on synthetic 16 kHz mono files, including the sliced-read pattern
the utterance pipeline uses (read 5 s windows out of full songs).

    python tools/bench_loader.py          # one JSON line per variant
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main():
    from svt_speechbrain_tpu import native
    from svt_speechbrain_tpu.dataio.dataio import write_audio, _read_wav

    rng = np.random.default_rng(0)
    sr = 16000
    n_files, seconds = 8, 180  # 8 three-minute songs
    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    paths = []
    for i in range(n_files):
        sig = (rng.normal(size=seconds * sr) * 0.1).astype(np.float32)
        p = os.path.join(tmp, f"song{i}.wav")
        write_audio(p, sig, sr)
        paths.append(p)
    total_mb = n_files * seconds * sr * 2 / 1e6  # int16 payload

    def timeit(fn, passes=3):
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    def native_full():
        for p in paths:
            native.wav_read_int16(p)

    def numpy_full():
        for p in paths:
            _read_wav(p)

    def native_sliced():
        for p in paths:
            for s in range(0, seconds * sr, 5 * sr):
                native.wav_read_int16(p, start=s, stop=s + 5 * sr)

    results = {
        "native_full_MBps": total_mb / timeit(native_full),
        "numpy_full_MBps": total_mb / timeit(numpy_full),
        "native_sliced_MBps": total_mb / timeit(native_sliced),
    }
    results["native_vs_numpy"] = round(
        results["native_full_MBps"] / results["numpy_full_MBps"], 2)
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))
    for p in paths:
        os.remove(p)
    os.rmdir(tmp)


if __name__ == "__main__":
    main()
