"""Native (C++) host-runtime components with lazy in-tree compilation.

The reference's host runtime rides torch's C++ DataLoader + torchaudio
decoders; here a small C++ library covers the loader's hot I/O ops (WAV
header parse, sliced PCM decode with normalization, mono-mixed int16 reads
for the inference pipeline's half-bandwidth device feed).

``get_lib()`` compiles ``wav_loader.cpp`` with g++ on first use (cached as
``libsvtnative.so`` beside the source) and returns a ctypes handle, or None
when no compiler is available — callers fall back to the numpy/scipy path.
"""
from __future__ import annotations

import ctypes
import logging
import os
import shutil
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "wav_loader.cpp")
_LIB = os.path.join(_HERE, "libsvtnative.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _compile():
    cxx = shutil.which("g++") or shutil.which("c++") or shutil.which("clang++")
    if cxx is None:
        return False
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except subprocess.CalledProcessError as e:
        logger.warning(f"native build failed: {e.stderr.decode(errors='replace')}")
        return False


def get_lib():
    """ctypes handle to the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            logger.warning(f"native load failed: {e}")
            return None
        lib.wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_read.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_float)]
        lib.wav_read.restype = ctypes.c_int
        lib.wav_read_int16.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                       ctypes.c_int64,
                                       ctypes.POINTER(ctypes.c_int16)]
        lib.wav_read_int16.restype = ctypes.c_int
        _lib = lib
        return _lib


def wav_info(path):
    """(frames, sample_rate, channels, bits, is_float) or None."""
    lib = get_lib()
    if lib is None:
        return None
    frames = ctypes.c_int64()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    bits = ctypes.c_int32()
    isf = ctypes.c_int32()
    rc = lib.wav_info(path.encode(), ctypes.byref(frames), ctypes.byref(sr),
                      ctypes.byref(ch), ctypes.byref(bits), ctypes.byref(isf))
    if rc != 0:
        return None
    return frames.value, sr.value, ch.value, bits.value, bool(isf.value)


def wav_read(path, start=0, stop=None):
    """Sliced float32 read → (data (T, C), sample_rate) or None on failure."""
    info = wav_info(path)
    if info is None:
        return None
    frames, sr, ch, _, _ = info
    stop = frames if stop is None else min(int(stop), frames)
    n = max(stop - int(start), 0)
    out = np.empty(n * ch, dtype=np.float32)
    lib = get_lib()
    got = lib.wav_read(path.encode(), int(start), n,
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0:
        return None
    return out[: got * ch].reshape(-1, ch), sr


def wav_read_int16(path, start=0, stop=None):
    """Sliced mono-mixed int16 read → (data (T,), sample_rate) or None."""
    info = wav_info(path)
    if info is None:
        return None
    frames, sr, ch, bits, isf = info
    if bits != 16 or isf:
        return None
    stop = frames if stop is None else min(int(stop), frames)
    n = max(stop - int(start), 0)
    out = np.empty(n, dtype=np.int16)
    lib = get_lib()
    got = lib.wav_read_int16(path.encode(), int(start), n,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    if got < 0:
        return None
    return out[:got], sr
