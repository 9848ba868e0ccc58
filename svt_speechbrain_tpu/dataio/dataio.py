"""Data I/O: CSV/JSON manifest loading and audio read/write
(analogue of reference ``speechbrain/dataio/dataio.py``).

Audio I/O is numpy/scipy-based (torchaudio is a GPU-stack dependency the TPU
build doesn't carry): 16-bit/32-bit PCM and float WAV. Reads return float32
in [-1, 1], matching torchaudio's normalized convention so the reference's
recipes port over unchanged.
"""
from __future__ import annotations

import csv
import json
import os
import re

import numpy as np


def load_data_csv(csv_path, replacements={}):
    """Load CSV manifest as dict-of-dicts (reference ``dataio.py:89``).

    Mandatory ``ID`` column becomes the key; ``duration`` is cast to float;
    ``$var`` substrings are replaced via ``replacements``.
    """
    with open(csv_path, newline="") as csvfile:
        result = {}
        reader = csv.DictReader(csvfile, skipinitialspace=True)
        variable_finder = re.compile(r"\$([\w.]+)")
        for row in reader:
            try:
                data_id = row["ID"]
                del row["ID"]
            except KeyError:
                raise KeyError("CSV has to have an 'ID' field, with unique ids for all data points")
            if data_id in result:
                raise ValueError(f"Duplicate id: {data_id}")
            for key, value in row.items():
                try:
                    row[key] = variable_finder.sub(
                        lambda match: str(replacements[match[1]]), value)
                except KeyError:
                    raise KeyError(f"The item {value} requires replacements which were not supplied.")
            if "duration" in row:
                row["duration"] = float(row["duration"])
            result[data_id] = row
    return result


def load_data_json(json_path, replacements={}):
    """Load JSON manifest as dict-of-dicts (reference ``dataio.py:29``)."""
    with open(json_path) as f:
        out_json = json.load(f)
    pattern = re.compile(r"\{(\w*)\}")
    for data_id in out_json:
        for key, value in out_json[data_id].items():
            if isinstance(value, str):
                out_json[data_id][key] = pattern.sub(
                    lambda match: str(replacements.get(match[1], match[0])), value)
    return out_json


def read_audio(waveforms_obj):
    """Read audio and return float32 mono/multichannel in [-1, 1]
    (reference ``dataio.py:161``: a path, or a dict with
    ``{"file": ..., "start": ..., "stop": ...}``)."""
    if isinstance(waveforms_obj, str):
        audio, _sr = _read_wav(waveforms_obj)
        return audio.squeeze(-1) if audio.shape[-1] == 1 else audio
    path = waveforms_obj["file"]
    start = int(waveforms_obj.get("start", 0))
    stop = int(waveforms_obj.get("stop", 0)) or None
    audio, _sr = _read_wav(path, start=start, stop=stop)
    return audio.squeeze(-1) if audio.shape[-1] == 1 else audio


def read_audio_info(path):
    """(num_frames, sample_rate, num_channels) without reading samples."""
    import wave

    with wave.open(path, "rb") as w:
        return w.getnframes(), w.getframerate(), w.getnchannels()


def _read_wav(path, start=0, stop=None):
    """Read a WAV file → (float32 array (T, C), sample_rate).

    Uses the native C++ decoder (``svt_speechbrain_tpu.native``) when
    available — sliced reads avoid materializing whole songs in loader
    workers; set ``SVT_NATIVE=0`` to force the scipy path."""
    if os.environ.get("SVT_NATIVE", "1") != "0":
        from svt_speechbrain_tpu import native

        result = native.wav_read(path, start=start, stop=stop)
        if result is not None:
            return result
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if start or stop is not None:
        data = data[start:stop]
    if data.ndim == 1:
        data = data[:, None]
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data, sr


def write_audio(filepath, audio, samplerate):
    """Write float audio in [-1, 1] as 16-bit PCM WAV (reference ``dataio.py:291``)."""
    from scipy.io import wavfile

    audio = np.asarray(audio)
    if audio.ndim == 2 and audio.shape[0] < audio.shape[1]:
        audio = audio.T  # accept (C, T) as well
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    wavfile.write(filepath, samplerate, pcm)


def merge_csvs(data_folder, csv_lst, merged_csv):
    """Concatenate CSV manifests with identical headers
    (reference ``dataio.py:972``; used to build ``mix_train.csv``,
    ``N20EMv2/audio_only/prepare_n20emv2.py:133-137``)."""
    write_path = os.path.join(data_folder, merged_csv)
    if os.path.isfile(write_path):
        return
    with open(os.path.join(data_folder, csv_lst[0])) as f:
        header = f.readline()
    lines = []
    for csv_file in csv_lst:
        with open(os.path.join(data_folder, csv_file)) as f:
            for i, line in enumerate(f):
                if i == 0:
                    if line != header:
                        raise ValueError("Different header for " + csv_file)
                    continue
                lines.append(line)
    with open(write_path, "w") as f:
        f.write(header)
        for line in lines:
            f.write(line)


def length_to_mask(length, max_len=None, dtype=np.float32):
    """Binary mask from absolute lengths (reference ``dataio.py:661``);
    see also the jnp version in ``nnet.losses``."""
    length = np.asarray(length)
    if max_len is None:
        max_len = int(length.max())
    return (np.arange(max_len)[None, :] < length[:, None]).astype(dtype)


def prepend_bos_token(label, bos_index):
    """Prepend bos to each label sequence (reference ``dataio.py:876``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> prepend_bos_token(jnp.asarray([[5, 6], [7, 8]]), bos_index=1).tolist()
    [[1, 5, 6], [1, 7, 8]]
    """
    import jax.numpy as jnp

    bos = jnp.full((label.shape[0], 1), bos_index, dtype=label.dtype)
    return jnp.concatenate([bos, label], axis=1)


def append_eos_token(label, length, eos_index):
    """Append eos at each sequence end (reference ``dataio.py:908``)."""
    import jax.numpy as jnp

    label = jnp.asarray(label)
    b, t = label.shape
    out = jnp.concatenate([label, jnp.zeros((b, 1), label.dtype)], axis=1)
    pos = jnp.asarray(length).astype(jnp.int32)
    return out.at[jnp.arange(b), pos].set(eos_index)


def read_audio_multichannel(waveforms_obj):
    """Read one or several audio files and stack channels, with the dict
    ``{"files": [...], "start": s, "stop": e}`` API
    (reference ``dataio.py:214``). Returns (T, C)."""
    if isinstance(waveforms_obj, str):
        files, start, stop = [waveforms_obj], 0, None
    else:
        files = waveforms_obj.get("files", waveforms_obj.get("file"))
        if isinstance(files, str):
            files = [files]
        start = waveforms_obj.get("start", 0)
        stop = waveforms_obj.get("stop", None)
    chans = []
    for f in files:
        wav, _sr = _read_wav(f, start=start, stop=stop)
        chans.append(wav[:, None] if wav.ndim == 1 else wav)
    n = min(c.shape[0] for c in chans)
    return np.concatenate([c[:n] for c in chans], axis=-1)


def relative_time_to_absolute(batch, relative_lens, rate):
    """Relative lengths → absolute duration in seconds
    (reference ``dataio.py:262``)."""
    max_len = batch.shape[1]
    return np.round(np.asarray(relative_lens) * max_len / rate, decimals=8)


def convert_index_to_lab(batch, ind2lab):
    """Index batch → label lists (reference ``dataio.py:619``)."""
    return [[ind2lab[int(i)] for i in seq] for seq in batch]


def merge_char(sequences, space="_"):
    """Char sequences → word sequences (reference ``dataio.py:851``).

    Example
    -------
    >>> merge_char([["a", "b", "_", "c", "d"]])
    [['ab', 'cd']]
    """
    return [[word for word in "".join(seq).split(space) if word]
            for seq in sequences]


def split_word(sequences, space="_"):
    """Word sequences → char sequences with space markers
    (reference ``dataio.py:935``)."""
    return [list(space.join(seq)) for seq in sequences]


def save_pkl(obj, file):
    """Pickle to file (reference ``dataio.py:705``)."""
    import pickle

    with open(file, "wb") as f:
        pickle.dump(obj, f)


def load_pkl(file):
    """Unpickle from file (reference ``dataio.py:744``)."""
    import pickle

    with open(file, "rb") as f:
        return pickle.load(f)


load_pickle = load_pkl


def write_txt_file(data, filename, sampling_rate=None):
    """Write an iterable of lines (reference ``dataio.py:980``)."""
    import os

    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as f:
        for line in data:
            f.write(str(line) + "\n")


def get_md5(file):
    """MD5 checksum of a file (reference ``dataio.py:771``)."""
    import hashlib

    hash_md5 = hashlib.md5()
    with open(file, "rb") as f:
        for chunk in iter(lambda: f.read(65536), b""):
            hash_md5.update(chunk)
    return hash_md5.hexdigest()


def save_md5(files, out_file):
    """Save file → md5 dict as pickle (reference ``dataio.py:800``)."""
    md5_dict = {f: get_md5(f) for f in files}
    save_pkl(md5_dict, out_file)


def write_stdout(data, filename=None):
    """Print lines to stdout (reference ``dataio.py:1011``)."""
    for line in data:
        print(line)


class IterativeCSVWriter:
    """Incremental CSV writing by keyword fields
    (reference ``dataio.py:1043``)."""

    def __init__(self, outstream, data_fields, defaults={}):
        self._outstream = outstream
        self.fields = ["ID"] + data_fields
        self.defaults = defaults
        self._outstream.write(",".join(self.fields))

    def set_default(self, field, value):
        if field not in self.fields:
            raise ValueError(f"{field} is not a field in this CSV")
        self.defaults[field] = value

    def write(self, *args, **kwargs):
        if args and kwargs:
            raise ValueError("Use either positional fields or keyword fields")
        if args:
            if len(args) != len(self.fields):
                raise ValueError("Need consistent fields")
            to_write = [str(arg) for arg in args]
        else:
            full = dict(self.defaults, **kwargs)
            to_write = [str(full.get(field, "")) for field in self.fields]
        self._outstream.write("\n" + ",".join(to_write))

    def write_batch(self, *args, **kwargs):
        if args and kwargs:
            raise ValueError("Use either positional fields or keyword fields")
        if args:
            if len(args) != len(self.fields):
                raise ValueError("Need consistent fields")
            for arg_row in zip(*args):
                self.write(*arg_row)
        else:
            for row in zip(*kwargs.values()):
                self.write(**dict(zip(kwargs.keys(), row)))


def read_kaldi_lab(kaldi_ali, kaldi_lab_opts):
    """Read kaldi alignment labels (reference ``dataio.py:822``); needs the
    optional ``kaldi_io`` package and kaldi binaries on PATH."""
    try:
        import kaldi_io
    except ImportError as e:
        raise ImportError(
            "read_kaldi_lab needs the optional kaldi_io package") from e
    return {
        k: v for k, v in kaldi_io.read_vec_int_ark(
            f"gunzip -c {kaldi_ali}/ali*.gz | "
            f"{kaldi_lab_opts} {kaldi_ali}/final.mdl ark:- ark:-|")
    }
