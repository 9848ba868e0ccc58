"""Data utilities (analogue of reference ``speechbrain/utils/data_utils.py``)."""
from __future__ import annotations

import collections.abc
import os
import urllib.request

import numpy as np


def undo_padding(batch, lengths):
    """Strip padding from a padded batch → list of lists
    (reference ``data_utils.py:20``).

    Example
    -------
    >>> undo_padding([[1, 2, 0, 0], [3, 4, 5, 6]], [0.5, 1.0])
    [[1, 2], [3, 4, 5, 6]]
    """
    batch = np.asarray(batch)
    batch_max_len = batch.shape[1]
    as_list = []
    for seq, seq_length in zip(batch, lengths):
        actual_size = int(round(float(seq_length) * batch_max_len))
        as_list.append(seq[:actual_size].tolist())
    return as_list


def pad_right_to(array, target_shape, mode="constant", value=0):
    """Pad ``array`` up to ``target_shape`` on the right of every axis
    (reference ``data_utils.py:317``). Returns (padded, valid%) where
    valid% is the list of original/target fractions PER AXIS, like the
    reference."""
    array = np.asarray(array)
    assert len(target_shape) == array.ndim
    pads = []
    valid = []
    for i, target in enumerate(target_shape):
        assert target >= array.shape[i], "Target shape must be >= original shape"
        pads.append((0, target - array.shape[i]))
        valid.append(array.shape[i] / target)
    padded = np.pad(array, pads, mode=mode, constant_values=value)
    return padded, valid


def batch_pad_right(arrays, mode="constant", value=0, target_len=None):
    """Pad a list of arrays to a common shape and stack
    (reference ``data_utils.py:361``). Optionally pad the first axis to
    ``target_len`` (shape bucketing for XLA-friendly fixed shapes).

    Example
    -------
    >>> import numpy as np
    >>> stacked, valid = batch_pad_right(
    ...     [np.asarray([1.0, 2.0, 3.0]), np.asarray([4.0])], target_len=4)
    >>> stacked.shape
    (2, 4)
    >>> [round(float(v), 2) for v in valid]
    [0.75, 0.25]
    """
    assert len(arrays), "input should be a non-empty list"
    if not any(arrays[0].ndim == x.ndim for x in arrays[1:]) and len(arrays) > 1:
        raise IndexError("All arrays must have same number of dimensions")
    for dim in range(1, arrays[0].ndim):
        if not all(x.shape[dim] == arrays[0].shape[dim] for x in arrays[1:]):
            raise IndexError("arrays should have matching shapes on all axes but the first")
    max_shape = []
    for dim in range(arrays[0].ndim):
        m = max(x.shape[dim] for x in arrays)
        if dim == 0 and target_len is not None:
            m = max(m, int(target_len))
        max_shape.append(m)
    padded, valid = [], []
    for x in arrays:
        p, v = pad_right_to(x, max_shape, mode=mode, value=value)
        padded.append(p)
        valid.append(v[0])   # first-axis fraction only (reference :418)
    return np.stack(padded), np.array(valid, dtype=np.float32)


def round_up(x, multiple):
    """Smallest multiple of ``multiple`` ≥ x (shape bucketing helper)."""
    return int(-(-x // multiple) * multiple)


def recursive_to(data, fn):
    """Apply ``fn`` to every array in a nested structure
    (analogue of reference ``data_utils.py:430`` recursive_to)."""
    if isinstance(data, np.ndarray):
        return fn(data)
    if isinstance(data, collections.abc.Mapping):
        return {k: recursive_to(v, fn) for k, v in data.items()}
    if isinstance(data, tuple) and hasattr(data, "_fields"):  # namedtuple
        return type(data)(*(recursive_to(v, fn) for v in data))
    if isinstance(data, collections.abc.Sequence) and not isinstance(data, str):
        return [recursive_to(v, fn) for v in data]
    return data


def recursive_update(d, u, must_match=False):
    """Update nested dict ``d`` with ``u`` (reference ``data_utils.py:220``)."""
    for k, v in u.items():
        if isinstance(v, collections.abc.Mapping) and k in d:
            recursive_update(d.get(k, {}), v, must_match=must_match)
        elif must_match and k not in d:
            raise KeyError(f"Override '{k}' not found in: {[key for key in d.keys()]}")
        else:
            d[k] = v


def download_file(source, dest, unpack=False, dest_unpack=None, replace_existing=False):
    """Download (or copy) ``source`` to ``dest`` (reference ``data_utils.py:258``).

    In the zero-egress TPU environment, remote URLs raise unless the file is
    already present — local paths are copied/symlinked.
    """
    import shutil

    if os.path.exists(dest) and not replace_existing:
        return
    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    if os.path.exists(source):
        shutil.copyfile(source, dest)
    else:
        urllib.request.urlretrieve(source, dest)
    if unpack:
        shutil.unpack_archive(dest, dest_unpack or os.path.dirname(dest))


def split_path(path):
    """Split into [dirname-or-source, filename] (reference
    ``data_utils.py:511``; a list, like ``str.rsplit``)."""
    if "/" in path:
        return path.rsplit("/", maxsplit=1)
    return "./", path


def get_all_files(dirName, match_and=None, match_or=None, exclude_and=None, exclude_or=None):
    """Recursively list files with filtering (reference ``data_utils.py:40``)."""
    listOfFile = os.listdir(dirName)
    allFiles = []
    for entry in listOfFile:
        fullPath = os.path.join(dirName, entry)
        if os.path.isdir(fullPath):
            allFiles += get_all_files(fullPath, match_and, match_or, exclude_and, exclude_or)
        else:
            if match_and and not all(s in fullPath for s in match_and):
                continue
            if match_or and not any(s in fullPath for s in match_or):
                continue
            if exclude_and and all(s in fullPath for s in exclude_and):
                continue
            if exclude_or and any(s in fullPath for s in exclude_or):
                continue
            allFiles.append(fullPath)
    return allFiles


def mod_default_collate(batch):
    """Best-effort stacking of a list of batch values (reference
    ``data_utils.py:460``): equal-shape arrays/scalars stack into one numpy
    array; anything else is returned unchanged rather than erroring out."""
    import numpy as _np

    elem = batch[0]
    if isinstance(elem, _np.ndarray) or hasattr(elem, "__array__"):
        try:
            arrs = [_np.asarray(b) for b in batch]
            if len({a.shape for a in arrs}) == 1 and arrs[0].dtype.kind not in "OUS":
                return _np.stack(arrs, 0)
        except Exception:
            pass
        return batch
    if isinstance(elem, float):
        return _np.asarray(batch, dtype=_np.float64)
    if isinstance(elem, bool):
        return _np.asarray(batch, dtype=bool)
    if isinstance(elem, int):
        return _np.asarray(batch)
    return batch


def split_by_whitespace(text):
    """str.split wrapper usable as a pipeline function
    (reference ``data_utils.py:77``)."""
    return text.split()


def split_list(seq, num):
    """Split a sequence into ``num`` nearly-equal chunks
    (reference ``data_utils.py:39``)."""
    seq = list(seq)
    avg = len(seq) / float(num)
    out, last = [], 0.0
    while last < len(seq):
        out.append(seq[int(last):int(last + avg)])
        last += avg
    return out


def recursive_items(dictionary):
    """Yield (key, value) pairs of a nested dict, depth-first
    (reference ``data_utils.py:57``)."""
    for key, value in dictionary.items():
        if isinstance(value, dict):
            yield from recursive_items(value)
        else:
            yield (key, value)
