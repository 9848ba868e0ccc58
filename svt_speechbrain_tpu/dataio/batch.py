"""Padded batch collation (analogue of reference ``speechbrain/dataio/batch.py``).

``PaddedBatch`` right-pads variable-length arrays and exposes
``PaddedData(data, lengths)`` pairs with *relative* lengths (len / max_len),
exactly like the reference (``batch.py:20-190``) — the length-masked losses
depend on this convention.

TPU twist: ``pad_multiples`` bucket the time axis up to a multiple per key, so
a whole epoch reuses a handful of compiled shapes instead of recompiling per
batch (the XLA analogue of the reference's free-form dynamic shapes).
"""
from __future__ import annotations

import collections

import numpy as np

from svt_speechbrain_tpu.utils.data_utils import batch_pad_right, round_up

PaddedData = collections.namedtuple("PaddedData", ["data", "lengths"])


def _is_array_like(x):
    return isinstance(x, np.ndarray) or (
        hasattr(x, "__array__") and not isinstance(x, (str, bytes))
    )


class PaddedBatch:
    """Collate a list of example dicts.

    - array-valued keys (unless in ``non_padded_keys``) are padded right and
      stored as ``PaddedData(stacked, relative_lengths)``;
    - scalar numbers are stacked to arrays; anything else is kept as a list.

    Attribute access per key mirrors the reference: ``batch.sig.data``,
    ``batch.sig.lengths`` (also unpackable as a 2-tuple).

    Example
    -------
    >>> import numpy as np
    >>> batch = PaddedBatch([
    ...     {"id": "ex1", "sig": np.asarray([1.0, 2.0, 3.0, 4.0])},
    ...     {"id": "ex2", "sig": np.asarray([5.0, 6.0])},
    ... ])
    >>> batch.id
    ['ex1', 'ex2']
    >>> data, lengths = batch.sig        # unpackable PaddedData
    >>> data.shape, [float(l) for l in lengths]
    ((2, 4), [1.0, 0.5])
    >>> float(data[1, 3])                # right-padded with zeros
    0.0
    """

    def __init__(self, examples, padded_keys=None, non_padded_keys=(),
                 pad_multiples=None, padding_kwargs=None):
        padding_kwargs = padding_kwargs or {}
        pad_multiples = pad_multiples or {}
        self.__length = len(examples)
        self.__keys = list(examples[0].keys())
        self.__padded_keys = []
        for key in self.__keys:
            values = [ex[key] for ex in examples]
            should_pad = (
                key not in non_padded_keys
                and (padded_keys is None or key in padded_keys)
                and _is_array_like(values[0])
            )
            if should_pad:
                arrays = [np.asarray(v) for v in values]
                target = None
                if key in pad_multiples:
                    longest = max(a.shape[0] for a in arrays)
                    target = round_up(longest, pad_multiples[key])
                padded = PaddedData(*batch_pad_right(arrays, target_len=target, **padding_kwargs))
                setattr(self, key, padded)
                self.__padded_keys.append(key)
            else:
                if isinstance(values[0], (int, float, np.integer, np.floating)):
                    values = np.asarray(values)
                setattr(self, key, values)

    def __len__(self):
        return self.__length

    def __getitem__(self, key):
        if key in self.__keys:
            return getattr(self, key)
        raise KeyError(f"Batch doesn't have key: {key}")

    def __iter__(self):
        return iter((getattr(self, key) for key in self.__keys))

    def at_position(self, pos):
        """Fetch an item by its position in the batch (reference
        ``batch.py:180``)."""
        return getattr(self, self.__keys[pos])

    @property
    def batchsize(self):
        return self.__length

    @property
    def keys(self):
        return list(self.__keys)

    @property
    def padded_keys(self):
        return list(self.__padded_keys)

    def as_dict(self):
        return {key: getattr(self, key) for key in self.__keys}

    def numpy_arrays(self, keys=None):
        """The jit-feedable subset: {key: (data, lengths)} for padded keys plus
        plain numeric arrays. Strings/objects are excluded — those stay host-side."""
        out = {}
        for key in (keys or self.__keys):
            val = getattr(self, key)
            if isinstance(val, PaddedData):
                out[key] = val
            elif isinstance(val, np.ndarray) and val.dtype != object:
                out[key] = val
        return out


class BatchsizeGuesser:
    """Figure out the batch size of heterogeneous batch objects without ever
    erroring out (reference ``batch.py:190``); falls back to 1."""

    def guess(self, batch):
        try:
            if hasattr(batch, "batchsize"):
                return batch.batchsize
            if hasattr(batch, "shape"):
                return batch.shape[0]
            if isinstance(batch, dict) and batch:
                return self.guess(next(iter(batch.values())))
            if isinstance(batch, (list, tuple)) and batch:
                first = batch[0]
                if hasattr(first, "shape"):
                    return first.shape[0]
                if isinstance(first, (int, float, str)):
                    return len(batch)
                return self.guess(first)
        except Exception:
            pass
        return 1

    def __call__(self, batch):
        return self.guess(batch)
