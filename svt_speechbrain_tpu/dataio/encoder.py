"""Categorical/text label encoders (analogue of reference
``speechbrain/dataio/encoder.py``)."""
from __future__ import annotations

import ast
import itertools
import logging

logger = logging.getLogger(__name__)

DEFAULT_UNK = "<unk>"
DEFAULT_BOS = "<bos>"
DEFAULT_EOS = "<eos>"
DEFAULT_BLANK = "<blank>"


class CategoricalEncoder:
    """Label ⇄ index encoder (reference ``encoder.py:19``).

    Example
    -------
    >>> enc = CategoricalEncoder()
    >>> enc.update_from_iterable(["spk1", "spk2", "spk1"])
    >>> len(enc)
    2
    >>> enc.encode_sequence(["spk2", "spk1"])
    [1, 0]
    >>> enc.decode_ndim([1, 0])
    ['spk2', 'spk1']
    """

    VALUE_SEPARATOR = " => "
    EXTRAS_SEPARATOR = "================\n"

    def __init__(self, starting_index=0):
        self.lab2ind = {}
        self.ind2lab = {}
        self.starting_index = starting_index
        self.unk_label = None

    def __len__(self):
        return len(self.lab2ind)

    def update_from_iterable(self, iterable, sequence_input=False):
        """Collect labels (reference ``:124``)."""
        if sequence_input:
            label_iterator = itertools.chain.from_iterable(iterable)
        else:
            label_iterator = iter(iterable)
        for label in label_iterator:
            self.ensure_label(label)

    def update_from_didataset(self, didataset, output_key, sequence_input=False):
        """Collect labels from a DynamicItemDataset key (reference ``:146``)."""
        with didataset.output_keys_as([output_key]):
            self.update_from_iterable(
                (item[output_key] for item in
                 (didataset[i] for i in range(len(didataset)))),
                sequence_input=sequence_input)

    def ensure_label(self, label):
        if label not in self.lab2ind:
            index = self._next_index()
            self.lab2ind[label] = index
            self.ind2lab[index] = label

    def add_label(self, label):
        if label in self.lab2ind:
            raise KeyError(f"Label already present: {label}")
        self.ensure_label(label)
        return self.lab2ind[label]

    def insert_label(self, label, index):
        if label in self.lab2ind:
            raise KeyError(f"Label already present: {label}")
        self.enforce_label(label, index)

    def enforce_label(self, label, index):
        index = int(index)
        if index in self.ind2lab:
            moved = self.ind2lab[index]
            del self.lab2ind[moved]
            new_index = self._next_index()
            self.lab2ind[moved] = new_index
            self.ind2lab[new_index] = moved
        self.lab2ind[label] = index
        self.ind2lab[index] = label

    def add_unk(self, unk_label=DEFAULT_UNK):
        self.unk_label = unk_label
        return self.add_label(unk_label)

    def _next_index(self):
        index = self.starting_index
        while index in self.ind2lab:
            index += 1
        return index

    def encode_label(self, label, allow_unk=True):
        try:
            return self.lab2ind[label]
        except KeyError:
            if self.unk_label is not None and allow_unk:
                return self.lab2ind[self.unk_label]
            raise

    def encode_sequence(self, sequence, allow_unk=True):
        return [self.encode_label(label, allow_unk) for label in sequence]

    def decode_ndim(self, x):
        """Recursively decode arrays/lists of indices (reference ``:477``)."""
        try:
            return [self.decode_ndim(sub) for sub in x]
        except TypeError:
            return self.ind2lab[int(x)]

    def save(self, path):
        with open(path, "w") as f:
            for label, ind in self.lab2ind.items():
                f.write(f"{repr(label)}{self.VALUE_SEPARATOR}{ind}\n")
            f.write(self.EXTRAS_SEPARATOR)
            if self.unk_label is not None:
                f.write(f"unk_label{self.VALUE_SEPARATOR}{repr(self.unk_label)}\n")

    def load(self, path):
        self.lab2ind = {}
        self.ind2lab = {}
        with open(path) as f:
            for line in f:
                if line == self.EXTRAS_SEPARATOR:
                    break
                literal, ind = line.rstrip().rsplit(self.VALUE_SEPARATOR, 1)
                label = ast.literal_eval(literal)
                self.lab2ind[label] = int(ind)
                self.ind2lab[int(ind)] = label
            for line in f:
                key, value = line.rstrip().split(self.VALUE_SEPARATOR, 1)
                if key == "unk_label":
                    self.unk_label = ast.literal_eval(value)

    def load_or_create(self, path, from_iterables=(), from_didatasets=(),
                       output_key=None, sequence_input=False):
        import os

        if os.path.exists(path):
            self.load(path)
            return self
        for it in from_iterables:
            self.update_from_iterable(it, sequence_input)
        for ds in from_didatasets:
            self.update_from_didataset(ds, output_key, sequence_input)
        self.save(path)
        return self


class TextEncoder(CategoricalEncoder):
    """Adds bos/eos handling (reference ``encoder.py:584``)."""

    def __init__(self, starting_index=0):
        super().__init__(starting_index)
        self.bos_label = None
        self.eos_label = None

    def add_bos_eos(self, bos_label=DEFAULT_BOS, eos_label=DEFAULT_EOS):
        self.add_label(bos_label)
        if eos_label != bos_label:
            self.add_label(eos_label)
        self.bos_label = bos_label
        self.eos_label = eos_label

    def insert_bos_eos(self, bos_label=DEFAULT_BOS, eos_label=DEFAULT_EOS,
                       bos_index=0, eos_index=None):
        self.insert_label(bos_label, bos_index)
        if eos_label != bos_label:
            self.insert_label(eos_label,
                              eos_index if eos_index is not None else bos_index + 1)
        self.bos_label = bos_label
        self.eos_label = eos_label

    def get_bos_index(self):
        return self.lab2ind[self.bos_label]

    def get_eos_index(self):
        return self.lab2ind[self.eos_label]

    def prepend_bos_label(self, x):
        return [self.bos_label] + list(x)

    def append_eos_label(self, x):
        return list(x) + [self.eos_label]

    def prepend_bos_index(self, x):
        return [self.get_bos_index()] + list(x)

    def append_eos_index(self, x):
        return list(x) + [self.get_eos_index()]


class CTCTextEncoder(TextEncoder):
    """Adds a blank symbol (reference ``encoder.py:700``)."""

    def __init__(self, starting_index=0):
        super().__init__(starting_index)
        self.blank_label = None

    def add_blank(self, blank_label=DEFAULT_BLANK):
        self.add_label(blank_label)
        self.blank_label = blank_label

    def insert_blank(self, blank_label=DEFAULT_BLANK, index=0):
        self.insert_label(blank_label, index)
        self.blank_label = blank_label

    def get_blank_index(self):
        return self.lab2ind[self.blank_label]

    def collapse_labels(self, x, merge_repeats=True):
        if merge_repeats:
            x = [label for i, label in enumerate(x)
                 if i == 0 or label != x[i - 1]]
        return [label for label in x if label != self.blank_label]

    def collapse_indices_ndim(self, x, merge_repeats=True):
        blank = self.get_blank_index()
        if merge_repeats:
            x = [ind for i, ind in enumerate(x) if i == 0 or ind != x[i - 1]]
        return [ind for ind in x if ind != blank]
