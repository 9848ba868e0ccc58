"""Categorical/text label encoders (analogue of reference
``speechbrain/dataio/encoder.py``).

Reference-exact (golden-tested in ``tests/test_encoder_golden.py``),
including the on-disk literal format — files saved by the reference load
here and vice versa (labels as ``repr => int`` lines, then the extras
separator, then ``repr(key) => repr(value)`` extras incl.
``starting_index``). Special labels use the reference's ``hasattr``
convention so ``None`` is a legal unk/bos/eos/blank label. The
``*_torch`` method variants operate on plain lists/arrays here (no torch
dependency on the encode path)."""
from __future__ import annotations

import ast
import collections
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

    def __init__(self, starting_index=0, **special_labels):
        self.lab2ind = {}
        self.ind2lab = {}
        self.starting_index = starting_index
        # NOTE: unk_label is not necessarily set at all (None is a valid
        # unk label, so the test is hasattr, like the reference)
        self.handle_special_labels(special_labels)

    def handle_special_labels(self, special_labels):
        """Add a ``unk_label`` passed through the constructor."""
        if "unk_label" in special_labels:
            self.add_unk(special_labels["unk_label"])

    def __len__(self):
        return len(self.lab2ind)

    @classmethod
    def from_saved(cls, path):
        """Recreate a previously saved encoder directly (reference ``:153``)."""
        obj = cls()
        obj.load(path)
        return obj

    def update_from_iterable(self, iterable, sequence_input=False):
        """Collect labels (reference ``:160``)."""
        if sequence_input:
            label_iterator = itertools.chain.from_iterable(iterable)
        else:
            label_iterator = iter(iterable)
        for label in label_iterator:
            self.ensure_label(label)

    def update_from_didataset(self, didataset, output_key,
                              sequence_input=False):
        """Collect labels from a DynamicItemDataset key (reference ``:178``)."""
        with didataset.output_keys_as([output_key]):
            self.update_from_iterable(
                (item[output_key] for item in
                 (didataset[i] for i in range(len(didataset)))),
                sequence_input=sequence_input)

    def limited_labelset_from_iterable(self, iterable, sequence_input=False,
                                       n_most_common=None, min_count=1):
        """Count-limited label mapping (reference ``:199``): keep at most
        ``n_most_common`` labels appearing at least ``min_count`` times.
        Returns the (unfiltered) label Counter."""
        if self.lab2ind:
            logger.info(
                f"Limited_labelset_from_iterable called, but "
                f"{self.__class__.__name__} is not empty; new labels add on.")
        if sequence_input:
            label_iterator = itertools.chain.from_iterable(iterable)
        else:
            label_iterator = iter(iterable)
        counts = collections.Counter(label_iterator)
        for label, count in counts.most_common(n_most_common):
            if count < min_count:
                break
            self.add_label(label)
        return counts

    def load_or_create(self, path, from_iterables=(), from_didatasets=(),
                       sequence_input=False, output_key=None,
                       special_labels={}):
        """Load if the file exists, else build from the sources and save
        (reference ``:245``; main-process-gated like the reference)."""
        from svt_speechbrain_tpu.parallel.distributed import (ddp_barrier,
                                                              if_main_process)

        try:
            if if_main_process():
                if not self.load_if_possible(path):
                    for iterable in from_iterables:
                        self.update_from_iterable(iterable, sequence_input)
                    for didataset in from_didatasets:
                        if output_key is None:
                            raise ValueError("Provide an output_key for "
                                             "DynamicItemDataset")
                        self.update_from_didataset(didataset, output_key,
                                                   sequence_input)
                    self.handle_special_labels(special_labels)
                    self.save(path)
        finally:
            ddp_barrier()
            self.load(path)
        return self

    def add_label(self, label):
        """Add a new label; raises if present (reference ``:280``)."""
        if label in self.lab2ind:
            raise KeyError(f"Label already present: {label}")
        index = self._next_index()
        self.lab2ind[label] = index
        self.ind2lab[index] = label
        return index

    def ensure_label(self, label):
        """Add a label only if it's absent (reference ``:303``)."""
        if label in self.lab2ind:
            return self.lab2ind[label]
        return self.add_label(label)

    def insert_label(self, label, index):
        """Add a new label at a forced index; raises if present
        (reference ``:323``)."""
        if label in self.lab2ind:
            raise KeyError(
                f"Label already present in {self.__class__.__name__}")
        self.enforce_label(label, index)

    def enforce_label(self, label, index):
        """Ensure ``label`` encodes to ``index``, relocating any occupant to
        the next free slot (reference ``:344``)."""
        index = int(index)
        if label in self.lab2ind:
            if index == self.lab2ind[label]:
                return
            del self.ind2lab[self.lab2ind[label]]
        if index in self.ind2lab:
            saved_label = self.ind2lab[index]
            moving_other = True
        else:
            moving_other = False
        self.lab2ind[label] = index
        self.ind2lab[index] = label
        if moving_other:
            logger.info(f"Moving label {saved_label!r} from index {index}, "
                        f"because {label!r} was put at its place.")
            new_index = self._next_index()
            self.lab2ind[saved_label] = new_index
            self.ind2lab[new_index] = saved_label

    def add_unk(self, unk_label=DEFAULT_UNK):
        """Add the out-of-vocab label (reference ``:379``); may be None."""
        self.unk_label = unk_label
        return self.add_label(unk_label)

    def _next_index(self):
        index = self.starting_index
        while index in self.ind2lab:
            index += 1
        return index

    def is_continuous(self):
        """True when the index set has no gaps from ``starting_index``
        (reference ``:406``)."""
        indices = sorted(self.ind2lab.keys())
        return self.starting_index in indices and all(
            j - i == 1 for i, j in zip(indices[:-1], indices[1:]))

    def encode_label(self, label, allow_unk=True):
        """Label → int with the reference's unk semantics (``:428``)."""
        try:
            return self.lab2ind[label]
        except KeyError:
            if hasattr(self, "unk_label") and allow_unk:
                return self.lab2ind[self.unk_label]
            if hasattr(self, "unk_label") and not allow_unk:
                raise KeyError(
                    f"Unknown label {label}, and explicitly disallowed the "
                    "use of the existing unk-label")
            if allow_unk:
                raise KeyError(
                    f"Cannot encode unknown label {label}. You have not "
                    "called add_unk() to add a special unk-label for "
                    "unknown labels.")
            raise KeyError(
                f"Couldn't and wouldn't encode unknown label {label}.")

    def encode_label_torch(self, label, allow_unk=True):
        """Length-1 int array variant (array-based here)."""
        import numpy as np

        return np.asarray([self.encode_label(label, allow_unk)], np.int64)

    def encode_sequence(self, sequence, allow_unk=True):
        return [self.encode_label(label, allow_unk) for label in sequence]

    def encode_sequence_torch(self, sequence, allow_unk=True):
        """Int-array variant (array-based here)."""
        import numpy as np

        return np.asarray(self.encode_sequence(sequence, allow_unk), np.int64)

    def decode_torch(self, x):
        """Decode an array/tensor of indices to a (nested) list of labels."""
        return self.decode_ndim(x)

    def decode_ndim(self, x):
        """Recursively decode arrays/lists of indices (reference ``:542``)."""
        try:
            return [self.decode_ndim(sub) for sub in x]
        except TypeError:
            return self.ind2lab[int(x)]

    def save(self, path):
        """Write the literal format (reference ``:569``)."""
        self._save_literal(path, self.lab2ind, self._get_extras())

    def load(self, path):
        """Read the literal format, overwriting state (reference ``:583``)."""
        if self.lab2ind:
            logger.info(f"Load called, but {self.__class__.__name__} is not "
                        "empty; loaded data overwrites everything.")
        lab2ind, ind2lab, extras = self._load_literal(path)
        self.lab2ind = lab2ind
        self.ind2lab = ind2lab
        self._set_extras(extras)

    def load_if_possible(self, path, end_of_epoch=False, device=None):
        """Load, returning success as bool (reference ``:609``)."""
        del end_of_epoch, device
        try:
            self.load(path)
        except FileNotFoundError:
            return False
        except (ValueError, SyntaxError):
            return False
        return True

    def _get_extras(self):
        extras = {"starting_index": self.starting_index}
        if hasattr(self, "unk_label"):
            extras["unk_label"] = self.unk_label
        return extras

    def _set_extras(self, extras):
        if "unk_label" in extras:
            self.unk_label = extras["unk_label"]
        self.starting_index = extras["starting_index"]

    @staticmethod
    def _save_literal(path, lab2ind, extras):
        """The reference's exact on-disk format (``:677``)."""
        with open(path, "w") as f:
            for label, ind in lab2ind.items():
                f.write(repr(label) + CategoricalEncoder.VALUE_SEPARATOR
                        + str(ind) + "\n")
            f.write(CategoricalEncoder.EXTRAS_SEPARATOR)
            for key, value in extras.items():
                f.write(repr(key) + CategoricalEncoder.VALUE_SEPARATOR
                        + repr(value) + "\n")
            f.flush()

    @staticmethod
    def _load_literal(path):
        lab2ind = {}
        ind2lab = {}
        extras = {}
        with open(path) as f:
            for line in f:
                if line == CategoricalEncoder.EXTRAS_SEPARATOR:
                    break
                literal, ind = line.strip().split(
                    CategoricalEncoder.VALUE_SEPARATOR, maxsplit=1)
                ind = int(ind)
                label = ast.literal_eval(literal)
                lab2ind[label] = ind
                ind2lab[ind] = label
            for line in f:
                literal_key, literal_value = line.strip().split(
                    CategoricalEncoder.VALUE_SEPARATOR, maxsplit=1)
                extras[ast.literal_eval(literal_key)] = ast.literal_eval(
                    literal_value)
        return lab2ind, ind2lab, extras


class TextEncoder(CategoricalEncoder):
    """Adds bos/eos handling (reference ``encoder.py:720``); sequence input
    is the default for text.

    Example
    -------
    >>> enc = TextEncoder()
    >>> enc.update_from_iterable([["hello", "world"], ["how", "are"]])
    >>> enc.add_bos_eos()
    >>> enc.prepend_bos_index(enc.encode_sequence(["hello"]))
    [4, 0]
    """

    def handle_special_labels(self, special_labels):
        super().handle_special_labels(special_labels)
        if "bos_label" in special_labels and "eos_label" in special_labels:
            self.insert_bos_eos(bos_label="<bos>", eos_label="<eos>",
                                bos_index=special_labels["bos_label"],
                                eos_index=special_labels["eos_label"])
        elif "bos_label" in special_labels or "eos_label" in special_labels:
            raise TypeError("Only BOS or EOS specified. Need both for init.")

    def update_from_iterable(self, iterable, sequence_input=True):
        return super().update_from_iterable(iterable, sequence_input)

    def update_from_didataset(self, didataset, output_key,
                              sequence_input=True):
        return super().update_from_didataset(didataset, output_key,
                                             sequence_input)

    def limited_labelset_from_iterable(self, iterable, sequence_input=True,
                                       n_most_common=None, min_count=1):
        return super().limited_labelset_from_iterable(
            iterable, sequence_input=sequence_input,
            n_most_common=n_most_common, min_count=min_count)

    def add_bos_eos(self, bos_label=DEFAULT_BOS, eos_label=DEFAULT_EOS):
        """Append sentence boundaries to the label set; equal labels share
        one boundary symbol (reference ``:826``)."""
        if bos_label == eos_label:
            self.add_label(bos_label)
        else:
            self.add_label(bos_label)
            self.add_label(eos_label)
        self.bos_label = bos_label
        self.eos_label = eos_label

    def insert_bos_eos(self, bos_label=DEFAULT_BOS, eos_label=DEFAULT_EOS,
                       bos_index=0, eos_index=None):
        """Insert sentence boundaries at given indexes (reference ``:857``)."""
        if bos_label == eos_label:
            self.insert_label(bos_label, bos_index)
        else:
            self.insert_label(bos_label, bos_index)
            if eos_index is None:
                self.insert_label(eos_label, bos_index + 1)
            else:
                self.insert_label(eos_label, eos_index)
        self.bos_label = bos_label
        self.eos_label = eos_label

    def get_bos_index(self):
        if not hasattr(self, "bos_label"):
            raise RuntimeError("BOS label is not set!")
        return self.encode_label(self.bos_label)

    def get_eos_index(self):
        if not hasattr(self, "eos_label"):
            raise RuntimeError("EOS label is not set!")
        return self.encode_label(self.eos_label)

    def prepend_bos_label(self, x):
        if not hasattr(self, "bos_label"):
            raise KeyError("BOS label has not been added to label set!")
        return [self.bos_label] + list(x)

    def prepend_bos_index(self, x):
        if not hasattr(self, "bos_label"):
            raise KeyError("BOS label has not been added to label set!")
        return [self.lab2ind[self.bos_label]] + list(x)

    def append_eos_label(self, x):
        if not hasattr(self, "eos_label"):
            raise KeyError("EOS label has not been added to label set!")
        return list(x) + [self.eos_label]

    def append_eos_index(self, x):
        if not hasattr(self, "eos_label"):
            raise KeyError("EOS label has not been added to label set!")
        return list(x) + [self.lab2ind[self.eos_label]]

    def _get_extras(self):
        extras = super()._get_extras()
        if hasattr(self, "bos_label"):
            extras["bos_label"] = self.bos_label
        if hasattr(self, "eos_label"):
            extras["eos_label"] = self.eos_label
        return extras

    def _set_extras(self, extras):
        super()._set_extras(extras)
        if "bos_label" in extras:
            self.bos_label = extras["bos_label"]
        if "eos_label" in extras:
            self.eos_label = extras["eos_label"]


class CTCTextEncoder(TextEncoder):
    """Adds a blank symbol + CTC collapsing (reference ``encoder.py:940``).

    Example
    -------
    >>> enc = CTCTextEncoder()
    >>> enc.update_from_iterable(["abcd"])
    >>> enc.add_blank()
    >>> enc.collapse_indices_ndim([4, 4, 0, 1, 2, 3, 4, 4])   # 4 is <blank>
    [0, 1, 2, 3]
    >>> enc.collapse_labels(["a", "a", "b", "c", "d"])
    ['a', 'b', 'c', 'd']
    """

    def handle_special_labels(self, special_labels):
        if "blank_label" in special_labels:
            self.insert_blank(index=special_labels["blank_label"])
        super().handle_special_labels(special_labels)

    def add_blank(self, blank_label=DEFAULT_BLANK):
        self.add_label(blank_label)
        self.blank_label = blank_label

    def insert_blank(self, blank_label=DEFAULT_BLANK, index=0):
        self.insert_label(blank_label, index)
        self.blank_label = blank_label

    def get_blank_index(self):
        if not hasattr(self, "blank_label"):
            raise RuntimeError("Blank label is not set!")
        return self.encode_label(self.blank_label)

    def collapse_labels(self, x, merge_repeats=True):
        """CTC collapsing on labels (reference ``:1024``);
        ``merge_repeats=False`` for RNN-T topology."""
        if not hasattr(self, "blank_label"):
            raise KeyError("Blank label has not been added")
        if merge_repeats:
            return [label for i, label in enumerate(x)
                    if (i == 0 or label != x[i - 1])
                    and label != self.blank_label]
        return [label for label in x if label != self.blank_label]

    def collapse_indices_ndim(self, x, merge_repeats=True):
        """CTC collapsing on (possibly nested) index sequences
        (reference ``:1056``)."""
        if not hasattr(self, "blank_label"):
            raise KeyError("Blank label has not been added")
        collapsed = []
        for subtensor in x:
            try:
                collapsed.append(
                    self.collapse_indices_ndim(subtensor, merge_repeats))
            except TypeError:
                break
        else:
            return collapsed
        blank_index = self.lab2ind[self.blank_label]
        if merge_repeats:
            return [index for i, index in enumerate(x)
                    if (i == 0 or index != x[i - 1]) and index != blank_index]
        return [index for index in x if index != blank_index]

    def _get_extras(self):
        extras = super()._get_extras()
        if hasattr(self, "blank_label"):
            extras["blank_label"] = self.blank_label
        return extras

    def _set_extras(self, extras):
        super()._set_extras(extras)
        if "blank_label" in extras:
            self.blank_label = extras["blank_label"]
