"""Data loaders (analogue of reference ``speechbrain/dataio/dataloader.py``).

``SaveableDataLoader`` iterates a ``DynamicItemDataset`` through a sampler and
collates ``PaddedBatch``es, with:

- background prefetch via a thread pool (the host-side analogue of torch's
  worker processes; numpy/scipy file reads release the GIL) and a bounded
  queue double-buffering the host → device feed;
- checkpointable iteration position: mid-epoch recovery fast-forwards the
  sampler like the reference's ``__new_init`` monkey-patch
  (``dataloader.py:144-181``).
"""
from __future__ import annotations

import functools
import queue
import threading

from svt_speechbrain_tpu.dataio.batch import PaddedBatch
from svt_speechbrain_tpu.dataio.sampler import ReproducibleRandomSampler, SequentialSampler


def make_dataloader(dataset, looped_nominal_epoch=None, **loader_kwargs):
    """Default-filling factory (reference ``dataloader.py:63``): PaddedBatch
    collate and a ReproducibleRandomSampler when ``shuffle=True``."""
    if looped_nominal_epoch is not None:
        loader = make_dataloader(dataset, **loader_kwargs)
        return LoopedLoader(loader, looped_nominal_epoch)
    return SaveableDataLoader(dataset, **loader_kwargs)


class SaveableDataLoader:
    """Reference ``dataloader.py:185-265`` analogue: PaddedBatch-collating
    loader whose epoch position is checkpointable (``_iterator_position``
    counts delivered batches; setting ``_recovery_skip`` resumes mid-epoch).

    Example
    -------
    >>> import numpy as np
    >>> data = [{"id": f"u{i}", "x": np.arange(i + 1, dtype=np.float32)}
    ...         for i in range(4)]
    >>> dl = SaveableDataLoader(data, batch_size=2)
    >>> batch = next(iter(dl))
    >>> batch.id, np.asarray(batch.x.data).shape   # padded to longest row
    (['u0', 'u1'], (2, 2))
    >>> resumed = SaveableDataLoader(data, batch_size=2)
    >>> resumed._recovery_skip = 1                 # as restored from a ckpt
    >>> [b.id for b in resumed]                    # skips the consumed batch
    [['u2', 'u3']]
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, sampler=None,
                 batch_sampler=None, collate_fn=None, drop_last=False,
                 num_workers=0, prefetch_batches=2, pad_multiples=None,
                 padded_keys=None, non_padded_keys=(), seed=563375142, **unused):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch_batches = max(prefetch_batches, 1)
        if collate_fn is None:
            collate_fn = functools.partial(
                PaddedBatch, pad_multiples=pad_multiples, padded_keys=padded_keys,
                non_padded_keys=non_padded_keys)
        self.collate_fn = collate_fn
        self.batch_sampler = batch_sampler
        if batch_sampler is None:
            if sampler is None:
                sampler = (ReproducibleRandomSampler(dataset, seed=seed)
                           if shuffle else SequentialSampler(dataset))
            self.sampler = sampler
        else:
            self.sampler = None
        # checkpointable position (number of batches consumed this epoch)
        self._iterator_position = None
        self._recovery_skip = None

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches_of_indices(self):
        if self.batch_sampler is not None:
            yield from iter(self.batch_sampler)
            return
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def _make_batch(self, indices):
        return self.collate_fn([self.dataset[i] for i in indices])

    def __iter__(self):
        skip = self._recovery_skip or 0
        self._recovery_skip = None
        self._iterator_position = skip

        def index_stream():
            for i, indices in enumerate(self._batches_of_indices()):
                if i < skip:
                    continue
                yield indices

        if self.num_workers <= 0:
            for indices in index_stream():
                # count before yielding: once the consumer holds the batch it
                # is consumed for recovery purposes (reference _num_yielded)
                self._iterator_position += 1
                yield self._make_batch(indices)
            self._iterator_position = None
            return

        # threaded prefetch: workers collate batches into a bounded queue
        q = queue.Queue(maxsize=self.prefetch_batches)
        sentinel = object()

        def producer():
            try:
                for indices in index_stream():
                    q.put(self._make_batch(indices))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            self._iterator_position += 1
            yield item
        thread.join()
        self._iterator_position = None

    # --- checkpointing hooks (analogue of @mark_as_saver/@mark_as_loader) ---
    def state_dict(self):
        return {"iterator_position": self._iterator_position}

    def load_state_dict(self, data, end_of_epoch=True):
        pos = data.get("iterator_position")
        if pos is not None and not end_of_epoch:
            self._recovery_skip = pos

    def set_epoch(self, epoch):
        if self.batch_sampler is not None and hasattr(self.batch_sampler, "set_epoch"):
            self.batch_sampler.set_epoch(epoch)
        elif self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)


class LoopedLoader:
    """Loop an underlying iterable to nominal-epoch lengths
    (reference ``dataloader.py:267``)."""

    def __init__(self, loader, epoch_length, batchsize_fn=None):
        self.loader = loader
        self.iterator = None
        self.epoch_length = epoch_length
        self.step = 0
        self.total_steps = 0
        self.total_samples = 0
        self.batchsize_fn = batchsize_fn or (lambda b: len(b))

    def __iter__(self):
        if self.iterator is None:
            self.iterator = iter(self.loader)
        return self

    def __next__(self):
        if self.step >= self.epoch_length:
            self.step = 0
            raise StopIteration
        self.step += 1
        self.total_steps += 1
        try:
            batch = next(self.iterator)
        except StopIteration:  # wrap around — the "epoch" here is virtual
            self.iterator = iter(self.loader)
            batch = next(self.iterator)
        self.total_samples += self.batchsize_fn(batch)
        return batch

    def __len__(self):
        return self.epoch_length

    def state_dict(self):
        return {"step": self.step, "total_steps": self.total_steps,
                "total_samples": self.total_samples}

    def load_state_dict(self, data, end_of_epoch=True):
        self.step = data["step"]
        self.total_steps = data["total_steps"]
        self.total_samples = data["total_samples"]
        if self.step == 0 and end_of_epoch:
            self.step = self.epoch_length
