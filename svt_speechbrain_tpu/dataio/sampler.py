"""Samplers (analogue of reference ``speechbrain/dataio/sampler.py``).

Samplers yield dataset indices; the loader materializes batches from them. In
multi-process (multi-host TPU) runs, ``DistributedSamplerWrapper`` shards any
sampler's output across processes — the analogue of torch's
``DistributedSampler`` wiring in ``core.py:731-763``.
"""
from __future__ import annotations

import itertools

import numpy as np


class ReproducibleRandomSampler:
    """Seeded random permutation, re-randomized per epoch via ``set_epoch``
    (reference ``sampler.py:28``).

    Example
    -------
    >>> sampler = ReproducibleRandomSampler(range(5), seed=42)
    >>> order_a = list(sampler)
    >>> order_b = list(sampler)            # same epoch -> same order
    >>> order_a == order_b, sorted(order_a)
    (True, [0, 1, 2, 3, 4])
    >>> sampler.set_epoch(1)
    >>> list(sampler) == order_a           # new epoch -> reshuffled
    False
    """

    def __init__(self, data_source, seed=563375142, epoch=0):
        if isinstance(seed, bool):
            raise ValueError("The reproducibility seed cannot be a boolean.")
        self.data_source = data_source
        self.seed = int(seed)
        self.epoch = epoch

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        return iter(rng.permutation(len(self.data_source)).tolist())

    def __len__(self):
        return len(self.data_source)


class ReproducibleWeightedRandomSampler:
    """Seeded weighted sampling with replacement (reference ``sampler.py:110``)."""

    def __init__(self, weights, num_samples, replacement=True, seed=129491412, epoch=0):
        if isinstance(seed, bool):
            raise ValueError("The reproducibility seed cannot be a boolean.")
        self.weights = np.asarray(weights, dtype=np.float64)
        self.num_samples = num_samples
        self.replacement = replacement
        self.seed = int(seed)
        self.epoch = epoch

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __iter__(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        p = self.weights / self.weights.sum()
        idx = rng.choice(len(self.weights), size=self.num_samples,
                         replace=self.replacement, p=p)
        return iter(idx.tolist())

    def __len__(self):
        return self.num_samples


class SequentialSampler:
    """Indices in dataset order (torch analogue; eval keeps song order —
    the stitched song eval depends on it, ``train_audio_ssl.py:88``)."""

    def __init__(self, data_source):
        self.data_source = data_source

    def __iter__(self):
        return iter(range(len(self.data_source)))

    def __len__(self):
        return len(self.data_source)


class ConcatDatasetBatchSampler:
    """Batch sampler combining several samplers round-robin so each batch has
    a fixed quota from each dataset (reference ``sampler.py:186``)."""

    def __init__(self, samplers, batch_sizes, epoch=0):
        if not isinstance(samplers, (list, tuple)) or not isinstance(batch_sizes, (list, tuple)):
            raise ValueError("samplers and batch_sizes should be lists or tuples")
        if len(batch_sizes) != len(samplers):
            raise ValueError("batch_sizes and samplers should be have same length")
        self.batch_sizes = batch_sizes
        self.samplers = samplers
        self.offsets = [0] + list(np.cumsum([len(x) for x in samplers])[:-1])
        self.epoch = epoch
        self.set_epoch(self.epoch)

    def _iter_one_dataset(self, c_batch_size, c_sampler, c_offset):
        it = iter(c_sampler)
        while True:  # trailing partial batches are dropped, like the torch
            batch = [c_offset + idx          # BatchSampler(drop_last=True)
                     for idx in itertools.islice(it, c_batch_size)]
            if len(batch) < c_batch_size:
                return
            yield batch

    def set_epoch(self, epoch):
        if not hasattr(self.samplers[0], "epoch"):
            return
        for s in self.samplers:
            s.set_epoch(epoch)

    def __iter__(self):
        iterators = [iter(i) for i in self.samplers]
        tot_batch = []
        for b_num in range(len(self)):
            for samp_idx in range(len(self.samplers)):
                c_batch = []
                while len(c_batch) < self.batch_sizes[samp_idx]:
                    c_batch.append(self.offsets[samp_idx] + next(iterators[samp_idx]))
                tot_batch.extend(c_batch)
            yield tot_batch
            tot_batch = []

    def __len__(self):
        min_len = float("inf")
        for idx, sampler in enumerate(self.samplers):
            c_len = len(sampler) // self.batch_sizes[idx]
            min_len = min(c_len, min_len)
        return int(min_len)


class DynamicBatchSampler:
    """Length-bucketed dynamic batching (reference ``sampler.py:305``):
    batches are filled until ``max_batch_length`` (in length units) so each
    batch has a bounded token count — with shape-bucketing this maps to a
    small set of XLA programs.
    """

    def __init__(self, dataset, max_batch_length, num_buckets=None,
                 length_func=lambda x: x["duration"], shuffle=True,
                 batch_ordering="random", max_batch_ex=None,
                 bucket_boundaries=[], lengths_list=None, seed=42, epoch=0,
                 drop_last=False, verbose=False):
        self._dataset = dataset
        self._ex_lengths = {}
        if lengths_list is not None:
            for indx in range(len(lengths_list)):
                self._ex_lengths[str(indx)] = lengths_list[indx]
        else:
            ex_ids = self._dataset.data_ids
            for indx in range(len(self._dataset)):
                self._ex_lengths[str(indx)] = length_func(self._dataset.data[ex_ids[indx]])

        if len(bucket_boundaries) > 0:
            if not all([x >= 0 for x in bucket_boundaries]):
                raise ValueError("All elements in bucket boundaries should be non-negative.")
            if not len(set(bucket_boundaries)) == len(bucket_boundaries):
                raise ValueError("Bucket_boundaries should not contain duplicates.")
            boundaries = np.array(sorted(bucket_boundaries), dtype=np.float64)
        else:
            if num_buckets is None:
                raise ValueError("Need either bucket_boundaries or num_buckets")
            lengths = np.array(list(self._ex_lengths.values()), dtype=np.float64)
            quantiles = np.linspace(0, 1, num_buckets + 1)[1:-1]
            boundaries = np.unique(np.quantile(lengths, quantiles))
        self._bucket_boundaries = boundaries
        self._max_batch_length = max_batch_length
        self._shuffle_ex = shuffle
        self._batch_ordering = batch_ordering
        self._seed = seed
        self._drop_last = drop_last
        self._max_batch_ex = max_batch_ex or np.inf
        self._epoch = epoch
        self._generate_batches()

    def get_durations(self, batch):
        return [self._ex_lengths[str(idx)] for idx in batch]

    def _bucket_of(self, length):
        return int(np.searchsorted(self._bucket_boundaries, length))

    def _generate_batches(self):
        rng = np.random.default_rng(self._seed + self._epoch)
        order = np.arange(len(self._ex_lengths))
        if self._shuffle_ex:
            order = rng.permutation(order)
        n_buckets = len(self._bucket_boundaries) + 1
        bucket_batches = [[] for _ in range(n_buckets)]
        bucket_lens = [0.0] * n_buckets
        batches = []
        for idx in order:
            length = self._ex_lengths[str(idx)]
            b = self._bucket_of(length)
            bucket_batches[b].append(int(idx))
            bucket_lens[b] += length
            if (bucket_lens[b] >= self._max_batch_length
                    or len(bucket_batches[b]) >= self._max_batch_ex):
                batches.append(bucket_batches[b])
                bucket_batches[b] = []
                bucket_lens[b] = 0.0
        if not self._drop_last:
            for b in range(n_buckets):
                if bucket_batches[b]:
                    batches.append(bucket_batches[b])
        if self._batch_ordering == "random":
            perm = rng.permutation(len(batches))
            batches = [batches[i] for i in perm]
        elif self._batch_ordering == "ascending":
            batches.sort(key=lambda b: max(self._ex_lengths[str(i)] for i in b))
        elif self._batch_ordering == "descending":
            batches.sort(key=lambda b: max(self._ex_lengths[str(i)] for i in b), reverse=True)
        self._batches = batches

    def __iter__(self):
        for batch in self._batches:
            yield batch
        if self._shuffle_ex or self._batch_ordering == "random":
            self._generate_batches()

    def set_epoch(self, epoch):
        self._epoch = epoch
        self._generate_batches()

    def __len__(self):
        return len(self._batches)


class DistributedSamplerWrapper:
    """Shard any sampler across processes (reference ``sampler.py:704``);
    pairs with ``jax.process_index()``/``jax.process_count()`` in multi-host
    runs. Each process sees indices ``rank::world`` of the inner sampler's
    stream, padded to equal length (wrap-around) like torch's
    DistributedSampler."""

    def __init__(self, sampler, rank=None, num_replicas=None, drop_last=False):
        import jax

        self.sampler = sampler
        self.rank = rank if rank is not None else jax.process_index()
        self.num_replicas = num_replicas if num_replicas is not None else jax.process_count()
        self.drop_last = drop_last

    def __iter__(self):
        indices = list(iter(self.sampler))
        if self.drop_last:
            total = (len(indices) // self.num_replicas) * self.num_replicas
            indices = indices[:total]
        else:
            pad = (-len(indices)) % self.num_replicas
            indices = indices + indices[:pad]
        return iter(indices[self.rank::self.num_replicas])

    def __len__(self):
        if self.drop_last:
            return len(self.sampler) // self.num_replicas
        return -(-len(self.sampler) // self.num_replicas)

    def set_epoch(self, epoch):
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)
