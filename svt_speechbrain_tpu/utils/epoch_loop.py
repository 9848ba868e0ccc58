"""Epoch counting (analogue of reference ``speechbrain/utils/epoch_loop.py``)."""
from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


class EpochCounter:
    """Checkpointable epoch iterator 1..limit (reference ``epoch_loop.py:16``).

    Example
    -------
    >>> counter = EpochCounter(limit=3)
    >>> [epoch for epoch in counter]
    [1, 2, 3]
    >>> counter.load_state_dict({"current": 1}, end_of_epoch=False)
    >>> next(counter)              # interrupted epoch 1 repeats
    1
    """

    def __init__(self, limit):
        self.current = 0
        self.limit = int(limit)

    def __iter__(self):
        return self

    def __next__(self):
        if self.current < self.limit:
            self.current += 1
            logger.info(f"Going into epoch {self.current}")
            return self.current
        raise StopIteration

    def state_dict(self):
        return {"current": self.current}

    def load_state_dict(self, data, end_of_epoch=True):
        self.current = data["current"]
        if not end_of_epoch:
            # repeat the interrupted epoch (reference ``epoch_loop.py:58-66``)
            self.current -= 1


class EpochCounterWithStopper(EpochCounter):
    """Early stopping on a tracked metric (reference ``epoch_loop.py:71``)."""

    def __init__(self, limit, limit_to_stop, limit_warmup, direction):
        super().__init__(limit)
        self.limit_to_stop = limit_to_stop
        self.limit_warmup = limit_warmup
        self.direction = direction
        if self.limit_to_stop < 0:
            raise ValueError("Stopper 'limit_to_stop' must be >= 0")
        if self.limit_warmup < 0:
            raise ValueError("Stopper 'limit_warmup' must be >= 0")
        if self.direction == "min":
            self.min_delta = 1e-3
            self.best_limit = float("inf")
            self.th = lambda x: x < self.best_limit * (1 - self.min_delta)
        elif self.direction == "max":
            self.min_delta = 1e-3
            self.best_limit = float("-inf")
            self.th = lambda x: x > self.best_limit * (1 + self.min_delta)
        else:
            raise ValueError("Stopper 'direction' must be 'min' or 'max'")
        self.current_patience = self.limit_to_stop
        self.should_stop = False

    def __next__(self):
        if self.should_stop:
            raise StopIteration
        return super().__next__()

    def update_metric(self, current_metric):
        if self.current > self.limit_warmup:
            if self.th(current_metric):
                self.best_limit = current_metric
                self.current_patience = self.limit_to_stop
            else:
                self.current_patience -= 1
            self.should_stop = self.current_patience < 0

    def state_dict(self):
        return {"current": self.current, "best_limit": float(self.best_limit),
                "current_patience": self.current_patience,
                "should_stop": self.should_stop}

    def load_state_dict(self, data, end_of_epoch=True):
        super().load_state_dict({"current": data["current"]}, end_of_epoch)
        self.best_limit = data["best_limit"]
        self.current_patience = data["current_patience"]
        self.should_stop = data["should_stop"]
