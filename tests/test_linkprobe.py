"""Watchdogged link probes: the three failure modes must be distinct.

A dead tunnel TIMES OUT, a broken environment RAISES, and a healthy
backend counts devices — `bench.py`, `__graft_entry__.py` and
`tools/serving_probe.py` all branch on which one happened (an empty
round artifact vs an explicit dead-link record vs a loud failure), so
the classification itself is load-bearing.
"""
import time

import numpy as np

from svt_speechbrain_tpu.utils.linkprobe import (probe_backend_init,
                                                 probe_downlink_mbps)


def test_backend_init_healthy():
    n, err = probe_backend_init(timeout=60.0)
    assert err is None
    assert n >= 1  # conftest forces the 8-device virtual CPU mesh


def test_backend_init_exception_surfaced(monkeypatch):
    import jax

    boom = RuntimeError("malformed XLA_FLAGS")

    def _raise():
        raise boom

    monkeypatch.setattr(jax, "devices", _raise)
    n, err = probe_backend_init(timeout=60.0)
    assert n is None
    assert err is boom  # NOT conflated with a timeout


def test_backend_init_timeout_is_not_an_error(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "devices", lambda: time.sleep(30))
    n, err = probe_backend_init(timeout=0.05)
    assert n is None and err is None  # the dead-tunnel signature


def test_downlink_healthy_fetch():
    arr = np.zeros((1 << 16,), np.float32)  # ndarray: asarray is instant
    mbps = probe_downlink_mbps(arr, 1 << 18, timeout=60.0)
    assert mbps > 1.0


def test_downlink_hang_returns_floor():
    class Hangs:
        def __array__(self, dtype=None):
            time.sleep(30)

    mbps = probe_downlink_mbps(Hangs(), 1 << 18, timeout=0.1)
    assert mbps <= (0.25 / 0.1) + 1e-6  # floor estimate, no hang
