"""Watchdogged probes for the tunneled-device reality.

Through a relayed host↔device link (this environment's ``axon`` tunnel;
any remote-coordinator deployment behaves the same) two failure modes are
routine and must never hang an artifact-producing process:

- a FULLY dead tunnel blocks the *first* backend call indefinitely — even
  ``jax.devices()`` (observed for >5 h windows);
- a degraded downlink can stall a sub-MB device→host transfer for
  minutes, while the uplink stays healthy.

Both probes here run the blocking call on a daemon thread and give up
after a timeout, so callers (``bench.py``, ``__graft_entry__.py``,
``tools/serving_probe.py``) can emit an explicit "the link was dead"
record instead of an empty artifact. The reference framework never needs
this — its accelerator is PCIe-local (``speechbrain/core.py`` device
handling) — it is part of the TPU-tunnel operational surface.

Example
-------
>>> from svt_speechbrain_tpu.utils.linkprobe import probe_backend_init
>>> n, err = probe_backend_init(timeout=60.0)  # CPU backend: instant
>>> n >= 1 and err is None
True
"""
import threading
import time


def probe_backend_init(timeout=180.0):
    """Count backend devices under a watchdog.

    Runs the first ``jax.devices()`` call on a daemon thread. Returns
    ``(n_devices, None)`` on success, ``(None, None)`` on timeout (the
    dead-tunnel hang), or ``(None, exception)`` when backend init raised
    (e.g. malformed ``XLA_FLAGS``) — callers must not conflate the last
    two: a raise means the environment is broken, not the link.
    """
    result = {}

    def _probe():
        try:
            import jax

            result["n"] = len(jax.devices())
        except Exception as e:  # surfaced to the caller, not swallowed
            result["err"] = e

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout=timeout)
    if "err" in result:
        return None, result["err"]
    if "n" not in result:
        return None, None  # timed out: the dead-tunnel signature
    return result["n"], None


def probe_downlink_mbps(device_array, nbytes, timeout=60.0):
    """Device→host throughput of fetching ``device_array`` (MB/s).

    ``device_array`` must already be committed (``block_until_ready``).
    A dead link can hang even a 256 KB transfer, so the fetch runs on a
    daemon thread; on timeout the floor estimate ``nbytes/timeout`` is
    returned (reads as ~0 MB/s), never a hang.
    """
    import numpy as np

    result = {}

    def _probe():
        t0 = time.perf_counter()
        np.asarray(device_array)
        result["dt"] = time.perf_counter() - t0

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(timeout=timeout)
    return (nbytes / (1 << 20)) / max(result.get("dt", timeout), 1e-9)
