"""Profiling / tracing utilities (the reference has essentially none —
SURVEY.md §5.1: TorchScript profiling disabled, tqdm-only visibility. The
TPU build exposes the XLA profiler and compile/step timing natively)."""
from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def profile(logdir="./profile", host_tracer_level=2, timeout_s=60.0):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/Perfetto.

    Trace collection runs in a watchdog thread: on remoted/relayed backends
    (e.g. a tunneled TPU) ``stop_trace`` can hang waiting for device traces
    that never arrive — after ``timeout_s`` the context exits with a warning
    instead of hanging the experiment. The wrapped computation itself always
    runs."""
    import threading

    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir, create_perfetto_link=False)
        started = True
    except Exception as e:
        logger.warning(f"profiler start_trace failed ({e}); running unprofiled")
    try:
        yield logdir
    finally:
        if started:
            done = threading.Event()

            def stop():
                try:
                    jax.profiler.stop_trace()
                except Exception as e:  # pragma: no cover
                    logger.warning(f"profiler stop_trace failed: {e}")
                done.set()

            t = threading.Thread(target=stop, daemon=True)
            t.start()
            if done.wait(timeout_s):
                logger.info(f"Profiler trace written to {logdir}")
            else:
                logger.warning(
                    f"profiler stop_trace did not finish within {timeout_s}s "
                    "(relayed backends may not support trace collection); "
                    "continuing without a trace")


@contextlib.contextmanager
def annotate(name):
    """Named region inside a captured trace (StepTraceAnnotation)."""
    import jax

    with jax.profiler.StepTraceAnnotation(name):
        yield


class StepTimer:
    """Lightweight wall-clock step timing with compile-time separation:
    the first call per shape is reported as compile+run.

    Example
    -------
    >>> timer = StepTimer("demo")
    >>> for _ in range(3):
    ...     with timer.measure():
    ...         pass
    >>> s = timer.summary()
    >>> sorted(s), s["steps"]       # first call tracked apart from steady state
    (['first_ms', 'mean_ms', 'p50_ms', 'p95_ms', 'steps'], 2)
    """

    def __init__(self, name="step"):
        self.name = name
        self.times = []
        self.first_time = None

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        if self.first_time is None:
            self.first_time = dt
            logger.info(f"{self.name}: first call (incl. compile) {dt * 1e3:.1f} ms")
        else:
            self.times.append(dt)

    def summary(self):
        import numpy as np

        if not self.times:
            return {"first_ms": (self.first_time or 0) * 1e3}
        arr = np.asarray(self.times)
        return {
            "first_ms": (self.first_time or 0) * 1e3,
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "steps": len(self.times),
        }


def log_compile_cache_stats():
    """Log jit cache sizes (visibility into shape-bucketing discipline)."""
    try:
        import jax

        info = jax.lib.xla_bridge.get_backend().live_executables()  # type: ignore[attr-defined]
        logger.info(f"live executables: {len(info)}")
    except Exception:
        logger.info("compile cache stats unavailable on this backend")
