"""Multi-process (multi-host) utilities
(analogue of reference ``speechbrain/utils/distributed.py``).

The reference gates rank-0-only work with ``run_on_main``/``if_main_process``
over ``torch.distributed`` (``distributed.py:14-95``). On TPU pods the
process group is implicit: ``jax.distributed.initialize()`` connects hosts
over DCN, and ``jax.process_index()`` replaces ``RANK``. XLA collectives ride
ICI inside jitted programs; these helpers only choreograph *host-side* work
(experiment-dir creation, checkpoint writes, data prep).
"""
from __future__ import annotations

import functools
import logging

logger = logging.getLogger(__name__)


def if_main_process():
    """True on the main (process_index 0) host (reference ``distributed.py:82``)."""
    import jax

    try:
        return jax.process_index() == 0
    except RuntimeError:
        return True


def main_process_only(function):
    """Decorator: run only on the main process, barrier after
    (reference ``distributed.py:`` MAIN_PROC_ONLY pattern)."""

    @functools.wraps(function)
    def main_proc_wrapped_func(*args, **kwargs):
        result = None
        if if_main_process():
            result = function(*args, **kwargs)
        ddp_barrier()
        return result

    return main_proc_wrapped_func


def run_on_main(func, args=None, kwargs=None, post_func=None, post_args=None,
                post_kwargs=None, run_post_on_main=False):
    """Run ``func`` on the main process only, barrier, then optionally run
    ``post_func`` on non-main processes (reference ``distributed.py:14-79``).

    Example
    -------
    >>> if_main_process()       # single-process: this IS the main process
    True
    >>> acc = []
    >>> run_on_main(acc.append, args=[1],
    ...             post_func=acc.append, post_args=[2], run_post_on_main=True)
    >>> acc
    [1, 2]
    """
    args = args or []
    kwargs = kwargs or {}
    post_args = post_args or []
    post_kwargs = post_kwargs or {}

    if if_main_process():
        func(*args, **kwargs)
    ddp_barrier()
    if post_func is not None:
        if run_post_on_main:
            post_func(*post_args, **post_kwargs)
        elif not if_main_process():
            post_func(*post_args, **post_kwargs)
        ddp_barrier()


def ddp_barrier():
    """Cross-host barrier (reference ``distributed.py:98``). A no-op in
    single-process runs; on pods it synchronizes via a trivial psum."""
    import jax

    try:
        if jax.process_count() > 1:
            # A tiny all-reduce across all devices acts as a barrier.
            import numpy as np

            x = jax.numpy.ones((jax.local_device_count(),))
            jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()
    except RuntimeError:
        pass


def ddp_init_group(run_opts=None, coordinator_address=None, num_processes=None,
                   process_id=None):
    """Initialize the multi-host runtime (analogue of reference
    ``distributed.py:107`` ``ddp_init_group``).

    With no arguments, relies on the cluster auto-detection built into
    ``jax.distributed.initialize``; single-host runs skip initialization.
    ``coordinator_address``/``num_processes``/``process_id`` may come as
    kwargs or as ``run_opts`` keys (the CLI/yaml route). When a distributed
    launch was explicitly requested, failure to initialize raises — silently
    degrading to a single process would train on a fraction of the data.
    """
    import jax

    run_opts = run_opts or {}
    coordinator_address = coordinator_address or run_opts.get("coordinator_address")
    num_processes = num_processes if num_processes is not None else run_opts.get("num_processes")
    process_id = process_id if process_id is not None else run_opts.get("process_id")
    explicit = run_opts.get("distributed_launch", False)
    if not explicit and coordinator_address is None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            f"Initialized distributed runtime: process {jax.process_index()} "
            f"of {jax.process_count()}")
    except Exception as e:
        if jax.process_count() > 1:  # already initialized by the launcher
            logger.info(f"distributed runtime already initialized: {e}")
        elif explicit or coordinator_address is not None:
            raise RuntimeError(
                f"--distributed_launch requested but "
                f"jax.distributed.initialize failed: {e}") from e
        else:
            logger.warning(f"jax.distributed.initialize failed: {e}")
