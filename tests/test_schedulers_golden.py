"""Golden parity of host-side schedulers vs the reference implementations.

The reference module (``/root/reference/speechbrain/nnet/schedulers.py``)
pulls in the full speechbrain package; we load it by file path with the
checkpoint-decorator namespace stubbed so only the scheduler logic runs.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

from tests.conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _load_reference_schedulers():
    name = "_ref_schedulers_golden"
    if name in sys.modules:
        return sys.modules[name]
    # stub the decorator namespace the module imports at top level
    ckpt = types.ModuleType("speechbrain.utils.checkpoints")
    ckpt.register_checkpoint_hooks = lambda cls: cls
    ckpt.mark_as_saver = lambda fn: fn
    ckpt.mark_as_loader = lambda fn: fn
    utils = types.ModuleType("speechbrain.utils")
    utils.checkpoints = ckpt
    pkg = types.ModuleType("speechbrain")
    pkg.utils = utils
    stubs = {"speechbrain": pkg, "speechbrain.utils": utils,
             "speechbrain.utils.checkpoints": ckpt}
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            name, "/root/reference/speechbrain/nnet/schedulers.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


@pytest.mark.parametrize("patient", [0, 1, 3])
def test_newbob_sequence_matches_reference(patient):
    """Identical (old, new) sequences on adversarial metric streams:
    improvements, stalls, exact zeros (division guard), regressions."""
    from svt_speechbrain_tpu.nnet.schedulers import NewBobScheduler

    ref_mod = _load_reference_schedulers()
    metrics = [10.0, 9.0, 9.0, 9.0, 9.0, 8.0, 0.0, 5.0, 0.0, 0.0, 4.0,
               3.99, 3.99, 3.99, 3.99, 3.0]
    rng = np.random.default_rng(7)
    metrics += list(np.abs(rng.normal(size=30)))

    ours = NewBobScheduler(initial_value=1.0, annealing_factor=0.5,
                           improvement_threshold=0.0025, patient=patient)
    theirs = ref_mod.NewBobScheduler(initial_value=1.0, annealing_factor=0.5,
                                     improvement_threshold=0.0025,
                                     patient=patient)
    for m in metrics:
        got = ours(float(m))
        want = theirs(float(m))
        assert got == tuple(want), (m, got, want)
        assert ours.current_patient == theirs.current_patient


def test_reduce_lr_on_plateau_matches_reference():
    from svt_speechbrain_tpu.nnet.schedulers import ReduceLROnPlateau

    ref_mod = _load_reference_schedulers()
    import torch

    ours = ReduceLROnPlateau(lr_min=1e-4, factor=0.5, patience=2,
                             dont_halve_until_epoch=3)
    theirs = ref_mod.ReduceLROnPlateau(lr_min=1e-4, factor=0.5, patience=2,
                                       dont_halve_until_epoch=3)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.1)
    losses = [5.0, 4.0, 4.5, 4.6, 4.7, 4.8, 4.9, 3.0, 3.1, 3.2, 3.3, 3.4]
    lr = 0.1
    for epoch, loss in enumerate(losses, start=1):
        old_ours, new_ours = ours(lr, epoch, loss)
        old_ref, new_ref = theirs([opt], epoch, torch.tensor(loss))
        assert np.isclose(old_ours, old_ref), (epoch, old_ours, old_ref)
        assert np.isclose(new_ours, new_ref), (epoch, new_ours, new_ref)
        lr = new_ours
        for g in opt.param_groups:
            g["lr"] = new_ref


def test_noam_sequence_matches_reference():
    """Per-step lr sequences identical through warmup and decay, with and
    without model_size normalization."""
    from svt_speechbrain_tpu.nnet.schedulers import NoamScheduler

    ref_mod = _load_reference_schedulers()
    import torch

    for model_size in (None, 64):
        ours = NoamScheduler(lr_initial=1.0, n_warmup_steps=5,
                             model_size=model_size)
        theirs = ref_mod.NoamScheduler(lr_initial=1.0, n_warmup_steps=5,
                                       model_size=model_size)
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
        for step in range(1, 30):
            got, _ = ours()
            _, want = theirs(opt)
            assert np.isclose(got, want), (model_size, step, got, want)
            assert np.isclose(opt.param_groups[0]["lr"], got)


def test_cyclic_cosine_sequence_matches_reference():
    from svt_speechbrain_tpu.nnet.schedulers import CyclicCosineScheduler

    ref_mod = _load_reference_schedulers()
    import torch

    ours = CyclicCosineScheduler(n_warmup_steps=3, lr_initial=0.5,
                                 total_steps=40)
    theirs = ref_mod.CyclicCosineScheduler(n_warmup_steps=3, lr_initial=0.5,
                                           total_steps=40)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.5)
    for step in range(1, 45):
        _, got = ours()
        _, want = theirs(opt)
        assert np.isclose(got, want), (step, got, want)


def test_cyclic_lr_sequence_matches_reference():
    """Triangular / triangular2 / exp_range batch-end lr curves identical."""
    from svt_speechbrain_tpu.nnet.schedulers import CyclicLRScheduler

    ref_mod = _load_reference_schedulers()
    import torch

    for mode, gamma in (("triangular", 1.0), ("triangular2", 1.0),
                        ("exp_range", 0.999)):
        ours = CyclicLRScheduler(base_lr=0.001, max_lr=0.006, step_size=7.0,
                                 mode=mode, gamma=gamma)
        theirs = ref_mod.CyclicLRScheduler(base_lr=0.001, max_lr=0.006,
                                           step_size=7.0, mode=mode,
                                           gamma=gamma)
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.001)
        for step in range(40):
            got = ours.on_batch_end()
            theirs.on_batch_end(opt)
            want = opt.param_groups[0]["lr"]
            assert np.isclose(got, want), (mode, step, got, want)


def test_epoch_stopper_matches_reference():
    """should_stop decisions identical on adversarial metric streams for
    both directions (incl. exact-equality no-improvement and warmup)."""
    import importlib.util

    from svt_speechbrain_tpu.utils.epoch_loop import EpochCounterWithStopper

    name = "speechbrain.utils.epoch_loop"
    if "_ref_epoch_loop_golden" in sys.modules:
        ref_mod = sys.modules["_ref_epoch_loop_golden"]
    else:
        ckpt = types.ModuleType("speechbrain.utils.checkpoints")
        ckpt.register_checkpoint_hooks = lambda cls: cls
        ckpt.mark_as_saver = lambda fn: fn
        ckpt.mark_as_loader = lambda fn: fn
        utils = types.ModuleType("speechbrain.utils")
        utils.checkpoints = ckpt
        utils.__path__ = []  # mark as package so relative imports resolve
        pkg = types.ModuleType("speechbrain")
        pkg.utils = utils
        pkg.__path__ = []
        stubs = {"speechbrain": pkg, "speechbrain.utils": utils,
                 "speechbrain.utils.checkpoints": ckpt}
        saved = {k: sys.modules.get(k) for k in stubs}
        sys.modules.update(stubs)
        try:
            # exec under the package name so `from .checkpoints import ...`
            # resolves against the stub package
            spec = importlib.util.spec_from_file_location(
                name, "/root/reference/speechbrain/utils/epoch_loop.py")
            ref_mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = ref_mod
            spec.loader.exec_module(ref_mod)
            sys.modules["_ref_epoch_loop_golden"] = ref_mod
        finally:
            sys.modules.pop(name, None)
            for k, v in saved.items():
                if v is None:
                    sys.modules.pop(k, None)
                else:
                    sys.modules[k] = v

    rng = np.random.default_rng(3)
    metrics = [5.0, 4.0, 4.0, 3.999996, 4.0, 4.0, 2.0, 2.0, 2.0, 2.0, 2.0]
    metrics += list(np.abs(rng.normal(size=20)) + 1.0)
    for direction in ("min", "max"):
        ours = EpochCounterWithStopper(limit=40, limit_to_stop=3,
                                       limit_warmup=2, direction=direction)
        theirs = ref_mod.EpochCounterWithStopper(
            limit=40, limit_to_stop=3, limit_warmup=2, direction=direction)
        for epoch, m in enumerate(metrics, start=1):
            got = ours.should_stop(epoch, float(m))
            want = theirs.should_stop(epoch, float(m))
            assert got == want, (direction, epoch, m, got, want)
            assert ours.best_limit == theirs.best_limit
            assert ours.th == theirs.th
