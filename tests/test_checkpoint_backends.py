"""Orbax checkpoint backend + margin/KD losses + profiling utilities."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_orbax_checkpointer_roundtrip(tmp_path):
    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.utils.checkpoints import PytreeHandle
    from svt_speechbrain_tpu.utils.orbax_checkpoints import OrbaxCheckpointer
    from svt_speechbrain_tpu.nnet.schedulers import NewBobScheduler

    lin = Linear(4, 3)
    state = {"p": lin.init(jax.random.PRNGKey(0))}
    sched = NewBobScheduler(initial_value=1.0)
    sched(10.0)
    sched(20.0)  # anneal

    ckpt = OrbaxCheckpointer(tmp_path / "ckpts", recoverables={
        "model": PytreeHandle(get=lambda: state["p"],
                              set=lambda t: state.update(p=t)),
        "sched": sched,
    })
    step = ckpt.save_checkpoint(meta={"loss": 1.0})

    # corrupt, then restore
    saved = jax.device_get(state["p"])
    state["p"] = lin.init(jax.random.PRNGKey(9))
    sched2 = NewBobScheduler(initial_value=1.0)
    ckpt2 = OrbaxCheckpointer(tmp_path / "ckpts", recoverables={
        "model": PytreeHandle(get=lambda: state["p"],
                              set=lambda t: state.update(p=t)),
        "sched": sched2,
    })
    restored_step = ckpt2.recover_if_possible()
    assert restored_step == step
    for a, b in zip(jax.tree_util.tree_leaves(saved),
                    jax.tree_util.tree_leaves(state["p"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert sched2.hyperparam_value == sched.hyperparam_value
    assert sched2.metric_values == sched.metric_values


def test_margin_losses():
    from svt_speechbrain_tpu.nnet.losses import (
        AngularMargin, AdditiveAngularMargin, LogSoftmaxWrapper,
    )

    rng = np.random.default_rng(0)
    cosines = jnp.asarray(np.clip(rng.normal(size=(4, 10)) * 0.3, -0.9, 0.9),
                          jnp.float32)
    targets = jnp.asarray(rng.integers(0, 10, 4))

    for margin_mod in (AngularMargin(margin=0.2, scale=30),
                       AdditiveAngularMargin(margin=0.2, scale=30)):
        crit = LogSoftmaxWrapper(margin_mod)
        loss = crit(cosines, targets)
        assert np.isfinite(float(loss)) and float(loss) > 0


def test_kd_losses():
    from svt_speechbrain_tpu.nnet.losses import ce_kd, nll_loss_kd, ctc_loss_kd

    rng = np.random.default_rng(1)
    student = jnp.asarray(np.log(rng.dirichlet(np.ones(5), size=(2, 7))), jnp.float32)
    teacher = jnp.asarray(rng.dirichlet(np.ones(5), size=(2, 7)), jnp.float32)
    elem = ce_kd(student, teacher)
    assert elem.shape == (2, 7)
    loss = nll_loss_kd(student, teacher, jnp.ones(2))
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert np.isfinite(float(ctc_loss_kd(student, teacher, jnp.ones(2), 0)))


def test_step_timer():
    from svt_speechbrain_tpu.utils.profiling import StepTimer

    t = StepTimer("unit")
    for _ in range(3):
        with t.measure():
            pass
    s = t.summary()
    assert s["steps"] == 2  # first call reported separately
    assert "mean_ms" in s
