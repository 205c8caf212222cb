"""Training utilities: checkpoint roundtrip, profiling helpers, schedules."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from diffusionnet_tpu.training import (
    save_checkpoint, restore_checkpoint, step_decay_schedule, StageTimer,
    slope_throughput,
)


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                        "b": jnp.ones(3)},
             "step": jnp.asarray(7)}
    path = save_checkpoint(str(tmp_path / "ckpt"), state, step=7)
    template = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_step_decay_schedule_matches_reference_semantics():
    """lr *= 0.5 every `decay_every` steps (reference
    classification_shrec11.py:102-106 per-epoch decay)."""
    sched = step_decay_schedule(1e-3, decay_every_steps=10, decay_rate=0.5)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 2.5e-4, rtol=1e-6)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report()


def test_slope_throughput():
    @jax.jit
    def f(x):
        return x * 1.0001

    def step(x):
        y = f(x)
        return y, jnp.sum(y)

    rate, _ = slope_throughput(step, jnp.ones(16))
    assert rate > 0
