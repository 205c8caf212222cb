"""Training-step primitives shared by the experiment harness.

The reference repeats an identical train/eval skeleton in all five experiment
drivers (argparse -> Adam(lr=1e-3) -> manual lr*=0.5 every 50 epochs -> loop;
e.g. classification_shrec11.py:99-160). Here those pieces are reusable, jitted
primitives with the same step-decay schedule semantics; `experiments/
exp_common.fit` composes them into the full loop (and
`parallel.make_dp_train_step` is the drop-in data-parallel variant with the
SAME step signature).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import optax


def step_decay_schedule(base_lr: float, decay_every_steps: int,
                        decay_rate: float = 0.5) -> optax.Schedule:
    """lr * decay_rate^(floor(step / decay_every_steps)) — the reference's manual
    per-epoch decay (classification_shrec11.py:102-106) expressed as a schedule."""
    return optax.exponential_decay(
        init_value=base_lr, transition_steps=decay_every_steps,
        decay_rate=decay_rate, staircase=True)


def adam_with_step_decay(base_lr: float = 1e-3, decay_every_steps: int = 0,
                         decay_rate: float = 0.5) -> optax.GradientTransformation:
    """The reference's optimizer config (Adam + staircase decay) as one call."""
    sched = (step_decay_schedule(base_lr, decay_every_steps, decay_rate)
             if decay_every_steps else base_lr)
    return optax.adam(sched)


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    donate: bool = True):
    """Single-device jitted step. loss_fn(params, batch, rng) -> (loss, aux).

    Returns train_step(params, opt_state, batch, rng) ->
    (params, opt_state, loss, aux) — the same signature as
    parallel.make_dp_train_step(has_aux=True), so the harness swaps them
    freely. params/opt_state buffers are donated by default (halves optimizer
    memory traffic)."""

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def train_step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    return train_step


def make_eval_step(metric_fn: Callable):
    """metric_fn(params, batch) -> pytree of metrics; jitted."""

    @jax.jit
    def eval_step(params, batch):
        return metric_fn(params, batch)

    return eval_step
