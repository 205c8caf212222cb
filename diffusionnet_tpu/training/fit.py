"""Generic training harness.

The reference repeats an identical train/eval skeleton in all five experiment
drivers (argparse -> Adam(lr=1e-3) -> manual lr*=0.5 every 50 epochs -> loop; e.g.
classification_shrec11.py:99-160). Here that skeleton is one reusable, jitted
harness built on optax, with the same step-decay schedule semantics.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def step_decay_schedule(base_lr: float, decay_every_steps: int,
                        decay_rate: float = 0.5) -> optax.Schedule:
    """lr * decay_rate^(floor(step / decay_every_steps)) — the reference's manual
    per-epoch decay (classification_shrec11.py:102-106) expressed as a schedule."""
    return optax.exponential_decay(
        init_value=base_lr, transition_steps=decay_every_steps,
        decay_rate=decay_rate, staircase=True)


def adam_with_step_decay(base_lr: float = 1e-3, decay_every_steps: int = 0,
                         decay_rate: float = 0.5) -> optax.GradientTransformation:
    sched = (step_decay_schedule(base_lr, decay_every_steps, decay_rate)
             if decay_every_steps else base_lr)
    return optax.adam(sched)


def create_train_state(model, optimizer, example_inputs: dict,
                       rng=None) -> tuple[TrainState, Any]:
    """Initialize params/opt_state from example (padded) inputs."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = model.init({"params": rng}, **example_inputs)
    opt_state = optimizer.init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32)), params


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation):
    """Single-device jitted step. loss_fn(params, batch, rng) -> (loss, aux)."""

    @jax.jit
    def train_step(state: TrainState, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss, aux

    return train_step


def make_eval_step(metric_fn: Callable):
    """metric_fn(params, batch) -> pytree of metrics; jitted."""

    @jax.jit
    def eval_step(params, batch):
        return metric_fn(params, batch)

    return eval_step
