"""Data-parallel training over a device mesh via shard_map + explicit collectives.

Each device computes grads on its shard of the (padded, stacked) mesh batch; grads
and metrics are pmean'd over the `data` axis (ICI all-reduce); the optimizer step
runs redundantly-replicated. This is the TPU-native replacement for the
parallelism the reference lacks entirely (SURVEY §2.6).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_dp_train_step(loss_fn, optimizer: optax.GradientTransformation,
                       mesh: Mesh, axis: str = "data", donate: bool = True,
                       has_aux: bool = False):
    """Build a jitted data-parallel train step.

    loss_fn(params, batch, rng) -> scalar loss (or (loss, aux) with
    has_aux=True; aux leaves are per-shard SUMS and get psum'd). batch is a
    pytree whose leaves all carry a leading batch axis divisible by the mesh's
    `data` size.

    Because the model runs per-device INSIDE shard_map, this composes with
    Pallas kernels (the megakernel fast path) — XLA cannot auto-partition a
    custom call, but each device simply launches its own kernel on its shard.

    Returns train_step(params, opt_state, batch, rng) ->
    (params, opt_state, loss[, aux])."""

    def device_fn(params, opt_state, batch, rng):
        # decorrelate dropout across devices
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if has_aux:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, rng)
            aux = jax.lax.psum(aux, axis)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if has_aux:
            return params, opt_state, loss, aux
        return params, opt_state, loss

    out_specs = (P(), P(), P(), P()) if has_aux else (P(), P(), P())
    sharded = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(), P(axis), P()),
        out_specs=out_specs,
        check_vma=False,
    )

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(sharded, donate_argnums=donate_argnums)


def make_dp_eval_step(metric_fn, mesh: Mesh, axis: str = "data"):
    """metric_fn(params, batch) -> pytree of per-shard SUMS (e.g. correct counts);
    sums are psum'd over the data axis."""

    def device_fn(params, batch):
        metrics = metric_fn(params, batch)
        return jax.lax.psum(metrics, axis)

    sharded = shard_map(device_fn, mesh=mesh,
                        in_specs=(P(), P(axis)), out_specs=P(),
                        check_vma=False)
    return jax.jit(sharded)
