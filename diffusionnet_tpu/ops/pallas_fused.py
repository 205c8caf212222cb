"""Fused Pallas TPU kernel for the DiffusionNet spectral block core.

One kernel launch computes, for a single surface:

    x_hat = Phi^T (m . x)            (spectral projection, mass-weighted)
    s     = coefs . x_hat            (learned per-channel heat diffusion)
    y     = Phi s                    (back-projection = diffused signal)
    ygx   = GX s                     (tangent-gradient X of the diffused signal)
    ygy   = GY s                     (tangent-gradient Y)

with Phi = evecs (V,K), GX/GY the spectral gradient operators
(geometry.operators.spectral_gradients), coefs = exp(-evals t) (K,C).

Structure: a 2-phase sequential grid (phase, tile). Phase 0 streams (Phi, m.x)
tiles and accumulates x_hat in a VMEM scratch; phase 1 multiplies in the
diffusion coefficients once, then streams (Phi, GX, GY) tiles emitting all three
outputs. The (K,C) intermediates never touch HBM, the mass-weighting and
exponential are fused, and inputs not needed in a phase are pinned to tile 0 by
their index maps so they cost one redundant tile, not a full pass.

The backward pass is plain XLA einsums (transposed matmuls — already optimal),
wired through jax.custom_vjp; operator inputs get symbolic zero cotangents.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_V = 1024


def _kernel(x_ref, evecs_ref, gx_ref, gy_ref, mass_ref, coefs_ref,
            y_ref, ygx_ref, ygy_ref, acc_ref):
    phase = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((phase == 0) & (i == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        xm = x_ref[:] * mass_ref[:]  # (T, C) * (T, 1)
        acc_ref[:] += jax.lax.dot_general(
            evecs_ref[:], xm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (K, C)

    @pl.when(phase == 1)
    def _():
        @pl.when(i == 0)
        def _():
            acc_ref[:] = coefs_ref[:] * acc_ref[:]  # s = coefs . x_hat
        s = acc_ref[:]
        # casts are no-ops for f32 outputs; with bf16 inputs the out refs
        # are bf16 and a raw f32 store is a dtype error
        y_ref[:] = jnp.dot(evecs_ref[:], s,
                           preferred_element_type=jnp.float32
                           ).astype(y_ref.dtype)
        ygx_ref[:] = jnp.dot(gx_ref[:], s,
                             preferred_element_type=jnp.float32
                             ).astype(ygx_ref.dtype)
        ygy_ref[:] = jnp.dot(gy_ref[:], s,
                             preferred_element_type=jnp.float32
                             ).astype(ygy_ref.dtype)


def _check_tile(V, tile_v):
    if V % tile_v:
        raise ValueError(f"V={V} must be a multiple of tile_v={tile_v} "
                         "(pad to a bucket)")


def _fused_fwd_impl(x, evecs, gX, gY, mass, coefs, tile_v: int,
                    interpret: bool = False):
    _check_tile(x.shape[-2], tile_v)
    V, C = x.shape
    K = evecs.shape[1]
    n_tiles = V // tile_v

    grid = (2, n_tiles)
    row_in_phase0 = lambda p, i: (i * (1 - p), 0)   # real tiles in phase 0 only
    row_in_phase1 = lambda p, i: (i * p, 0)         # real tiles in phase 1 only
    every_phase = lambda p, i: (i, 0)

    out_shape = [jax.ShapeDtypeStruct((V, C), x.dtype) for _ in range(3)]
    y, ygx, ygy = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_v, C), row_in_phase0),   # x
            pl.BlockSpec((tile_v, K), every_phase),     # evecs
            pl.BlockSpec((tile_v, K), row_in_phase1),   # gX
            pl.BlockSpec((tile_v, K), row_in_phase1),   # gY
            pl.BlockSpec((tile_v, 1), row_in_phase0),   # mass (V,1)
            pl.BlockSpec((K, C), lambda p, i: (0, 0)),  # coefs
        ],
        out_specs=[
            pl.BlockSpec((tile_v, C), row_in_phase1),
            pl.BlockSpec((tile_v, C), row_in_phase1),
            pl.BlockSpec((tile_v, C), row_in_phase1),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((K, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, evecs, gX, gY, mass[:, None], coefs)
    return y, ygx, ygy


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_spectral_block(x, evecs, gX, gY, mass, coefs,
                         tile_v: int = DEFAULT_TILE_V,
                         interpret: bool = False):
    """(y, ygx, ygy) for ONE surface; x (V,C), evecs/gX/gY (V,K), mass (V,),
    coefs (K,C). V must be a multiple of tile_v (use padded buckets). vmap over
    a leading batch axis for batches."""
    return _fused_fwd_impl(x, evecs, gX, gY, mass, coefs, tile_v, interpret)


def _fwd(x, evecs, gX, gY, mass, coefs, tile_v, interpret):
    outs = _fused_fwd_impl(x, evecs, gX, gY, mass, coefs, tile_v, interpret)
    # Residuals: x_hat is cheap to recompute from x; keep it instead of x to
    # shorten the backward chain: x_hat = Phi^T (m x).
    x_hat = jnp.einsum("vk,vc->kc", evecs, x * mass[:, None],
                       preferred_element_type=jnp.float32)
    return outs, (x, evecs, gX, gY, mass, coefs, x_hat)


def _bwd(tile_v, interpret, res, cts):
    x, evecs, gX, gY, mass, coefs, x_hat = res
    dy, dgx, dgy = cts
    # ds = Phi^T dy + GX^T dgx + GY^T dgy  (K,C)
    ds = (jnp.einsum("vk,vc->kc", evecs, dy)
          + jnp.einsum("vk,vc->kc", gX, dgx)
          + jnp.einsum("vk,vc->kc", gY, dgy))
    dcoefs = (ds * x_hat).astype(coefs.dtype)
    dxhat = ds * coefs
    # cotangent dtype must match the primal (x may be bf16)
    dx = (mass[:, None] * jnp.einsum("vk,kc->vc", evecs, dxhat)
          ).astype(x.dtype)
    zeros_like = jax.tree.map(jnp.zeros_like, (evecs, gX, gY, mass))
    return (dx, *zeros_like, dcoefs)


fused_spectral_block.defvjp(_fwd, _bwd)


def _kernel_batched(x_ref, evecs_ref, gx_ref, gy_ref, mass_ref, coefs_ref,
                    y_ref, ygx_ref, ygy_ref, acc_ref):
    phase = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when((phase == 0) & (i == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        xm = x_ref[0] * mass_ref[0]
        acc_ref[:] += jax.lax.dot_general(
            evecs_ref[0], xm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(phase == 1)
    def _():
        @pl.when(i == 0)
        def _():
            acc_ref[:] = coefs_ref[0] * acc_ref[:]
        s = acc_ref[:]
        y_ref[0] = jnp.dot(evecs_ref[0], s,
                           preferred_element_type=jnp.float32
                           ).astype(y_ref.dtype)
        ygx_ref[0] = jnp.dot(gx_ref[0], s,
                             preferred_element_type=jnp.float32
                             ).astype(ygx_ref.dtype)
        ygy_ref[0] = jnp.dot(gy_ref[0], s,
                             preferred_element_type=jnp.float32
                             ).astype(ygy_ref.dtype)


def _fused_fwd_batched_impl(x, evecs, gX, gY, mass, coefs, tile_v: int,
                            interpret: bool = False):
    _check_tile(x.shape[-2], tile_v)
    B, V, C = x.shape
    K = evecs.shape[-1]
    n_tiles = V // tile_v
    grid = (B, 2, n_tiles)

    p0 = lambda b, p, i: (b, i * (1 - p), 0)
    p1 = lambda b, p, i: (b, i * p, 0)
    both = lambda b, p, i: (b, i, 0)

    out_shape = [jax.ShapeDtypeStruct((B, V, C), x.dtype) for _ in range(3)]
    return pl.pallas_call(
        _kernel_batched,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_v, C), p0),                 # x
            pl.BlockSpec((1, tile_v, K), both),               # evecs
            pl.BlockSpec((1, tile_v, K), p1),                 # gX
            pl.BlockSpec((1, tile_v, K), p1),                 # gY
            pl.BlockSpec((1, tile_v, 1), p0),                 # mass
            pl.BlockSpec((1, K, C), lambda b, p, i: (b, 0, 0)),  # coefs
        ],
        out_specs=[pl.BlockSpec((1, tile_v, C), p1) for _ in range(3)],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((K, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, evecs, gX, gY, mass[..., None], coefs)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_spectral_block_batched(x, evecs, gX, gY, mass, coefs,
                                 tile_v: int = DEFAULT_TILE_V,
                                 interpret: bool = False):
    """Batched version: all args carry a leading batch dim (coefs included).
    Batch is a leading grid dimension of ONE kernel (not vmap — vmapping a
    pallas_call compiles pathologically slowly on some toolchains)."""
    return _fused_fwd_batched_impl(x, evecs, gX, gY, mass, coefs, tile_v,
                                   interpret)


def _fwd_b(x, evecs, gX, gY, mass, coefs, tile_v, interpret):
    outs = _fused_fwd_batched_impl(x, evecs, gX, gY, mass, coefs, tile_v,
                                   interpret)
    x_hat = jnp.einsum("bvk,bvc->bkc", evecs, x * mass[..., None],
                       preferred_element_type=jnp.float32)
    return outs, (x, evecs, gX, gY, mass, coefs, x_hat)


def _bwd_b(tile_v, interpret, res, cts):
    x, evecs, gX, gY, mass, coefs, x_hat = res
    dy, dgx, dgy = cts
    ds = (jnp.einsum("bvk,bvc->bkc", evecs, dy)
          + jnp.einsum("bvk,bvc->bkc", gX, dgx)
          + jnp.einsum("bvk,bvc->bkc", gY, dgy))
    dcoefs = (ds * x_hat).astype(coefs.dtype)
    dxhat = ds * coefs
    # cotangent dtype must match the primal (x may be bf16)
    dx = (mass[..., None] * jnp.einsum("bvk,bkc->bvc", evecs, dxhat)
          ).astype(x.dtype)
    zeros_like = jax.tree.map(jnp.zeros_like, (evecs, gX, gY, mass))
    return (dx, *zeros_like, dcoefs)


fused_spectral_block_batched.defvjp(_fwd_b, _bwd_b)
