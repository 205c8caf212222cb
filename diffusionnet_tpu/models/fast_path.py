"""Megakernel fast path: run a standard DiffusionNet with whole-block Pallas
kernels, consuming the SAME Flax parameter pytree as models.DiffusionNet.

Supported configuration (the reference default): spectral diffusion with dense
spectral gradient operators, with_gradient_features=True,
with_gradient_rotations=True, mlp_hidden_dims=(C, C), dropout off.
Use for deterministic forward/training at large V where the per-block
activation traffic dominates (see ops/pallas_megablock.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_megablock import megablock


def _block_params(params, b: int):
    p = params["params"][f"block_{b}"]
    t = p["diffusion"]["diffusion_time"]
    gf = p["gradient_features"]
    mlp = p["mlp"]
    return (t, gf["A_re"]["kernel"], gf["A_im"]["kernel"],
            mlp["dense_000"]["kernel"], mlp["dense_000"]["bias"],
            mlp["dense_001"]["kernel"], mlp["dense_001"]["bias"],
            mlp["dense_002"]["kernel"], mlp["dense_002"]["bias"])


def megablock_apply(params, x_in, mass, evals, evecs, gX_spec, gY_spec,
                    n_block: int, tile_v: int = 1024,
                    last_activation=None, interpret: bool = False):
    """Forward pass equivalent to DiffusionNet.apply for the supported config,
    with each block as ONE Pallas kernel. Unbatched: x_in (V, C_in)."""
    p = params["params"]
    x = x_in @ p["first_lin"]["kernel"] + p["first_lin"]["bias"]

    for b in range(n_block):
        (t, A_re, A_im, W1, b1, W2, b2, W3, b3) = _block_params(params, b)
        t = t + jax.lax.stop_gradient(jnp.maximum(t, 1e-8) - t)
        coefs = jnp.exp(-evals[:, None] * t)
        x = megablock(x, evecs, gX_spec, gY_spec, mass, coefs, A_re, A_im,
                      W1, b1, W2, b2, W3, b3, tile_v, interpret)

    x = x @ p["last_lin"]["kernel"] + p["last_lin"]["bias"]
    if last_activation is not None:
        x = last_activation(x)
    return x


def megablock_apply_batched(params, x_in, mass, evals, evecs, gX_spec,
                            gY_spec, n_block: int, tile_v: int = 1024,
                            last_activation=None, interpret: bool = False):
    """Batched wrapper via lax.map over the batch (one kernel compile)."""
    def one(args):
        x, m, ev, evec, gx, gy = args
        return megablock_apply(params, x, m, ev, evec, gx, gy, n_block,
                               tile_v, last_activation, interpret)
    return jax.lax.map(one, (x_in, mass, evals, evecs, gX_spec, gY_spec))
