"""Megakernel fast path: run a standard DiffusionNet with whole-block Pallas
kernels, consuming the SAME Flax parameter pytree as models.DiffusionNet.

Supported configuration: spectral diffusion with dense spectral gradient
operators, with_gradient_features=True, with_gradient_rotations=True, any
mlp_hidden_dims, dropout on (rate 0.5, the reference's fixed MiniMLP rate) or
off. Use for forward/training at large V where per-block activation traffic
dominates (see ops/pallas_megablock.py). The batch rides a leading Pallas grid
dimension — one kernel launch per block for the whole batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.pallas_megablock import megablock, megablock_chained


def _block_params(params, b: int):
    p = params["params"][f"block_{b}"]
    t = p["diffusion"]["diffusion_time"]
    gf = p["gradient_features"]
    mlp = p["mlp"]
    n_dense = len(mlp)
    Ws = tuple(mlp[f"dense_{l:03d}"]["kernel"] for l in range(n_dense))
    bs = tuple(mlp[f"dense_{l:03d}"]["bias"] for l in range(n_dense))
    if "A" in gf:  # with_gradient_rotations=False: vb_re = gx A, vb_im = gy A
        A = gf["A"]["kernel"]
        return t, A, jnp.zeros_like(A), Ws, bs
    return t, gf["A_re"]["kernel"], gf["A_im"]["kernel"], Ws, bs


def megablock_apply(params, x_in, mass, evals, evecs, gX_spec, gY_spec,
                    n_block: int, tile_v: int = 1024,
                    last_activation=None, dropout_rng=None,
                    interpret: bool = False, xhat_reduce=None):
    """Forward pass equivalent to DiffusionNet.apply for the supported config,
    with each block as ONE batched Pallas kernel.

    x_in (B, V, C_in); evecs/gX_spec/gY_spec (B, V, K); mass (B, V);
    evals (B, K). dropout_rng: optional PRNG key — when given, MiniMLP dropout
    (rate 0.5) is active, with per-block on-core PRNG masks.

    xhat_reduce: optional callable applied to each block's x_hat = Phi^T(m x).
    Under shard_map with the V axis sharded, the kernels compute PARTIAL
    x_hat over the local vertex shard; pass
    `lambda h: jax.lax.psum(h, "vert")` and the whole fast path becomes
    vertex-sharded — x_hat (K, C) is the ONLY cross-shard quantity."""
    if dropout_rng is not None:
        # the kernels fold (batch, tile, layer) into ONE int32 PRNG key
        # (pallas_megablock._keep_mask: (b * 65536 + i) * 16 + layer); the
        # packing is exact only inside these static bounds — outside them
        # keys collide and dropout masks silently correlate across batch
        # elements, so refuse loudly at trace time instead
        B, V = x_in.shape[0], x_in.shape[-2]
        n_tiles = -(-V // tile_v)
        n_mlp = len(_block_params(params, 0)[3])
        problems = []
        if B > 2048:
            problems.append(f"batch {B} > 2048")
        if n_tiles > 65536:
            problems.append(f"V/tile_v = {n_tiles} tiles > 65536")
        if n_mlp - 1 > 16:
            problems.append(f"{n_mlp - 1} dropout layers > 16")
        if problems:
            raise ValueError(
                "megakernel dropout PRNG key packing out of range ("
                + "; ".join(problems) + "); use the XLA path for this config")
    p = params["params"]
    x = x_in @ p["first_lin"]["kernel"] + p["first_lin"]["bias"]
    # inter-block activations inherit the input precision: with bf16 inputs
    # the x stream between blocks is stored bf16 (kernels compute in f32)
    x = x.astype(x_in.dtype)

    # block 0's spectral projection is one XLA pass; every block thereafter
    # receives its x_hat from the previous block's fused accumulation, so each
    # block is a single Pallas sweep over V (see megablock_chained)
    x_hat = jnp.einsum("bvk,bvc->bkc", evecs, x * mass[..., None],
                       preferred_element_type=jnp.float32)
    if xhat_reduce is not None:
        x_hat = xhat_reduce(x_hat)
    for b in range(n_block):
        t, A_re, A_im, Ws, bs = _block_params(params, b)
        t = t + jax.lax.stop_gradient(jnp.maximum(t, 1e-8) - t)
        coefs = jnp.exp(-evals[..., None] * t)  # (B, K, C)
        if dropout_rng is not None:
            seed = jax.random.randint(jax.random.fold_in(dropout_rng, b), (),
                                      0, 2**31 - 1, dtype=jnp.int32)
        else:
            seed = jnp.zeros((), jnp.int32)
        x, x_hat = megablock_chained(
            x, evecs, gX_spec, gY_spec, mass, coefs, A_re, A_im, Ws, bs,
            seed, x_hat, tile_v, dropout_rng is not None,
            b < n_block - 1, interpret)
        if x_hat is not None and xhat_reduce is not None:
            x_hat = xhat_reduce(x_hat)

    x = x @ p["last_lin"]["kernel"] + p["last_lin"]["bias"]
    if last_activation is not None:
        x = last_activation(x)
    return x


# backward-compatible alias: the kernel is natively batched now
megablock_apply_batched = megablock_apply
