"""Fused Pallas spectral-block kernel vs the XLA reference math (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionnet_tpu.ops.pallas_fused import (
    fused_spectral_block, fused_spectral_block_batched,
)


def _inputs(rs, V=1024, K=32, C=16):
    x = jnp.asarray(rs.randn(V, C).astype(np.float32))
    evecs = jnp.asarray(rs.randn(V, K).astype(np.float32) / np.sqrt(V))
    gX = jnp.asarray(rs.randn(V, K).astype(np.float32) / np.sqrt(V))
    gY = jnp.asarray(rs.randn(V, K).astype(np.float32) / np.sqrt(V))
    mass = jnp.asarray(rs.rand(V).astype(np.float32))
    coefs = jnp.asarray(rs.rand(K, C).astype(np.float32))
    return x, evecs, gX, gY, mass, coefs


def _reference(x, evecs, gX, gY, mass, coefs):
    xh = jnp.einsum("vk,vc->kc", evecs, x * mass[:, None])
    s = coefs * xh
    return evecs @ s, gX @ s, gY @ s


def test_fused_forward_matches_xla(rng):
    args = _inputs(rng)
    outs = fused_spectral_block(*args, 256, True)
    refs = _reference(*args)
    for a, b in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_vjp_matches_autodiff(rng):
    x, evecs, gX, gY, mass, coefs = _inputs(rng, V=512, K=16, C=8)

    def ref_loss(x, coefs):
        y, a, b = _reference(x, evecs, gX, gY, mass, coefs)
        return jnp.sum(y ** 2) + jnp.sum(a ** 2) + 2 * jnp.sum(b ** 2)

    def pal_loss(x, coefs):
        y, a, b = fused_spectral_block(x, evecs, gX, gY, mass, coefs, 256, True)
        return jnp.sum(y ** 2) + jnp.sum(a ** 2) + 2 * jnp.sum(b ** 2)

    g_ref = jax.grad(ref_loss, argnums=(0, 1))(x, coefs)
    g_pal = jax.grad(pal_loss, argnums=(0, 1))(x, coefs)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_batched(rng):
    singles = [_inputs(rng, V=512, K=16, C=8) for _ in range(3)]
    batched = [jnp.stack(parts) for parts in zip(*singles)]
    outs = fused_spectral_block_batched(*batched, 256, True)
    for b in range(3):
        refs = _reference(*singles[b])
        for o, r in zip(outs, refs):
            np.testing.assert_allclose(np.asarray(o[b]), np.asarray(r),
                                       rtol=1e-4, atol=1e-5)
