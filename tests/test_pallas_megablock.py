"""Whole-block Pallas megakernel vs plain XLA (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionnet_tpu.ops.pallas_megablock import megablock, megablock_reference


def _inputs(rs, V=512, K=16, C=8):
    def r(*shape, scale=1.0):
        return jnp.asarray(rs.randn(*shape).astype(np.float32) * scale)
    x = r(V, C)
    evecs = r(V, K, scale=1 / np.sqrt(V))
    gX = r(V, K, scale=1 / np.sqrt(V))
    gY = r(V, K, scale=1 / np.sqrt(V))
    mass = jnp.asarray(rs.rand(V).astype(np.float32))
    coefs = jnp.asarray(rs.rand(K, C).astype(np.float32))
    A_re, A_im = r(C, C, scale=0.3), r(C, C, scale=0.3)
    W1, b1 = r(3 * C, C, scale=0.3), r(C, scale=0.1)
    W2, b2 = r(C, C, scale=0.3), r(C, scale=0.1)
    W3, b3 = r(C, C, scale=0.3), r(C, scale=0.1)
    return (x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2, b2, W3, b3)


def test_megablock_forward_matches_xla(rng):
    args = _inputs(rng)
    out = megablock(*args, 256, True)
    ref = megablock_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_megablock_vjp_matches_autodiff(rng):
    args = _inputs(rng, V=256, K=8, C=8)

    def loss_pal(*a):
        return jnp.sum(megablock(*a, 128, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(megablock_reference(*a) ** 2)

    # differentiate wrt x, coefs and all params (skip operator args 1-4)
    argnums = (0, 5, 6, 7, 8, 9, 10, 11, 12, 13)
    g_pal = jax.grad(loss_pal, argnums=argnums)(*args)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    names = ["dx", "dcoefs", "dA_re", "dA_im", "dW1", "db1", "dW2", "db2",
             "dW3", "db3"]
    for n, a, b in zip(names, g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_megablock_apply_matches_model(rng):
    """The fast-path apply on the standard param pytree equals
    models.DiffusionNet.apply for the supported configuration."""
    from diffusionnet_tpu.geometry import compute_operators, pad_operators, grad_operators
    from diffusionnet_tpu.models import DiffusionNet
    from diffusionnet_tpu.models.fast_path import megablock_apply
    from tests.meshgen import icosphere

    verts, faces = icosphere(subdivisions=2)
    ops = compute_operators(verts, faces, k_eig=16)
    ops = pad_operators(ops, v_pad=256)
    gX, gY = grad_operators(ops)
    jo = jax.tree.map(jnp.asarray, ops)
    x = jnp.asarray(np.pad(verts.astype(np.float32),
                           ((0, 256 - verts.shape[0]), (0, 0))))

    model = DiffusionNet(c_in=3, c_out=5, c_width=8, n_block=2, dropout=False)
    params = model.init(jax.random.PRNGKey(1), x, jo.mass, evals=jo.evals,
                        evecs=jo.evecs, gradX=jnp.asarray(gX),
                        gradY=jnp.asarray(gY))
    out_model = np.asarray(model.apply(params, x, jo.mass, evals=jo.evals,
                                       evecs=jo.evecs, gradX=jnp.asarray(gX),
                                       gradY=jnp.asarray(gY)))
    out_fast = np.asarray(megablock_apply(
        params, x, jo.mass, jo.evals, jo.evecs, jnp.asarray(gX),
        jnp.asarray(gY), n_block=2, tile_v=128, interpret=True))
    np.testing.assert_allclose(out_fast, out_model, rtol=2e-4, atol=2e-5)
