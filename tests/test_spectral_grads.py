"""The dense spectral-gradient fast path must match the ELL path exactly
(it is an algebraic reassociation of the same computation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionnet_tpu.geometry import compute_operators, grad_operators
from diffusionnet_tpu.models import DiffusionNet
from diffusionnet_tpu.ops.sparse import ell_matvec


@pytest.fixture(scope="module")
def ops162():
    from tests.meshgen import icosphere
    verts, faces = icosphere(subdivisions=2)
    return verts.astype(np.float32), compute_operators(verts, faces, k_eig=32)


def test_spectral_gradient_operator_definition(ops162):
    """GX == gradX @ evecs elementwise."""
    _, ops = ops162
    jellX = jax.tree.map(jnp.asarray, ops.gradX)
    direct = np.asarray(ell_matvec(jellX, jnp.asarray(ops.evecs)))
    np.testing.assert_allclose(ops.gradX_spec, direct, rtol=1e-4, atol=1e-5)


def test_model_paths_agree(ops162):
    verts, ops = ops162
    jops = jax.tree.map(jnp.asarray, ops)
    model = DiffusionNet(c_in=3, c_out=5, c_width=16, n_block=2, dropout=False)
    kw_ell = dict(L=jops.L, evals=jops.evals, evecs=jops.evecs,
                  gradX=jops.gradX, gradY=jops.gradY)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(verts), jops.mass,
                        **kw_ell)
    out_ell = np.asarray(model.apply(params, jnp.asarray(verts), jops.mass,
                                     **kw_ell))
    gX, gY = grad_operators(ops)
    kw_spec = dict(L=jops.L, evals=jops.evals, evecs=jops.evecs,
                   gradX=jnp.asarray(gX), gradY=jnp.asarray(gY))
    out_spec = np.asarray(model.apply(params, jnp.asarray(verts), jops.mass,
                                      **kw_spec))
    np.testing.assert_allclose(out_spec, out_ell, rtol=1e-4, atol=2e-5)


def test_gradients_flow_spectral_path(ops162):
    verts, ops = ops162
    jops = jax.tree.map(jnp.asarray, ops)
    gX, gY = grad_operators(ops)
    model = DiffusionNet(c_in=3, c_out=1, c_width=16, n_block=1, dropout=False)
    kw = dict(L=jops.L, evals=jops.evals, evecs=jops.evecs,
              gradX=jnp.asarray(gX), gradY=jnp.asarray(gY))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(verts), jops.mass,
                        **kw)

    def loss(p):
        return jnp.mean(model.apply(p, jnp.asarray(verts), jops.mass, **kw) ** 2)

    grads = jax.tree.leaves(jax.grad(loss)(params))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in grads)


def test_spectral_path_requires_spectral_diffusion(ops162):
    verts, ops = ops162
    jops = jax.tree.map(jnp.asarray, ops)
    gX, gY = grad_operators(ops)
    model = DiffusionNet(c_in=3, c_out=2, c_width=8, n_block=1, dropout=False,
                         diffusion_method="implicit_dense")
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), jnp.asarray(verts), jops.mass,
                   L=jops.L, evals=jops.evals, evecs=jops.evecs,
                   gradX=jnp.asarray(gX), gradY=jnp.asarray(gY))
