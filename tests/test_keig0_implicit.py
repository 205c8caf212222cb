"""k_eig=0 + implicit_dense: the no-eigenbasis path (reference layers.py:260
documents implicit_dense as the way to skip spectral precompute entirely)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionnet_tpu.geometry import compute_operators, pad_operators
from diffusionnet_tpu.models import DiffusionNet


def test_keig0_operators_and_implicit_dense_forward():
    from tests.meshgen import icosphere
    verts, faces = icosphere(subdivisions=1)  # 42 verts (V^3 dense solve is ok)
    ops = compute_operators(verts, faces, k_eig=0)
    assert ops.evals.shape == (0,)
    assert ops.evecs.shape == (verts.shape[0], 0)
    assert ops.gradX_spec.shape == (verts.shape[0], 0)

    ops = pad_operators(ops, v_pad=64)
    jops = jax.tree.map(jnp.asarray, ops)
    x = jnp.asarray(np.pad(verts.astype(np.float32), ((0, 64 - 42), (0, 0))))

    model = DiffusionNet(c_in=3, c_out=4, c_width=8, n_block=2, dropout=False,
                         diffusion_method="implicit_dense")
    params = model.init(jax.random.PRNGKey(0), x, jops.mass, L=jops.L,
                        gradX=jops.gradX, gradY=jops.gradY)
    out = model.apply(params, x, jops.mass, L=jops.L,
                      gradX=jops.gradX, gradY=jops.gradY)
    assert out.shape == (64, 4)
    assert np.isfinite(np.asarray(out)[:42]).all()

    # gradient flow through the Cholesky solve
    def loss(p):
        o = model.apply(p, x, jops.mass, L=jops.L, gradX=jops.gradX,
                        gradY=jops.gradY)
        return jnp.mean(o[:42] ** 2)

    grads = jax.tree.leaves(jax.grad(loss)(params))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)


def test_implicit_dense_batched():
    """Batched implicit_dense (vmapped dense Cholesky over the Ell L)."""
    from tests.meshgen import icosphere, torus
    from diffusionnet_tpu.geometry import stack_operators

    v1, f1 = icosphere(subdivisions=1)
    v2, f2 = torus(n_major=8, n_minor=6)
    ops = stack_operators([compute_operators(v1, f1, k_eig=0),
                           compute_operators(v2, f2, k_eig=0)], v_pad=64)
    jops = jax.tree.map(jnp.asarray, ops)
    x = np.zeros((2, 64, 3), np.float32)
    x[0, :42] = v1
    x[1, :48] = v2

    model = DiffusionNet(c_in=3, c_out=2, c_width=8, n_block=1, dropout=False,
                         diffusion_method="implicit_dense")
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jops.mass,
                        L=jops.L, gradX=jops.gradX, gradY=jops.gradY)
    out = model.apply(params, jnp.asarray(x), jops.mass, L=jops.L,
                      gradX=jops.gradX, gradY=jops.gradY)
    assert out.shape == (2, 64, 2)
    assert np.isfinite(np.asarray(out)[0, :42]).all()
    assert np.isfinite(np.asarray(out)[1, :48]).all()
