"""Model tests: shapes, padding invariance, gradient flow, diffusion methods."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionnet_tpu.geometry import (
    compute_operators, pad_operators, stack_operators,
)
from diffusionnet_tpu.models import DiffusionNet
from diffusionnet_tpu.ops.sparse import Ell


@pytest.fixture(scope="module")
def small_ops():
    from tests.meshgen import icosphere
    verts, faces = icosphere(subdivisions=2)  # 162 verts
    ops = compute_operators(verts, faces, k_eig=32)
    return verts.astype(np.float32), faces, ops


def _as_jnp_ops(ops):
    return jax.tree.map(jnp.asarray, ops)


def _call_kwargs(ops):
    return dict(L=ops.L, evals=ops.evals, evecs=ops.evecs,
                gradX=ops.gradX, gradY=ops.gradY)


def test_forward_shapes_vertices(small_ops):
    verts, faces, ops = small_ops
    ops = _as_jnp_ops(ops)
    model = DiffusionNet(c_in=3, c_out=10, c_width=32, n_block=2, dropout=False)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(verts), ops.mass,
                        **_call_kwargs(ops))
    out = model.apply(params, jnp.asarray(verts), ops.mass, **_call_kwargs(ops))
    assert out.shape == (verts.shape[0], 10)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_global_mean_and_faces(small_ops):
    verts, faces, ops = small_ops
    ops = _as_jnp_ops(ops)
    for outputs_at, extra, expect in [
        ("global_mean", {}, (10,)),
        ("faces", dict(faces=jnp.asarray(faces)), (faces.shape[0], 10)),
    ]:
        model = DiffusionNet(c_in=3, c_out=10, c_width=16, n_block=1,
                             dropout=False, outputs_at=outputs_at)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(verts), ops.mass,
                            **_call_kwargs(ops), **extra)
        out = model.apply(params, jnp.asarray(verts), ops.mass,
                          **_call_kwargs(ops), **extra)
        assert out.shape == expect


def test_forward_edges_output(small_ops):
    verts, faces, ops = small_ops
    ops = _as_jnp_ops(ops)
    edges = np.stack([faces[:, 0], faces[:, 1]], axis=1)  # (E,2)
    model = DiffusionNet(c_in=3, c_out=4, c_width=16, n_block=1, dropout=False,
                         outputs_at="edges")
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(verts), ops.mass,
                        **_call_kwargs(ops), edges=jnp.asarray(edges))
    out = model.apply(params, jnp.asarray(verts), ops.mass, **_call_kwargs(ops),
                      edges=jnp.asarray(edges))
    assert out.shape == (edges.shape[0], 4)


def test_batched_matches_unbatched(small_ops):
    verts, faces, ops = small_ops
    model = DiffusionNet(c_in=3, c_out=5, c_width=16, n_block=2, dropout=False)
    jops = _as_jnp_ops(ops)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(verts), jops.mass,
                        **_call_kwargs(jops))
    out1 = model.apply(params, jnp.asarray(verts), jops.mass,
                       **_call_kwargs(jops))
    batched = stack_operators([ops, ops])
    bops = _as_jnp_ops(batched)
    x = jnp.stack([jnp.asarray(verts)] * 2)
    out2 = model.apply(params, x, bops.mass, **_call_kwargs(bops))
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out1),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out2[1]),
                               rtol=1e-6)


def test_padding_invariance(small_ops):
    """Padding vertices (mass=0, zero operator rows) must not change valid
    outputs nor the global mean."""
    verts, faces, ops = small_ops
    V = verts.shape[0]
    model = DiffusionNet(c_in=3, c_out=5, c_width=16, n_block=2, dropout=False)
    jops = _as_jnp_ops(ops)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(verts), jops.mass,
                        **_call_kwargs(jops))
    out = np.asarray(model.apply(params, jnp.asarray(verts), jops.mass,
                                 **_call_kwargs(jops)))

    padded = pad_operators(ops, v_pad=V + 37)
    pops = _as_jnp_ops(padded)
    x_pad = jnp.concatenate([jnp.asarray(verts),
                             jnp.zeros((37, 3), jnp.float32)])
    out_pad = np.asarray(model.apply(params, x_pad, pops.mass,
                                     **_call_kwargs(pops)))
    np.testing.assert_allclose(out_pad[:V], out, rtol=2e-4, atol=1e-5)

    gmodel = DiffusionNet(c_in=3, c_out=5, c_width=16, n_block=2, dropout=False,
                          outputs_at="global_mean")
    gparams = gmodel.init(jax.random.PRNGKey(0), jnp.asarray(verts), jops.mass,
                          **_call_kwargs(jops))
    g1 = np.asarray(gmodel.apply(gparams, jnp.asarray(verts), jops.mass,
                                 **_call_kwargs(jops)))
    g2 = np.asarray(gmodel.apply(gparams, x_pad, pops.mass,
                                 **_call_kwargs(pops)))
    np.testing.assert_allclose(g2, g1, rtol=2e-4, atol=1e-5)


def test_dropout_changes_output_only_in_train(small_ops):
    verts, faces, ops = small_ops
    ops = _as_jnp_ops(ops)
    model = DiffusionNet(c_in=3, c_out=5, c_width=16, n_block=1, dropout=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(verts), ops.mass,
                        **_call_kwargs(ops))
    out_det1 = model.apply(params, jnp.asarray(verts), ops.mass,
                           **_call_kwargs(ops), deterministic=True)
    out_det2 = model.apply(params, jnp.asarray(verts), ops.mass,
                           **_call_kwargs(ops), deterministic=True)
    np.testing.assert_allclose(np.asarray(out_det1), np.asarray(out_det2))
    out_tr1 = model.apply(params, jnp.asarray(verts), ops.mass,
                          **_call_kwargs(ops), deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    out_tr2 = model.apply(params, jnp.asarray(verts), ops.mass,
                          **_call_kwargs(ops), deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out_tr1), np.asarray(out_tr2))


def test_gradients_flow(small_ops):
    verts, faces, ops = small_ops
    ops = _as_jnp_ops(ops)
    model = DiffusionNet(c_in=3, c_out=1, c_width=16, n_block=2, dropout=False)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(verts), ops.mass,
                        **_call_kwargs(ops))

    def loss(p):
        out = model.apply(p, jnp.asarray(verts), ops.mass, **_call_kwargs(ops))
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # diffusion times should receive gradient (straight-through projection)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dt_grads = [np.asarray(v) for k, v in flat
                if "diffusion_time" in jax.tree_util.keystr(k)]
    assert dt_grads and any(np.abs(g).max() > 0 for g in dt_grads)


def test_implicit_dense_close_to_spectral(small_ops):
    """With a full eigenbasis the spectral path equals exact implicit diffusion;
    with k=32 of 162 they should still be close for smooth inputs."""
    verts, faces, ops = small_ops
    jops = _as_jnp_ops(ops)
    m_spec = DiffusionNet(c_in=3, c_out=3, c_width=8, n_block=1, dropout=False,
                          with_gradient_features=False,
                          diffusion_method="spectral")
    m_dense = DiffusionNet(c_in=3, c_out=3, c_width=8, n_block=1, dropout=False,
                           with_gradient_features=False,
                           diffusion_method="implicit_dense")
    params = m_spec.init(jax.random.PRNGKey(0), jnp.asarray(verts), jops.mass,
                         **_call_kwargs(jops))
    o1 = np.asarray(m_spec.apply(params, jnp.asarray(verts), jops.mass,
                                 **_call_kwargs(jops)))
    o2 = np.asarray(m_dense.apply(params, jnp.asarray(verts), jops.mass,
                                  **_call_kwargs(jops)))
    assert o1.shape == o2.shape
    # diffusion times init at ~0 so both are near-identity: outputs close
    np.testing.assert_allclose(o1, o2, atol=0.05)


def test_no_gradient_features_mode(small_ops):
    verts, faces, ops = small_ops
    ops = _as_jnp_ops(ops)
    model = DiffusionNet(c_in=3, c_out=5, c_width=16, n_block=1, dropout=False,
                         with_gradient_features=False)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(verts), ops.mass,
                        L=ops.L, evals=ops.evals, evecs=ops.evecs)
    out = model.apply(params, jnp.asarray(verts), ops.mass, L=ops.L,
                      evals=ops.evals, evecs=ops.evecs)
    assert out.shape == (verts.shape[0], 5)


def test_invalid_options_raise():
    with pytest.raises(ValueError):
        DiffusionNet(c_in=3, c_out=2, outputs_at="bogus").init(
            jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.ones(4))
    with pytest.raises(ValueError):
        DiffusionNet(c_in=3, c_out=2, diffusion_method="bogus").init(
            jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.ones(4))


def test_remat_blocks_trains_with_dropout(small_ops):
    """remat_blocks=True must work in its intended use case — training with
    dropout on: flax remat counts `self` at index 0 and only covers
    POSITIONAL args, so `deterministic` has to be positional + static (a
    keyword there raises TracerBoolConversionError inside nn.Dropout)."""
    verts, faces, ops = small_ops
    ops = _as_jnp_ops(ops)
    model = DiffusionNet(c_in=3, c_out=2, c_width=8, n_block=2, dropout=True,
                         remat_blocks=True)
    x = jnp.asarray(verts)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, ops.mass,
                        **_call_kwargs(ops))

    def loss(p, rng):
        out = model.apply(p, x, ops.mass, deterministic=False,
                          rngs={"dropout": rng}, **_call_kwargs(ops))
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params, jax.random.PRNGKey(1))
    assert all(np.isfinite(np.asarray(t)).all() for t in jax.tree.leaves(g))

    # remat must not change the forward value
    out_remat = model.apply(params, x, ops.mass, **_call_kwargs(ops))
    plain = DiffusionNet(c_in=3, c_out=2, c_width=8, n_block=2, dropout=True,
                         remat_blocks=False)
    out_plain = plain.apply(params, x, ops.mass, **_call_kwargs(ops))
    np.testing.assert_allclose(np.asarray(out_remat), np.asarray(out_plain),
                               rtol=1e-6, atol=1e-6)
