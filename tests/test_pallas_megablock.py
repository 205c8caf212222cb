"""Whole-block Pallas megakernel vs plain XLA (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionnet_tpu.ops.pallas_megablock import (
    megablock, megablock_reference, interpret_dropout_mask)

SEED0 = jnp.zeros((), jnp.int32)


def _inputs(rs, B=2, V=512, K=16, C=8, hidden=(8, 8)):
    def r(*shape, scale=1.0):
        return jnp.asarray(rs.randn(*shape).astype(np.float32) * scale)
    x = r(B, V, C)
    evecs = r(B, V, K, scale=1 / np.sqrt(V))
    gX = r(B, V, K, scale=1 / np.sqrt(V))
    gY = r(B, V, K, scale=1 / np.sqrt(V))
    mass = jnp.asarray(rs.rand(B, V).astype(np.float32))
    coefs = jnp.asarray(rs.rand(B, K, C).astype(np.float32))
    A_re, A_im = r(C, C, scale=0.3), r(C, C, scale=0.3)
    widths = (3 * C,) + tuple(hidden) + (C,)
    Ws = tuple(r(widths[i], widths[i + 1], scale=0.3)
               for i in range(len(widths) - 1))
    bs = tuple(r(widths[i + 1], scale=0.1) for i in range(len(widths) - 1))
    return (x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs)


def test_megablock_forward_matches_xla(rng):
    args = _inputs(rng)
    out = megablock(*args, SEED0, 256, False, True)
    ref = megablock_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_megablock_general_mlp_dims(rng):
    """Arbitrary hidden widths and depth (VERDICT: general MLP dims)."""
    args = _inputs(rng, B=1, V=256, K=8, C=8, hidden=(16, 32, 8))
    out = megablock(*args, SEED0, 128, False, True)
    ref = megablock_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_megablock_vjp_matches_autodiff(rng):
    args = _inputs(rng, B=2, V=256, K=8, C=8)

    def loss_pal(*a):
        return jnp.sum(megablock(*a, SEED0, 128, False, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(megablock_reference(*a) ** 2)

    # differentiate wrt x, coefs and all params (skip operator args 1-4)
    argnums = (0, 5, 6, 7, 8, 9)
    g_pal = jax.grad(loss_pal, argnums=argnums)(*args)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    names = ["dx", "dcoefs", "dA_re", "dA_im", "dWs", "dbs"]
    for n, a, b in zip(names, g_pal, g_ref):
        jax.tree.map(lambda u, v: np.testing.assert_allclose(
            np.asarray(u), np.asarray(v), rtol=2e-4, atol=2e-4,
            err_msg=n), a, b)


def _tiled_masks(B, V, tile_v, widths, seed):
    """Reassemble the kernel's per-tile interpret-mode dropout masks into full
    (B, V, width) arrays, one per hidden layer."""
    masks = []
    for layer, w in enumerate(widths):
        rows = []
        for b in range(B):
            tiles = [interpret_dropout_mask((tile_v, w), 0.5, seed, b, i,
                                            layer)
                     for i in range(V // tile_v)]
            rows.append(jnp.concatenate(tiles, axis=0))
        masks.append(jnp.stack(rows))
    return masks


def test_megablock_dropout_matches_masked_reference(rng):
    """With dropout on, the kernel equals the XLA reference fed the exact same
    keep-masks — forward AND all gradients."""
    B, V, K, C, tile = 2, 256, 8, 8, 128
    args = _inputs(rng, B=B, V=V, K=K, C=C)
    seed = jnp.asarray(1234, jnp.int32)
    masks = _tiled_masks(B, V, tile, (C, C), seed)

    out = megablock(*args, seed, tile, True, True)
    ref = megablock_reference(*args, keep_masks=masks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # masks are real Bernoulli(0.5)-ish draws, not degenerate
    frac = float(jnp.mean(masks[0].astype(jnp.float32)))
    assert 0.4 < frac < 0.6

    def loss_pal(*a):
        return jnp.sum(megablock(*a, seed, tile, True, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(megablock_reference(*a, keep_masks=masks) ** 2)

    argnums = (0, 5, 6, 7, 8, 9)
    g_pal = jax.grad(loss_pal, argnums=argnums)(*args)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    jax.tree.map(lambda u, v: np.testing.assert_allclose(
        np.asarray(u), np.asarray(v), rtol=2e-4, atol=2e-4), g_pal, g_ref)


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
        params, x[None], jo.mass[None], jo.evals[None], jo.evecs[None],
        jnp.asarray(gX)[None], jnp.asarray(gY)[None], n_block=2, tile_v=128,
        interpret=True))[0]
    np.testing.assert_allclose(out_fast, out_model, rtol=2e-4, atol=2e-5)


def test_megablock_apply_custom_mlp_dims(rng):
    """fast_path handles non-default mlp_hidden_dims through the kernel."""
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

    model = DiffusionNet(c_in=3, c_out=5, c_width=8, n_block=2, dropout=False,
                         mlp_hidden_dims=(16, 8, 16))
    params = model.init(jax.random.PRNGKey(1), x, jo.mass, evals=jo.evals,
                        evecs=jo.evecs, gradX=jnp.asarray(gX),
                        gradY=jnp.asarray(gY))
    out_model = np.asarray(model.apply(params, x, jo.mass, evals=jo.evals,
                                       evecs=jo.evecs, gradX=jnp.asarray(gX),
                                       gradY=jnp.asarray(gY)))
    out_fast = np.asarray(megablock_apply(
        params, x[None], jo.mass[None], jo.evals[None], jo.evecs[None],
        jnp.asarray(gX)[None], jnp.asarray(gY)[None], n_block=2, tile_v=128,
        interpret=True))[0]
    np.testing.assert_allclose(out_fast, out_model, rtol=2e-4, atol=2e-5)


def test_megablock_apply_grads_match_model(rng):
    """Gradients THROUGH the chained fast path (x_hat threading between
    blocks) equal autodiff through the standard model."""
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

    model = DiffusionNet(c_in=3, c_out=5, c_width=8, n_block=3, dropout=False)
    params = model.init(jax.random.PRNGKey(1), x, jo.mass, evals=jo.evals,
                        evecs=jo.evecs, gradX=jnp.asarray(gX),
                        gradY=jnp.asarray(gY))

    def loss_model(p):
        out = model.apply(p, x, jo.mass, evals=jo.evals, evecs=jo.evecs,
                          gradX=jnp.asarray(gX), gradY=jnp.asarray(gY))
        return jnp.sum(out ** 2)

    def loss_fast(p):
        out = megablock_apply(p, x[None], jo.mass[None], jo.evals[None],
                              jo.evecs[None], jnp.asarray(gX)[None],
                              jnp.asarray(gY)[None], n_block=3, tile_v=128,
                              interpret=True)
        return jnp.sum(out ** 2)

    g_model = jax.grad(loss_model)(params)
    g_fast = jax.grad(loss_fast)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4), g_model,
        g_fast)


def test_megablock_apply_no_gradient_rotations(rng):
    """with_gradient_rotations=False runs through the kernel as A_im=0."""
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

    model = DiffusionNet(c_in=3, c_out=5, c_width=8, n_block=2, dropout=False,
                         with_gradient_rotations=False)
    params = model.init(jax.random.PRNGKey(1), x, jo.mass, evals=jo.evals,
                        evecs=jo.evecs, gradX=jnp.asarray(gX),
                        gradY=jnp.asarray(gY))
    out_model = np.asarray(model.apply(params, x, jo.mass, evals=jo.evals,
                                       evecs=jo.evecs, gradX=jnp.asarray(gX),
                                       gradY=jnp.asarray(gY)))
    out_fast = np.asarray(megablock_apply(
        params, x[None], jo.mass[None], jo.evals[None], jo.evecs[None],
        jnp.asarray(gX)[None], jnp.asarray(gY)[None], n_block=2, tile_v=128,
        interpret=True))[0]
    np.testing.assert_allclose(out_fast, out_model, rtol=2e-4, atol=2e-5)

    # gradients wrt A must match too (dA_im is discarded exactly)
    def loss_model(p):
        return jnp.sum(model.apply(p, x, jo.mass, evals=jo.evals,
                                   evecs=jo.evecs, gradX=jnp.asarray(gX),
                                   gradY=jnp.asarray(gY)) ** 2)

    def loss_fast(p):
        return jnp.sum(megablock_apply(
            p, x[None], jo.mass[None], jo.evals[None], jo.evecs[None],
            jnp.asarray(gX)[None], jnp.asarray(gY)[None], n_block=2,
            tile_v=128, interpret=True) ** 2)

    g_m = jax.grad(loss_model)(params)
    g_f = jax.grad(loss_fast)(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4), g_m, g_f)


def test_megablock_apply_dropout_key_bounds(rng):
    """The (batch, tile, layer) -> int32 PRNG key packing is only exact for
    batch <= 2048; beyond that megablock_apply must refuse loudly instead of
    silently correlating dropout masks across batch elements."""
    from diffusionnet_tpu.geometry import compute_operators, pad_operators, grad_operators
    from diffusionnet_tpu.models import DiffusionNet
    from diffusionnet_tpu.models.fast_path import megablock_apply
    from tests.meshgen import icosphere
    import pytest

    verts, faces = icosphere(subdivisions=2)
    ops = compute_operators(verts, faces, k_eig=8)
    ops = pad_operators(ops, v_pad=256)
    gX, gY = grad_operators(ops)
    jo = jax.tree.map(jnp.asarray, ops)
    x = jnp.asarray(np.pad(verts.astype(np.float32),
                           ((0, 256 - verts.shape[0]), (0, 0))))
    model = DiffusionNet(c_in=3, c_out=5, c_width=8, n_block=1, dropout=True)
    params = model.init(jax.random.PRNGKey(1), x, jo.mass, evals=jo.evals,
                        evecs=jo.evecs, gradX=jnp.asarray(gX),
                        gradY=jnp.asarray(gY))

    big = jnp.zeros((2049, 256, 3), jnp.float32)
    with pytest.raises(ValueError, match="2048"):
        megablock_apply(params, big, jo.mass[None], jo.evals[None],
                        jo.evecs[None], jnp.asarray(gX)[None],
                        jnp.asarray(gY)[None], n_block=1, tile_v=128,
                        dropout_rng=jax.random.PRNGKey(0), interpret=True)
    # in-bounds batch with dropout still works
    out = megablock_apply(params, x[None], jo.mass[None], jo.evals[None],
                          jo.evecs[None], jnp.asarray(gX)[None],
                          jnp.asarray(gY)[None], n_block=1, tile_v=128,
                          dropout_rng=jax.random.PRNGKey(0), interpret=True)
    assert np.isfinite(np.asarray(out)).all()
