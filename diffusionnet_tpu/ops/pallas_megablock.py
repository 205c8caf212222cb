"""Whole-DiffusionNet-block Pallas megakernel.

The train step is activation-bandwidth-bound (XLA cost analysis: ~23 GB/step at
bench shapes in bf16, dominated by per-block intermediates written to HBM:
x_diffuse, tangent gradients, gradient features, the 3C-wide concat, MLP
hiddens). This kernel computes an ENTIRE DiffusionNetBlock

    x_hat = Phi^T (m . x)
    s     = coefs . x_hat
    xd    = Phi s;   gx = GX s;   gy = GY s
    vb_re = gx A_re - gy A_im;  vb_im = gy A_re + gx A_im
    feat  = tanh(gx . vb_re + gy . vb_im)
    cat   = [x, xd, feat]
    out   = MLP(cat) + x            (Dense-ReLU-Dense-ReLU-Dense, 3C->C->C->C)

tile-by-tile in VMEM, writing ONLY the block output to HBM. The backward is a
second Pallas kernel that recomputes the forward per tile (VMEM-local
rematerialization) and accumulates parameter gradients in VMEM scratch.

Supported configuration (the reference default): spectral diffusion + spectral
gradient operators, with_gradient_rotations=True, mlp_hidden_dims=(C, C),
dropout off / deterministic. The general model falls back to the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_V = 1024
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_kernel(x_ref, evecs_ref, gx_ref, gy_ref, mass_ref, coefs_ref,
                are_ref, aim_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                b3_ref, out_ref, acc_ref):
    phase = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((phase == 0) & (i == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        xm = x_ref[:] * mass_ref[:]
        acc_ref[:] += jax.lax.dot_general(
            evecs_ref[:], xm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(phase == 1)
    def _():
        @pl.when(i == 0)
        def _():
            acc_ref[:] = coefs_ref[:] * acc_ref[:]
        s = acc_ref[:]
        x = x_ref[:]
        xd = jnp.dot(evecs_ref[:], s, preferred_element_type=jnp.float32)
        gx = jnp.dot(gx_ref[:], s, preferred_element_type=jnp.float32)
        gy = jnp.dot(gy_ref[:], s, preferred_element_type=jnp.float32)

        vb_re = (jnp.dot(gx, are_ref[:], preferred_element_type=jnp.float32)
                 - jnp.dot(gy, aim_ref[:], preferred_element_type=jnp.float32))
        vb_im = (jnp.dot(gy, are_ref[:], preferred_element_type=jnp.float32)
                 + jnp.dot(gx, aim_ref[:], preferred_element_type=jnp.float32))
        feat = jnp.tanh(gx * vb_re + gy * vb_im)

        cat = jnp.concatenate([x, xd, feat], axis=-1)
        h1 = jnp.maximum(
            jnp.dot(cat, w1_ref[:], preferred_element_type=jnp.float32)
            + b1_ref[:], 0.0)
        h2 = jnp.maximum(
            jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32)
            + b2_ref[:], 0.0)
        out = (jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
               + b3_ref[:] + x)
        out_ref[:] = out


def _fwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2, b2, W3,
              b3, tile_v: int, interpret: bool = False):
    V, C = x.shape
    K = evecs.shape[1]
    n_tiles = V // tile_v
    grid = (2, n_tiles)

    p0 = lambda p, i: (i * (1 - p), 0)
    p1 = lambda p, i: (i * p, 0)
    both = lambda p, i: (i, 0)
    const2 = lambda p, i: (0, 0)
    const1 = lambda p, i: (0,)

    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_v, C), both),    # x (both phases)
            pl.BlockSpec((tile_v, K), both),    # evecs
            pl.BlockSpec((tile_v, K), p1),      # gX
            pl.BlockSpec((tile_v, K), p1),      # gY
            pl.BlockSpec((tile_v, 1), p0),      # mass
            pl.BlockSpec((K, C), const2),       # coefs
            pl.BlockSpec((C, C), const2),       # A_re
            pl.BlockSpec((C, C), const2),       # A_im
            pl.BlockSpec((3 * C, C), const2),   # W1
            pl.BlockSpec((1, C), const2),       # b1
            pl.BlockSpec((C, C), const2),       # W2
            pl.BlockSpec((1, C), const2),       # b2
            pl.BlockSpec((C, C), const2),       # W3
            pl.BlockSpec((1, C), const2),       # b3
        ],
        out_specs=pl.BlockSpec((tile_v, C), p1),
        out_shape=jax.ShapeDtypeStruct((V, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((K, C), jnp.float32)],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(x, evecs, gX, gY, mass[:, None], coefs, A_re, A_im, W1, b1[None, :],
      W2, b2[None, :], W3, b3[None, :])
    return out


def _bwd_kernel(x_ref, evecs_ref, gx_ref, gy_ref, mass_ref, coefs_ref,
                are_ref, aim_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                b3_ref, xhat_ref, dout_ref,
                dx_ref, ds_out_ref, dare_ref, daim_ref, dw1_ref, db1_ref,
                dw2_ref, db2_ref, dw3_ref, db3_ref,
                ds_acc, dare_acc, daim_acc, dw1_acc, db1_acc, dw2_acc,
                db2_acc, dw3_acc, db3_acc):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        ds_acc[:] = jnp.zeros_like(ds_acc)
        dare_acc[:] = jnp.zeros_like(dare_acc)
        daim_acc[:] = jnp.zeros_like(daim_acc)
        dw1_acc[:] = jnp.zeros_like(dw1_acc)
        db1_acc[:] = jnp.zeros_like(db1_acc)
        dw2_acc[:] = jnp.zeros_like(dw2_acc)
        db2_acc[:] = jnp.zeros_like(db2_acc)
        dw3_acc[:] = jnp.zeros_like(dw3_acc)
        db3_acc[:] = jnp.zeros_like(db3_acc)

    # ---- recompute forward for this tile (s = coefs . x_hat precomputed)
    s = coefs_ref[:] * xhat_ref[:]
    x = x_ref[:]
    xd = jnp.dot(evecs_ref[:], s, preferred_element_type=jnp.float32)
    gx = jnp.dot(gx_ref[:], s, preferred_element_type=jnp.float32)
    gy = jnp.dot(gy_ref[:], s, preferred_element_type=jnp.float32)
    vb_re = (jnp.dot(gx, are_ref[:], preferred_element_type=jnp.float32)
             - jnp.dot(gy, aim_ref[:], preferred_element_type=jnp.float32))
    vb_im = (jnp.dot(gy, are_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(gx, aim_ref[:], preferred_element_type=jnp.float32))
    dots = gx * vb_re + gy * vb_im
    feat = jnp.tanh(dots)
    cat = jnp.concatenate([x, xd, feat], axis=-1)
    pre1 = jnp.dot(cat, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h1 = jnp.maximum(pre1, 0.0)
    pre2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    h2 = jnp.maximum(pre2, 0.0)

    # ---- backward
    g = dout_ref[:]
    # out = h2 W3 + b3 + x
    dw3_acc[:] += jax.lax.dot_general(h2, g, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db3_acc[:] += jnp.sum(g, axis=0, keepdims=True)
    dh2 = jnp.dot(g, w3_ref[:].T, preferred_element_type=jnp.float32)
    dpre2 = jnp.where(pre2 > 0.0, dh2, 0.0)
    dw2_acc[:] += jax.lax.dot_general(h1, dpre2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db2_acc[:] += jnp.sum(dpre2, axis=0, keepdims=True)
    dh1 = jnp.dot(dpre2, w2_ref[:].T, preferred_element_type=jnp.float32)
    dpre1 = jnp.where(pre1 > 0.0, dh1, 0.0)
    dw1_acc[:] += jax.lax.dot_general(cat, dpre1, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db1_acc[:] += jnp.sum(dpre1, axis=0, keepdims=True)
    dcat = jnp.dot(dpre1, w1_ref[:].T, preferred_element_type=jnp.float32)

    C = x.shape[-1]
    dx_direct = dcat[:, :C] + g          # residual + concat part 1
    dxd = dcat[:, C:2 * C]
    dfeat = dcat[:, 2 * C:]

    ddots = dfeat * (1.0 - feat * feat)
    dgx = ddots * vb_re
    dgy = ddots * vb_im
    dvb_re = ddots * gx
    dvb_im = ddots * gy
    # vb_re = gx A_re - gy A_im ; vb_im = gy A_re + gx A_im
    dare_acc[:] += (jax.lax.dot_general(gx, dvb_re, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(gy, dvb_im, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32))
    daim_acc[:] += (jax.lax.dot_general(gx, dvb_im, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    - jax.lax.dot_general(gy, dvb_re, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32))
    dgx = dgx + jnp.dot(dvb_re, are_ref[:].T,
                        preferred_element_type=jnp.float32)
    dgx = dgx + jnp.dot(dvb_im, aim_ref[:].T,
                        preferred_element_type=jnp.float32)
    dgy = dgy + jnp.dot(dvb_im, are_ref[:].T,
                        preferred_element_type=jnp.float32)
    dgy = dgy - jnp.dot(dvb_re, aim_ref[:].T,
                        preferred_element_type=jnp.float32)

    # ds accumulation: Phi_t^T dxd + GX_t^T dgx + GY_t^T dgy
    ds_acc[:] += (jax.lax.dot_general(evecs_ref[:], dxd,
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(gx_ref[:], dgx,
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(gy_ref[:], dgy,
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32))

    dx_ref[:] = dx_direct

    # flush accumulators once, at the last tile
    @pl.when(i == n - 1)
    def _():
        ds_out_ref[:] = ds_acc[:]
        dare_ref[:] = dare_acc[:]
        daim_ref[:] = daim_acc[:]
        dw1_ref[:] = dw1_acc[:]
        db1_ref[:] = db1_acc[:]
        dw2_ref[:] = dw2_acc[:]
        db2_ref[:] = db2_acc[:]
        dw3_ref[:] = dw3_acc[:]
        db3_ref[:] = db3_acc[:]


def _bwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2, b2, W3,
              b3, x_hat, dout, tile_v: int, interpret: bool = False):
    V, C = x.shape
    K = evecs.shape[1]
    n_tiles = V // tile_v
    grid = (n_tiles,)

    row = lambda i: (i, 0)
    const2 = lambda i: (0, 0)

    out_shapes = (
        jax.ShapeDtypeStruct((V, C), jnp.float32),       # dx_direct
        jax.ShapeDtypeStruct((K, C), jnp.float32),       # ds
        jax.ShapeDtypeStruct((C, C), jnp.float32),       # dA_re
        jax.ShapeDtypeStruct((C, C), jnp.float32),       # dA_im
        jax.ShapeDtypeStruct((3 * C, C), jnp.float32),   # dW1
        jax.ShapeDtypeStruct((1, C), jnp.float32),       # db1
        jax.ShapeDtypeStruct((C, C), jnp.float32),       # dW2
        jax.ShapeDtypeStruct((1, C), jnp.float32),       # db2
        jax.ShapeDtypeStruct((C, C), jnp.float32),       # dW3
        jax.ShapeDtypeStruct((1, C), jnp.float32),       # db3
    )
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_v, C), row),     # x
            pl.BlockSpec((tile_v, K), row),     # evecs
            pl.BlockSpec((tile_v, K), row),     # gX
            pl.BlockSpec((tile_v, K), row),     # gY
            pl.BlockSpec((tile_v, 1), row),     # mass (unused in bwd kernel)
            pl.BlockSpec((K, C), const2),       # coefs
            pl.BlockSpec((C, C), const2),       # A_re
            pl.BlockSpec((C, C), const2),       # A_im
            pl.BlockSpec((3 * C, C), const2),   # W1
            pl.BlockSpec((1, C), const2),       # b1
            pl.BlockSpec((C, C), const2),       # W2
            pl.BlockSpec((1, C), const2),       # b2
            pl.BlockSpec((C, C), const2),       # W3
            pl.BlockSpec((1, C), const2),       # b3
            pl.BlockSpec((K, C), const2),       # x_hat
            pl.BlockSpec((tile_v, C), row),     # dout
        ],
        out_specs=(
            pl.BlockSpec((tile_v, C), row),
            pl.BlockSpec((K, C), const2),
            pl.BlockSpec((C, C), const2),
            pl.BlockSpec((C, C), const2),
            pl.BlockSpec((3 * C, C), const2),
            pl.BlockSpec((1, C), const2),
            pl.BlockSpec((C, C), const2),
            pl.BlockSpec((1, C), const2),
            pl.BlockSpec((C, C), const2),
            pl.BlockSpec((1, C), const2),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((K, C), jnp.float32),
            pltpu.VMEM((C, C), jnp.float32),
            pltpu.VMEM((C, C), jnp.float32),
            pltpu.VMEM((3 * C, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.VMEM((C, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
            pltpu.VMEM((C, C), jnp.float32),
            pltpu.VMEM((1, C), jnp.float32),
        ],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(x, evecs, gX, gY, mass[:, None], coefs, A_re, A_im, W1, b1[None, :],
      W2, b2[None, :], W3, b3[None, :], x_hat, dout)
    return outs


@partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def megablock(x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2, b2, W3,
              b3, tile_v: int = DEFAULT_TILE_V, interpret: bool = False):
    """One whole DiffusionNetBlock for ONE surface (see module docstring).
    All params float32; x (V,C) with V % tile_v == 0."""
    return _fwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2,
                     b2, W3, b3, tile_v, interpret)


def _mb_fwd(x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2, b2, W3, b3,
            tile_v, interpret):
    out = _fwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2, b2,
                    W3, b3, tile_v, interpret)
    x_hat = jnp.einsum("vk,vc->kc", evecs, x * mass[:, None],
                       preferred_element_type=jnp.float32)
    return out, (x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2, b2,
                 W3, b3, x_hat)


def _mb_bwd(tile_v, interpret, res, dout):
    (x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2, b2, W3, b3,
     x_hat) = res
    (dx_direct, ds, dA_re, dA_im, dW1, db1, dW2, db2, dW3, db3) = _bwd_impl(
        x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1, W2, b2, W3, b3,
        x_hat, dout, tile_v, interpret)
    # the spectral chain: s = coefs . x_hat; x_hat = Phi^T (m x)
    dcoefs = ds * x_hat
    dxhat = ds * coefs
    dx = dx_direct + mass[:, None] * jnp.einsum(
        "vk,kc->vc", evecs, dxhat, preferred_element_type=jnp.float32)
    zeros = jax.tree.map(jnp.zeros_like, (evecs, gX, gY, mass))
    return (dx, *zeros, dcoefs, dA_re, dA_im, dW1, db1[0], dW2, db2[0],
            dW3, db3[0])


megablock.defvjp(_mb_fwd, _mb_bwd)


def megablock_reference(x, evecs, gX, gY, mass, coefs, A_re, A_im, W1, b1,
                        W2, b2, W3, b3):
    """Plain-XLA reference of the same block (for tests)."""
    x_hat = jnp.einsum("vk,vc->kc", evecs, x * mass[:, None])
    s = coefs * x_hat
    xd = evecs @ s
    gx = gX @ s
    gy = gY @ s
    vb_re = gx @ A_re - gy @ A_im
    vb_im = gy @ A_re + gx @ A_im
    feat = jnp.tanh(gx * vb_re + gy * vb_im)
    cat = jnp.concatenate([x, xd, feat], axis=-1)
    h1 = jax.nn.relu(cat @ W1 + b1)
    h2 = jax.nn.relu(h1 @ W2 + b2)
    return h2 @ W3 + b3 + x
