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
    out   = MLP(cat) + x        (Dense, [Dropout?]-ReLU-Dense ..., arbitrary
                                 hidden widths; dropout BEFORE every Dense
                                 except the first, reference layers.py:137-164)

tile-by-tile in VMEM, writing ONLY the block output to HBM. The batch is a
leading grid dimension (vmapping a pallas_call or lax.map costs ~20x more
compile/launch overhead on this toolchain). The backward is a second Pallas
kernel that recomputes the forward per tile (VMEM-local rematerialization) and
accumulates parameter gradients in VMEM scratch across batch and tiles.

Dropout masks come from the on-core TPU PRNG (pltpu.prng_seed keyed on
(seed, batch, tile, layer) so the backward recompute regenerates identical
masks with zero HBM traffic). In interpret mode (CPU tests) the PRNG
primitives are unavailable; a deterministic splitmix-style hash over the same
key produces the masks instead (exposed as `interpret_dropout_mask` so XLA
test references can reproduce them bit-exactly).

Supported configuration: spectral diffusion + dense spectral gradient
operators, with_gradient_rotations=True, any mlp_hidden_dims, dropout on or
off. Other configurations fall back to the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_V = 1024
DROPOUT_RATE = 0.5  # the reference's fixed MiniMLP rate (layers.py:150)
# experiment override for the bf16-operand MXU mode: "auto" follows the
# operator stream dtype; "0"/"1" force it off/on
import os as _os
_LOWP_OVERRIDE = _os.environ.get("MEGA_LOWP", "auto")


def _lowp_for(evecs):
    if _LOWP_OVERRIDE == "0":
        return False
    if _LOWP_OVERRIDE == "1":
        return True
    return evecs.dtype == jnp.bfloat16
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
# batch grid dim is embarrassingly parallel in the chained FORWARD kernel
# (each b has its own x_hat chain; scratch acc is re-zeroed at i==0), letting
# Mosaic overlap DMA across the b boundary; the tile dim accumulates -> keep
# it "arbitrary". The bwd kernel emits PER-BATCH parameter-grad partials
# (summed by XLA outside — a few hundred KB of extra HBM writes vs ~1 GB of
# operand traffic), so its batch dim is parallel too.
_VMEM_LIMIT_FWD = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024,
    dimension_semantics=("parallel", "arbitrary"))


def _hash_bits(shape, *seeds):
    """Deterministic splitmix/xorshift hash over a counter grid — the
    interpret-mode stand-in for the TPU hardware PRNG."""
    idx = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
           * jnp.uint32(shape[-1])
           + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
    h = idx
    for s in seeds:
        s32 = jnp.asarray(s).astype(jnp.uint32)
        h = h ^ (s32 + jnp.uint32(0x9E3779B9) + (h << 6) + (h >> 2))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _keep_mask(shape, rate, interpret, seed, b, i, layer):
    """Bernoulli(1-rate) keep mask, identical between fwd and bwd kernels
    (both reseed with the same key before drawing). Mosaic's prng_seed takes
    at most 2 values, so (batch, tile, layer) fold into one int32: batch <
    2^11, tile index < 2^16, layer < 2^4."""
    key = (jnp.asarray(b, jnp.int32) * 65536 + jnp.asarray(i, jnp.int32)) * 16 \
        + jnp.asarray(layer, jnp.int32)
    if interpret:
        bits = _hash_bits(shape, seed, key)
    else:
        pltpu.prng_seed(seed, key)
        bits = pltpu.prng_random_bits(shape)
        bits = pltpu.bitcast(bits, jnp.uint32)
    threshold = np.uint32(round(rate * float(2**32)))
    return bits >= threshold


def interpret_dropout_mask(shape, rate, seed, b, i, layer):
    """The exact keep-mask the kernel uses in interpret mode, for XLA test
    references. shape is the per-tile (tile_v, width) shape."""
    return _keep_mask(shape, rate, True, seed, b, i, layer)


def _dot(a, b, lowp):
    """MXU matmul with f32 accumulation; with lowp the operands are cast to
    bf16 so the MXU runs at its bf16 rate (mixed-precision standard)."""
    if lowp:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b, lowp):
    """a^T @ b with f32 accumulation (contraction over axis 0)."""
    if lowp:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mlp_fwd(x, cat, dense_refs, drop, lowp):
    """Shared MLP forward (kernel-side). Returns (out, saved) where saved has
    the per-layer inputs and pre-activations for the backward."""
    n = len(dense_refs)
    h = cat
    inputs, pres, masks = [], [], []
    for l, (w_ref, b_ref) in enumerate(dense_refs):
        if l > 0 and drop is not None:
            keep = drop(l - 1, h.shape)
            h = jnp.where(keep, h * (1.0 / (1.0 - DROPOUT_RATE)), 0.0)
            masks.append(keep)
        inputs.append(h)
        pre = _dot(h, w_ref[:], lowp) + b_ref[:]
        pres.append(pre)
        h = jnp.maximum(pre, 0.0) if l < n - 1 else pre
    return x + h, (inputs, pres, masks)


def _make_fwd_kernel(n_dense: int, dropout: bool, lowp: bool,
                     interpret: bool):
    def kernel(*refs):
        (x_ref, evecs_ref, gx_ref, gy_ref, mass_ref, coefs_ref, are_ref,
         aim_ref) = refs[:8]
        dense_refs = [(refs[8 + 2 * l], refs[9 + 2 * l])
                      for l in range(n_dense)]
        pos = 8 + 2 * n_dense
        seed_ref = refs[pos] if dropout else None
        pos += 1 if dropout else 0
        out_ref, xhat_ref, acc_ref = refs[pos], refs[pos + 1], refs[pos + 2]

        b = pl.program_id(0)
        phase = pl.program_id(1)
        i = pl.program_id(2)
        n = pl.num_programs(2)

        @pl.when((phase == 0) & (i == 0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(phase == 0)
        def _():
            xm = x_ref[0].astype(jnp.float32) * mass_ref[0]
            acc_ref[:] += _dot_t(evecs_ref[0], xm, lowp)
            # x_hat = Phi^T(m x) is complete after the last phase-0 tile:
            # emit it so the VJP residual costs no extra pass over x/evecs
            @pl.when(i == n - 1)
            def _():
                xhat_ref[0] = acc_ref[:]

        @pl.when(phase == 1)
        def _():
            @pl.when(i == 0)
            def _():
                acc_ref[:] = coefs_ref[0] * acc_ref[:]
            s = acc_ref[:]
            x = x_ref[0].astype(jnp.float32)
            xd = _dot(evecs_ref[0], s, lowp)
            gx = _dot(gx_ref[0], s, lowp)
            gy = _dot(gy_ref[0], s, lowp)

            vb_re = _dot(gx, are_ref[:], lowp) - _dot(gy, aim_ref[:], lowp)
            vb_im = _dot(gy, are_ref[:], lowp) + _dot(gx, aim_ref[:], lowp)
            feat = jnp.tanh(gx * vb_re + gy * vb_im)
            cat = jnp.concatenate([x, xd, feat], axis=-1)

            drop = None
            if dropout:
                def drop(layer, shape):
                    return _keep_mask(shape, DROPOUT_RATE, interpret,
                                      seed_ref[0], b, i, layer)
            out, _ = _mlp_fwd(x, cat, dense_refs, drop, lowp)
            out_ref[0] = out.astype(out_ref.dtype)

    return kernel


def _fwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed,
              tile_v: int, dropout: bool, interpret: bool = False):
    B, V, C = x.shape
    K = evecs.shape[-1]
    n_dense = len(Ws)
    if V % tile_v:
        raise ValueError(f"V={V} must be a multiple of "
                         f"tile_v={tile_v} (pad to a bucket)")
    n_tiles = V // tile_v
    grid = (B, 2, n_tiles)

    p0 = lambda b, p, i: (b, i * (1 - p), 0)
    p1 = lambda b, p, i: (b, i * p, 0)
    both = lambda b, p, i: (b, i, 0)
    bconst = lambda b, p, i: (b, 0, 0)
    const2 = lambda b, p, i: (0, 0)

    in_specs = [
        pl.BlockSpec((1, tile_v, C), both),    # x (both phases)
        pl.BlockSpec((1, tile_v, K), both),    # evecs
        pl.BlockSpec((1, tile_v, K), p1),      # gX
        pl.BlockSpec((1, tile_v, K), p1),      # gY
        pl.BlockSpec((1, tile_v, 1), p0),      # mass
        pl.BlockSpec((1, K, C), bconst),       # coefs (per-batch evals)
        pl.BlockSpec((C, C), const2),          # A_re
        pl.BlockSpec((C, C), const2),          # A_im
    ]
    args = [x, evecs, gX, gY, mass[..., None], coefs, A_re, A_im]
    for W, b_arr in zip(Ws, bs):
        in_specs += [pl.BlockSpec(W.shape, const2),
                     pl.BlockSpec((1, b_arr.shape[0]), const2)]
        args += [W, b_arr[None, :]]
    if dropout:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(seed, jnp.int32).reshape((1,)))

    lowp = _lowp_for(evecs)
    out, x_hat = pl.pallas_call(
        _make_fwd_kernel(n_dense, dropout, lowp, interpret),
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((1, tile_v, C), p1),
                   pl.BlockSpec((1, K, C), bconst)),
        out_shape=(jax.ShapeDtypeStruct((B, V, C), x.dtype),
                   jax.ShapeDtypeStruct((B, K, C), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((K, C), jnp.float32)],
        compiler_params=_VMEM_LIMIT,
        interpret=interpret,
    )(*args)
    return out, x_hat


def _make_fwd_kernel_chained(n_dense: int, dropout: bool, emit_next: bool,
                             lowp: bool, interpret: bool):
    """Single-pass block kernel: x_hat arrives as an input (from the previous
    block's fused accumulation or an initial projection), so the phase-0 sweep
    over x/evecs disappears; while writing each output tile the kernel
    accumulates the NEXT block's x_hat = Phi^T(m out) in scratch."""
    def kernel(*refs):
        (x_ref, evecs_ref, gx_ref, gy_ref, mass_ref, coefs_ref, are_ref,
         aim_ref) = refs[:8]
        dense_refs = [(refs[8 + 2 * l], refs[9 + 2 * l])
                      for l in range(n_dense)]
        pos = 8 + 2 * n_dense
        seed_ref = refs[pos] if dropout else None
        pos += 1 if dropout else 0
        xhat_in_ref = refs[pos]
        pos += 1
        if emit_next:
            out_ref, xhatn_ref, acc2_ref = refs[pos], refs[pos + 1], refs[pos + 2]
        else:
            out_ref = refs[pos]

        b = pl.program_id(0)
        i = pl.program_id(1)
        n = pl.num_programs(1)

        s = coefs_ref[0] * xhat_in_ref[0]
        # x may be stored bf16 between blocks (halves its HBM stream); MXU
        # accumulation stays float32 (operands bf16 when lowp)
        x = x_ref[0].astype(jnp.float32)
        xd = _dot(evecs_ref[0], s, lowp)
        gx = _dot(gx_ref[0], s, lowp)
        gy = _dot(gy_ref[0], s, lowp)

        vb_re = _dot(gx, are_ref[:], lowp) - _dot(gy, aim_ref[:], lowp)
        vb_im = _dot(gy, are_ref[:], lowp) + _dot(gx, aim_ref[:], lowp)
        feat = jnp.tanh(gx * vb_re + gy * vb_im)
        cat = jnp.concatenate([x, xd, feat], axis=-1)

        drop = None
        if dropout:
            def drop(layer, shape):
                return _keep_mask(shape, DROPOUT_RATE, interpret,
                                  seed_ref[0], b, i, layer)
        out, _ = _mlp_fwd(x, cat, dense_refs, drop, lowp)
        out_ref[0] = out.astype(out_ref.dtype)

        if emit_next:
            @pl.when(i == 0)
            def _():
                acc2_ref[:] = jnp.zeros_like(acc2_ref)
            acc2_ref[:] += _dot_t(evecs_ref[0], out * mass_ref[0], lowp)

            @pl.when(i == n - 1)
            def _():
                xhatn_ref[0] = acc2_ref[:]

    return kernel


def _fwd_impl_chained(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs,
                      seed, x_hat_in, tile_v: int, dropout: bool,
                      emit_next: bool, interpret: bool = False):
    B, V, C = x.shape
    K = evecs.shape[-1]
    n_dense = len(Ws)
    if V % tile_v:
        raise ValueError(f"V={V} must be a multiple of "
                         f"tile_v={tile_v} (pad to a bucket)")
    grid = (B, V // tile_v)

    row = lambda b, i: (b, i, 0)
    bconst = lambda b, i: (b, 0, 0)
    const2 = lambda b, i: (0, 0)

    in_specs = [
        pl.BlockSpec((1, tile_v, C), row),     # x
        pl.BlockSpec((1, tile_v, K), row),     # evecs
        pl.BlockSpec((1, tile_v, K), row),     # gX
        pl.BlockSpec((1, tile_v, K), row),     # gY
        pl.BlockSpec((1, tile_v, 1), row),     # mass
        pl.BlockSpec((1, K, C), bconst),       # coefs
        pl.BlockSpec((C, C), const2),          # A_re
        pl.BlockSpec((C, C), const2),          # A_im
    ]
    args = [x, evecs, gX, gY, mass[..., None], coefs, A_re, A_im]
    for W, b_arr in zip(Ws, bs):
        in_specs += [pl.BlockSpec(W.shape, const2),
                     pl.BlockSpec((1, b_arr.shape[0]), const2)]
        args += [W, b_arr[None, :]]
    if dropout:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(seed, jnp.int32).reshape((1,)))
    in_specs.append(pl.BlockSpec((1, K, C), bconst))  # x_hat_in
    args.append(x_hat_in)

    if emit_next:
        out_specs = (pl.BlockSpec((1, tile_v, C), row),
                     pl.BlockSpec((1, K, C), bconst))
        out_shape = (jax.ShapeDtypeStruct((B, V, C), x.dtype),
                     jax.ShapeDtypeStruct((B, K, C), jnp.float32))
        scratch = [pltpu.VMEM((K, C), jnp.float32)]
    else:
        out_specs = pl.BlockSpec((1, tile_v, C), row)
        out_shape = jax.ShapeDtypeStruct((B, V, C), x.dtype)
        scratch = []

    lowp = _lowp_for(evecs)
    res = pl.pallas_call(
        _make_fwd_kernel_chained(n_dense, dropout, emit_next, lowp, interpret),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_VMEM_LIMIT_FWD,
        interpret=interpret,
    )(*args)
    return res if emit_next else (res, None)


def _make_bwd_kernel(n_dense: int, dropout: bool, emit_next: bool,
                     lowp: bool, interpret: bool):
    def kernel(*refs):
        (x_ref, evecs_ref, gx_ref, gy_ref, coefs_ref, are_ref,
         aim_ref) = refs[:7]
        dense_refs = [(refs[7 + 2 * l], refs[8 + 2 * l])
                      for l in range(n_dense)]
        pos = 7 + 2 * n_dense
        seed_ref = refs[pos] if dropout else None
        pos += 1 if dropout else 0
        xhat_ref, dout_ref = refs[pos], refs[pos + 1]
        pos += 2
        if emit_next:
            mass_ref, dxhatn_ref = refs[pos], refs[pos + 1]
            pos += 2
        # outputs: dx, ds, dare, daim, then (dW_l, db_l) per layer
        dx_ref, ds_out_ref, dare_ref, daim_ref = refs[pos:pos + 4]
        ddense_refs = [(refs[pos + 4 + 2 * l], refs[pos + 5 + 2 * l])
                       for l in range(n_dense)]
        pos += 4 + 2 * n_dense
        # scratch: ds_acc, dare_acc, daim_acc, then (dW,db) accs per layer
        ds_acc, dare_acc, daim_acc = refs[pos:pos + 3]
        dd_accs = [(refs[pos + 3 + 2 * l], refs[pos + 4 + 2 * l])
                   for l in range(n_dense)]

        b = pl.program_id(0)
        i = pl.program_id(1)
        n = pl.num_programs(1)

        # all accumulators are per-BATCH-element (flushed at i == n-1 into
        # per-b output blocks, summed over b outside): no cross-b carries,
        # so the batch grid dim is parallel and Mosaic can overlap DMA
        # across the b boundary
        @pl.when(i == 0)
        def _():
            ds_acc[:] = jnp.zeros_like(ds_acc)
            dare_acc[:] = jnp.zeros_like(dare_acc)
            daim_acc[:] = jnp.zeros_like(daim_acc)
            for dw_acc, db_acc in dd_accs:
                dw_acc[:] = jnp.zeros_like(dw_acc)
                db_acc[:] = jnp.zeros_like(db_acc)

        # ---- recompute forward for this tile (s = coefs . x_hat known)
        s = coefs_ref[0] * xhat_ref[0]
        x = x_ref[0].astype(jnp.float32)
        xd = _dot(evecs_ref[0], s, lowp)
        gx = _dot(gx_ref[0], s, lowp)
        gy = _dot(gy_ref[0], s, lowp)
        vb_re = _dot(gx, are_ref[:], lowp) - _dot(gy, aim_ref[:], lowp)
        vb_im = _dot(gy, are_ref[:], lowp) + _dot(gx, aim_ref[:], lowp)
        dots = gx * vb_re + gy * vb_im
        feat = jnp.tanh(dots)
        cat = jnp.concatenate([x, xd, feat], axis=-1)

        drop = None
        if dropout:
            def drop(layer, shape):
                return _keep_mask(shape, DROPOUT_RATE, interpret,
                                  seed_ref[0], b, i, layer)
        _, (inputs, pres, masks) = _mlp_fwd(x, cat, dense_refs, drop, lowp)

        # ---- backward through the MLP
        g = dout_ref[0].astype(jnp.float32)
        if emit_next:
            # this block's output also fed the NEXT block's x_hat =
            # Phi^T(m out); fold that cotangent into the output gradient
            g = g + mass_ref[0] * _dot(evecs_ref[0], dxhatn_ref[0], lowp)
        scale = 1.0 / (1.0 - DROPOUT_RATE)
        d = g
        for l in range(n_dense - 1, -1, -1):
            w_ref, _ = dense_refs[l]
            dw_acc, db_acc = dd_accs[l]
            dpre = d if l == n_dense - 1 else jnp.where(pres[l] > 0.0, d, 0.0)
            dw_acc[:] += _dot_t(inputs[l], dpre, lowp)
            db_acc[:] += jnp.sum(dpre, axis=0, keepdims=True)
            d = _dot(dpre, w_ref[:].T, lowp)
            if l > 0 and dropout:
                d = jnp.where(masks[l - 1], d * scale, 0.0)
        dcat = d

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
        dare_acc[:] += _dot_t(gx, dvb_re, lowp) + _dot_t(gy, dvb_im, lowp)
        daim_acc[:] += _dot_t(gx, dvb_im, lowp) - _dot_t(gy, dvb_re, lowp)
        dgx = dgx + _dot(dvb_re, are_ref[:].T, lowp)
        dgx = dgx + _dot(dvb_im, aim_ref[:].T, lowp)
        dgy = dgy + _dot(dvb_im, are_ref[:].T, lowp)
        dgy = dgy - _dot(dvb_re, aim_ref[:].T, lowp)

        # ds accumulation: Phi_t^T dxd + GX_t^T dgx + GY_t^T dgy
        ds_acc[:] += (_dot_t(evecs_ref[0], dxd, lowp)
                      + _dot_t(gx_ref[0], dgx, lowp)
                      + _dot_t(gy_ref[0], dgy, lowp))

        dx_ref[0] = dx_direct.astype(dx_ref.dtype)

        # everything flushes at this batch element's last tile: ds is
        # per-b by definition; parameter grads land as per-b PARTIALS
        @pl.when(i == n - 1)
        def _():
            ds_out_ref[0] = ds_acc[:]
            dare_ref[0] = dare_acc[:]
            daim_ref[0] = daim_acc[:]
            for (dw_ref, db_ref), (dw_acc, db_acc) in zip(ddense_refs, dd_accs):
                dw_ref[0] = dw_acc[:]
                db_ref[0] = db_acc[:]

    return kernel


def _bwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed, x_hat,
              dout, tile_v: int, dropout: bool, interpret: bool = False,
              dxhat_next=None):
    B, V, C = x.shape
    K = evecs.shape[-1]
    n_dense = len(Ws)
    if V % tile_v:
        raise ValueError(f"V={V} must be a multiple of "
                         f"tile_v={tile_v} (pad to a bucket)")
    n_tiles = V // tile_v
    grid = (B, n_tiles)

    row = lambda b, i: (b, i, 0)
    bconst = lambda b, i: (b, 0, 0)
    const2 = lambda b, i: (0, 0)

    in_specs = [
        pl.BlockSpec((1, tile_v, C), row),     # x
        pl.BlockSpec((1, tile_v, K), row),     # evecs
        pl.BlockSpec((1, tile_v, K), row),     # gX
        pl.BlockSpec((1, tile_v, K), row),     # gY
        pl.BlockSpec((1, K, C), bconst),       # coefs
        pl.BlockSpec((C, C), const2),          # A_re
        pl.BlockSpec((C, C), const2),          # A_im
    ]
    args = [x, evecs, gX, gY, coefs, A_re, A_im]
    for W, b_arr in zip(Ws, bs):
        in_specs += [pl.BlockSpec(W.shape, const2),
                     pl.BlockSpec((1, b_arr.shape[0]), const2)]
        args += [W, b_arr[None, :]]
    if dropout:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(jnp.asarray(seed, jnp.int32).reshape((1,)))
    in_specs += [
        pl.BlockSpec((1, K, C), bconst),       # x_hat
        pl.BlockSpec((1, tile_v, C), row),     # dout
    ]
    args += [x_hat, dout]
    emit_next = dxhat_next is not None
    if emit_next:
        in_specs += [
            pl.BlockSpec((1, tile_v, 1), row),  # mass
            pl.BlockSpec((1, K, C), bconst),    # dxhat_next cotangent
        ]
        args += [mass[..., None], dxhat_next]

    # parameter grads come out as per-BATCH partials (leading B axis, bconst
    # blocks) so the batch grid dim stays parallel; the sum over b below is
    # a few hundred KB of XLA reduction, noise next to the operand traffic
    out_shapes = [
        jax.ShapeDtypeStruct((B, V, C), x.dtype),           # dx_direct
        jax.ShapeDtypeStruct((B, K, C), jnp.float32),       # ds
        jax.ShapeDtypeStruct((B, C, C), jnp.float32),       # dA_re partials
        jax.ShapeDtypeStruct((B, C, C), jnp.float32),       # dA_im partials
    ]
    out_specs = [
        pl.BlockSpec((1, tile_v, C), row),
        pl.BlockSpec((1, K, C), bconst),
        pl.BlockSpec((1, C, C), bconst),
        pl.BlockSpec((1, C, C), bconst),
    ]
    scratch = [
        pltpu.VMEM((K, C), jnp.float32),
        pltpu.VMEM((C, C), jnp.float32),
        pltpu.VMEM((C, C), jnp.float32),
    ]
    for W, b_arr in zip(Ws, bs):
        out_shapes += [jax.ShapeDtypeStruct((B,) + W.shape, jnp.float32),
                       jax.ShapeDtypeStruct((B, 1, b_arr.shape[0]),
                                            jnp.float32)]
        out_specs += [pl.BlockSpec((1,) + W.shape, bconst),
                      pl.BlockSpec((1, 1, b_arr.shape[0]), bconst)]
        scratch += [pltpu.VMEM(W.shape, jnp.float32),
                    pltpu.VMEM((1, b_arr.shape[0]), jnp.float32)]

    lowp = _lowp_for(evecs)
    outs = pl.pallas_call(
        _make_bwd_kernel(n_dense, dropout, emit_next, lowp, interpret),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=_VMEM_LIMIT_FWD,
        interpret=interpret,
    )(*args)
    # reduce the per-b parameter-grad partials; dx/ds keep their batch axis
    return tuple(outs[:2]) + tuple(o.sum(axis=0) for o in outs[2:])


@partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def megablock(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed,
              tile_v: int = DEFAULT_TILE_V, dropout: bool = False,
              interpret: bool = False):
    """One whole DiffusionNetBlock for a BATCH of surfaces (module docstring).

    x (B,V,C); evecs/gX/gY (B,V,K); mass (B,V); coefs (B,K,C); Ws/bs tuples of
    MLP weights ((w_in, w_out) kernels and (w_out,) biases, any depth/widths,
    first input 3C, last output C); seed: int32 scalar keying the dropout PRNG
    (ignored when dropout=False). All float32; V % tile_v == 0."""
    out, _ = _fwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs,
                       seed, tile_v, dropout, interpret)
    return out


def _mb_fwd(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed,
            tile_v, dropout, interpret):
    # x_hat comes out of the forward kernel's scratch — no extra pass
    out, x_hat = _fwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs,
                           seed, tile_v, dropout, interpret)
    return out, (x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed,
                 x_hat)


def _mb_bwd(tile_v, dropout, interpret, res, dout):
    (x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed, x_hat) = res
    outs = _bwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed,
                     x_hat, dout, tile_v, dropout, interpret)
    dx_direct, ds, dA_re, dA_im = outs[:4]
    dWs, dbs = [], []
    for l in range(len(Ws)):
        dWs.append(outs[4 + 2 * l])
        dbs.append(outs[5 + 2 * l][0])
    # the spectral chain: s = coefs . x_hat; x_hat = Phi^T (m x)
    dcoefs = ds * x_hat
    dxhat = ds * coefs
    dx = (dx_direct + mass[..., None] * jnp.einsum(
        "bvk,bkc->bvc", evecs, dxhat, preferred_element_type=jnp.float32)
          ).astype(x.dtype)  # cotangent dtype must match the primal (bf16 x)
    zeros = jax.tree.map(jnp.zeros_like, (evecs, gX, gY, mass))
    dseed = np.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return (dx, *zeros, dcoefs, dA_re, dA_im, tuple(dWs), tuple(dbs), dseed)


megablock.defvjp(_mb_fwd, _mb_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def megablock_chained(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs,
                      seed, x_hat_in, tile_v: int = DEFAULT_TILE_V,
                      dropout: bool = False, emit_next: bool = True,
                      interpret: bool = False):
    """Chained DiffusionNetBlock: takes this block's x_hat = Phi^T(m x) as an
    INPUT (from the previous block's fused accumulation, or one initial
    projection for block 0) and — when emit_next — accumulates the next
    block's x_hat while writing the output. Each middle block is then a
    single pass over V instead of two.

    Returns (out, x_hat_next) with x_hat_next None when emit_next=False."""
    return _fwd_impl_chained(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws,
                             bs, seed, x_hat_in, tile_v, dropout, emit_next,
                             interpret)


def _mbc_fwd(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed,
             x_hat_in, tile_v, dropout, emit_next, interpret):
    out, xhat_next = _fwd_impl_chained(
        x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed, x_hat_in,
        tile_v, dropout, emit_next, interpret)
    return (out, xhat_next), (x, evecs, gX, gY, mass, coefs, A_re, A_im,
                              Ws, bs, seed, x_hat_in)


def _mbc_bwd(tile_v, dropout, emit_next, interpret, res, cts):
    dout, dxhat_next = cts
    (x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed,
     x_hat_in) = res
    outs = _bwd_impl(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs, seed,
                     x_hat_in, dout, tile_v, dropout, interpret,
                     dxhat_next=dxhat_next if emit_next else None)
    dx_direct, ds, dA_re, dA_im = outs[:4]
    dWs, dbs = [], []
    for l in range(len(Ws)):
        dWs.append(outs[4 + 2 * l])
        dbs.append(outs[5 + 2 * l][0])
    dcoefs = ds * x_hat_in
    dxhat_in = ds * coefs   # s = coefs . x_hat_in
    zeros = jax.tree.map(jnp.zeros_like, (evecs, gX, gY, mass))
    dseed = np.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return (dx_direct, *zeros, dcoefs, dA_re, dA_im, tuple(dWs), tuple(dbs),
            dseed, dxhat_in)


megablock_chained.defvjp(_mbc_fwd, _mbc_bwd)


def megablock_reference(x, evecs, gX, gY, mass, coefs, A_re, A_im, Ws, bs,
                        keep_masks=None):
    """Plain-XLA reference of the same batched block (for tests).
    keep_masks: optional per-hidden-layer boolean masks (B, V, width) matching
    the kernel's dropout draws (see interpret_dropout_mask)."""
    x_hat = jnp.einsum("bvk,bvc->bkc", evecs, x * mass[..., None])
    s = coefs * x_hat
    xd = evecs @ s
    gx = gX @ s
    gy = gY @ s
    vb_re = gx @ A_re - gy @ A_im
    vb_im = gy @ A_re + gx @ A_im
    feat = jnp.tanh(gx * vb_re + gy * vb_im)
    h = jnp.concatenate([x, xd, feat], axis=-1)
    n = len(Ws)
    for l, (W, b) in enumerate(zip(Ws, bs)):
        if l > 0 and keep_masks is not None:
            h = jnp.where(keep_masks[l - 1],
                          h * (1.0 / (1.0 - DROPOUT_RATE)), 0.0)
        h = h @ W + b
        if l < n - 1:
            h = jax.nn.relu(h)
    return h + x
