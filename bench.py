"""Headline benchmark: fwd+bwd meshes/sec at ~20k vertices, k_eig=128, 4x128
DiffusionNet (the BASELINE.json primary metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline is relative to REF_BASELINE_MESHES_PER_SEC, an estimate of the PyTorch
reference's fwd+bwd throughput at this size on a modern datacenter GPU. The
reference publishes no numbers (SURVEY §6) — it only says it can "easily train on
meshes of 20k vertices" on a >4GB GPU; 40 meshes/s (25 ms/step) is a generous
estimate for the CUDA implementation at V=20k, k=128.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REF_BASELINE_MESHES_PER_SEC = 40.0
V_TARGET = 20164   # 142x142 grid
V_PAD = 20480
K_EIG = 128
C_WIDTH = 128
N_BLOCK = 4
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
# TPU-idiomatic training precision: bf16 activations/matmul operands with f32
# parameters and f32 MXU accumulation (set BENCH_DTYPE=f32 for full precision)
DTYPE = os.environ.get("BENCH_DTYPE", "f32")
# implementation: 'mega' = whole-block Pallas megakernel (full f32, fastest),
# 'xla' = the standard model apply
IMPL = os.environ.get("BENCH_IMPL", "mega")


def build_inputs():
    import jax
    import jax.numpy as jnp
    from tests.meshgen import flat_grid
    from diffusionnet_tpu.geometry import get_operators, pad_operators, stack_operators

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "bench_cache")
    verts, faces = flat_grid(n=142, jitter=0.4)
    ops = get_operators(verts, faces, k_eig=K_EIG, op_cache_dir=cache_dir)
    ops = stack_operators([ops] * BATCH, v_pad=V_PAD)
    x = np.zeros((BATCH, V_PAD, 3), np.float32)
    x[:, :verts.shape[0]] = verts.astype(np.float32)
    return jax.tree.map(jnp.asarray, ops), jnp.asarray(x)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from diffusionnet_tpu.models import DiffusionNet
    from diffusionnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    ops, x = build_inputs()

    # the megakernel path runs full f32 (its loss matches the f32 model)
    compute_dtype = (jnp.bfloat16 if (DTYPE == "bf16" and IMPL != "mega")
                     else None)
    model = DiffusionNet(c_in=3, c_out=8, c_width=C_WIDTH, n_block=N_BLOCK,
                         dropout=False, outputs_at="vertices",
                         compute_dtype=compute_dtype)
    from diffusionnet_tpu.geometry import grad_operators
    gX, gY = grad_operators(ops)
    params = model.init(jax.random.PRNGKey(0), x[:1],
                        ops.mass[:1],
                        L=jax.tree.map(lambda t: t[:1], ops.L),
                        evals=ops.evals[:1], evecs=ops.evecs[:1],
                        gradX=gX[:1], gradY=gY[:1])

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def loss_fn(params, x, ops):
        from diffusionnet_tpu.geometry import grad_operators
        gX, gY = grad_operators(ops)
        if IMPL == "mega":
            from diffusionnet_tpu.models.fast_path import megablock_apply_batched
            if DTYPE == "bf16":  # bf16 tiles, f32 MXU accumulation
                x = x.astype(jnp.bfloat16)
                gX, gY = gX.astype(jnp.bfloat16), gY.astype(jnp.bfloat16)
                evecs = ops.evecs.astype(jnp.bfloat16)
            else:
                evecs = ops.evecs
            out = megablock_apply_batched(
                params, x, ops.mass.astype(x.dtype), ops.evals, evecs, gX, gY,
                n_block=N_BLOCK, tile_v=2048)
        else:
            out = model.apply(params, x, ops.mass, L=ops.L, evals=ops.evals,
                              evecs=ops.evecs, gradX=gX, gradY=gY)
        out = out.astype(jnp.float32)  # loss in f32
        mask = (ops.mass > 0)[..., None]
        return jnp.sum((out * mask) ** 2) / jnp.sum(mask)

    @jax.jit
    def train_step(params, opt_state, x, ops):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, ops)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # warmup/compile (the float() fetch forces real execution; on this
    # platform block_until_ready does not reliably wait)
    params, opt_state, loss = train_step(params, opt_state, x, ops)
    float(loss)

    # slope timing: wall clock of N vs 3N chained steps, each ending in a
    # scalar fetch, cancels dispatch/fetch overhead
    def run(n):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        loss = None
        for _ in range(n):
            params, opt_state, loss = train_step(params, opt_state, x, ops)
        float(loss)
        return time.perf_counter() - t0

    run(3)  # discard residual warmup
    n1, n2 = 6, 18
    dts = []
    for _ in range(2):
        t1 = run(n1)
        t2 = run(n2)
        dts.append((t2 - t1) / (n2 - n1))
    dt = max(min(dts), 1e-9)

    meshes_per_sec = BATCH / dt
    print(json.dumps({
        "metric": f"fwd+bwd meshes/sec @ {V_TARGET} verts (pad {V_PAD}), "
                  f"k={K_EIG}, {N_BLOCK}x{C_WIDTH}, batch {BATCH}, "
                  + (("full f32" if DTYPE != "bf16" else
                      "bf16 tiles/f32 accum")
                     + ", whole-block Pallas megakernel" if IMPL == "mega"
                     else f"{DTYPE} mixed precision (f32 params/accum)"),
        "value": round(meshes_per_sec, 3),
        "unit": "meshes/sec",
        "vs_baseline": round(meshes_per_sec / REF_BASELINE_MESHES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
