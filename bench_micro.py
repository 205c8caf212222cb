"""Microbenchmarks of the forward's two hot paths on the real TPU:
  1. spectral diffusion (two (V,K)x(K,C) matmuls + exp)
  2. ELL gradient application (gather + einsum) in several formulations
Used to decide where Pallas kernels pay off. Not part of the test suite.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    B, V, K, C, D = 8, 20480, 128, 128, 8
    rs = np.random.RandomState(0)
    evecs = jnp.asarray(rs.randn(B, V, K).astype(np.float32))
    x = jnp.asarray(rs.randn(B, V, C).astype(np.float32))
    mass = jnp.asarray(rs.rand(B, V).astype(np.float32))
    evals = jnp.asarray(rs.rand(B, K).astype(np.float32))
    t = jnp.asarray(rs.rand(C).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, V, (B, V, D)).astype(np.int32))
    val = jnp.asarray(rs.randn(B, V, D).astype(np.float32))

    @jax.jit
    def diffusion(x, evecs, mass, evals, t):
        s = jnp.einsum("bvk,bvc->bkc", evecs, x * mass[..., None])
        s = s * jnp.exp(-evals[..., None] * t)
        return jnp.einsum("bvk,bkc->bvc", evecs, s)

    @jax.jit
    def diffusion_bf16(x, evecs, mass, evals, t):
        e16 = evecs.astype(jnp.bfloat16)
        s = jnp.einsum("bvk,bvc->bkc", e16,
                       (x * mass[..., None]).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        s = s * jnp.exp(-evals[..., None] * t)
        return jnp.einsum("bvk,bkc->bvc", e16, s.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @jax.jit
    def ell_einsum(val, idx, x):
        g = jnp.take_along_axis(x[:, :, None, :], idx[..., None], axis=1)
        return jnp.einsum("bvd,bvdc->bvc", val, g)

    @jax.jit
    def ell_loop(val, idx, x):
        y = jnp.zeros_like(x)
        for d in range(D):
            y = y + val[:, :, d, None] * jnp.take_along_axis(
                x, idx[:, :, d, None], axis=1)
        return y

    @jax.jit
    def ell_onehot_mm(val, idx, x):
        # segment-sum style: scatter-add formulation
        y = jnp.zeros_like(x)
        rows = jnp.broadcast_to(jnp.arange(V)[None, :, None], idx.shape)
        return y.at[jnp.arange(B)[:, None, None], rows, :].add(
            val[..., None] * jnp.take_along_axis(
                x[:, :, None, :], idx[..., None], axis=1))

    results = {}
    results["diffusion_f32"] = timeit(diffusion, x, evecs, mass, evals, t)
    results["diffusion_bf16"] = timeit(diffusion_bf16, x, evecs, mass, evals, t)
    results["ell_einsum"] = timeit(ell_einsum, val, idx, x)
    results["ell_loop"] = timeit(ell_loop, val, idx, x)

    for k, v in results.items():
        print(f"{k:>18}: {v * 1e3:8.3f} ms")

    # roofline context
    hbm_diff = B * (2 * V * K + 2 * V * C + K * C) * 4
    print(f"diffusion min HBM traffic ~{hbm_diff / 1e6:.0f} MB "
          f"-> {hbm_diff / 8.2e11 * 1e3:.3f} ms at 820GB/s")
    hbm_ell = B * (V * C * 2 + V * D * 8) * 4
    print(f"ELL ideal HBM traffic ~{hbm_ell / 1e6:.0f} MB "
          f"-> {hbm_ell / 8.2e11 * 1e3:.3f} ms at 820GB/s")


if __name__ == "__main__":
    main()
