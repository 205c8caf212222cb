"""Spectral transforms and heat kernel signatures — pure jnp, MXU-friendly.

Capability parity with reference geometry.py:572-633. These are the runtime hot
matmuls of DiffusionNet: to_basis/from_basis are (V,K)x(K,C)-class contractions that
XLA tiles directly onto the MXU. All functions broadcast over arbitrary leading
batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_basis(values, basis, massvec, compute_dtype=None):
    """Project into the mass-orthonormal basis: phi^T (M (.) x).

    values: (..., V, D); basis: (..., V, K); massvec: (..., V) -> (..., K, D).
    Reference geometry.py:572-583. Padding-safe: padded vertices carry mass 0 and
    contribute nothing.
    """
    weighted = values * massvec[..., None]
    if compute_dtype is None:
        return jnp.einsum("...vk,...vd->...kd", basis, weighted,
                          preferred_element_type=values.dtype)
    # operands in compute_dtype, f32 MXU accumulation, result stored in
    # compute_dtype (the cast fuses into the matmul epilogue)
    out = jnp.einsum("...vk,...vd->...kd", basis.astype(compute_dtype),
                     weighted.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(compute_dtype)


def from_basis(values, basis, compute_dtype=None):
    """Back-project out of the basis: phi x_hat.

    values: (..., K, D); basis: (..., V, K) -> (..., V, D).
    Complex support mirrors reference geometry.py:586-598. compute_dtype casts
    matmul operands (e.g. bfloat16 for the MXU); accumulation stays float32."""
    if jnp.iscomplexobj(values) or jnp.iscomplexobj(basis):
        basis = basis.astype(jnp.complex64) if not jnp.iscomplexobj(basis) else basis
        values = values.astype(jnp.complex64) if not jnp.iscomplexobj(values) else values
        return jnp.einsum("...vk,...kd->...vd", basis, values)
    if compute_dtype is None:
        return jnp.einsum("...vk,...kd->...vd", basis, values,
                          preferred_element_type=values.dtype)
    out = jnp.einsum("...vk,...kd->...vd", basis.astype(compute_dtype),
                     values.astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(compute_dtype)


def compute_hks(evals, evecs, scales):
    """Heat kernel signature at S time scales.

    evals: (..., K); evecs: (..., V, K); scales: (..., S) -> (..., V, S).
    Implemented as one (V,K)x(K,S) matmul (the reference notes "TODO could be a
    matmul", geometry.py:619); exact same math as geometry.py:600-628.
    """
    # coefs[s,k] = exp(-eval_k * scale_s)
    power_coefs = jnp.exp(-evals[..., None, :] * scales[..., :, None])  # (..., S, K)
    sq = evecs * evecs                                                  # (..., V, K)
    return jnp.einsum("...vk,...sk->...vs", sq, power_coefs,
                      preferred_element_type=evecs.dtype)


def compute_hks_autoscale(evals, evecs, count: int = 16):
    """HKS at `count` log-spaced times in [1e-2, 1] (reference geometry.py:630-633)."""
    scales = jnp.logspace(-2.0, 0.0, num=count, dtype=evals.dtype)
    if evals.ndim > 1:  # broadcast scales over batch dims
        scales = jnp.broadcast_to(scales, evals.shape[:-1] + (count,))
    return compute_hks(evals, evecs, scales)
