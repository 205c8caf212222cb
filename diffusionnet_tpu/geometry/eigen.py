"""Generalized eigensolvers for L phi = lambda M phi (M diagonal lumped mass).

Two paths:
  * `eigensolve_host` — scipy ARPACK shift-invert, byte-for-byte semantics of the
    reference's ladder (geometry.py:336-361): shift sigma=eps, retry up to 4 times
    adding eps*10^failcount * I, clip small negative eigenvalues to 0.
  * `eigensolve_device` — TPU-resident LOBPCG. Because M is diagonal, the
    generalized problem reduces to a *standard* symmetric problem on
    C = M^{-1/2} L M^{-1/2}; the k smallest eigenpairs of C are the k largest of
    (mu I - C) for any mu >= lambda_max(C) (Gershgorin bound), which is exactly
    what jax.experimental.sparse.linalg.lobpcg_standard computes. The operator is
    applied matrix-free through the ELL kernel, so the whole solve is jittable,
    static-shape, and runs on the MXU.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse
import scipy.sparse.linalg as sla

import jax
import jax.numpy as jnp

from ..ops.sparse import Ell, ell_matvec


def eigensolve_host(L: scipy.sparse.spmatrix, massvec: np.ndarray, k_eig: int,
                    eps: float = 1e-8):
    """Reference-parity host path (ARPACK shift-invert with the retry ladder)."""
    if k_eig == 0:
        return np.zeros((0,)), np.zeros((L.shape[0], 0))

    L_eigsh = (L + scipy.sparse.identity(L.shape[0]) * eps).tocsc()
    Mmat = scipy.sparse.diags(np.asarray(massvec, dtype=np.float64))

    failcount = 0
    while True:
        try:
            evals, evecs = sla.eigsh(L_eigsh, k=k_eig, M=Mmat, sigma=eps)
            evals = np.clip(evals, a_min=0.0, a_max=float("inf"))
            return evals, evecs
        except Exception as e:  # same ladder as reference geometry.py:345-361
            print(e)
            if failcount > 3:
                raise ValueError("failed to compute eigendecomp")
            failcount += 1
            print(f"--- decomp failed; adding eps ===> count: {failcount}")
            L_eigsh = L_eigsh + scipy.sparse.identity(L.shape[0]) * (eps * 10 ** failcount)


def _gershgorin_bound(ell: Ell) -> jnp.ndarray:
    """Upper bound on lambda_max of a symmetric ELL matrix: max_i sum_j |a_ij|."""
    return jnp.max(jnp.sum(jnp.abs(ell.val), axis=-1))


def eigensolve_device(L_ell: Ell, massvec, k_eig: int, n_valid: int | None = None,
                      eps: float = 1e-8, n_iter: int = 200):
    """TPU LOBPCG for the k smallest generalized eigenpairs.

    L_ell: symmetric PSD weak Laplacian in ELL layout (padded rows must be zero).
    massvec: (V,) strictly positive on valid rows, 0 on padding.
    Returns (evals (k,), evecs (V, k)) with evecs M-orthonormal, matching the
    normalization ARPACK returns for the generalized problem.
    """
    V = L_ell.idx.shape[0]
    mask = massvec > 0
    inv_sqrt_m = jnp.where(mask, 1.0 / jnp.sqrt(jnp.where(mask, massvec, 1.0)), 0.0)

    # C = M^-1/2 (L + eps I) M^-1/2 restricted to valid rows; padded rows are
    # decoupled identity rows pinned at the TOP of the spectrum (eigenvalue
    # `big` ~= Gershgorin bound) so they never pollute the smallest-k window.
    row_scale = inv_sqrt_m
    bound = _gershgorin_bound(
        Ell(L_ell.idx, L_ell.val * row_scale[:, None]
            * row_scale[L_ell.idx])) + eps
    big = bound
    mu = bound * 1.05 + 1.0

    def matvec(x):  # x: (V, m); C x = r (L (r x)) + eps r^2 x, r = M^-1/2
        y = row_scale[:, None] * x
        y = ell_matvec(L_ell, y)
        y = row_scale[:, None] * y + eps * (row_scale[:, None] ** 2) * x
        # padded rows: act as big * I to push them out of the smallest-k window
        return jnp.where(mask[:, None], y, big * x)

    # Shift: smallest-k of C == largest-k of (mu I - C)

    def shifted(x):
        return mu * x - matvec(x)

    key = jax.random.PRNGKey(0)
    X0 = jax.random.normal(key, (V, k_eig), dtype=jnp.float32)

    from jax.experimental.sparse.linalg import lobpcg_standard
    theta, U, _ = lobpcg_standard(shifted, X0, m=n_iter)

    evals = mu - theta - eps
    evals = jnp.clip(evals, 0.0, None)
    # back-transform: generalized evecs = M^-1/2 U; M-orthonormal by construction
    evecs = inv_sqrt_m[:, None] * U
    # sort ascending (lobpcg returns descending theta -> ascending evals already,
    # but sort defensively)
    order = jnp.argsort(evals)
    return evals[order], evecs[:, order]
