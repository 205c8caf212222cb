"""Generalized eigensolvers for L phi = lambda M phi (M diagonal lumped mass).

Two paths:
  * `eigensolve_host` — scipy ARPACK shift-invert, byte-for-byte semantics of the
    reference's ladder (geometry.py:336-361): shift sigma=eps, retry up to 4 times
    adding eps*10^failcount * I, clip small negative eigenvalues to 0.
  * `eigensolve_device` / `eigensolve_device_sharded` — the TPU-resident
    replacement for ARPACK (SURVEY §7's #1 hard part), and the PRIMARY solver
    of `compute_operators`. Because M is diagonal, the generalized problem
    reduces to a *standard* symmetric problem on C = M^{-1/2} L M^{-1/2}.
    The algorithm is Chebyshev-filtered subspace iteration (Zhou & Saad's
    scaled filter, the ChASE/PARSEC recipe) with SVQB orthonormalization and
    a residual-based outer loop:

      repeat until the k wanted residuals converge:
        Y   <- p_m(C) X     p_m = scaled Chebyshev on [lo, bound], amplifying
                            the wanted band [0, lo) exponentially in m
        Y   <- SVQB(Y) x2   Gram-eigh whitening (rank-revealing, no Cholesky
                            failure mode, matmul-dominated -> MXU)
        RR: T = Y^T C Y; eigh; rotate; residuals ||C u - w u||
        lo  <- top Ritz value (the filter window adapts to the iterate)

    Everything is static-shape jittable: the filter is a fori_loop of ELL
    SpMMs, SVQB/RR are (V,n)x(n,n) matmuls plus an (n,n) eigh. Per-sweep cost
    is ~m SpMMs; memory is 3 (V, n) blocks — O(10x) less than LOBPCG's
    extended basis, which is what lets 1M x 128 fit on one chip. The sharded
    variant row-shards all (V, n) blocks over a `vert` mesh axis; the only
    collectives are an all-gather of the iterate for the SpMM and (n, n)
    psums for Gram/RR matrices.
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
            # deterministic ARPACK start: the default v0 is drawn from
            # numpy's GLOBAL RNG, making eigenpairs depend on whatever ran
            # before in the process. Seeded per ATTEMPT, so a retry still
            # escapes a start-vector-driven convergence failure (the
            # reference's random-restart behavior) while staying
            # reproducible.
            v0 = np.random.RandomState(777 + failcount).randn(L.shape[0])
            evals, evecs = sla.eigsh(L_eigsh, k=k_eig, M=Mmat, sigma=eps,
                                     v0=v0)
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


def _cheb_coeffs(fn, lo: float, hi: float, degree: int) -> np.ndarray:
    """Chebyshev expansion coefficients of fn on [lo, hi] (host, tiny)."""
    j = np.arange(degree + 1)
    nodes = np.cos(np.pi * (j + 0.5) / (degree + 1))          # in [-1, 1]
    x = 0.5 * (hi - lo) * (nodes + 1.0) + lo
    fvals = fn(x)
    k = np.arange(degree + 1)[:, None]
    T = np.cos(k * np.arccos(nodes)[None, :])                  # (deg+1, deg+1)
    c = 2.0 / (degree + 1) * (T * fvals[None, :]).sum(axis=1)
    c[0] *= 0.5
    return c


def eigensolve_device(L_ell: Ell, massvec, k_eig: int, n_valid: int | None = None,
                      eps: float = 1e-8, n_iter: int = 100,
                      lambda_cut: float | None = None,
                      cheb_degree: int | None = None,
                      oversample: int | None = None):
    """TPU eigensolver for the k smallest generalized eigenpairs of
    L phi = lambda M phi — Chebyshev heat-filtered LOBPCG.

    The naive shift trick (largest of mu I - C) is numerically hopeless at scale
    in float32: for a fine mesh the spectral radius of C = M^-1/2 L M^-1/2 is
    ~1e5 while the wanted bottom eigenvalues are separated by O(1), so relative
    gaps are ~1e-5. Instead we run LOBPCG on the *heat filter* F = exp(-t C)
    (evaluated matrix-free by a Chebyshev polynomial of C over the ELL kernel):
    the bottom of C becomes the top of F with exponentially amplified gaps.
    t is chosen from Weyl's law (lambda_j ~ 4 pi j / Area for a surface), and
    eigenvalues are recovered by a final Rayleigh-Ritz with C itself.

    L_ell: symmetric PSD weak Laplacian in ELL layout (padded rows all-zero).
    massvec: (V,) strictly positive on valid rows, 0 on padding. Returns
    (evals (k,), evecs (V,k)), evecs M-orthonormal, padded rows exactly zero.

    HBM scaling: LOBPCG holds an extended basis of 3(k+oversample) columns
    plus temporaries — tens of (V, k+oversample) f32 arrays. 200k x k=128
    fits a 16 GB chip comfortably; 1M x k=128 does NOT (measured ~36 GB) —
    use the host path or shard at that scale.
    """
    if cheb_degree is not None and cheb_degree < 2:
        raise ValueError(f"cheb_degree must be >= 2, got {cheb_degree} "
                         "(the recurrence always consumes coeffs[0..1])")
    V = L_ell.idx.shape[0]
    mask = massvec > 0
    if n_valid is not None:
        # caller-declared valid-row count: rows at or beyond n_valid are
        # padding even if their mass is nonzero
        mask = mask & (jnp.arange(V) < n_valid)
    inv_sqrt_m = jnp.where(mask, 1.0 / jnp.sqrt(jnp.where(mask, massvec, 1.0)), 0.0)
    row_scale = inv_sqrt_m

    # spectral radius bound of C (Gershgorin over the normalized entries,
    # PLUS the eps * M^-1 regularization term of matvec_C — a tiny-mass
    # vertex with a near-zero Laplacian row otherwise pushes lambda_max(C)
    # outside the Chebyshev interval and T_n overflows f32)
    bound = (float(_gershgorin_bound(
        Ell(L_ell.idx, L_ell.val * row_scale[:, None]
            * row_scale[L_ell.idx])))
             + eps * float(jnp.max(jnp.where(mask, row_scale, 0.0))) ** 2
             + eps)
    big = bound  # padded rows act as big*I -> filtered to ~0, auto-excluded

    def matvec_C(x):  # x: (V, m); C x = r (L (r x)) + eps r^2 x, r = M^-1/2
        y = row_scale[:, None] * x
        y = ell_matvec(L_ell, y)
        y = row_scale[:, None] * y + eps * (row_scale[:, None] ** 2) * x
        return jnp.where(mask[:, None], y, big * x)

    if oversample is None:
        oversample = max(8, k_eig // 4)

    # Weyl's law cutoff estimate: lambda_j ~= 4 pi j / Area for a 2-manifold
    # (covering the oversampled band so the filter keeps it alive)
    if lambda_cut is None:
        area = float(jnp.sum(massvec))
        lambda_cut = max(4.0 * np.pi * (k_eig + oversample + 1)
                         / max(area, 1e-30), eps)
    t = 3.0 / lambda_cut
    if cheb_degree is None:
        cheb_degree = int(1.8 * np.sqrt(max(t * bound, 1.0))) + 12
    coeffs = jnp.asarray(_cheb_coeffs(lambda x: np.exp(-t * x), 0.0, bound,
                                      cheb_degree), dtype=jnp.float32)

    # F(x) = exp(-t C) x via the Chebyshev recurrence on u = (2/b) C - I
    two_over_b = 2.0 / bound

    def matvec_U(x):
        return two_over_b * matvec_C(x) - x

    def filter_apply(x):
        t0 = x
        t1 = matvec_U(x)
        acc = coeffs[0] * t0 + coeffs[1] * t1

        def body(i, carry):
            tm1, tm0, acc = carry
            tn = 2.0 * matvec_U(tm0) - tm1
            acc = acc + coeffs[i] * tn
            return (tm0, tn, acc)

        _, _, acc = jax.lax.fori_loop(2, cheb_degree + 1, body, (t0, t1, acc))
        return acc

    # Oversampling: iterate a larger subspace than requested and keep the
    # lowest k after the final Rayleigh-Ritz. The top of the requested band
    # sits near the filter's noise floor (exp(-t*lambda) ~ e^-3); extra
    # columns push the poorly-converged boundary OUT of the returned band.
    n_cols = k_eig + oversample

    key = jax.random.PRNGKey(0)
    X0 = jax.random.normal(key, (V, n_cols), dtype=jnp.float32)
    X0 = jnp.where(mask[:, None], X0, 0.0)

    # f32-accurate matmul precision is load-bearing on TPU: the default
    # precision runs dots in bf16 passes, but the wanted band's RELATIVE
    # gaps are ~1e-5 of lambda_max(C) (see the docstring) — far below bf16's
    # ~3 decimal digits. LOBPCG's Gram matrices and the Rayleigh-Ritz
    # projection would both degrade on hardware while CPU tests pass (the
    # same failure mode heat_device._build_chol documents).
    with jax.default_matmul_precision("highest"):
        from jax.experimental.sparse.linalg import lobpcg_standard
        _, U, _ = lobpcg_standard(filter_apply, X0, m=n_iter)

        # Rayleigh-Ritz with C itself to recover eigenvalues (and de-rotate
        # within the filtered subspace, since F compresses eigenvalue
        # information)
        CU = matvec_C(U)
        T = U.T @ CU
        T = 0.5 * (T + T.T)
        w, S = jnp.linalg.eigh(T)
        evals = jnp.clip(w - eps, 0.0, None)
        U = U @ S

    # back-transform: generalized evecs = M^-1/2 U; M-orthonormal by construction
    evecs = inv_sqrt_m[:, None] * U
    order = jnp.argsort(evals)[:k_eig]  # drop the oversampled tail
    return evals[order], evecs[:, order]
