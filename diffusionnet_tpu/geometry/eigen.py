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

    Everything big is static-shape jittable: the filter is a fori_loop of
    ELL (or banded-dense) SpMMs, and the SVQB/RR rotations are (V,n)x(n,n)
    matmuls. The tiny (n,n) eigh factorizations run on HOST between four
    device programs (see _whiten_factor: device eigh of small matrices is
    pathologically slow on TPU); only ~100 KB Gram/RR matrices cross the
    host boundary per sweep. Per-sweep cost is ~m SpMMs; memory is 3 (V, n)
    blocks — O(10x) less than LOBPCG's extended basis, which is what lets
    1M x 128 fit on one chip. The sharded variant row-shards all (V, n)
    blocks over a `vert` mesh axis; the only collectives are an all-gather
    of the iterate for the SpMM and (n, n) psums for Gram/RR matrices.
"""

from __future__ import annotations

import os

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


def _cheb_filter(matvec, X, lo: float, hi: float, m: int):
    """Y = rho_m(C) X with rho_m(x) = T_m((x - c)/e) / T_m((0 - c)/e),
    c = (hi + lo)/2, e = (hi - lo)/2 — the Zhou–Saad SCALED Chebyshev filter
    (normalized at x = 0 so |rho_m| <= 1 everywhere on [0, hi]: no overflow,
    while the wanted band [0, lo) is amplified relative to [lo, hi] by
    |T_m| ~ e^{2m sqrt((lo-x)/(hi-lo))}). lo/hi may be traced scalars; m is
    static (fori_loop trip count)."""
    e = (hi - lo) / 2.0
    c = (hi + lo) / 2.0
    l0 = -c / e                      # ell(0), < -1
    sigma1 = 1.0 / l0
    Z0 = X
    Z1 = (matvec(X) - c * X) * (sigma1 / e)

    def body(_, carry):
        Zm1, Zm0, sigma = carry
        sigma_new = 1.0 / (2.0 * l0 - sigma)
        Zn = (matvec(Zm0) - c * Zm0) * (2.0 * sigma_new / e) \
            - (sigma * sigma_new) * Zm1
        return (Zm0, Zn, sigma_new)

    _, Y, _ = jax.lax.fori_loop(1, m, body, (Z0, Z1, sigma1))
    return Y


def _whiten_factor(G, tau: float = 1e-12) -> np.ndarray:
    """HOST half of SVQB orthonormalization (Stathopoulos–Wu): from the Gram
    matrix G = Y^T Y, build the (n, n) factor F such that Y F has orthonormal
    columns — diagonal scaling, eigh whitening, rank-revealing clip.

    The eigh deliberately runs on host, in float64: an (n, n) Gram is ~100 KB
    at n=160 (a microsecond LAPACK call and a negligible transfer), while
    jitting `jnp.linalg.eigh` into the device sweep was measured to dominate
    the whole eigensolve on TPU — the tiny-matrix eigh lowers to a giant
    QR-iteration HLO that costs seconds per call (and minutes of XLA compile).
    Splitting the sweep so only dense (V,n)-block matmuls stay on device cut
    the 200k-vertex solve ~3x end to end."""
    import scipy.linalg
    G = np.asarray(G, np.float64)
    G = 0.5 * (G + G.T)
    d = 1.0 / np.sqrt(np.clip(np.diag(G), 1e-30, None))
    w, S = scipy.linalg.eigh(G * d[:, None] * d[None, :])
    w = np.clip(w, tau * max(w.max(), 1e-300), None)
    return (d[:, None] * S) / np.sqrt(w)[None, :]


def _host_eigh_ascending(T):
    """Host f64 eigh of the (n, n) Rayleigh-Ritz matrix (same rationale as
    _whiten_factor: tiny-matrix eigh does not belong in a TPU program)."""
    import scipy.linalg
    T = np.asarray(T, np.float64)
    w, S = scipy.linalg.eigh(0.5 * (T + T.T))
    return w, S


_COMP_CACHE_ON = False


def _ensure_compilation_cache():
    """Enable JAX's persistent compilation cache once per process (opt out
    with DNT_NO_COMPILATION_CACHE=1). The filtered-sweep programs take tens
    of seconds to compile on slow toolchains; without the on-disk cache
    every fresh process calling get_operators with the device eigensolver
    pays that again. Skipped silently if the cache dir is not writable or
    the caller already configured one."""
    global _COMP_CACHE_ON
    if _COMP_CACHE_ON or os.environ.get("DNT_NO_COMPILATION_CACHE"):
        return
    _COMP_CACHE_ON = True
    try:
        if jax.config.jax_compilation_cache_dir is None:
            from ..utils import enable_compilation_cache
            enable_compilation_cache()
    except Exception:
        pass


def _device_solver_setup(L_ell: Ell, massvec, k_eig: int, n_valid, eps: float,
                         lambda_cut, oversample):
    """Shared setup for the single-chip and vert-sharded solvers: validity
    mask, M^-1/2 row scaling, spectral-radius bound, filter window estimate.

    Runs ENTIRELY on host numpy (returns numpy mask/inv_sqrt_m): these are
    trivial O(nnz) reductions, but expressed as eager device ops each one is
    a separate compile + dispatch — measured 137 s cold at 200k through a
    tunneled TPU (vs milliseconds here). Callers transfer the two (V,)
    vectors once, alongside the operator itself."""
    idx = np.asarray(L_ell.idx)
    val = np.asarray(L_ell.val)
    massvec_np = np.asarray(massvec)
    V = idx.shape[0]
    mask = massvec_np > 0
    if n_valid is not None:
        # caller-declared valid-row count: rows at or beyond n_valid are
        # padding even if their mass is nonzero
        mask = mask & (np.arange(V) < n_valid)
    inv_sqrt_m = np.where(
        mask, 1.0 / np.sqrt(np.where(mask, massvec_np, 1.0)), 0.0
    ).astype(np.float32)

    # spectral radius bound of C (Gershgorin over the normalized entries,
    # PLUS the eps * M^-1 regularization term of matvec_C — a tiny-mass
    # vertex with a near-zero Laplacian row otherwise pushes lambda_max(C)
    # outside the Chebyshev interval)
    scaled = np.abs(val) * inv_sqrt_m[:, None] * inv_sqrt_m[idx]
    bound = (float(scaled.sum(axis=1).max())
             + eps * float(inv_sqrt_m.max()) ** 2
             + eps)

    if oversample is None:
        oversample = max(8, k_eig // 4)
    # the subspace cannot exceed the number of valid rows (tiny meshes):
    # clamp the oversampling, and refuse k_eig > valid rows outright
    n_valid_rows = int(mask.sum())
    if k_eig > n_valid_rows:
        raise RuntimeError(f"k_eig={k_eig} exceeds the {n_valid_rows} valid "
                           "vertices")
    n_cols = min(k_eig + oversample, n_valid_rows)
    oversample = n_cols - k_eig

    # Weyl's law cutoff estimate: lambda_j ~= 4 pi j / Area for a 2-manifold
    # (initial filter window edge; the outer loop replaces it with the top
    # Ritz value after the first sweep)
    if lambda_cut is None:
        area = float(massvec_np.sum())
        lambda_cut = max(4.0 * np.pi * (n_cols + 1) / max(area, 1e-30), eps)
    lambda_cut = min(lambda_cut, 0.5 * bound)
    return mask, inv_sqrt_m, bound, n_cols, oversample, lambda_cut


def _dense_eigh_tiny(L_ell: Ell, massvec, mask, k_eig: int, eps: float,
                     polish):
    """Dense generalized eigh for tiny problems (valid rows ~ subspace size):
    Chebyshev subspace iteration cannot separate a band that spans most of
    the spectrum, so the filtered sweeps stagnate far above tolerance on
    sub-1k meshes. A direct f64 eigh of (L + eps I, M) on the valid rows is
    exact, costs O(V^3) ~ microseconds-to-ms here, and matches the host
    ARPACK ladder's semantics (reference geometry.py:340-352)."""
    import scipy.linalg
    mask_np = np.asarray(mask)
    idx = np.where(mask_np)[0]
    if polish is not None:
        L_sp, mass = polish
    else:
        L_sp, mass = _ell_to_scipy(L_ell), np.asarray(massvec)
    A = np.asarray(L_sp.todense(), dtype=np.float64)[np.ix_(idx, idx)]
    A[np.diag_indices_from(A)] += eps
    m = np.asarray(mass, np.float64)[idx]
    w, U = scipy.linalg.eigh(A, np.diag(m))
    # subtract the eps regularization like every sibling path (the
    # eigensolve_device no-polish branch and _rr_polish_host both return
    # clip(w - eps, 0, ...)) so the zero mode comes back as exactly 0
    w = np.clip(w[:k_eig] - eps, 0.0, None)
    evecs = np.zeros((L_ell.idx.shape[0], k_eig), np.float64)
    evecs[idx] = U[:, :k_eig]
    if polish is not None:
        return w, evecs
    return (jnp.asarray(w, jnp.float32), jnp.asarray(evecs, jnp.float32))


def _rr_polish_host(L: scipy.sparse.spmatrix, massvec, Y, k_eig: int,
                    eps: float, augment: bool = True,
                    certify_tol: float | None = 1e-3,
                    timings: dict | None = None):
    """Float64 Rayleigh–Ritz polish of a device-converged basis Y (V, n).

    The f32 device sweeps converge the SUBSPACE to the f32 matvec noise
    floor (~1e-7 * lambda_max(C)); the in-subspace decomposition then limits
    band accuracy to ~noise/gap. This polish (a) orthonormalizes the basis
    in f64, (b) AUGMENTS it with the f64 residual block Z = CQ - Q(Q^T CQ)
    — one block-Krylov step, so the f32 subspace error itself is corrected
    to second order — and (c) solves one generalized RR. Sparse SpMMs plus
    dense GEMMs, O(nnz*n + V*n^2), no factorization (the thing ARPACK
    needed): measured band error 2e-12 / diffusion parity 1e-6 at 20k, and
    the residual augmentation keeps diffusion parity <=1e-4 at 200k where
    the f32 noise floor alone would leave ~1e-2 band-edge subspace error.
    Returns (evals (k,), evecs (V, k)) float64, evecs M-orthonormal."""
    import scipy.linalg
    import time as _time

    def _mark(stage, t0):
        if timings is not None:
            timings[stage] = (timings.get(stage, 0.0)
                              + _time.perf_counter() - t0)
        return _time.perf_counter()

    _t = _time.perf_counter()
    V = Y.shape[0]
    m = np.asarray(massvec, np.float64)
    r = np.zeros(V)
    pos = m > 0
    r[pos] = 1.0 / np.sqrt(m[pos])
    Lcsr = L.tocsr()

    # Fold the M^-1/2 row/col scaling and the eps shift INTO the operator
    # once (C = r L r + eps r^2 I): each matvec is then a single SpMM with
    # no per-call elementwise passes over (V, n)-sized temporaries — those
    # broadcasts cost more than the SpMM itself at 200k. The SpMM goes
    # through the native threaded axpy kernel (scipy's csr multivector
    # product is several times slower on a wide B).
    rows = np.repeat(np.arange(V), np.diff(Lcsr.indptr))
    C_sp = scipy.sparse.csr_matrix(
        (Lcsr.data * r[rows] * r[Lcsr.indices], Lcsr.indices, Lcsr.indptr),
        shape=Lcsr.shape)
    C_sp = (C_sp + scipy.sparse.diags(eps * r * r)).tocsr()
    try:
        from ..native import csr_spmm_native as _spmm
        from ..native.build import get_lib
        get_lib()  # compile now: the lazy build raises at first CALL, so
        # probing here keeps the documented no-compiler scipy fallback alive
    except Exception:  # no compiler / build failure: scipy fallback
        _spmm = lambda A, B: A @ B

    def matvec(B):
        t0 = _time.perf_counter()
        out = _spmm(C_sp, B)
        _mark("polish_spmm", t0)
        return out

    _t = _mark("polish_setup", _t)

    # No QR: the generalized eigh(T, G) handles a non-orthonormal basis
    # directly (Y arrives f32-SVQB'd, so G ~ I), and the big O(V n^2) GEMMs
    # are the polish's whole cost on a host core — the Gram blocks below are
    # the minimal set.
    #
    # Every tall-output (V, n) product goes through np.matmul(..., out=):
    # measured on this host's OpenBLAS, plain `A @ B` with a (200k, 160)
    # result runs at 1.6 GFLOPS while the preallocated-out path runs at
    # ~29 GFLOPS (the allocating path takes a degenerate kernel); the
    # (n, n)-output Gram products are fast either way (~46 GFLOPS).
    Y = np.asarray(Y, np.float64)
    _t = _mark("polish_cast", _t)
    CY = matvec(Y)
    T0 = Y.T @ CY
    G0 = Y.T @ Y
    # below ~2 GB of (V, n) f64, keep CY/CZ alive through the eigh:
    # certification then reuses them as C[Y,Z] @ S — two dense GEMMs
    # instead of a fresh SpMM (mathematically identical; ~2x cheaper)
    gemm_certify = (certify_tol is not None
                    and Y.shape[0] * Y.shape[1] * 8 < 2e9)
    CZ = None
    if augment:
        # residual block Z = CY - Y G0^-1 T0 (first-order subspace
        # correction — one block-Krylov step), column-normalized.
        # SELECTIVE: a column already converged to the f32 matvec noise
        # floor (zn ~ eps_f32 * ||C||) carries an out-of-subspace error
        # ~1e-7 relative — far below the parity gates — so only columns
        # whose residual sits ABOVE that floor (the band-edge leakage the
        # augmentation exists for) join the subspace, nearly halving the
        # polish's O(V n^2) GEMM + SpMM cost with no measurable parity
        # change (200k: diffusion/HKS parity gates unchanged at ~2e-6).
        Z = CY.copy() if gemm_certify else CY
        Z -= np.matmul(Y, scipy.linalg.solve(G0, T0, assume_a="pos"),
                       out=np.empty_like(CY))
        zn = np.linalg.norm(Z, axis=0)
        cnorm = max(float(np.abs(C_sp).sum(axis=1).max()), 1e-300)
        f32_floor = float(np.finfo(np.float32).eps) * cnorm
        keep = zn > max(4.0 * f32_floor, 1e-13 * max(zn.max(), 1e-300))
        if keep.all():
            Z /= zn            # in place: the (V, n) column-gather copy of
        elif keep.any():       # the fancy-index path costs seconds at 200k
            Z = Z[:, keep] / zn[keep]
        else:
            Z = None
    else:
        Z = None
    if Z is not None:
        CZ = matvec(Z)
        # blockwise T/G for B = [Y, Z] (C symmetric: Z^T C Y = (Y^T C Z)^T)
        YtZ, YtCZ = Y.T @ Z, Y.T @ CZ
        T = np.block([[T0, YtCZ], [YtCZ.T, Z.T @ CZ]])
        G = np.block([[G0, YtZ], [YtZ.T, Z.T @ Z]])
    else:
        T, G = T0, G0
    if not gemm_certify:
        CY = CZ = None  # free the (V, n) blocks before the dense work
    T = 0.5 * (T + T.T)
    G = 0.5 * (G + G.T)
    _t = _mark("polish_gram", _t)  # CY/CZ SpMMs + all Gram GEMMs
    try:
        w, S = scipy.linalg.eigh(T, G)
    except scipy.linalg.LinAlgError:
        # near-dependent augmentation columns: regularize and retry
        G = G + 1e-10 * np.eye(G.shape[0])
        w, S = scipy.linalg.eigh(T, G)
    _t = _mark("polish_eigh", _t)
    evals = np.clip(w[:k_eig] - eps, 0.0, None)
    # B @ S without materializing B = [Y, Z] (a second (V, 2n) copy)
    n = Y.shape[1]
    BS = np.matmul(Y, np.ascontiguousarray(S[:n, :k_eig]),
                   out=np.empty((Y.shape[0], k_eig)))
    if Z is not None:
        BS += np.matmul(Z, np.ascontiguousarray(S[n:, :k_eig]),
                        out=np.empty_like(BS))
    _t = _mark("polish_recombine", _t)

    if certify_tol is not None:
        # f64 CERTIFICATION of the final pairs (one extra SpMM): the f32
        # outer loop's noise-floor acceptance is calibrated for sane
        # bound-to-band ratios; on ill-scaled operators (sliver meshes:
        # cotan weights ~1e10, Gershgorin bound ~1e12) it can accept an
        # unconverged basis whose residual is huge in absolute terms but
        # under 1e-5*bound. The polish cannot rescue a wrong SUBSPACE, so
        # measure the true generalized residual ||C u - w u|| here (U = BS
        # has unit columns: S is G-orthonormal) and reject loudly —
        # compute_operators then falls back to the ARPACK ladder. Healthy
        # polished bases sit orders below this tolerance (band error ~1e-12
        # at 20k, docs/RESULTS.md); garbage sits at O(1) relative.
        if gemm_certify:
            # C @ BS assembled from the cached blocks: C(Y S1 + Z S2)
            # = CY S1 + CZ S2 exactly (f64 GEMM rounding ~1e-16, orders
            # below certify_tol)
            CBS = np.matmul(CY, np.ascontiguousarray(S[:n, :k_eig]),
                            out=np.empty_like(BS))
            if Z is not None:
                CBS += np.matmul(CZ, np.ascontiguousarray(S[n:, :k_eig]),
                                 out=np.empty_like(BS))
            res = CBS - BS * w[None, :k_eig]
        else:
            res = matvec(BS) - BS * w[None, :k_eig]
        # denominator floor: when the whole requested band is (near-)kernel
        # (k_eig <= #connected components) w[k-1] ~ eps, but f64 roundoff in
        # the residual scales with the operator's magnitude (~bound on
        # ill-scaled sliver meshes) — a correct basis would spuriously fail.
        # Floor by the f64 noise floor of one matvec, ~u64 * ||C||; the
        # largest Ritz value of the augmented subspace estimates that scale.
        f64_floor = 2.22e-16 * max(float(w[-1]), 1.0)
        rel = float(np.linalg.norm(res, axis=0).max()
                    / max(float(w[k_eig - 1]), eps, f64_floor))
        if rel > certify_tol:
            raise RuntimeError(
                f"f64 certification failed after polish: max relative "
                f"residual {rel:.3e} > {certify_tol:g} — the f32 sweeps "
                "converged to a wrong subspace (ill-scaled operator?); "
                "falling back to the host ladder is required")
    evecs = r[:, None] * BS
    _mark("polish_certify", _t)
    return evals, evecs


def _matvec_C(L_idx, L_val, inv_sqrt_m, mask, bound, eps, x,
              col_chunk: int | None = None):
    """C x = r (L (r x)) + eps r^2 x with r = M^-1/2; padded rows act as
    bound*I so the band-pass filter sends numerical leakage onto padding to
    ~1/T_m(ell(0)) (self-damping) instead of amplifying it as a fake
    zero-mode.

    col_chunk: process x in column blocks of this width. The ELL gather
    materializes a (V, D, n) temp; at 1M x 9 x 160 that alone is ~6 GB and
    the un-chunked sweep OOMs a 16 GB chip — chunking bounds the peak to
    (V, D, col_chunk) while keeping every block MXU-shaped."""
    def apply(xc):
        y = inv_sqrt_m[:, None] * xc
        y = ell_matvec(Ell(L_idx, L_val), y)
        y = inv_sqrt_m[:, None] * y + eps * (inv_sqrt_m[:, None] ** 2) * xc
        return jnp.where(mask[:, None], y, bound * xc)

    n = x.shape[1]
    if col_chunk is None or n <= col_chunk:
        return apply(x)
    return jnp.concatenate([apply(x[:, i:i + col_chunk])
                            for i in range(0, n, col_chunk)], axis=1)


from functools import partial as _partial


# One outer iteration is SPLIT into four device programs with host (n, n)
# eigh factorizations between them (see _whiten_factor for why):
#   1. filter+Gram:      Y = p_m(C) X;  G = Y^T Y
#   2. [host F1 = whiten(G)]  rotate+Gram:  Y <- Y F1;  G2 = Y^T Y
#   3. [host F2 = whiten(G2)] rotate+apply: Y <- Y F2;  W = C Y;  T = Y^T W
#   4. [host w,S = eigh(T)]   rotate+residuals: U = Y S;  R = W S - U w
# The (V, n) blocks never leave the device; only (n, n) matrices cross the
# host boundary (~100 KB each at n=160).
#
# f32-accurate ("highest") matmul precision is load-bearing on TPU: the
# default precision runs dots in bf16 passes, but the wanted band's RELATIVE
# gaps are ~1e-5 of lambda_max(C) — far below bf16's ~3 digits. The Gram/RR
# matrices would degrade on hardware while CPU tests pass.


def _mv_ell(L_idx, L_val, inv_sqrt_m, mask, bound, eps, col_chunk):
    return _partial(_matvec_C, L_idx, L_val, inv_sqrt_m, mask, bound, eps,
                    col_chunk=col_chunk)


def _mv_banded(band, starts, inv_sqrt_m, mask, bound, eps, col_chunk):
    from ..ops.banded import Banded, banded_matvec
    b = Banded(band=band, starts=starts, n=band.shape[0] * band.shape[1],
               perm=None)

    def mv_block(x):
        y = banded_matvec(b, inv_sqrt_m[:, None] * x)
        y = inv_sqrt_m[:, None] * y + eps * (inv_sqrt_m[:, None] ** 2) * x
        return jnp.where(mask[:, None], y, bound * x)

    def mv(x):
        n = x.shape[1]
        if col_chunk is None or n <= col_chunk:
            return mv_block(x)
        return jnp.concatenate([mv_block(x[:, i:i + col_chunk])
                                for i in range(0, n, col_chunk)], axis=1)
    return mv


@_partial(jax.jit, static_argnames=("cheb_degree", "col_chunk"))
def _dev_filter_gram_ell(L_idx, L_val, inv_sqrt_m, mask, X, lo, bound, eps,
                         cheb_degree: int, col_chunk: int | None = None):
    """Stage 1 (ELL operator). Module-level jit: meshes sharing (V, D,
    n_cols, degree) reuse ONE compiled program — per-mesh closures would
    recompile for every mesh of a dataset."""
    mv = _mv_ell(L_idx, L_val, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        X = jnp.where(mask[:, None], X, 0.0)
        Y = _cheb_filter(mv, X, lo, bound, cheb_degree)
        G = Y.T @ Y
    return Y, G


@_partial(jax.jit, static_argnames=("cheb_degree", "col_chunk"))
def _dev_filter_gram_banded(band, starts, inv_sqrt_m, mask, X, lo, bound,
                            eps, cheb_degree: int,
                            col_chunk: int | None = None):
    """Stage 1 (banded-dense operator, ops/banded.py): the SpMM is a batch
    of per-tile (TR, W) x (W, C) MXU matmuls fed by contiguous window
    slices — ~13x faster than the ELL gather on TPU per 200k x 160 matvec.
    Everything is in RCM-permuted, tile-padded row order."""
    mv = _mv_banded(band, starts, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        X = jnp.where(mask[:, None], X, 0.0)
        Y = _cheb_filter(mv, X, lo, bound, cheb_degree)
        G = Y.T @ Y
    return Y, G


def _mv_dia(data, offsets: tuple, inv_sqrt_m, mask, bound, eps, col_chunk):
    from ..ops.banded import dia_matvec

    def mv_block(x):
        y = dia_matvec(data, offsets, inv_sqrt_m[:, None] * x)
        y = inv_sqrt_m[:, None] * y + eps * (inv_sqrt_m[:, None] ** 2) * x
        return jnp.where(mask[:, None], y, bound * x)

    def mv(x):
        n = x.shape[1]
        if col_chunk is None or n <= col_chunk:
            return mv_block(x)
        return jnp.concatenate([mv_block(x[:, i:i + col_chunk])
                                for i in range(0, n, col_chunk)], axis=1)
    return mv


@_partial(jax.jit, static_argnames=("offsets", "cheb_degree", "col_chunk"))
def _dev_filter_gram_dia(data, offsets: tuple, inv_sqrt_m, mask, X, lo,
                         bound, eps, cheb_degree: int,
                         col_chunk: int | None = None):
    """Stage 1 (DIA operator — structured meshes, ops/banded.py
    dia_matvec): statically-shifted elementwise SpMM, no gather."""
    mv = _mv_dia(data, offsets, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        X = jnp.where(mask[:, None], X, 0.0)
        Y = _cheb_filter(mv, X, lo, bound, cheb_degree)
        G = Y.T @ Y
    return Y, G


@_partial(jax.jit, static_argnames=("offsets", "col_chunk"))
def _dev_rotate_apply_dia(data, offsets: tuple, inv_sqrt_m, mask, bound,
                          eps, Y, F, col_chunk: int | None = None):
    mv = _mv_dia(data, offsets, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        Y = Y @ F
        W = mv(Y)
        T = Y.T @ W
    return Y, W, T


# --- segmented filter (large-V single-chip path) -------------------------
# One degree-m filter as ONE device program runs for minutes at 1M x 160 and
# reliably kills this environment's tunneled TPU worker (measured: a
# degree-32 program executes fine, degree-64 faults — a per-program
# execution watchdog, not memory: live buffers are identical). The segmented
# path drives the same scaled-Chebyshev recurrence as _cheb_filter through
# short fori_loop programs, carrying (Z_{k-1}, Z_k, sigma_k) on device; only
# the traced scalars cross the host boundary between segments.


@_partial(jax.jit, static_argnames=("col_chunk",))
def _dev_cheb_start_ell(L_idx, L_val, inv_sqrt_m, mask, X, lo, bound, eps,
                        col_chunk: int | None = None):
    mv = _mv_ell(L_idx, L_val, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        X = jnp.where(mask[:, None], X, 0.0)
        e = (bound - lo) / 2.0
        c = (bound + lo) / 2.0
        sigma1 = 1.0 / (-c / e)
        Z1 = (mv(X) - c * X) * (sigma1 / e)
    return X, Z1, sigma1


@_partial(jax.jit, static_argnames=("steps", "col_chunk"))
def _dev_cheb_seg_ell(L_idx, L_val, inv_sqrt_m, mask, Zm1, Zm0, sigma, lo,
                      bound, eps, steps: int, col_chunk: int | None = None):
    mv = _mv_ell(L_idx, L_val, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        e = (bound - lo) / 2.0
        c = (bound + lo) / 2.0
        l0 = -c / e

        def body(_, carry):
            Zm1, Zm0, sigma = carry
            sigma_new = 1.0 / (2.0 * l0 - sigma)
            Zn = (mv(Zm0) - c * Zm0) * (2.0 * sigma_new / e) \
                - (sigma * sigma_new) * Zm1
            return (Zm0, Zn, sigma_new)

        return jax.lax.fori_loop(0, steps, body, (Zm1, Zm0, sigma))


@_partial(jax.jit, static_argnames=("col_chunk",))
def _dev_cheb_start_banded(band, starts, inv_sqrt_m, mask, X, lo, bound, eps,
                           col_chunk: int | None = None):
    mv = _mv_banded(band, starts, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        X = jnp.where(mask[:, None], X, 0.0)
        e = (bound - lo) / 2.0
        c = (bound + lo) / 2.0
        sigma1 = 1.0 / (-c / e)
        Z1 = (mv(X) - c * X) * (sigma1 / e)
    return X, Z1, sigma1


@_partial(jax.jit, static_argnames=("steps", "col_chunk"))
def _dev_cheb_seg_banded(band, starts, inv_sqrt_m, mask, Zm1, Zm0, sigma, lo,
                         bound, eps, steps: int,
                         col_chunk: int | None = None):
    mv = _mv_banded(band, starts, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        e = (bound - lo) / 2.0
        c = (bound + lo) / 2.0
        l0 = -c / e

        def body(_, carry):
            Zm1, Zm0, sigma = carry
            sigma_new = 1.0 / (2.0 * l0 - sigma)
            Zn = (mv(Zm0) - c * Zm0) * (2.0 * sigma_new / e) \
                - (sigma * sigma_new) * Zm1
            return (Zm0, Zn, sigma_new)

        return jax.lax.fori_loop(0, steps, body, (Zm1, Zm0, sigma))


# --- blocked-ELL stage functions (unstructured large meshes) -------------
# Same four-stage split driven through ops/blocked_ell.py's Pallas SpMM —
# the format for meshes where DIA refuses (unstructured sparsity) and the
# dense RCM band exceeds memory (1M irregular: band 22 GB vs blocked 4 GB).
# The w_window/n_pad_x ints are static (they size the kernel's VMEM window).


def _mv_blocked(blocks, offs, starts, ovr, ovc, ovv, w_window: int,
                n_pad_x: int, inv_sqrt_m, mask, bound, eps, col_chunk):
    from ..ops.blocked_ell import BlockedEll, blocked_ell_matvec
    b = BlockedEll(blocks=blocks, offs=offs, starts=starts, ov_rows=ovr,
                   ov_cols=ovc, ov_vals=ovv, n=0, n_pad_x=n_pad_x,
                   w_window=w_window, perm=None)

    def mv_block(x):
        y = blocked_ell_matvec(b, inv_sqrt_m[:, None] * x)
        y = inv_sqrt_m[:, None] * y + eps * (inv_sqrt_m[:, None] ** 2) * x
        return jnp.where(mask[:, None], y, bound * x)

    def mv(x):
        n = x.shape[1]
        if col_chunk is None or n <= col_chunk:
            return mv_block(x)
        return jnp.concatenate([mv_block(x[:, i:i + col_chunk])
                                for i in range(0, n, col_chunk)], axis=1)
    return mv


@_partial(jax.jit, static_argnames=("w_window", "n_pad_x", "cheb_degree",
                                    "col_chunk"))
def _dev_filter_gram_blocked(blocks, offs, starts, ovr, ovc, ovv,
                             w_window: int, n_pad_x: int, inv_sqrt_m, mask,
                             X, lo, bound, eps, cheb_degree: int,
                             col_chunk: int | None = None):
    mv = _mv_blocked(blocks, offs, starts, ovr, ovc, ovv, w_window, n_pad_x,
                     inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        X = jnp.where(mask[:, None], X, 0.0)
        Y = _cheb_filter(mv, X, lo, bound, cheb_degree)
        G = Y.T @ Y
    return Y, G


@_partial(jax.jit, static_argnames=("w_window", "n_pad_x", "col_chunk"))
def _dev_cheb_start_blocked(blocks, offs, starts, ovr, ovc, ovv,
                            w_window: int, n_pad_x: int, inv_sqrt_m, mask,
                            X, lo, bound, eps,
                            col_chunk: int | None = None):
    mv = _mv_blocked(blocks, offs, starts, ovr, ovc, ovv, w_window, n_pad_x,
                     inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        X = jnp.where(mask[:, None], X, 0.0)
        e = (bound - lo) / 2.0
        c = (bound + lo) / 2.0
        sigma1 = 1.0 / (-c / e)
        Z1 = (mv(X) - c * X) * (sigma1 / e)
    return X, Z1, sigma1


@_partial(jax.jit, static_argnames=("w_window", "n_pad_x", "steps",
                                    "col_chunk"))
def _dev_cheb_seg_blocked(blocks, offs, starts, ovr, ovc, ovv,
                          w_window: int, n_pad_x: int, inv_sqrt_m, mask,
                          Zm1, Zm0, sigma, lo, bound, eps, steps: int,
                          col_chunk: int | None = None):
    mv = _mv_blocked(blocks, offs, starts, ovr, ovc, ovv, w_window, n_pad_x,
                     inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        e = (bound - lo) / 2.0
        c = (bound + lo) / 2.0
        l0 = -c / e

        def body(_, carry):
            Zm1, Zm0, sigma = carry
            sigma_new = 1.0 / (2.0 * l0 - sigma)
            Zn = (mv(Zm0) - c * Zm0) * (2.0 * sigma_new / e) \
                - (sigma * sigma_new) * Zm1
            return (Zm0, Zn, sigma_new)

        return jax.lax.fori_loop(0, steps, body, (Zm1, Zm0, sigma))


@_partial(jax.jit, static_argnames=("w_window", "n_pad_x", "col_chunk"))
def _dev_rotate_apply_blocked(blocks, offs, starts, ovr, ovc, ovv,
                              w_window: int, n_pad_x: int, inv_sqrt_m, mask,
                              bound, eps, Y, F,
                              col_chunk: int | None = None):
    mv = _mv_blocked(blocks, offs, starts, ovr, ovc, ovv, w_window, n_pad_x,
                     inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        Y = Y @ F
        W = mv(Y)
        T = Y.T @ W
    return Y, W, T


@_partial(jax.jit, static_argnames=("offsets", "col_chunk"))
def _dev_cheb_start_dia(data, offsets: tuple, inv_sqrt_m, mask, X, lo,
                        bound, eps, col_chunk: int | None = None):
    mv = _mv_dia(data, offsets, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        X = jnp.where(mask[:, None], X, 0.0)
        e = (bound - lo) / 2.0
        c = (bound + lo) / 2.0
        sigma1 = 1.0 / (-c / e)
        Z1 = (mv(X) - c * X) * (sigma1 / e)
    return X, Z1, sigma1


@_partial(jax.jit, static_argnames=("offsets", "steps", "col_chunk"))
def _dev_cheb_seg_dia(data, offsets: tuple, inv_sqrt_m, mask, Zm1, Zm0,
                      sigma, lo, bound, eps, steps: int,
                      col_chunk: int | None = None):
    mv = _mv_dia(data, offsets, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        e = (bound - lo) / 2.0
        c = (bound + lo) / 2.0
        l0 = -c / e

        def body(_, carry):
            Zm1, Zm0, sigma = carry
            sigma_new = 1.0 / (2.0 * l0 - sigma)
            Zn = (mv(Zm0) - c * Zm0) * (2.0 * sigma_new / e) \
                - (sigma * sigma_new) * Zm1
            return (Zm0, Zn, sigma_new)

        return jax.lax.fori_loop(0, steps, body, (Zm1, Zm0, sigma))


@jax.jit
def _dev_gram(Y):
    with jax.default_matmul_precision("highest"):
        return Y.T @ Y


def _segmented_filter_gram(start_fn, seg_fn, X, lo, m: int, seg: int):
    """filter+Gram via short device programs (same math as _cheb_filter: the
    recurrence applies m-1 steps after the start; Y = Z_m)."""
    Zm1, Zm0, sigma = start_fn(X, lo)
    done = 0
    while done < m - 1:
        steps = min(seg, m - 1 - done)
        Zm1, Zm0, sigma = seg_fn(Zm1, Zm0, sigma, lo, steps)
        done += steps
    return Zm0, _dev_gram(Zm0)


@jax.jit
def _dev_rotate_gram(Y, F):
    """Stage 2: apply the first whitening factor, re-Gram (the second SVQB
    pass exists to fix the f32 roundoff of the big rotation matmul)."""
    with jax.default_matmul_precision("highest"):
        Y = Y @ F
        G = Y.T @ Y
    return Y, G


@_partial(jax.jit, static_argnames=("col_chunk",))
def _dev_rotate_apply_ell(L_idx, L_val, inv_sqrt_m, mask, bound, eps, Y, F,
                          col_chunk: int | None = None):
    mv = _mv_ell(L_idx, L_val, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        Y = Y @ F
        W = mv(Y)
        T = Y.T @ W
    return Y, W, T


@_partial(jax.jit, static_argnames=("col_chunk",))
def _dev_rotate_apply_banded(band, starts, inv_sqrt_m, mask, bound, eps, Y,
                             F, col_chunk: int | None = None):
    mv = _mv_banded(band, starts, inv_sqrt_m, mask, bound, eps, col_chunk)
    with jax.default_matmul_precision("highest"):
        Y = Y @ F
        W = mv(Y)
        T = Y.T @ W
    return Y, W, T


@jax.jit
def _dev_rotate_residuals(Y, W, S, w):
    """Stage 4: rotate into the Ritz basis, per-column residual 2-norms."""
    with jax.default_matmul_precision("highest"):
        U = Y @ S
        R = W @ S - U * w[None, :]
        res = jnp.linalg.norm(R, axis=0)
    return U, res


def _split_sweep(filter_gram, rotate_apply, X, lo,
                 rotate_gram=None, rotate_residuals=None):
    """One outer iteration via the four-stage device/host split above.
    Returns (ritz vectors U (device), ritz values w ascending (np.float64),
    residual 2-norms res)."""
    rotate_gram = rotate_gram if rotate_gram is not None else _dev_rotate_gram
    rotate_residuals = (rotate_residuals if rotate_residuals is not None
                        else _dev_rotate_residuals)
    Y, G = filter_gram(X, lo)
    F1 = jnp.asarray(_whiten_factor(np.asarray(G)), jnp.float32)
    Y, G2 = rotate_gram(Y, F1)
    F2 = jnp.asarray(_whiten_factor(np.asarray(G2)), jnp.float32)
    Y, W, T = rotate_apply(Y, F2)
    w, S = _host_eigh_ascending(np.asarray(T))
    U, res = rotate_residuals(Y, W, jnp.asarray(S, jnp.float32),
                              jnp.asarray(w, jnp.float32))
    return U, w, res


# Diagnostic record of the most recent _converge call in this process:
# {"name", "exit" ("tol" | "floor"), "sweeps", "worst", "tol_scale",
#  "floor_limit"}. Written on every successful convergence so tests (and
# postmortems) can distinguish a true tolerance exit from a noise-floor
# acceptance — a *wrong* floor acceptance is exactly the silent failure mode
# the adversarial suite guards against (VERDICT r3 weak #7).
LAST_CONVERGE_INFO: dict = {}


def _converge(sweep_fn, X, lo0: float, k_eig: int, eps: float, tol: float,
              max_sweeps: int, bound: float, verbose: bool, name: str):
    """Outer loop shared by all solver variants: sweep until the worst
    wanted residual clears tol*scale, or accept the f32 noise floor via the
    STAGNATION rule — iterate until the residual stops halving (one
    post-stagnation sweep is load-bearing for the f64 polish: measured at
    200k, polishing the first at-floor basis gives 9e-2 subspace angle,
    polishing the next sweep's gives 9e-6). Returns (X, w)."""
    def _record(exit_kind, it, worst, scale):
        LAST_CONVERGE_INFO.clear()
        LAST_CONVERGE_INFO.update(
            name=name, exit=exit_kind, sweeps=it + 1, worst=worst,
            tol_scale=tol * scale,
            floor_limit=max(1e-5 * bound, 10 * tol * scale))

    lo = jnp.asarray(lo0, jnp.float32)
    prev_worst = np.inf
    w = None
    for it in range(max_sweeps):
        X, w, res = sweep_fn(X, lo)
        scale = float(max(float(w[k_eig - 1]), eps))  # w is host float64
        worst = float(np.max(np.asarray(res)[:k_eig]))
        if verbose:
            print(f"  {name} sweep {it}: worst wanted residual {worst:.3e} "
                  f"(tol*scale {tol * scale:.3e})", flush=True)
        if not np.isfinite(worst):
            raise RuntimeError(f"{name}: non-finite residual at sweep {it}")
        if worst <= tol * scale:
            _record("tol", it, worst, scale)
            break
        if worst > 0.9 * prev_worst:
            # <1.11x reduction = plateau. (Not 2x: a sweep still cutting the
            # residual by e.g. 1.7x — a badly seeded filter window on its
            # first adapted sweep — is converging, and aborting it would pay
            # the full ARPACK fallback for nothing. max_sweeps backstops.)
            # accept the floor when it lands within an order of the
            # requested tolerance OR at the large-problem f32 floor
            # (~1e-7 * bound * margin); tiny meshes stall marginally above
            # tol*scale without being anywhere near 1e-5*bound
            if worst <= max(1e-5 * bound, 10 * tol * scale):
                _record("floor", it, worst, scale)
                break                              # converged to the floor
            raise RuntimeError(
                f"{name}: residual stagnated at {worst:.3e} (sweep {it}), "
                "far above the f32 noise floor")
        prev_worst = worst
        # adapt the filter window: dampen everything above the basis's top
        # w is host float64 now; pin the traced-scalar dtype so every sweep
        # hits the same compiled program
        lo = jnp.asarray(np.clip(w[-1], 0.0, 0.5 * bound), jnp.float32)
    else:
        raise RuntimeError(f"{name}: wanted band not converged after "
                           f"{max_sweeps} sweeps (worst residual "
                           f"{worst:.3e})")
    return X, w


def _ell_to_scipy(ell: Ell):
    """Host CSR from an ELL bundle (explicit padding zeros pruned — they
    would otherwise anchor every banded window at column 0)."""
    import scipy.sparse
    idx = np.asarray(ell.idx)
    val = np.asarray(ell.val)
    V, D = idx.shape
    rows = np.repeat(np.arange(V), D)
    m = scipy.sparse.coo_matrix(
        (val.ravel(), (rows, idx.ravel())), shape=(V, V)).tocsr()
    m.eliminate_zeros()
    return m


def eigensolve_device(L_ell: Ell, massvec, k_eig: int, n_valid: int | None = None,
                      eps: float = 1e-8, tol: float = 2e-4,
                      max_sweeps: int = 30,
                      lambda_cut: float | None = None,
                      cheb_degree: int | None = None,
                      oversample: int | None = None,
                      n_iter: int | None = None,
                      seed: int = 777,
                      polish=None,
                      banded: bool | str | None = None,
                      cheb_segment: int | None = None,
                      verbose: bool = False,
                      timings: dict | None = None):
    """TPU eigensolver for the k smallest generalized eigenpairs of
    L phi = lambda M phi — residual-converged Chebyshev-filtered subspace
    iteration (see the module docstring for the algorithm).

    The naive shift trick (largest of mu I - C) is numerically hopeless at
    scale in float32: for a fine mesh the spectral radius of
    C = M^-1/2 L M^-1/2 is ~1e5-1e6 while the wanted bottom eigenvalues are
    separated by O(1), so relative gaps are ~1e-5. The band-pass Chebyshev
    filter amplifies the wanted band exponentially in the degree instead,
    and the outer loop REPEATS filtered sweeps, adapting the filter window
    to the current top Ritz value, until the k wanted residuals
    ||C u - w u|| are below max(tol * w_k, f32 matvec noise).

    L_ell: symmetric PSD weak Laplacian in ELL layout (padded rows all-zero).
    massvec: (V,) strictly positive on valid rows, 0 on padding. Returns
    (evals (k,), evecs (V,k)), evecs M-orthonormal, padded rows exactly zero.

    tol: relative residual target (relative to the top wanted Ritz value);
    if the residual stagnates before reaching it, the f32 matvec noise
    floor is accepted instead (see _converge — the f64 polish removes the
    floor's in-subspace error).
    cheb_degree: filter degree per sweep (default scales with
    sqrt(bound/lambda_cut), the Chebyshev convergence exponent).
    n_iter: deprecated (the pre-round-3 LOBPCG iteration count); ignored.
    seed: deterministic start-vector seed (the host ladder's 777 convention).
    banded: operator format. None (default, accelerators) auto-selects
    DIA (structured) -> dense RCM band (narrow bandwidth) -> blocked-ELL
    Pallas panels (unstructured/wide, ops/blocked_ell.py) -> ELL gather;
    False forces the ELL gather (and is the CPU default); True requires the
    dense band; 'dia'/'blocked' require that specific format (raise if the
    operator does not fit it).
    cheb_segment: max Chebyshev steps per device program (None = auto: 32
    when V >= 400k, unsegmented below). Large-V filter sweeps as ONE XLA
    program run for minutes and trip per-program execution watchdogs
    (measured on this environment's tunneled worker: degree-32 programs at
    1M execute, degree-64 fault); segmenting keeps each program short while
    the iterate stays on device. 0 disables segmentation.
    polish: optional (L_scipy_sparse, massvec_float64) pair enabling the
    float64 host Rayleigh–Ritz polish of the converged basis (see
    _rr_polish_host) — compute_operators passes it since it holds the f64
    operator anyway; the polished branch returns float64 numpy arrays.

    Raises RuntimeError if the wanted band has not converged after
    max_sweeps (callers may retry with a larger budget or fall back to the
    host ladder — compute_operators does exactly that).
    timings: optional dict; records wall seconds of the internal stages
    (eigen_band_build, eigen_sweeps, eigen_polish) for bench breakdowns.

    Memory: 3 live (V, n_cols) f32 blocks plus matmul temporaries — 1M x 128
    fits a single 16 GB chip (unlike LOBPCG's 3x extended basis). For
    multi-chip scaling see eigensolve_device_sharded."""
    del n_iter
    import time as _time

    def _mark(stage, t0):
        if timings is not None:
            timings[stage] = timings.get(stage, 0.0) + _time.perf_counter() - t0
        return _time.perf_counter()

    if cheb_degree is not None and cheb_degree < 2:
        raise ValueError(f"cheb_degree must be >= 2, got {cheb_degree} "
                         "(the recurrence always consumes degrees 0..1)")
    if k_eig == 0:
        return jnp.zeros((0,)), jnp.zeros((L_ell.idx.shape[0], 0))
    _ensure_compilation_cache()

    mask, inv_sqrt_m, bound, n_cols, oversample, lambda_cut = \
        _device_solver_setup(L_ell, massvec, k_eig, n_valid, eps,
                             lambda_cut, oversample)
    V = L_ell.idx.shape[0]

    # small problems: when the subspace spans more than ~1/10 of the
    # spectrum, the band-pass filter cannot separate the wanted band and
    # the sweeps stagnate far above tolerance (measured boundary on
    # sphere/torus/grid families: V/n_cols <= 7.5 always stagnates, >= 9.8
    # always converges). Gate with margin at 12x — a direct f64 eigh there
    # is exact and costs about the same as the sweeps (V <= 1920 at
    # k_eig=128); the 4096-row cap bounds the O(V^3) for very wide bands,
    # beyond which the sweeps + ARPACK fallback take over.
    n_valid_rows = int(mask.sum())
    if n_valid_rows <= min(12 * n_cols, 4096):
        return _dense_eigh_tiny(L_ell, massvec, mask, k_eig, eps, polish)

    if cheb_degree is None:
        # degree scales with the Chebyshev convergence exponent
        # sqrt(bound/lambda_cut); rounded up to a 32-grid so meshes of the
        # same bucket shape hit the same compiled sweep
        cheb_degree = int(np.clip(8.0 * np.sqrt(bound / lambda_cut) + 10,
                                  50, 320))
        cheb_degree = -32 * (-cheb_degree // 32)

    key = jax.random.PRNGKey(seed)
    bound_j = jnp.asarray(bound, jnp.float32)
    eps_j = jnp.asarray(eps, jnp.float32)
    if cheb_segment is None:
        cheb_segment = 32 if V >= 400_000 else 0

    # banded fast path (default on accelerators when the RCM-reordered
    # bandwidth is small enough): the sweeps run as dense per-tile MXU
    # matmuls instead of the gather-bound ELL SpMM — ~13x per-matvec on TPU
    # (ops/banded.py). NOT on CPU: the dense band does ~V*W/nnz more FLOPs,
    # which the MXU absorbs but a host core does not.
    if banded is None:
        dd = jax.config.jax_default_device
        on_cpu = (dd.platform == "cpu" if dd is not None
                  else jax.default_backend() == "cpu")
        banded = None if not on_cpu else False
    band_rep = None
    dia_rep = None
    blocked_rep = None
    if banded is not False:
        from ..ops.banded import (banded_from_sparse_device, dia_from_sparse,
                                  rcm_permutation)
        t0 = _time.perf_counter()
        L_host = polish[0] if polish is not None else _ell_to_scipy(L_ell)
        if banded in (None, "dia") and L_host.shape[0] == V:
            # STRUCTURED meshes (few distinct col-row offsets, e.g. grids):
            # DIA — statically-shifted elementwise matvec, no gather, memory
            # exactly D*V. Beats the dense band in memory AND FLOPs, and is
            # the only single-chip fast path at 1M where the RCM band needs
            # ~10 GB (over budget) and the ELL gather measures ~1.5 s/matvec
            dia_rep = dia_from_sparse(L_host)
        if banded == "dia" and dia_rep is None:
            raise RuntimeError("banded='dia' but the operator is not "
                               "diagonal-structured (or the ELL was padded)")
        # band-size budget: leave room for the 3 live (V, n_cols) blocks,
        # the chunked window gather (~1.5 GB) and matmul temps on a 16 GB
        # chip
        block_bytes = 3 * V * n_cols * 4
        budget = min(6_500_000_000,
                     max(2_500_000_000, 11_000_000_000 - block_bytes))
        rcm = None
        if dia_rep is None and banded in (None, True):
            rcm = rcm_permutation(L_host)
            band_rep = banded_from_sparse_device(L_host,
                                                 max_band_bytes=budget,
                                                 perm=rcm)
        if dia_rep is None and band_rep is None and banded in (None,
                                                               "blocked"):
            # UNSTRUCTURED meshes too wide for the dense band (irregular 1M:
            # RCM bandwidth ~2600, band 22 GB): blocked-ELL Pallas SpMM —
            # only the occupied 128-column panels are stored (~4 GB at 1M),
            # the matvec stays MXU matmuls against a VMEM-resident window
            from ..ops.blocked_ell import blocked_ell_from_sparse
            if rcm is None:
                rcm = rcm_permutation(L_host)
            blocked_rep = blocked_ell_from_sparse(L_host, max_bytes=budget,
                                                  perm=rcm)
        _mark("eigen_band_build", t0)
        if band_rep is None and dia_rep is None and banded is True:
            raise RuntimeError("banded=True but the RCM-reordered bandwidth "
                               "exceeds the band-size budget")
        if blocked_rep is None and banded == "blocked":
            raise RuntimeError("banded='blocked' but the blocked-ELL panels "
                               "exceed the memory budget")

    if dia_rep is not None:
        data_j = jnp.asarray(dia_rep[0])
        offsets = dia_rep[1]
        inv_j = jnp.asarray(inv_sqrt_m)
        mask_j = jnp.asarray(mask)
        # bound the fused per-offset (V, chunk) streams at large V
        col_chunk = 64 if V * n_cols * 4 > 1.0e9 else None
        X0 = jnp.where(mask_j[:, None],
                       jax.random.normal(key, (V, n_cols), jnp.float32), 0.0)
        if cheb_segment:
            filter_gram = lambda Xs, los: _segmented_filter_gram(
                lambda X_, lo_: _dev_cheb_start_dia(
                    data_j, offsets, inv_j, mask_j, X_, lo_, bound_j, eps_j,
                    col_chunk),
                lambda Zm1, Zm0, sig, lo_, steps: _dev_cheb_seg_dia(
                    data_j, offsets, inv_j, mask_j, Zm1, Zm0, sig, lo_,
                    bound_j, eps_j, steps, col_chunk),
                Xs, los, cheb_degree, cheb_segment)
        else:
            filter_gram = lambda Xs, los: _dev_filter_gram_dia(
                data_j, offsets, inv_j, mask_j, Xs, los, bound_j, eps_j,
                cheb_degree, col_chunk)
        t0 = _time.perf_counter()
        X, w = _converge(
            lambda X, lo: _split_sweep(
                filter_gram,
                lambda Ys, Fs: _dev_rotate_apply_dia(
                    data_j, offsets, inv_j, mask_j, bound_j, eps_j, Ys, Fs,
                    col_chunk),
                X, lo),
            X0, lambda_cut, k_eig, eps, tol, max_sweeps, bound, verbose,
            "eigensolve_device[dia]")
        t0 = _mark("eigen_sweeps", t0)
        if polish is not None:
            L_sp, mass_f64 = polish
            Xh = np.asarray(X)
            t0 = _mark("eigen_fetch", t0)
            out = _rr_polish_host(L_sp, mass_f64, Xh, k_eig, eps,
                                  timings=timings)
            _mark("eigen_polish", t0)
            return out
        evals = jnp.clip(w[:k_eig] - eps, 0.0, None)
        evecs = inv_j[:, None] * X[:, :k_eig]
        return evals, evecs

    if band_rep is not None:
        T_, TR, Wd = band_rep.band.shape
        n_pad = T_ * TR
        perm = band_rep.perm
        imp = np.zeros(n_pad, np.float32)
        imp[:V] = inv_sqrt_m[perm]
        mkp = np.zeros(n_pad, bool)
        mkp[:V] = mask[perm]
        band_j = jnp.asarray(band_rep.band)
        starts_j = jnp.asarray(band_rep.starts)
        imp_j, mkp_j = jnp.asarray(imp), jnp.asarray(mkp)
        col_chunk = None
        if T_ * Wd * 4 * n_cols > 1.5e9:
            col_chunk = max(16, int(1.5e9 / (T_ * Wd * 4)) // 16 * 16)
        X0 = jnp.where(mkp_j[:, None],
                       jax.random.normal(key, (n_pad, n_cols), jnp.float32),
                       0.0)
        if cheb_segment:
            filter_gram = lambda Xs, los: _segmented_filter_gram(
                lambda X_, lo_: _dev_cheb_start_banded(
                    band_j, starts_j, imp_j, mkp_j, X_, lo_, bound_j, eps_j,
                    col_chunk),
                lambda Zm1, Zm0, sig, lo_, steps: _dev_cheb_seg_banded(
                    band_j, starts_j, imp_j, mkp_j, Zm1, Zm0, sig, lo_,
                    bound_j, eps_j, steps, col_chunk),
                Xs, los, cheb_degree, cheb_segment)
        else:
            filter_gram = lambda Xs, los: _dev_filter_gram_banded(
                band_j, starts_j, imp_j, mkp_j, Xs, los, bound_j, eps_j,
                cheb_degree, col_chunk)
        t0 = _time.perf_counter()
        X, w = _converge(
            lambda X, lo: _split_sweep(
                filter_gram,
                lambda Ys, Fs: _dev_rotate_apply_banded(
                    band_j, starts_j, imp_j, mkp_j, bound_j, eps_j, Ys, Fs,
                    col_chunk),
                X, lo),
            X0, lambda_cut, k_eig, eps, tol, max_sweeps, bound, verbose,
            "eigensolve_device[banded]")
        # back to the original vertex order
        X_orig = np.zeros((V, n_cols), np.float32)
        X_orig[perm] = np.asarray(X)[:V]
        t0 = _mark("eigen_sweeps", t0)
        if polish is not None:
            L_sp, mass_f64 = polish
            out = _rr_polish_host(L_sp, mass_f64, X_orig, k_eig, eps,
                                  timings=timings)
            _mark("eigen_polish", t0)
            return out
        evals = jnp.clip(w[:k_eig] - eps, 0.0, None)
        evecs = inv_sqrt_m[:, None] * jnp.asarray(X_orig[:, :k_eig])
        return evals, evecs

    if blocked_rep is not None:
        br = blocked_rep
        n_pad = br.n_pad
        perm = br.perm
        ww, npx = int(br.w_window), int(br.n_pad_x)
        fmt = (br.blocks, br.offs, br.starts, br.ov_rows, br.ov_cols,
               br.ov_vals)
        imp = np.zeros(n_pad, np.float32)
        imp[:V] = inv_sqrt_m[perm]
        mkp = np.zeros(n_pad, bool)
        mkp[:V] = mask[perm]
        imp_j, mkp_j = jnp.asarray(imp), jnp.asarray(mkp)
        col_chunk = None
        X0 = jnp.where(mkp_j[:, None],
                       jax.random.normal(key, (n_pad, n_cols), jnp.float32),
                       0.0)
        if cheb_segment:
            filter_gram = lambda Xs, los: _segmented_filter_gram(
                lambda X_, lo_: _dev_cheb_start_blocked(
                    *fmt, ww, npx, imp_j, mkp_j, X_, lo_, bound_j, eps_j,
                    col_chunk),
                lambda Zm1, Zm0, sig, lo_, steps: _dev_cheb_seg_blocked(
                    *fmt, ww, npx, imp_j, mkp_j, Zm1, Zm0, sig, lo_,
                    bound_j, eps_j, steps, col_chunk),
                Xs, los, cheb_degree, cheb_segment)
        else:
            filter_gram = lambda Xs, los: _dev_filter_gram_blocked(
                *fmt, ww, npx, imp_j, mkp_j, Xs, los, bound_j, eps_j,
                cheb_degree, col_chunk)
        t0 = _time.perf_counter()
        X, w = _converge(
            lambda X, lo: _split_sweep(
                filter_gram,
                lambda Ys, Fs: _dev_rotate_apply_blocked(
                    *fmt, ww, npx, imp_j, mkp_j, bound_j, eps_j, Ys, Fs,
                    col_chunk),
                X, lo),
            X0, lambda_cut, k_eig, eps, tol, max_sweeps, bound, verbose,
            "eigensolve_device[blocked]")
        # back to the original vertex order
        X_orig = np.zeros((V, n_cols), np.float32)
        X_orig[perm] = np.asarray(X)[:V]
        t0 = _mark("eigen_sweeps", t0)
        if polish is not None:
            L_sp, mass_f64 = polish
            out = _rr_polish_host(L_sp, mass_f64, X_orig, k_eig, eps,
                                  timings=timings)
            _mark("eigen_polish", t0)
            return out
        evals = jnp.clip(w[:k_eig] - eps, 0.0, None)
        evecs = inv_sqrt_m[:, None] * jnp.asarray(X_orig[:, :k_eig])
        return evals, evecs

    # ELL gather path (wide-band matrices / banded=False) — one transfer of
    # the host-computed (V,) setup vectors
    inv_sqrt_m = jnp.asarray(inv_sqrt_m)
    mask = jnp.asarray(mask)
    X0 = jnp.where(mask[:, None],
                   jax.random.normal(key, (V, n_cols), dtype=jnp.float32),
                   0.0)
    # bound the (V, D, chunk) gather temp of the SpMM to ~1.5 GB (the full
    # (V, D, n_cols) temp OOMs a 16 GB chip at 1M x 128)
    gather_bytes = V * L_ell.idx.shape[1] * 4
    col_chunk = None
    if gather_bytes * n_cols > 1.5e9:
        col_chunk = max(16, int(1.5e9 / gather_bytes) // 16 * 16)

    if cheb_segment:
        filter_gram = lambda Xs, los: _segmented_filter_gram(
            lambda X_, lo_: _dev_cheb_start_ell(
                L_ell.idx, L_ell.val, inv_sqrt_m, mask, X_, lo_, bound_j,
                eps_j, col_chunk),
            lambda Zm1, Zm0, sig, lo_, steps: _dev_cheb_seg_ell(
                L_ell.idx, L_ell.val, inv_sqrt_m, mask, Zm1, Zm0, sig, lo_,
                bound_j, eps_j, steps, col_chunk),
            Xs, los, cheb_degree, cheb_segment)
    else:
        filter_gram = lambda Xs, los: _dev_filter_gram_ell(
            L_ell.idx, L_ell.val, inv_sqrt_m, mask, Xs, los, bound_j,
            eps_j, cheb_degree, col_chunk)
    t0 = _time.perf_counter()
    X, w = _converge(
        lambda X, lo: _split_sweep(
            filter_gram,
            lambda Ys, Fs: _dev_rotate_apply_ell(
                L_ell.idx, L_ell.val, inv_sqrt_m, mask, bound_j, eps_j, Ys,
                Fs, col_chunk),
            X, lo),
        X0, lambda_cut, k_eig, eps, tol, max_sweeps, bound, verbose,
        "eigensolve_device")
    t0 = _mark("eigen_sweeps", t0)

    if polish is not None:
        L_sp, mass_f64 = polish
        Xh = np.asarray(X)
        t0 = _mark("eigen_fetch", t0)
        out = _rr_polish_host(L_sp, mass_f64, Xh, k_eig, eps,
                              timings=timings)
        _mark("eigen_polish", t0)
        return out
    evals = jnp.clip(w[:k_eig] - eps, 0.0, None)
    evecs = inv_sqrt_m[:, None] * X[:, :k_eig]
    return evals, evecs


# ---------------------------------------------------------------------------
# Vert-sharded solver (multi-chip): row-shard every (V, n) block over the
# `vert` mesh axis. The SpMM all-gathers the iterate (the operator's column
# indices are global); Gram/RR matrices are (n, n) psums — tiny collectives
# riding ICI while all O(V) traffic stays device-local.
# ---------------------------------------------------------------------------


def _mv_sharded(L_idx, L_val, inv_sqrt_m, mask, bound, eps, axis,
                col_chunk):
    """Matvec for row-sharded operands inside shard_map: all-gather the
    pre-scaled iterate (the operator's column indices are global; L is
    symmetric, applied as r L r, so scaling x before the gather lets both
    sides use local data), then a local ELL gather-contraction."""
    def mv_block(x):  # x: (V_loc, c) -> (V_loc, c)
        x_full = jax.lax.all_gather(x * inv_sqrt_m[:, None], axis,
                                    axis=0, tiled=True)      # (V, c)
        gathered = x_full[L_idx]                             # (V_loc,D,c)
        y = jnp.einsum("vd,vdc->vc", L_val, gathered,
                       preferred_element_type=jnp.float32)
        y = inv_sqrt_m[:, None] * y \
            + eps * (inv_sqrt_m[:, None] ** 2) * x
        return jnp.where(mask[:, None], y, bound * x)

    def mv(x):  # column-chunked (see _matvec_C)
        n = x.shape[1]
        if col_chunk is None or n <= col_chunk:
            return mv_block(x)
        return jnp.concatenate([mv_block(x[:, i:i + col_chunk])
                                for i in range(0, n, col_chunk)], axis=1)
    return mv


@_partial(jax.jit, static_argnames=("cheb_degree", "mesh", "axis",
                                    "col_chunk"))
def _dev_filter_gram_sharded(L_idx, L_val, inv_sqrt_m, mask, X, lo, bound,
                             eps, cheb_degree: int, mesh, axis: str,
                             col_chunk: int | None = None):
    """Stage 1, shard_map twin of _dev_filter_gram_ell: (V, ...) operands
    arrive row-sharded over `axis`; the Gram comes back replicated (psum)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def device_fn(L_idx, L_val, inv_sqrt_m, mask, X, lo):
        mv = _mv_sharded(L_idx, L_val, inv_sqrt_m, mask, bound, eps, axis,
                         col_chunk)
        with jax.default_matmul_precision("highest"):
            X = jnp.where(mask[:, None], X, 0.0)
            Y = _cheb_filter(mv, X, lo, bound, cheb_degree)
            G = jax.lax.psum(Y.T @ Y, axis)
        return Y, G

    pv = P(axis)
    return shard_map(
        device_fn, mesh=mesh,
        in_specs=(pv, pv, pv, pv, pv, P()),
        out_specs=(pv, P()),
        check_vma=False,
    )(L_idx, L_val, inv_sqrt_m, mask, X, lo)


@_partial(jax.jit, static_argnames=("mesh", "axis"))
def _dev_rotate_gram_sharded(Y, F, mesh, axis: str):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def device_fn(Y, F):
        with jax.default_matmul_precision("highest"):
            Y = Y @ F
            G = jax.lax.psum(Y.T @ Y, axis)
        return Y, G

    pv = P(axis)
    return shard_map(device_fn, mesh=mesh, in_specs=(pv, P()),
                     out_specs=(pv, P()), check_vma=False)(Y, F)


@_partial(jax.jit, static_argnames=("mesh", "axis", "col_chunk"))
def _dev_rotate_apply_sharded(L_idx, L_val, inv_sqrt_m, mask, bound, eps, Y,
                              F, mesh, axis: str,
                              col_chunk: int | None = None):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def device_fn(L_idx, L_val, inv_sqrt_m, mask, Y, F):
        mv = _mv_sharded(L_idx, L_val, inv_sqrt_m, mask, bound, eps, axis,
                         col_chunk)
        with jax.default_matmul_precision("highest"):
            Y = Y @ F
            W = mv(Y)
            T = jax.lax.psum(Y.T @ W, axis)
        return Y, W, T

    pv = P(axis)
    return shard_map(device_fn, mesh=mesh,
                     in_specs=(pv, pv, pv, pv, pv, P()),
                     out_specs=(pv, pv, P()),
                     check_vma=False)(L_idx, L_val, inv_sqrt_m, mask, Y, F)


@_partial(jax.jit, static_argnames=("mesh", "axis"))
def _dev_rotate_residuals_sharded(Y, W, S, w, mesh, axis: str):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def device_fn(Y, W, S, w):
        with jax.default_matmul_precision("highest"):
            U = Y @ S
            R = W @ S - U * w[None, :]
            res = jnp.sqrt(jax.lax.psum(jnp.sum(R * R, axis=0), axis))
        return U, res

    pv = P(axis)
    return shard_map(device_fn, mesh=mesh,
                     in_specs=(pv, pv, P(), P()),
                     out_specs=(pv, P()), check_vma=False)(Y, W, S, w)


def eigensolve_device_sharded(L_ell: Ell, massvec, k_eig: int, mesh,
                              axis: str = "vert",
                              n_valid: int | None = None,
                              eps: float = 1e-8, tol: float = 2e-4,
                              max_sweeps: int = 30,
                              lambda_cut: float | None = None,
                              cheb_degree: int | None = None,
                              oversample: int | None = None,
                              seed: int = 777,
                              polish=None,
                              verbose: bool = False):
    """eigensolve_device with every (V, n) block row-sharded over the `axis`
    axis of `mesh` — the path that fits 1M x 128 across chips (VERDICT r2
    item 1b). Same algorithm, same convergence loop; the only cross-shard
    traffic is one all-gather of the (V, n) iterate per filter matvec and
    (n, n) psums for Gram/RR. V must be divisible by the shard count.

    Returns (evals (k,), evecs (V, k) row-sharded over `axis`)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_shards = mesh.shape[axis]
    V = L_ell.idx.shape[0]
    if V % n_shards != 0:
        raise ValueError(f"V={V} not divisible by {n_shards} '{axis}' shards"
                         " — pad the operator rows (ell_pad) first")
    if k_eig == 0:
        return jnp.zeros((0,)), jnp.zeros((V, 0))
    _ensure_compilation_cache()

    mask, inv_sqrt_m, bound, n_cols, oversample, lambda_cut = \
        _device_solver_setup(L_ell, massvec, k_eig, n_valid, eps,
                             lambda_cut, oversample)

    if cheb_degree is None:
        cheb_degree = int(np.clip(8.0 * np.sqrt(bound / lambda_cut) + 10,
                                  50, 320))
        cheb_degree = -32 * (-cheb_degree // 32)
    elif cheb_degree < 2:
        raise ValueError(f"cheb_degree must be >= 2, got {cheb_degree}")

    vshard = NamedSharding(mesh, P(axis))
    L_idx = jax.device_put(L_ell.idx, vshard)
    L_val = jax.device_put(L_ell.val, vshard)
    inv_sqrt_m_s = jax.device_put(inv_sqrt_m, vshard)
    mask_s = jax.device_put(mask, vshard)
    X = jnp.where(mask[:, None],
                  jax.random.normal(jax.random.PRNGKey(seed), (V, n_cols),
                                    dtype=jnp.float32), 0.0)
    X = jax.device_put(X, vshard)
    bound_j = jnp.asarray(bound, jnp.float32)
    eps_j = jnp.asarray(eps, jnp.float32)

    # per-shard (V_loc, D, chunk) gather temp bounded to ~1.5 GB
    gather_bytes = (V // n_shards) * L_ell.idx.shape[1] * 4
    col_chunk = None
    if gather_bytes * n_cols > 1.5e9:
        col_chunk = max(16, int(1.5e9 / gather_bytes) // 16 * 16)

    X, w = _converge(
        lambda X, lo: _split_sweep(
            lambda Xs, los: _dev_filter_gram_sharded(
                L_idx, L_val, inv_sqrt_m_s, mask_s, Xs, los, bound_j, eps_j,
                cheb_degree, mesh, axis, col_chunk),
            lambda Ys, Fs: _dev_rotate_apply_sharded(
                L_idx, L_val, inv_sqrt_m_s, mask_s, bound_j, eps_j, Ys, Fs,
                mesh, axis, col_chunk),
            X, lo,
            rotate_gram=lambda Ys, Fs: _dev_rotate_gram_sharded(
                Ys, Fs, mesh, axis),
            rotate_residuals=lambda Ys, Ws, Ss, ws: (
                _dev_rotate_residuals_sharded(Ys, Ws, Ss, ws, mesh, axis))),
        X, lambda_cut, k_eig, eps, tol, max_sweeps, bound, verbose,
        "eigensolve_device_sharded")

    if polish is not None:
        L_sp, mass_f64 = polish
        return _rr_polish_host(L_sp, mass_f64, np.asarray(X), k_eig, eps)
    evals = jnp.clip(w[:k_eig] - eps, 0.0, None)
    evecs = inv_sqrt_m[:, None] * X[:, :k_eig]
    return evals, evecs
