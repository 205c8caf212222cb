"""Functional-maps correspondence head (reference
experiments/functional_correspondence/fmaps_model.py).

TPU-first difference: the reference solves the 30 regularized rows of the
functional map with a Python loop of torch.inverse calls (fmaps_model.py:33-38);
here all rows are ONE batched linear solve (jnp.linalg.solve over a stacked
(K2, K2, K2) system) — fully jittable and MXU-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .diffusion_net import DiffusionNet


def compute_fmap(feat_x, feat_y, evals_x, evals_y, evecs_trans_x, evecs_trans_y,
                 lambda_param: float = 1e-3):
    """Least-squares functional map with Laplacian-commutativity regularization.

    feat_x: (..., Vx, C); evecs_trans_x: (..., Kx, Vx) mass-weighted transposed
    eigenvectors; evals_*: (..., K). Returns C_xy (..., Ky, Kx) mapping spectral
    coefficients on X to Y — same convention as reference fmaps_model.py:11-40.
    """
    # spectral coefficients of the learned features
    A = evecs_trans_x @ feat_x                       # (..., Kx, C)
    B = evecs_trans_y @ feat_y                       # (..., Ky, C)

    # D_i[k, l] = (evals_y[k] - evals_x[l])^2 resolvent mask per output row i?
    # Reference builds D: (Ky, Kx) with D[i] used per row i of C (Ky rows).
    D = (evals_y[..., :, None] - evals_x[..., None, :]) ** 2  # (..., Ky, Kx)

    A_t = jnp.swapaxes(A, -1, -2)                    # (..., C, Kx)
    A_A_t = A @ A_t                                  # (..., Kx, Kx)
    B_A_t = B @ A_t                                  # (..., Ky, Kx)

    # Row i of C solves (A A^T + lambda diag-mask D_i) C_i^T = (B A^T)_i^T.
    # Stack all Ky systems and solve in one batched call.
    Ky = D.shape[-2]
    Kx = D.shape[-1]
    eye = jnp.eye(Kx, dtype=A.dtype)
    # systems: (..., Ky, Kx, Kx)
    systems = A_A_t[..., None, :, :] + lambda_param * (D[..., :, None] * eye)
    rhs = B_A_t[..., :, :, None]                     # (..., Ky, Kx, 1)
    C_rows = jnp.linalg.solve(systems, rhs)[..., 0]  # (..., Ky, Kx)
    return C_rows


class FunctionalMapCorrespondence(nn.Module):
    """Shared-weights DiffusionNet feature extractor + parameter-free fmap solver
    (reference fmaps_model.py:43-89)."""
    c_in: int
    c_out: int = 128
    c_width: int = 128
    n_block: int = 4
    n_fmap: int = 30
    lambda_param: float = 1e-3
    input_features: str = "xyz"  # documentation only; caller builds features

    def setup(self):
        self.feature_extractor = DiffusionNet(
            c_in=self.c_in, c_out=self.c_out, c_width=self.c_width,
            n_block=self.n_block, dropout=True, outputs_at="vertices",
            name="feature_extractor")

    def __call__(self, shape_x: dict, shape_y: dict, deterministic: bool = True):
        """Each shape dict: {features, mass, L, evals, evecs, gradX, gradY}.
        Returns (C_xy (n_fmap, n_fmap), feat_x, feat_y)."""

        def extract(s):
            return self.feature_extractor(
                s["features"], s["mass"], L=s["L"], evals=s["evals"],
                evecs=s["evecs"], gradX=s["gradX"], gradY=s["gradY"],
                deterministic=deterministic)

        feat_x = extract(shape_x)
        feat_y = extract(shape_y)

        k = self.n_fmap
        for name, s in (("shape_x", shape_x), ("shape_y", shape_y)):
            if s["evals"].shape[-1] < k:
                # [..., :k] would silently yield a smaller map than n_fmap
                raise ValueError(
                    f"{name} carries only {s['evals'].shape[-1]} eigenpairs "
                    f"but n_fmap={k}; precompute with k_eig >= n_fmap")

        def trans(s):
            # (K, V) mass-weighted transposed eigenvectors
            # (reference fmaps_model.py:79: evecs^T @ diag(mass))
            return s["evecs"][..., :, :k].swapaxes(-1, -2) * s["mass"][..., None, :]

        C = compute_fmap(feat_x, feat_y,
                         shape_x["evals"][..., :k], shape_y["evals"][..., :k],
                         trans(shape_x), trans(shape_y),
                         lambda_param=self.lambda_param)
        return C, feat_x, feat_y
