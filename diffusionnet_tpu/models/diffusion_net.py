"""DiffusionNet in Flax — the TPU-native re-design of reference layers.py.

Key departures from the reference (all TPU-motivated):
  * gradX/gradY are ELL operators; applying them is one batched gather+contraction
    (ops/sparse.ell_matvec) instead of a per-batch-element torch.mm loop
    (reference layers.py:216-223);
  * the in-place diffusion-time clamp (layers.py:48-49) becomes a straight-through
    projection (value clamped, identity gradient) — functionally equivalent to
    clamping parameter data outside autograd, but pure;
  * everything is static-shape and padding-aware: padded vertices carry mass == 0,
    so to_basis projections, gradients (zero ELL rows) and the mass-weighted
    global_mean (layers.py:393-397) ignore them exactly;
  * dropout is explicit-deterministic (Flax), not global train mode.

The constructor surface matches reference layers.py:246-288 one-for-one.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.sparse import Ell, ell_matvec, ell_to_dense
from ..ops.spectral import to_basis, from_basis


class LearnedTimeDiffusion(nn.Module):
    """Per-channel learned diffusion time (reference layers.py:17-90).

    method='spectral': diffuse in the truncated eigenbasis.
    method='implicit_dense': exact one-step backward Euler via dense Cholesky
    (usable with k_eig=0; O(V^3), intended for small padded buckets).
    """
    c_inout: int
    method: str = "spectral"
    compute_dtype: Optional[Any] = None

    def setup(self):
        self.diffusion_time = self.param(
            "diffusion_time", nn.initializers.zeros, (self.c_inout,))

    def _time(self):
        t = self.diffusion_time
        # positive projection with identity gradient (see module docstring)
        return t + jax.lax.stop_gradient(jnp.maximum(t, 1e-8) - t)

    def coefs(self, evals):
        """Per-channel diffusion coefficients exp(-evals t): (..., K, C)."""
        return jnp.exp(-evals[..., :, None] * self._time())

    def __call__(self, x, L, mass, evals, evecs, return_spectral: bool = False):
        if return_spectral and self.method != "spectral":
            raise ValueError("return_spectral requires method='spectral'")
        if x.shape[-1] != self.c_inout:
            raise ValueError(
                f"Tensor has wrong shape = {x.shape}. Last dim shape should have "
                f"number of channels = {self.c_inout}")

        t = self._time()

        if self.method == "spectral":
            x_spec = to_basis(x, evecs, mass,
                              compute_dtype=self.compute_dtype)   # (..., K, C)
            x_diffuse_spec = self.coefs(evals) * x_spec
            x_diffuse = from_basis(x_diffuse_spec, evecs,
                                   compute_dtype=self.compute_dtype)
            if return_spectral:
                return x_diffuse, x_diffuse_spec

        elif self.method == "implicit_dense":
            V = x.shape[-2]
            if isinstance(L, Ell):
                if L.idx.ndim == 2:
                    L_dense = ell_to_dense(L)
                else:
                    L_dense = jax.vmap(ell_to_dense)(L)
            else:
                L_dense = L
            # padded rows (mass == 0) get identity rows so the system stays SPD
            mask = mass > 0
            mass_eff = jnp.where(mask, mass, 1.0)
            # (..., C, V, V) = t_c * L + diag(mass)
            mat = (t[:, None, None] * L_dense[..., None, :, :]
                   + jnp.eye(V, dtype=x.dtype) * mass_eff[..., None, :, None])
            chol = jnp.linalg.cholesky(mat)
            rhs = (x * mass[..., None])                           # (..., V, C)
            rhsT = jnp.swapaxes(rhs, -1, -2)[..., None]           # (..., C, V, 1)
            sols = jax.scipy.linalg.cho_solve((chol, True), rhsT)
            x_diffuse = jnp.swapaxes(sols[..., 0], -1, -2)        # (..., V, C)
        else:
            raise ValueError("unrecognized method")

        return x_diffuse


class SpatialGradientFeatures(nn.Module):
    """Inner products between tangent gradients through a learned complex-linear
    map (reference layers.py:93-130). Input (..., V, C, 2) -> (..., V, C)."""
    c_inout: int
    with_gradient_rotations: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, vectors):
        vX = vectors[..., 0]
        vY = vectors[..., 1]

        if self.with_gradient_rotations:
            A_re = nn.Dense(self.c_inout, use_bias=False, dtype=self.dtype,
                            name="A_re")
            A_im = nn.Dense(self.c_inout, use_bias=False, dtype=self.dtype,
                            name="A_im")
            vBreal = A_re(vX) - A_im(vY)
            vBimag = A_re(vY) + A_im(vX)
        else:
            A = nn.Dense(self.c_inout, use_bias=False, dtype=self.dtype,
                         name="A")
            vBreal = A(vX)
            vBimag = A(vY)

        dots = vX * vBreal + vY * vBimag
        return jnp.tanh(dots)


class MiniMLP(nn.Module):
    """Dense+ReLU stack with optional Dropout(0.5) before every layer except the
    first; no activation after the last layer (reference layers.py:133-164)."""
    layer_sizes: Sequence[int]
    dropout: bool = False
    dtype: Optional[Any] = None  # activation/compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n = len(self.layer_sizes) - 1
        for i in range(n):
            is_last = (i + 2 == len(self.layer_sizes))
            if self.dropout and i > 0:
                x = nn.Dropout(rate=0.5, deterministic=deterministic)(x)
            x = nn.Dense(self.layer_sizes[i + 1], dtype=self.dtype,
                         name=f"dense_{i:03d}")(x)
            if not is_last:
                x = jax.nn.relu(x)
        return x


class DiffusionNetBlock(nn.Module):
    """diffusion -> tangent gradients -> gradient features -> MLP -> residual
    (reference layers.py:167-241).

    Two gradient paths:
      * gradX/gradY given as Ell: batched ELL gather/SpMM (general; required for
        implicit_dense diffusion).
      * gradX/gradY given as dense (V, K) *spectral gradient operators*
        (Operators.gradX_spec): gradients of the diffused signal are computed as
        GX @ (e^{-lambda t} (.) x_hat) — an exact reassociation that turns the
        whole block into dense MXU matmuls with no gathers (see
        geometry.operators.spectral_gradients).
    """
    c_width: int
    mlp_hidden_dims: Sequence[int]
    dropout: bool = True
    diffusion_method: str = "spectral"
    with_gradient_features: bool = True
    with_gradient_rotations: bool = True
    compute_dtype: Optional[Any] = None
    use_pallas_fused: bool = False
    pallas_tile_v: int = 1024

    @nn.compact
    def __call__(self, x_in, mass, L, evals, evecs, gradX, gradY,
                 deterministic: bool = True):
        if x_in.shape[-1] != self.c_width:
            raise ValueError(
                f"Tensor has wrong shape = {x_in.shape}. Last dim shape should "
                f"have number of channels = {self.c_width}")

        spectral_grads = (self.with_gradient_features
                          and gradX is not None and not isinstance(gradX, Ell))
        if spectral_grads and self.diffusion_method != "spectral":
            raise ValueError(
                "dense spectral gradient operators require "
                "diffusion_method='spectral'; pass Ell gradX/gradY instead")

        diffusion = LearnedTimeDiffusion(
            self.c_width, method=self.diffusion_method,
            compute_dtype=self.compute_dtype, name="diffusion")

        V = x_in.shape[-2]
        fused = (spectral_grads and self.use_pallas_fused
                 and V % self.pallas_tile_v == 0)
        if fused:
            from ..ops.pallas_fused import (
                fused_spectral_block, fused_spectral_block_batched)
            coefs = diffusion.coefs(evals)
            # interpret mode on CPU (tests / accelerator-less machines):
            # same kernel code, executed by XLA:CPU
            dd = jax.config.jax_default_device
            interp = (dd.platform == "cpu" if dd is not None
                      else jax.default_backend() == "cpu")
            if x_in.ndim == 3:
                x_diffuse, x_gradX, x_gradY = fused_spectral_block_batched(
                    x_in, evecs, gradX, gradY, mass, coefs,
                    self.pallas_tile_v, interp)
            else:
                x_diffuse, x_gradX, x_gradY = fused_spectral_block(
                    x_in, evecs, gradX, gradY, mass, coefs,
                    self.pallas_tile_v, interp)
        elif spectral_grads:
            x_diffuse, x_diffuse_spec = diffusion(
                x_in, L, mass, evals, evecs, return_spectral=True)
        else:
            x_diffuse = diffusion(x_in, L, mass, evals, evecs)

        if self.with_gradient_features:
            if fused:
                pass  # x_gradX / x_gradY already computed by the fused kernel
            elif spectral_grads:
                # (..., V, K) @ (..., K, C): dense MXU matmuls, matmul backward
                gX, gY, s_spec = gradX, gradY, x_diffuse_spec
                if self.compute_dtype is not None:
                    gX = gX.astype(self.compute_dtype)
                    gY = gY.astype(self.compute_dtype)
                    s_spec = s_spec.astype(self.compute_dtype)
                # f32 accumulation over K regardless of operand dtype (the
                # module's mixed-precision contract, like to_basis/from_basis)
                x_gradX = jnp.einsum(
                    "...vk,...kc->...vc", gX, s_spec,
                    preferred_element_type=jnp.float32).astype(x_in.dtype)
                x_gradY = jnp.einsum(
                    "...vk,...kc->...vc", gY, s_spec,
                    preferred_element_type=jnp.float32).astype(x_in.dtype)
            else:
                x_gradX = ell_matvec(gradX, x_diffuse)
                x_gradY = ell_matvec(gradY, x_diffuse)
            x_grad = jnp.stack((x_gradX, x_gradY), axis=-1)  # (..., V, C, 2)

            x_grad_features = SpatialGradientFeatures(
                self.c_width,
                with_gradient_rotations=self.with_gradient_rotations,
                dtype=self.compute_dtype,
                name="gradient_features")(x_grad)

            feature_combined = jnp.concatenate(
                (x_in, x_diffuse, x_grad_features), axis=-1)
        else:
            feature_combined = jnp.concatenate((x_in, x_diffuse), axis=-1)

        mlp_c = feature_combined.shape[-1]
        x0_out = MiniMLP(
            (mlp_c, *self.mlp_hidden_dims, self.c_width),
            dropout=self.dropout, dtype=self.compute_dtype,
            name="mlp")(feature_combined, deterministic=deterministic)
        return (x0_out + x_in).astype(x_in.dtype)


def _gather_mean(x, inds):
    """x: (..., V, C); inds: (..., E, m) -> mean over the m gathered vertices
    (the edges/faces output remap, reference layers.py:379-391)."""
    m = inds.shape[-1]
    parts = [jnp.take_along_axis(x, inds[..., i][..., None], axis=-2)
             for i in range(m)]
    return sum(parts) / m


class DiffusionNet(nn.Module):
    """Top-level model (reference layers.py:244-407), same constructor surface.

    __call__(x_in, mass, L=None, evals=None, evecs=None, gradX=None, gradY=None,
             edges=None, faces=None, deterministic=True)
    x_in: (V, C_in) or (B, V, C_in); operators batched to match. gradX/gradY/L are
    ELL operators (ops.sparse.Ell).
    """
    c_in: int
    c_out: int
    c_width: int = 128
    n_block: int = 4
    last_activation: Optional[Callable[[Any], Any]] = None
    outputs_at: str = "vertices"
    mlp_hidden_dims: Optional[Sequence[int]] = None
    dropout: bool = True
    with_gradient_features: bool = True
    with_gradient_rotations: bool = True
    diffusion_method: str = "spectral"
    compute_dtype: Optional[Any] = None  # e.g. jnp.bfloat16: cast the big
    # (V,K)x(K,C) matmul operands for MXU speed; accumulation stays float32
    use_pallas_fused: bool = False  # fused Pallas spectral-block kernel
    pallas_tile_v: int = 1024
    remat_blocks: bool = False  # rematerialize blocks in the backward pass:
    # trades recompute FLOPs for saved-activation HBM traffic (helps when
    # training is bandwidth-bound at large V)

    def setup(self):
        if self.outputs_at not in ("vertices", "edges", "faces", "global_mean"):
            raise ValueError("invalid setting for outputs_at")
        if self.diffusion_method not in ("spectral", "implicit_dense"):
            raise ValueError("invalid setting for diffusion_method")

        hidden = (self.mlp_hidden_dims if self.mlp_hidden_dims is not None
                  else [self.c_width, self.c_width])
        self.first_lin = nn.Dense(self.c_width, dtype=self.compute_dtype,
                                  name="first_lin")
        self.last_lin = nn.Dense(self.c_out, dtype=self.compute_dtype,
                                 name="last_lin")
        # flax's remat counts `self` at index 0 and applies static_argnums to
        # POSITIONAL args only — `deterministic` is therefore passed
        # positionally below and marked static as index 8 (self, x, mass, L,
        # evals, evecs, gradX, gradY, deterministic)
        block_cls = (nn.remat(DiffusionNetBlock, static_argnums=(8,))
                     if self.remat_blocks else DiffusionNetBlock)
        self.blocks = [
            block_cls(
                c_width=self.c_width,
                mlp_hidden_dims=tuple(hidden),
                dropout=self.dropout,
                diffusion_method=self.diffusion_method,
                with_gradient_features=self.with_gradient_features,
                with_gradient_rotations=self.with_gradient_rotations,
                compute_dtype=self.compute_dtype,
                use_pallas_fused=self.use_pallas_fused,
                pallas_tile_v=self.pallas_tile_v,
                name=f"block_{i}")
            for i in range(self.n_block)
        ]

    def __call__(self, x_in, mass, L=None, evals=None, evecs=None, gradX=None,
                 gradY=None, edges=None, faces=None, deterministic: bool = True):
        if x_in.shape[-1] != self.c_in:
            raise ValueError(
                f"DiffusionNet was constructed with C_in={self.c_in}, but x_in "
                f"has last dim={x_in.shape[-1]}")

        appended_batch_dim = False
        if x_in.ndim == 2:
            appended_batch_dim = True
            expand = lambda a: None if a is None else jax.tree.map(
                lambda t: t[None, ...], a)
            x_in, mass = x_in[None], mass[None]
            L, evals, evecs = expand(L), expand(evals), expand(evecs)
            gradX, gradY = expand(gradX), expand(gradY)
            edges, faces = expand(edges), expand(faces)
        elif x_in.ndim != 3:
            raise ValueError("x_in should be tensor with shape [N,C] or [B,N,C]")

        x = self.first_lin(x_in)
        for block in self.blocks:
            # deterministic passed POSITIONALLY: remat's static_argnums only
            # covers positional arguments (see setup)
            x = block(x, mass, L, evals, evecs, gradX, gradY, deterministic)
        x = self.last_lin(x)

        if self.outputs_at == "vertices":
            x_out = x
        elif self.outputs_at == "edges":
            x_out = _gather_mean(x, edges)
        elif self.outputs_at == "faces":
            x_out = _gather_mean(x, faces)
        else:  # global_mean — mass-weighted, discretization- and padding-invariant
            x_out = (jnp.sum(x * mass[..., None], axis=-2)
                     / jnp.sum(mass, axis=-1, keepdims=True))

        if self.last_activation is not None:
            x_out = self.last_activation(x_out)

        if appended_batch_dim:
            x_out = jax.tree.map(lambda t: t[0], x_out)
        return x_out
