"""High-level inference session: mesh in, predictions out.

The reference has no inference API beyond hand-assembled experiment code. This
wraps the full pipeline — operator precompute (cached), bucket padding, feature
construction, jitted forward — behind one object. Compilation happens once per
(bucket, k_eig) signature.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import utils
from ..data.features import get_features
from ..geometry import get_operators, grad_operators, pad_operators


class InferenceSession:
    """session = InferenceSession(model, params, k_eig=128, input_features='hks')
    preds = session(verts, faces)          # numpy in, numpy out
    """

    def __init__(self, model, params, k_eig: int = 128,
                 input_features: str = "hks",
                 op_cache_dir: str | None = None,
                 buckets=utils.DEFAULT_BUCKETS,
                 use_megakernel: bool = False,
                 bf16: bool = False):
        """use_megakernel: whole-block Pallas fast path (TPU; falls back to
        interpret mode on CPU). bf16: cast the big operand streams to bf16 —
        single-mesh inference is bandwidth-bound, ~1.8x at 200k vertices."""
        if model.outputs_at == "edges":
            raise ValueError(
                "InferenceSession does not support outputs_at='edges' (it "
                "has no edge list input); use model.apply directly with an "
                "edges array")
        self.model = model
        self.params = params
        self.k_eig = k_eig
        self.input_features = input_features
        self.op_cache_dir = op_cache_dir
        self.buckets = buckets
        self.use_megakernel = use_megakernel
        self.bf16 = bf16
        self._compiled: dict[int, Callable] = {}

    def _fn_for_bucket(self, v_pad: int):
        if v_pad not in self._compiled:
            if self.use_megakernel:
                from ..models.fast_path import megablock_apply
                m = self.model
                if (m.diffusion_method != "spectral"
                        or not m.with_gradient_features):
                    raise ValueError("use_megakernel needs spectral diffusion "
                                     "with gradient features")
                dd = jax.config.jax_default_device
                interpret = (dd.platform == "cpu" if dd is not None
                             else jax.default_backend() == "cpu")
                tile = next((t for t in (2048, 1024, 512, 256, 128)
                             if v_pad % t == 0), None)
                if tile is None:
                    raise ValueError(
                        f"megakernel needs the vertex bucket ({v_pad}) to be "
                        "a multiple of 128; adjust `buckets`")

                @jax.jit
                def fwd(params, feats, mass, evals, evecs, gX, gY, faces):
                    out = megablock_apply(
                        params, feats[None], mass[None], evals[None],
                        evecs[None], gX[None], gY[None],
                        n_block=m.n_block, tile_v=tile,
                        interpret=interpret)[0].astype(jnp.float32)
                    # outputs_at remap BEFORE last_activation (reference
                    # layers.py:376-405 order)
                    if m.outputs_at == "global_mean":
                        out = (jnp.sum(out * mass[:, None], axis=0)
                               / jnp.sum(mass))
                    elif m.outputs_at == "faces":
                        out = sum(out[faces[:, i]] for i in range(3)) / 3.0
                    if m.last_activation is not None:
                        out = m.last_activation(out)
                    return out
            else:
                @jax.jit
                def fwd(params, feats, mass, L, evals, evecs, gX, gY, faces):
                    kwargs = {}
                    if self.model.outputs_at == "faces":
                        kwargs["faces"] = faces
                    return self.model.apply(params, feats, mass, L=L,
                                            evals=evals, evecs=evecs,
                                            gradX=gX, gradY=gY,
                                            deterministic=True, **kwargs)
            self._compiled[v_pad] = fwd
        return self._compiled[v_pad]

    def __call__(self, verts, faces=None, normals=None):
        verts = np.asarray(verts, dtype=np.float32)
        V = verts.shape[0]
        ops = get_operators(verts, faces, k_eig=self.k_eig,
                            op_cache_dir=self.op_cache_dir, normals=normals)
        v_pad = utils.bucket_size(V, self.buckets)
        ops = pad_operators(ops, v_pad)
        # implicit_dense diffusion solves against L and applies the ELL
        # gradient operators; the dense spectral operators are only valid
        # for diffusion_method='spectral'
        spectral = self.model.diffusion_method == "spectral"
        gX, gY = grad_operators(ops, prefer_spectral=spectral)

        x = jnp.asarray(utils.pad_to(verts, v_pad))
        je = jax.tree.map(jnp.asarray, ops)
        feats = get_features(self.input_features, x, je.evals, je.evecs)
        # gX/gY are dense (V,K) arrays for spectral models, Ell bundles for
        # implicit_dense — both are pytrees of arrays
        evecs = je.evecs
        gX = jax.tree.map(jnp.asarray, gX)
        gY = jax.tree.map(jnp.asarray, gY)
        if self.bf16 and self.use_megakernel:
            feats = feats.astype(jnp.bfloat16)
            evecs = evecs.astype(jnp.bfloat16)
            gX, gY = gX.astype(jnp.bfloat16), gY.astype(jnp.bfloat16)

        faces_arr = (jnp.asarray(np.asarray(faces, np.int32))
                     if faces is not None and np.asarray(faces).size
                     else jnp.zeros((1, 3), jnp.int32))
        if self.use_megakernel:
            out = self._fn_for_bucket(v_pad)(
                self.params, feats, je.mass, je.evals, evecs, gX, gY,
                faces_arr)
        else:
            out = self._fn_for_bucket(v_pad)(
                self.params, feats, je.mass, je.L, je.evals, evecs, gX, gY,
                faces_arr)
        out = np.asarray(out)
        if self.model.outputs_at == "vertices":
            return out[:V]
        return out  # faces/global outputs are already unpadded-or-global
