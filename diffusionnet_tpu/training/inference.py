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
                 buckets=utils.DEFAULT_BUCKETS):
        self.model = model
        self.params = params
        self.k_eig = k_eig
        self.input_features = input_features
        self.op_cache_dir = op_cache_dir
        self.buckets = buckets
        self._compiled: dict[int, Callable] = {}

    def _fn_for_bucket(self, v_pad: int):
        if v_pad not in self._compiled:
            @jax.jit
            def fwd(params, feats, mass, evals, evecs, gX, gY, faces):
                kwargs = {}
                if self.model.outputs_at == "faces":
                    kwargs["faces"] = faces
                return self.model.apply(params, feats, mass, evals=evals,
                                        evecs=evecs, gradX=gX, gradY=gY,
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
        gX, gY = grad_operators(ops)

        x = jnp.asarray(utils.pad_to(verts, v_pad))
        je = jax.tree.map(jnp.asarray, ops)
        feats = get_features(self.input_features, x, je.evals, je.evecs)

        faces_arr = (jnp.asarray(np.asarray(faces, np.int32))
                     if faces is not None and np.asarray(faces).size
                     else jnp.zeros((1, 3), jnp.int32))
        out = self._fn_for_bucket(v_pad)(
            self.params, feats, je.mass, je.evals, je.evecs,
            jnp.asarray(gX), jnp.asarray(gY), faces_arr)
        out = np.asarray(out)
        if self.model.outputs_at == "vertices":
            return out[:V]
        return out  # faces/global outputs are already unpadded-or-global
