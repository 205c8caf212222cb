"""Input feature construction ('xyz' raw positions or 'hks' heat kernel
signatures) — the two feature types every reference driver exposes via
--input_features (e.g. reference classification_shrec11.py:17,137-140).

HKS uses the 16-scale autoscale variant exactly as the reference
(geometry.py:630-633 via classification_shrec11.py:140); xyz passes the
(possibly rotation-augmented) vertex positions straight through.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.spectral import compute_hks_autoscale

# channel count per feature type: drives DiffusionNet c_in in every driver
# (reference C_in=3 for xyz, C_in=16 for hks, e.g. human_segmentation_original.py:69-75)
FEATURE_DIMS = {"xyz": 3, "hks": 16}


def get_features(kind: str, verts, evals, evecs):
    """Build network input features.

    kind: 'xyz' | 'hks'; verts: (..., V, 3); evals: (..., K); evecs: (..., V, K).
    Returns (..., V, FEATURE_DIMS[kind]). Broadcasts over leading batch dims —
    padding rows of evecs are zero so padded HKS rows are exactly zero.
    """
    if kind == "xyz":
        return jnp.asarray(verts)
    if kind == "hks":
        return compute_hks_autoscale(jnp.asarray(evals), jnp.asarray(evecs),
                                     count=FEATURE_DIMS["hks"])
    raise ValueError(f"unrecognized input feature type '{kind}' "
                     "(expected 'xyz' or 'hks')")
