"""Position normalization — pure jnp (reference geometry.py:635-665)."""

from __future__ import annotations

import jax.numpy as jnp

from .vector import cross, norm


def normalize_positions(pos, faces=None, method: str = "mean",
                        scale_method: str = "max_rad"):
    """Center and unit-scale positions.

    method: 'mean' (centroid) or 'bbox' (AABB center).
    scale_method: 'max_rad' (divide by max radius) or 'area' (scale by
    1/sqrt(total face area); requires faces). Matches reference geometry.py:635-665.
    Broadcasts over leading batch dims for 'mean'/'max_rad'.
    """
    if method == "mean":
        pos = pos - jnp.mean(pos, axis=-2, keepdims=True)
    elif method == "bbox":
        bbox_min = jnp.min(pos, axis=-2)
        bbox_max = jnp.max(pos, axis=-2)
        center = (bbox_max + bbox_min) / 2.0
        pos = pos - center[..., None, :]
    else:
        raise ValueError("unrecognized method")

    if scale_method == "max_rad":
        scale = jnp.max(norm(pos), axis=-1, keepdims=True)[..., None]
        pos = pos / scale
    elif scale_method == "area":
        if faces is None:
            raise ValueError("must pass faces for area normalization")
        coords = pos[faces]
        vec_A = coords[:, 1, :] - coords[:, 0, :]
        vec_B = coords[:, 2, :] - coords[:, 0, :]
        face_areas = jnp.linalg.norm(cross(vec_A, vec_B), axis=1) * 0.5
        total_area = jnp.sum(face_areas)
        pos = pos * (1.0 / jnp.sqrt(total_area))
    else:
        raise ValueError("unrecognized scale method")
    return pos
