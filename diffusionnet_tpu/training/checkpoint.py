"""Checkpointing with optimizer state and step counter (Orbax).

The reference saves only a final model state_dict with torch.save (e.g.
human_segmentation_original.py:209) — no optimizer state, no resume. Here:
full-train-state checkpoints, restorable mid-run.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def _path_keys(tree):
    """Stable string key per leaf, derived from the pytree path — the npz
    fallback stores these so a restore can match leaves by NAME (enabling
    params-only templates against full-state checkpoints), not by position."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [jax.tree_util.keystr(kp) for kp, _ in flat], [v for _, v in flat]


def save_checkpoint(ckpt_dir: str, state: Any, step: int | None = None) -> str:
    """Save a pytree checkpoint. Uses Orbax when importable; without Orbax it
    falls back to a .npz keyed by pytree path. A FAILED Orbax save is an
    error, not a silent downgrade — swallowing it would leave an .npz that
    only surfaces as a problem at restore time."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        keys, leaves = _path_keys(_to_host(state))
        path = os.path.join(ckpt_dir,
                            f"step_{step if step is not None else 0}.npz")
        np.savez(path, **dict(zip(keys, leaves)))
        return path
    path = os.path.join(ckpt_dir, f"step_{step if step is not None else 0}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_host(state), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a checkpoint saved by save_checkpoint into `template`'s
    structure. A params-only template also accepts a full-train-state
    checkpoint ({params, opt_state, epoch, rng}) — the params subtree is
    extracted, so `--evaluate --load_model` works on training checkpoints.
    Relative paths are accepted (absolutized here; Orbax requires absolute)."""
    path = os.path.abspath(path)
    if path.endswith(".npz"):
        npz = np.load(path, allow_pickle=True)
        keys, _ = _path_keys(template)
        if all(k in npz.files for k in keys):
            return jax.tree.unflatten(jax.tree.structure(template),
                                      [npz[k] for k in keys])
        # params-only template vs a full-state npz: leaves live under a
        # "['params']..." prefix
        pref = [f"['params']{k}" for k in keys]
        if all(k in npz.files for k in pref):
            return jax.tree.unflatten(jax.tree.structure(template),
                                      [npz[k] for k in pref])
        # legacy flat (positional) format: only valid for an exact-structure
        # template
        if all(k.startswith("arr_") for k in npz.files):
            leaves = [npz[k] for k in npz.files]
            treedef = jax.tree.structure(template)
            if treedef.num_leaves != len(leaves):
                raise ValueError(
                    f"legacy positional checkpoint '{path}' has "
                    f"{len(leaves)} leaves but the template expects "
                    f"{treedef.num_leaves}; re-save with this version or "
                    "pass the full-train-state template")
            return jax.tree.unflatten(treedef, leaves)
        raise ValueError(
            f"checkpoint '{path}' does not contain the template's leaves "
            f"(have {sorted(npz.files)[:4]}..., want {keys[:4]}...)")
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(path, target=_to_host(template))
    except Exception:
        raw = ckptr.restore(path)
        if (isinstance(raw, dict) and "opt_state" in raw and "params" in raw
                and not (isinstance(template, dict) and "opt_state" in template)):
            return raw["params"]
        raise


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """Absolute path of the highest-step checkpoint under ckpt_dir (step_N
    dirs or step_N.npz files), or None."""
    best_step, best_path = -1, None
    if not os.path.isdir(ckpt_dir):
        return None
    for name in os.listdir(ckpt_dir):
        stem = name[:-4] if name.endswith(".npz") else name
        if not stem.startswith("step_"):
            continue
        try:
            step = int(stem[len("step_"):])
        except ValueError:
            continue
        if step > best_step:
            best_step = step
            best_path = os.path.join(os.path.abspath(ckpt_dir), name)
    return best_path
