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


def save_checkpoint(ckpt_dir: str, state: Any, step: int | None = None) -> str:
    """Save a pytree checkpoint. Uses Orbax when importable; without Orbax it
    falls back to a flat .npz of leaves (structure re-derived on restore from
    a template). A FAILED Orbax save is an error, not a silent downgrade —
    swallowing it would leave an order-dependent .npz that only surfaces as a
    problem at restore time."""
    os.makedirs(ckpt_dir, exist_ok=True)
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        leaves, _ = jax.tree.flatten(_to_host(state))
        path = os.path.join(ckpt_dir,
                            f"step_{step if step is not None else 0}.npz")
        np.savez(path, *leaves)
        return path
    path = os.path.join(os.path.abspath(ckpt_dir),
                        f"step_{step if step is not None else 0}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_host(state), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a checkpoint saved by save_checkpoint into `template`'s
    structure. A params-only template also accepts a full-train-state
    checkpoint ({params, opt_state, epoch, rng}) — the params subtree is
    extracted, so `--evaluate --load_model` works on training checkpoints."""
    if path.endswith(".npz"):
        npz = np.load(path, allow_pickle=True)
        leaves = [npz[k] for k in npz.files]
        treedef = jax.tree.structure(template)
        return jax.tree.unflatten(treedef, leaves)
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
    """Path of the highest-step checkpoint under ckpt_dir (step_N dirs or
    step_N.npz files), or None."""
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
            best_path = os.path.join(ckpt_dir, name)
    return best_path
