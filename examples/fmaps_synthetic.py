"""Synthetic functional-correspondence demo (the E4 pipeline without dataset
downloads): train the FunctionalMapCorrespondence model (shared-weights
DiffusionNet features + regularized fmap solver) on pairs of jittered
ASYMMETRIC bumpy spheres (a perfect sphere has degenerate eigenspaces, which
makes the ground-truth functional map gauge-ambiguous and the task ill-posed)
with identity ground-truth correspondence, then evaluate the induced
vertex-to-vertex map exactly as the reference does (kNN in the spectrally
aligned embedding, reference functional_correspondence.py:181-204).

Usage: python examples/fmaps_synthetic.py [--n_epoch 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import optax

from tests.meshgen import icosphere  # noqa: E402
import diffusionnet_tpu as dnt  # noqa: E402
from diffusionnet_tpu.data.features import get_features  # noqa: E402
from diffusionnet_tpu.geometry import compute_operators, pad_operators, grad_operators  # noqa: E402
from diffusionnet_tpu.models.fmaps import FunctionalMapCorrespondence  # noqa: E402


def bumpy(v):
    """Fixed asymmetric radial deformation: breaks the sphere's eigenspace
    degeneracies so the ground-truth functional map is well defined."""
    u = v / np.linalg.norm(v, axis=-1, keepdims=True)
    r = (1.0 + 0.25 * np.sin(3 * u[:, 0] + 1.0) * np.cos(2 * u[:, 1])
         + 0.15 * u[:, 2] ** 3)
    return u * r[:, None]


def build_shapes(n=8, seed=0, k_eig=32):
    rs = np.random.RandomState(seed)
    shapes = []
    for i in range(n):
        v, f = icosphere(subdivisions=2)
        v = bumpy(v) * (1.0 + 0.02 * rs.randn(*v.shape))
        v = dnt.utils.normalize_positions_np(v, faces=f, scale_method="area")
        ops = compute_operators(v, f, k_eig=k_eig)
        shapes.append((v.astype(np.float32), f, ops))
    return shapes


def shape_dict(v, ops, v_pad, k_eig, input_features="hks"):
    ops = pad_operators(ops, v_pad, k_eig)
    gX, gY = grad_operators(ops)
    jo = jax.tree.map(jnp.asarray, ops)
    x = jnp.asarray(dnt.utils.pad_to(v, v_pad))
    feats = get_features(input_features, x, jo.evals, jo.evecs)
    return dict(features=feats, mass=jo.mass, L=jo.L, evals=jo.evals,
                evecs=jo.evecs, gradX=jnp.asarray(gX), gradY=jnp.asarray(gY))


def gt_fmap(ops1, ops2, n_fmap):
    """Identity correspondence: lstsq alignment of the full eigenbases."""
    e1 = ops1.evecs[:, :n_fmap].astype(np.float64)
    e2 = ops2.evecs[:, :n_fmap].astype(np.float64)
    sol, *_ = np.linalg.lstsq(e1, e2, rcond=None)
    return sol.T.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_epoch", type=int, default=4)
    args = ap.parse_args()

    n_fmap, k_eig, n_feat = 12, 32, 32
    shapes = build_shapes(n=6, k_eig=k_eig)
    v_pad = 256

    model = FunctionalMapCorrespondence(c_in=16, c_out=n_feat, c_width=n_feat,
                                        n_block=2, n_fmap=n_fmap)
    dicts = [shape_dict(v, ops, v_pad, k_eig) for v, f, ops in shapes]

    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, dicts[0], dicts[1])
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, s1, s2, C_gt, rng):
        def loss_fn(p):
            C_pred, _, _ = model.apply(p, s1, s2, deterministic=False,
                                       rngs={"dropout": rng})
            return jnp.mean((C_pred - C_gt) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    from itertools import permutations
    pairs = list(permutations(range(4), 2))  # train on shapes 0-3
    print(f"training on {len(pairs)} pairs x {args.n_epoch} epochs")
    for epoch in range(args.n_epoch):
        losses = []
        for i, j in pairs:
            rng, r = jax.random.split(rng)
            C_gt = jnp.asarray(gt_fmap(shapes[i][2], shapes[j][2], n_fmap))
            params, opt_state, loss = train_step(params, opt_state,
                                                 dicts[i], dicts[j], C_gt, r)
            losses.append(float(loss))
        print(f"epoch {epoch}: train fmap L2 {np.mean(losses):.4e}")

    # --- test on held-out pair (6, 7): induced vertex map accuracy
    i, j = 4, 5
    C_gt = jnp.asarray(gt_fmap(shapes[i][2], shapes[j][2], n_fmap))
    C_pred, _, _ = model.apply(params, dicts[i], dicts[j])
    test_loss = float(jnp.mean((C_pred - C_gt) ** 2))

    evec1 = shapes[i][2].evecs[:, :n_fmap]
    evec2 = shapes[j][2].evecs[:, :n_fmap]
    evec1_on_2 = evec1 @ np.asarray(C_pred).T
    _, pred_2to1 = dnt.geometry.find_knn_host(evec2, evec1_on_2, k=1)
    pred_2to1 = pred_2to1[:, 0]
    # identity correspondence on the sphere: angular error of the map
    # identity correspondence: compare directions on the underlying sphere
    u1 = shapes[i][0] / np.linalg.norm(shapes[i][0], axis=1, keepdims=True)
    u2 = shapes[j][0] / np.linalg.norm(shapes[j][0], axis=1, keepdims=True)
    ang = np.degrees(np.arccos(np.clip(
        np.sum(u1 * u2[pred_2to1], axis=-1), -1, 1)))
    print(f"held-out pair: fmap L2 {test_loss:.4e}, "
          f"vertex-map mean angular err {ang.mean():.2f} deg "
          f"(exact matches {100 * (pred_2to1 == np.arange(len(u2))).mean():.1f}%)")


if __name__ == "__main__":
    main()
