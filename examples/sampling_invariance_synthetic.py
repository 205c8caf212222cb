"""Synthetic sampling-invariance check (the DiffusionNet headline property,
reference experiments/sampling_invariance): train template-vertex
correspondence on ONE discretization of a shape family, evaluate on DIFFERENT
discretizations — a finer remeshing and a raw point cloud — without retraining.

Template: a fixed asymmetric "bumpy sphere" (icosphere sub-2, 162 vertices;
labels = vertex ids). A perfect sphere is rotationally symmetric — every vertex
is equivalent, so the task would be ill-posed; the fixed bump pattern breaks the
symmetry. Features are xyz, matching the reference E5 default
(sampling_invariance.py:21).
Train split: jittered bumpy sub-2 spheres.
Test mutations: {orig: sub-2, dense: sub-3 (642 v), cloud: sub-3 points}.
Metric: mean angular (great-circle) error between the predicted template vertex
and the true nearest template vertex — the analogue of the reference's
per-mutation geodesic error table (sampling_invariance.py:212-225).

Usage: python examples/sampling_invariance_synthetic.py [--n_epoch 30]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "experiments")))

import jax
import jax.numpy as jnp

from tests.meshgen import icosphere  # noqa: E402
from diffusionnet_tpu.data import SurfaceDataset, make_padded_batches  # noqa: E402
from diffusionnet_tpu.data.features import get_features  # noqa: E402
from exp_common import FitConfig, build_model, fit  # noqa: E402


def unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def bumpy(v):
    """Fixed asymmetric radial deformation (same for every sample)."""
    u = unit(v)
    r = (1.0 + 0.25 * np.sin(3 * u[:, 0] + 1.0) * np.cos(2 * u[:, 1])
         + 0.15 * u[:, 2] ** 3)
    return u * r[:, None]


def nearest_template_labels(verts, template):
    """True labels for any discretization: nearest template vertex (by the
    underlying sphere parametrization)."""
    cos = unit(verts) @ unit(template).T
    return np.argmax(cos, axis=1).astype(np.int32)


def build_sets(n_train=12, seed=0):
    rs = np.random.RandomState(seed)
    template, _ = icosphere(subdivisions=2)

    train = SurfaceDataset(labels_kind="vertex")
    for i in range(n_train):
        v, f = icosphere(subdivisions=2)
        v = bumpy(v) * (1.0 + 0.02 * rs.randn(*v.shape))
        train.add(v, f, np.arange(v.shape[0], dtype=np.int32))
    train.precompute(k_eig=32, verbose=False)

    muts = {}
    v, f = icosphere(subdivisions=2)
    muts["orig"] = (bumpy(v) * (1.0 + 0.02 * rs.randn(*v.shape)), f)
    v, f = icosphere(subdivisions=3)             # finer remeshing, 642 verts
    muts["dense"] = (bumpy(v) * (1.0 + 0.02 * rs.randn(*v.shape)), f)
    v, _ = icosphere(subdivisions=3)
    muts["cloud"] = (bumpy(v) * (1.0 + 0.02 * rs.randn(*v.shape)), None)

    tests = {}
    for name, (v, f) in muts.items():
        ds = SurfaceDataset(labels_kind="vertex")
        ds.add(v, f, nearest_template_labels(v, template))
        ds.precompute(k_eig=32, verbose=False)
        tests[name] = ds
    return template, train, tests


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_epoch", type=int, default=30)
    args = ap.parse_args()

    template, train_ds, tests = build_sets()
    n_class = template.shape[0]

    # small config: this is a property demo; compile time dominates on slow
    # toolchains, so keep the jitted programs small
    cfg = FitConfig(n_epoch=args.n_epoch, lr=2e-3, decay_every=50,
                    batch_size=6, input_features="xyz", labels_kind="vertex")
    model = build_model(n_class=n_class, c_width=32, outputs_at="vertices",
                        dropout=False, input_features="xyz", n_block=2)
    params, history, evaluate = fit(model, train_ds, tests["orig"], cfg,
                                    verbose=False)

    print("\n== per-mutation results (angular error on the template sphere) ==")
    t_unit = unit(template)
    results = {}
    for name, ds in tests.items():
        batch = next(iter(make_padded_batches(ds, 1, shuffle=False)))
        batch = jax.tree.map(jnp.asarray, batch)
        feats = get_features("xyz", batch.verts, batch.ops.evals,
                             batch.ops.evecs)
        from diffusionnet_tpu.geometry import grad_operators
        gX, gY = grad_operators(batch.ops)
        preds = model.apply(params, feats, batch.ops.mass, evals=batch.ops.evals,
                            evecs=batch.ops.evecs, gradX=gX, gradY=gY)
        pred_labels = np.asarray(jnp.argmax(preds, -1))[0]
        labels = np.asarray(batch.labels)[0]
        valid = labels >= 0
        acc = float((pred_labels[valid] == labels[valid]).mean())
        ang = np.arccos(np.clip(
            np.sum(t_unit[pred_labels[valid]] * t_unit[labels[valid]], -1),
            -1, 1))
        results[name] = (acc, float(np.mean(ang)))
        print(f"  {name:>6}: exact-label acc {100 * acc:6.2f}%   "
              f"mean angular err {np.degrees(np.mean(ang)):6.2f} deg")
    return results


if __name__ == "__main__":
    main()
