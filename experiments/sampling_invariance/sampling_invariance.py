"""Sampling-invariance stress test: 6890-class template-vertex correspondence,
trained on FAUST templates, tested on 6 discretizations of held-out shapes
(reference experiments/sampling_invariance/sampling_invariance.py).

Same configuration: C_width=256, 4 blocks, outputs_at='vertices', dropout on,
xyz default features with Y-axis-only rotation augmentation (:130-132), Adam
1e-3 halved every 50 epochs; eval reports per-mutation mean geodesic error
against the first training mesh as reference (:212-225).

Usage: python sampling_invariance.py [--input_features xyz]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))
from exp_common import FitConfig, build_model, fit  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import diffusionnet_tpu as dnt  # noqa: E402
from diffusionnet_tpu.data import make_padded_batches  # noqa: E402
from diffusionnet_tpu.data.features import get_features  # noqa: E402
from diffusionnet_tpu.training import restore_checkpoint  # noqa: E402

from faust_with_robust_test_dataset import FaustWithRobustTestDataset  # noqa: E402


def per_mutation_geodesic_errors(model, params, test_ds, cfg,
                                 verts_ref, faces_ref, geodesic_cache_dir,
                                 method="exact"):
    """Reference sampling_invariance.py:212-225: mean geodesic error per
    mutation, measured on the training-reference mesh, diameter-normalized."""
    mut_errors = {}
    i_shape = 0
    for batch in make_padded_batches(test_ds, 1, shuffle=False):
        batch = jax.tree.map(jnp.asarray, batch)
        feats = get_features(cfg.input_features, batch.verts,
                             batch.ops.evals, batch.ops.evecs)
        preds = model.apply(params, feats, batch.ops.mass, L=batch.ops.L,
                            evals=batch.ops.evals, evecs=batch.ops.evecs,
                            gradX=batch.ops.gradX, gradY=batch.ops.gradY)
        pred_labels = np.asarray(jnp.argmax(preds, axis=-1))[0]
        labels = np.asarray(batch.labels)[0]
        valid = labels >= 0
        errors = dnt.geodesic_label_errors(
            verts_ref, faces_ref, pred_labels[valid], labels[valid],
            normalization="diameter", geodesic_cache_dir=geodesic_cache_dir,
            method=method)
        mut = test_ds.mut_list[i_shape]
        mut_errors.setdefault(mut, []).extend(np.asarray(errors).tolist())
        i_shape += 1

    print("\n== Geodesic errors ==")
    for mut, errs in mut_errors.items():
        print(f"    {mut:>8}  mean: {100 * np.mean(errs):.2f}")
    return mut_errors


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--load_model", type=str, default=None)
    parser.add_argument("--input_features", type=str, default="xyz")
    parser.add_argument("--n_epoch", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--k_eig", type=int, default=128)
    parser.add_argument("--device_data", action="store_true",
                        help="keep the stacked dataset in device HBM"
                             " and gather batches on-device (no"
                             " per-step host transfer)")
    parser.add_argument("--megakernel", action="store_true")
    parser.add_argument("--geodesic_method", type=str, default="exact",
                        help="'exact' (reference parity) | 'heat' (fast "
                             "approximate) | 'heat_device' (full table on"
                             " the accelerator) | 'steiner' | 'graph'")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="checkpoint dir: continue a crashed run")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--n_train", type=int, default=80)
    parser.add_argument("--n_test", type=int, default=20)
    parser.add_argument("--data_dir", type=str, default=None,
                        help="dataset root (default: ./data)")
    args = parser.parse_args()

    base_path = os.path.dirname(__file__)
    dataset_path = args.data_dir or os.path.join(base_path, "data")
    op_cache_dir = os.path.join(dataset_path, "op_cache")
    geodesic_cache_dir = os.path.join(dataset_path, "geodesic_cache")
    model_save_path = os.path.join(
        dataset_path, "saved_models",
        f"categorical_correspondence_{args.input_features}_4x256")

    k_eig = args.k_eig
    test_dataset = FaustWithRobustTestDataset(dataset_path, train=False,
                                              k_eig=k_eig,
                                              op_cache_dir=op_cache_dir,
                                              n_train=args.n_train,
                                              n_test=args.n_test)
    if args.evaluate:
        # only the template mesh is needed (verts_ref / faces_ref / n_class)
        # — precomputing all 80 train operator bundles just for that would
        # cost minutes of host eigensolves before the cache is warm
        verts_ref, faces_ref = dnt.geometry.read_mesh(os.path.join(
            dataset_path, "train", "MPI-FAUST", "training", "registrations",
            "tr_reg_000.ply"))
        # same normalization the train dataset applies to the template
        verts_ref = dnt.utils.normalize_positions_np(verts_ref,
                                                     method="bbox")
    else:
        train_dataset = FaustWithRobustTestDataset(dataset_path, train=True,
                                                   k_eig=k_eig,
                                                   op_cache_dir=op_cache_dir,
                                                   n_train=args.n_train,
                                                   n_test=args.n_test)
        verts_ref = train_dataset.verts_list[0]
        faces_ref = train_dataset.faces_list[0]
    # = 6890 on real FAUST (reference sampling_invariance.py:30 hardcodes it);
    # derived from the template so predictions always index valid vertices
    n_class = verts_ref.shape[0]

    cfg = FitConfig(
        n_epoch=args.n_epoch, lr=1e-3, decay_every=50, decay_rate=0.5,
        batch_size=args.batch_size, input_features=args.input_features,
        augment_rotate=(args.input_features == "xyz"), rotate_axis="y",
        labels_kind="vertex",
        use_megakernel=args.megakernel, bf16=args.bf16,
        device_data=args.device_data,
        graceful_sigterm=True)

    model = build_model(n_class=n_class, c_width=256, outputs_at="vertices",
                        dropout=True, input_features=args.input_features,
                        bf16=args.bf16)

    if args.evaluate:
        if not args.load_model:
            raise ValueError("--evaluate requires --load_model")
        eval_cfg = FitConfig(n_epoch=0, batch_size=cfg.batch_size,
                             input_features=cfg.input_features,
                             labels_kind="vertex")
        params, _, evaluate = fit(model, test_dataset, test_dataset, eval_cfg)
        if args.load_model.endswith((".npz", ".pth")):
            # converted .npz OR a reference-format torch .pth directly
            sys.path.insert(0, os.path.join(base_path, "..", "tools"))
            from convert_torch_checkpoint import load_reference_checkpoint
            params = load_reference_checkpoint(args.load_model)
        else:
            params = restore_checkpoint(args.load_model, params)
    else:
        params, history, evaluate = fit(model, train_dataset, test_dataset,
                                        cfg, model_save_path=model_save_path,
                                        resume_from=args.resume_from)

    print(f"Overall test accuracy: {100 * evaluate(params, test_dataset):06.3f}%")
    per_mutation_geodesic_errors(model, params, test_dataset, cfg,
                                 verts_ref, faces_ref, geodesic_cache_dir,
                                 method=args.geodesic_method)


if __name__ == "__main__":
    main()
