"""RNA mesh segmentation: 260-class per-vertex labels on ~15k-vertex RNA surfaces
(reference experiments/rna_mesh_segmentation/rna_mesh_segmentation.py).

Same configuration: C_width=128, 4 blocks, outputs_at='vertices', dropout on,
xyz default features, Adam 1e-3 halved every 50 epochs.

Usage: python rna_mesh_segmentation.py [--input_features xyz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))
from exp_common import FitConfig, build_model, fit  # noqa: E402

from rna_mesh_dataset import RNAMeshDataset  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_features", type=str, default="xyz")
    parser.add_argument("--n_epoch", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--k_eig", type=int, default=128)
    parser.add_argument("--device_data", action="store_true",
                        help="keep the stacked dataset in device HBM"
                             " and gather batches on-device (no"
                             " per-step host transfer)")
    parser.add_argument("--megakernel", action="store_true")
    parser.add_argument("--mesh", type=str, default=None, metavar="DATA,VERT",
                        help="two-axis sharded training, e.g. '2,4': batch "
                             "over DATA devices AND every (B,V,...) array "
                             "row-sharded over VERT devices (train surfaces "
                             "larger than one chip's HBM; requires "
                             "--megakernel; vertex buckets are rounded so V "
                             "divides VERT)")
    parser.add_argument("--buckets", type=str, default=None,
                        help="comma-separated vertex bucket sizes (padded "
                             "batch shapes), e.g. '16384,32768'")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="checkpoint dir: continue a crashed run")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--data_dir", type=str, default=None,
                        help="dataset root (default: ./data)")
    args = parser.parse_args()

    base_path = os.path.dirname(__file__)
    dataset_path = args.data_dir or os.path.join(base_path, "data")
    op_cache_dir = os.path.join(dataset_path, "op_cache")
    model_save_path = os.path.join(
        dataset_path, "saved_models", f"rna_seg_{args.input_features}_4x128")

    k_eig = args.k_eig
    train_dataset = RNAMeshDataset(dataset_path, train=True, k_eig=k_eig,
                                   op_cache_dir=op_cache_dir)
    test_dataset = RNAMeshDataset(dataset_path, train=False, k_eig=k_eig,
                                  op_cache_dir=op_cache_dir)

    mesh_shape = (tuple(int(s) for s in args.mesh.split(","))
                  if args.mesh else None)
    buckets = (tuple(int(s) for s in args.buckets.split(","))
               if args.buckets else None)
    cfg = FitConfig(
        n_epoch=args.n_epoch, lr=1e-3, decay_every=50, decay_rate=0.5,
        batch_size=args.batch_size, input_features=args.input_features,
        augment_rotate=(args.input_features == "xyz"), labels_kind="vertex",
        use_megakernel=args.megakernel, bf16=args.bf16,
        device_data=args.device_data, mesh_shape=mesh_shape, buckets=buckets,
        graceful_sigterm=True)

    model = build_model(n_class=260, c_width=128, outputs_at="vertices",
                        dropout=True, input_features=args.input_features,
                        bf16=args.bf16)

    params, history, evaluate = fit(model, train_dataset, test_dataset, cfg,
                                    model_save_path=model_save_path,
                                    resume_from=args.resume_from)
    print(f"Overall test accuracy: {100 * evaluate(params, test_dataset):06.3f}%")


if __name__ == "__main__":
    main()
