"""SHREC11 30-class mesh classification (reference
experiments/classification_shrec11/classification_shrec11.py).

Same task configuration: C_width=64, 4 blocks, outputs_at='global_mean',
dropout off, label smoothing 0.2, Adam 1e-3 halved every 50 epochs, random
rotation augmentation for xyz features; random 10-per-class train split with a
disjoint test set, regenerated each run (so no pretrained model ships, by
design — reference README.md:45).

Usage: python classification_shrec11.py --input_features hks --dataset_type simplified
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))
from exp_common import FitConfig, build_model, fit  # noqa: E402

from shrec11_dataset import (  # noqa: E402
    Shrec11MeshDataset_Original, Shrec11MeshDataset_Simplified,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_features", type=str, default="hks",
                        help="'xyz' or 'hks'")
    parser.add_argument("--dataset_type", type=str, default="original",
                        help="'original' or 'simplified'")
    parser.add_argument("--split_size", type=int, default=10)
    parser.add_argument("--n_epoch", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--k_eig", type=int, default=128)
    parser.add_argument("--device_data", action="store_true",
                        help="keep the stacked dataset in device HBM"
                             " and gather batches on-device (no"
                             " per-step host transfer)")
    parser.add_argument("--megakernel", action="store_true",
                        help="whole-block Pallas megakernel (TPU)")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="checkpoint dir: continue a crashed run")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 tiles / f32 accumulation")
    parser.add_argument("--data_dir", type=str, default=None,
                        help="dataset root (default: ./data/{dataset_type})")
    parser.add_argument("--model_save_path", type=str, default=None,
                        help="checkpoint base path (default: <data_dir>/"
                             "saved_models/shrec11_<type>_<features>; "
                             "checkpoints land in <path>_ckpt/)")
    args = parser.parse_args()

    base_path = os.path.dirname(__file__)
    dataset_path = args.data_dir or os.path.join(base_path, "data",
                                                 args.dataset_type)
    op_cache_dir = os.path.join(dataset_path, "op_cache")

    cls = {"simplified": Shrec11MeshDataset_Simplified,
           "original": Shrec11MeshDataset_Original}[args.dataset_type]

    k_eig = args.k_eig
    train_dataset = cls(dataset_path, split_size=args.split_size, k_eig=k_eig,
                        op_cache_dir=op_cache_dir)
    test_dataset = cls(dataset_path, split_size=None, k_eig=k_eig,
                       op_cache_dir=op_cache_dir,
                       exclude_dict=train_dataset.entries)

    cfg = FitConfig(
        n_epoch=args.n_epoch, lr=1e-3, decay_every=50, decay_rate=0.5,
        batch_size=args.batch_size, input_features=args.input_features,
        augment_rotate=(args.input_features == "xyz"),
        label_smoothing=0.2, labels_kind="global",
        use_megakernel=args.megakernel, bf16=args.bf16,
        device_data=args.device_data,
        graceful_sigterm=True)

    model = build_model(n_class=30, c_width=64, outputs_at="global_mean",
                        dropout=False, input_features=args.input_features,
                        bf16=args.bf16)

    model_save_path = args.model_save_path or os.path.join(
        dataset_path, "saved_models",
        f"shrec11_{args.dataset_type}_{args.input_features}")
    params, history, evaluate = fit(model, train_dataset, test_dataset, cfg,
                                    model_save_path=model_save_path,
                                    resume_from=args.resume_from)
    print(f"Overall test accuracy: {100 * evaluate(params, test_dataset):06.3f}%")


if __name__ == "__main__":
    main()
