"""Human segmentation (8-class per-face) on the Maron et al. dataset
(reference experiments/human_segmentation_original/human_segmentation_original.py).

Same configuration: C_width=128, 4 blocks, outputs_at='faces', dropout on,
HKS default features, Adam 1e-3 halved every 50 epochs.

Usage: python human_segmentation_original.py [--input_features hks] [--evaluate --load_model PATH]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))
from exp_common import FitConfig, build_model, fit  # noqa: E402
from diffusionnet_tpu.training import restore_checkpoint  # noqa: E402

from human_segmentation_original_dataset import HumanSegOrigDataset  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--load_model", type=str, default=None)
    parser.add_argument("--input_features", type=str, default="hks")
    parser.add_argument("--n_epoch", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--k_eig", type=int, default=128)
    parser.add_argument("--device_data", action="store_true",
                        help="keep the stacked dataset in device HBM"
                             " and gather batches on-device (no"
                             " per-step host transfer)")
    parser.add_argument("--megakernel", action="store_true")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="checkpoint dir: continue a crashed run")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--data_dir", type=str, default=None,
                        help="dataset root (default: ./data/sig17_seg_benchmark)")
    args = parser.parse_args()

    base_path = os.path.dirname(__file__)
    pretrain_path = os.path.join(
        base_path, "pretrained_models",
        f"human_seg_{args.input_features}_4x128.npz")
    dataset_path = args.data_dir or os.path.join(base_path, "data",
                                                 "sig17_seg_benchmark")
    op_cache_dir = os.path.join(dataset_path, "op_cache")
    model_save_path = os.path.join(
        dataset_path, "saved_models",
        f"human_seg_{args.input_features}_4x128")

    k_eig = args.k_eig
    test_dataset = HumanSegOrigDataset(dataset_path, train=False, k_eig=k_eig,
                                       op_cache_dir=op_cache_dir)

    cfg = FitConfig(
        n_epoch=args.n_epoch, lr=1e-3, decay_every=50, decay_rate=0.5,
        batch_size=args.batch_size, input_features=args.input_features,
        augment_rotate=(args.input_features == "xyz"), labels_kind="face",
        use_megakernel=args.megakernel, bf16=args.bf16,
        device_data=args.device_data,
        graceful_sigterm=True)

    model = build_model(n_class=8, c_width=128, outputs_at="faces",
                        dropout=True, input_features=args.input_features,
                        bf16=args.bf16)

    if args.evaluate:
        if not args.load_model and os.path.exists(pretrain_path):
            args.load_model = pretrain_path  # converted reference weights
        if not args.load_model:
            raise ValueError("--evaluate requires --load_model")
        # build a params template via a 0-epoch fit on the test set, then restore
        eval_cfg = FitConfig(n_epoch=0, batch_size=cfg.batch_size,
                             input_features=cfg.input_features,
                             labels_kind="face")
        params, _, evaluate = fit(model, test_dataset, test_dataset, eval_cfg)
        if args.load_model.endswith((".npz", ".pth")):
            # converted .npz OR the reference's original torch .pth directly
            sys.path.insert(0, os.path.join(base_path, "..", "tools"))
            from convert_torch_checkpoint import load_reference_checkpoint
            params = load_reference_checkpoint(args.load_model)
        else:
            params = restore_checkpoint(args.load_model, params)
        print(f"Overall test accuracy: "
              f"{100 * evaluate(params, test_dataset):06.3f}%")
        return

    train_dataset = HumanSegOrigDataset(dataset_path, train=True, k_eig=k_eig,
                                        op_cache_dir=op_cache_dir)
    params, history, evaluate = fit(model, train_dataset, test_dataset, cfg,
                                    model_save_path=model_save_path,
                                    resume_from=args.resume_from)
    print(f"Overall test accuracy: {100 * evaluate(params, test_dataset):06.3f}%")


if __name__ == "__main__":
    main()
