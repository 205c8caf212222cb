"""Supervised functional-map correspondence on FAUST/SCAPE (reference
experiments/functional_correspondence/functional_correspondence.py).

Same task configuration: DiffusionNet(C_out=128) feature extractor (shared
weights across the pair) + parameter-free regularized fmap solver with n_fmap=30
and lambda=1e-3; L2 loss on the predicted map vs the ground-truth lstsq map;
Adam lr=5e-4, 5 epochs; eval reports the L2 loss and the mean geodesic error of
the induced vertex map (kNN in the spectrally aligned embedding,
reference :181-204), normalized by sqrt(area).

Usage: python functional_correspondence.py --train_dataset faust --test_dataset faust
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))
from exp_common import REPO  # noqa: E402  (bootstraps sys.path)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import diffusionnet_tpu as dnt  # noqa: E402
from diffusionnet_tpu.data.features import FEATURE_DIMS, get_features  # noqa: E402
from diffusionnet_tpu.geometry import pad_operators  # noqa: E402
from diffusionnet_tpu.models.fmaps import FunctionalMapCorrespondence  # noqa: E402
from diffusionnet_tpu.training import save_checkpoint, restore_checkpoint  # noqa: E402

from faust_scape_dataset import FaustScapeDataset  # noqa: E402


def make_shape_fn(ds, v_pad, d_l, d_g, k_eig, input_features):
    """Build the padded shape dict for one dataset index (host side)."""
    def shape(i, rng=None):
        ops = pad_operators(ds.ops_list[i], v_pad, k_eig, d_l, d_g)
        ops = jax.tree.map(jnp.asarray, ops)
        verts = jnp.asarray(dnt.utils.pad_to(ds.verts_list[i], v_pad))
        if rng is not None:
            verts = dnt.utils.random_rotate_points(verts, rng)
        feats = get_features(input_features, verts, ops.evals, ops.evecs)
        return dict(features=feats, mass=ops.mass, L=ops.L, evals=ops.evals,
                    evecs=ops.evecs, gradX=ops.gradX, gradY=ops.gradY)
    return shape


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--train_dataset", type=str, default="faust")
    parser.add_argument("--test_dataset", type=str, default="faust")
    parser.add_argument("--input_features", type=str, default="hks")
    parser.add_argument("--load_model", type=str, default=None)
    parser.add_argument("--n_epoch", type=int, default=5)
    parser.add_argument("--k_eig", type=int, default=128)
    parser.add_argument("--n_fmap", type=int, default=30)
    parser.add_argument("--n_feat", type=int, default=128)
    parser.add_argument("--n_train", type=int, default=None,
                        help="train-shape count (default: reference 80/51)")
    parser.add_argument("--n_test", type=int, default=20)
    parser.add_argument("--data_dir", type=str, default=None,
                        help="dataset root (default: ./data)")
    parser.add_argument("--geodesic_method", type=str, default="exact",
                        help="'exact' (reference parity) | 'heat' (fast "
                             "approximate) | 'heat_device' (full table on"
                             " the accelerator) | 'steiner' | 'graph'")
    parser.add_argument("--device_data", action="store_true",
                        help="keep all padded shapes in device HBM and gather"
                             " pairs on-device (no per-step host transfer)")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="checkpoint dir: continue a crashed/preempted "
                             "run at the exact training pair it stopped at")
    args = parser.parse_args()

    k_eig, n_fmap, n_feat = args.k_eig, args.n_fmap, args.n_feat
    lambda_param = 1e-3
    lr = 5e-4
    input_features = args.input_features
    augment = input_features == "xyz"

    base_path = os.path.dirname(__file__)
    dataset_path = args.data_dir or os.path.join(base_path, "data")
    op_cache_dir = os.path.join(dataset_path, "op_cache")
    geodesic_cache_dir = os.path.join(dataset_path, "geodesic_cache")
    model_save_path = os.path.join(
        dataset_path, "saved_models", f"{args.train_dataset}_{input_features}")

    train = not args.evaluate
    if train:
        train_ds = FaustScapeDataset(dataset_path, name=args.train_dataset,
                                     train=True, k_eig=k_eig, n_fmap=n_fmap,
                                     op_cache_dir=op_cache_dir,
                                     n_train=args.n_train, n_test=args.n_test)
    test_ds = FaustScapeDataset(dataset_path, name=args.test_dataset,
                                train=False, k_eig=k_eig, n_fmap=n_fmap,
                                op_cache_dir=op_cache_dir,
                                n_train=args.n_train, n_test=args.n_test)

    # static shapes over the union of shapes used
    all_ds = ([train_ds, test_ds] if train else [test_ds])
    v_pad = dnt.utils.round_up_to_multiple(
        max(v.shape[0] for d in all_ds for v in d.verts_list), 128)
    d_l = max(o.L.max_degree for d in all_ds for o in d.ops_list)
    d_g = max(max(o.gradX.max_degree, o.gradY.max_degree)
              for d in all_ds for o in d.ops_list)

    model = FunctionalMapCorrespondence(
        c_in=FEATURE_DIMS[input_features], c_out=n_feat, c_width=n_feat,
        n_fmap=n_fmap, lambda_param=lambda_param)

    rng = jax.random.PRNGKey(0)
    shape_of = {id(d): make_shape_fn(d, v_pad, d_l, d_g, k_eig, input_features)
                for d in all_ds}

    if args.device_data:
        # all padded shapes uploaded ONCE; a pair lookup is an on-device
        # gather, and xyz rotation augmentation rotates the gathered features
        # (for xyz, features ARE the positions) — no per-step host transfer
        def device_shape_fn(d):
            base = shape_of[id(d)]
            shapes = [base(i) for i in range(len(d.verts_list))]
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *shapes)

            def shape(i, rng=None):
                s = jax.tree.map(lambda a: a[i], stacked)
                if rng is not None:
                    s = dict(s, features=dnt.utils.random_rotate_points(
                        s["features"], rng))
                return s
            return shape

        shape_of = {id(d): device_shape_fn(d) for d in all_ds}

    s0 = shape_of[id(all_ds[0])](0)
    params = model.init({"params": rng}, s0, s0)
    if not args.load_model and args.evaluate:
        # converted reference weights, when present
        cand = os.path.join(base_path, "pretrained_models",
                            f"{args.test_dataset}_{input_features}.npz")
        if os.path.exists(cand):
            args.load_model = cand
    if args.load_model:
        if args.load_model.endswith((".npz", ".pth")):
            # converted .npz OR the reference's original torch .pth directly
            sys.path.insert(0, os.path.join(base_path, "..", "tools"))
            from convert_torch_checkpoint import load_reference_checkpoint
            params = load_reference_checkpoint(args.load_model, fmaps=True)
        else:
            params = restore_checkpoint(args.load_model, params)
    if args.evaluate and not args.load_model:
        raise ValueError("--evaluate requires --load_model")

    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, shape1, shape2, C_gt, rng):
        def loss_fn(p):
            C_pred, _, _ = model.apply(p, shape1, shape2, deterministic=False,
                                       rngs={"dropout": rng})
            return jnp.mean((C_pred - C_gt) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, shape1, shape2, C_gt):
        C_pred, _, _ = model.apply(params, shape1, shape2)
        return jnp.mean((C_pred - C_gt) ** 2), C_pred

    def test(params, with_geodesic_error=False):
        losses, geo_errs = [], []
        sf = shape_of[id(test_ds)]
        for idx in range(len(test_ds)):
            i1, i2, C_gt = test_ds[idx]
            s1, s2 = sf(i1), sf(i2)
            loss, C_pred = eval_step(params, s1, s2, jnp.asarray(C_gt))
            losses.append(float(loss))
            if with_geodesic_error:
                # vertex map via kNN in the aligned spectral embedding
                # (reference functional_correspondence.py:193-201)
                V1 = test_ds.verts_list[i1].shape[0]
                V2 = test_ds.verts_list[i2].shape[0]
                evec1 = test_ds.ops_list[i1].evecs[:, :n_fmap]
                evec2 = test_ds.ops_list[i2].evecs[:, :n_fmap]
                evec1_on_2 = evec1 @ np.asarray(C_pred).T
                _, pred_2to1 = dnt.geometry.find_knn_host(
                    evec2, evec1_on_2, k=1)
                pred_2to1 = pred_2to1[:, 0]
                vts1, vts2 = test_ds.vts_list[i1], test_ds.vts_list[i2]
                vts2on1 = pred_2to1[vts2]
                errors = dnt.geodesic_label_errors(
                    test_ds.verts_list[i1], test_ds.faces_list[i1],
                    vts2on1, vts1, normalization="area",
                    geodesic_cache_dir=geodesic_cache_dir,
                    method=args.geodesic_method)
                geo_errs.append(float(np.mean(errors)))
        return (np.mean(losses),
                np.mean(geo_errs) if with_geodesic_error else -1.0)

    if train:
        print("Training...")
        sf = shape_of[id(train_ds)]
        # per-config dir: faust/scape share parameter shapes, so a shared
        # dir would let resume silently restore the other dataset's weights
        ckpt_dir = model_save_path + "_ckpt"
        dnt.utils.ensure_dir_exists(ckpt_dir)
        log_path = model_save_path + "_log.jsonl"

        # full train state; the per-epoch pair order is STATELESS
        # (seeded by epoch), so (epoch, pair_pos) pins the exact resume point
        start_epoch, start_pos = 0, 0
        if args.resume_from is not None:
            from diffusionnet_tpu.training.checkpoint import latest_checkpoint
            path = latest_checkpoint(args.resume_from)
            if path is None:
                raise FileNotFoundError(
                    f"no checkpoint under {args.resume_from}")
            template = {"params": params, "opt_state": opt_state,
                        "epoch": np.zeros((), np.int32),
                        "pair_pos": np.zeros((), np.int32), "rng": rng}
            st = restore_checkpoint(path, template)
            params, opt_state = st["params"], st["opt_state"]
            rng = jnp.asarray(st["rng"])
            start_epoch, start_pos = int(st["epoch"]), int(st["pair_pos"])
            print(f"resumed from {path}: epoch {start_epoch}, "
                  f"pair {start_pos}")

        def save_state(epoch, pair_pos, step):
            save_checkpoint(ckpt_dir,
                            {"params": params, "opt_state": opt_state,
                             "epoch": np.asarray(epoch, np.int32),
                             "pair_pos": np.asarray(pair_pos, np.int32),
                             "rng": np.asarray(rng)}, step=step)

        # preemption safety: stop at a PAIR boundary (real-data epochs are
        # thousands of pairs — too long for an eviction grace period), save
        # the exact position, and exit; --resume_from continues there.
        # graceful_stop restores the prior handlers even if the loop raises.
        from exp_common import graceful_stop

        import json
        import time as _time
        with graceful_stop() as stop_requested:
            for epoch in range(start_epoch, args.n_epoch):
                epoch_t0 = _time.time()
                losses = []
                order = np.random.RandomState(1000 + epoch).permutation(
                    len(train_ds))
                pos0 = start_pos if epoch == start_epoch else 0
                for pos in range(pos0, len(order)):
                    i1, i2, C_gt = train_ds[int(order[pos])]
                    rng, r1, r2, rd = jax.random.split(rng, 4)
                    s1 = sf(i1, r1 if augment else None)
                    s2 = sf(i2, r2 if augment else None)
                    params, opt_state, loss = train_step(
                        params, opt_state, s1, s2, jnp.asarray(C_gt), rd)
                    losses.append(float(loss))
                    if stop_requested:
                        save_state(epoch, pos + 1, step=epoch)
                        print(f"preemption checkpoint: epoch {epoch}, "
                              f"pair {pos + 1}; resume with --resume_from")
                        return
                test_loss, test_geo = test(params, with_geodesic_error=True)
                # a resume that landed exactly on an epoch boundary replays
                # the epoch with zero pairs — report the loss as None, not NaN
                train_loss = float(np.mean(losses)) if losses else None
                tl = f"{train_loss:.5e}" if train_loss is not None else "--"
                print(f"Epoch {epoch} - Train: {tl}  "
                      f"Test: {test_loss:.5e}  Test geodesic error: {test_geo:.5e}")
                with open(log_path, "a") as f:
                    f.write(json.dumps({
                        "epoch": epoch, "train_loss": train_loss,
                        "test_loss": float(test_loss),
                        "test_geodesic_error": float(test_geo),
                        "epoch_seconds": round(_time.time() - epoch_t0, 3),
                    }) + "\n")
                save_state(epoch + 1, 0, step=epoch)

    mean_loss, mean_geo = test(params, with_geodesic_error=True)
    print(f"Overall test loss: {mean_loss:.5e}  geodesic error: {mean_geo:.5e}")


if __name__ == "__main__":
    main()
