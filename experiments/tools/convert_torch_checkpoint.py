"""Convert a reference PyTorch DiffusionNet state_dict (.pth) into this
framework's parameter pytree, saved as .npz.

The reference ships pretrained checkpoints (human_segmentation {xyz,hks} 4x128,
functional_correspondence {faust,scape}x{xyz,hks}); this converter makes them
loadable here, giving --evaluate flows exact reference weights.

Usage:
  python convert_torch_checkpoint.py IN.pth OUT.npz [--n_block 4] [--fmaps]
(channel sizes are inferred from the state_dict's tensor shapes)

Weight mapping: torch Linear.weight (out,in) -> flax Dense kernel (in,out)^T;
module paths follow models/diffusion_net.py naming (block_i/diffusion/
diffusion_time, block_i/gradient_features/A_re|A_im, block_i/mlp/dense_00k,
first_lin, last_lin), with an optional feature_extractor/ prefix for the
functional-maps model.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))


def convert_state_dict(sd: dict, n_block: int, prefix: str = "") -> dict:
    """torch state_dict (name -> np array) -> nested flax params dict."""
    p: dict = {}

    def dense(tname):
        out = {"kernel": sd[tname + ".weight"].T.copy()}
        if tname + ".bias" in sd:
            out["bias"] = sd[tname + ".bias"].copy()
        return out

    p["first_lin"] = dense(prefix + "first_lin")
    p["last_lin"] = dense(prefix + "last_lin")
    for b in range(n_block):
        tb = f"{prefix}block_{b}"
        fb: dict = {"diffusion": {
            "diffusion_time": sd[tb + ".diffusion.diffusion_time"].copy()}}
        gf = {}
        for name in ("A_re", "A_im", "A"):
            key = f"{tb}.gradient_features.{name}.weight"
            if key in sd:
                gf[name] = {"kernel": sd[key].T.copy()}
        if gf:
            fb["gradient_features"] = gf
        mlp_keys = sorted(k for k in sd
                          if k.startswith(tb + ".mlp.") and k.endswith(".weight"))
        mlp = {}
        for i, wk in enumerate(mlp_keys):
            mlp[f"dense_{i:03d}"] = dense(wk[:-len(".weight")])
        fb["mlp"] = mlp
        p[f"block_{b}"] = fb
    return p


def flatten(tree: dict, prefix=()) -> dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def unflatten(flat: dict) -> dict:
    tree: dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def load_converted(path: str) -> dict:
    """Load an .npz produced by this tool into {'params': nested dict}."""
    npz = np.load(path)
    return {"params": unflatten({k: npz[k] for k in npz.files})}


def _infer_n_block(sd: dict, prefix: str = "") -> int:
    """Number of DiffusionNet blocks from state_dict key names."""
    blocks = set()
    for k in sd:
        if k.startswith(prefix + "block_"):
            blocks.add(int(k[len(prefix + "block_"):].split(".")[0]))
    if not blocks:
        raise ValueError("no block_i.* keys found — not a reference "
                         "DiffusionNet state_dict")
    return max(blocks) + 1


def load_reference_checkpoint(path: str, n_block: int | None = None,
                              fmaps: bool = False) -> dict:
    """Load reference DiffusionNet weights into {'params': nested dict}.

    Accepts either an .npz previously written by this converter, or the
    reference's ORIGINAL torch .pth checkpoint directly (converted in
    memory — no separate conversion step needed; requires the baked-in cpu
    torch). n_block defaults to what the state_dict's key names imply.
    fmaps: the checkpoint is a functional-maps model (DiffusionNet nested
    under `feature_extractor.`, reference fmaps_model.py)."""
    if path.endswith(".npz"):
        return load_converted(path)
    import torch
    sd_t = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd_t, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(sd_t)}")
    sd = {k: v.detach().numpy() for k, v in sd_t.items()}
    prefix = "feature_extractor." if fmaps else ""
    if n_block is None:
        n_block = _infer_n_block(sd, prefix)
    params = convert_state_dict(sd, n_block, prefix=prefix)
    if fmaps:
        params = {"feature_extractor": params}
    return {"params": params}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--n_block", type=int, default=4)
    ap.add_argument("--fmaps", action="store_true",
                    help="checkpoint is a functional-maps model (feature "
                         "extractor nested under feature_extractor.)")
    args = ap.parse_args()

    import torch
    sd_t = torch.load(args.input, map_location="cpu")
    sd = {k: v.detach().numpy() for k, v in sd_t.items()}

    prefix = "feature_extractor." if args.fmaps else ""
    params = convert_state_dict(sd, args.n_block, prefix=prefix)
    if args.fmaps:
        params = {"feature_extractor": params}

    flat = flatten(params)
    np.savez(args.output, **flat)
    print(f"wrote {args.output}: {len(flat)} arrays, "
          f"{sum(v.size for v in flat.values())} params")


if __name__ == "__main__":
    main()
