"""Export a DiffusionNet forward as a portable AOT serving artifact, then load
and serve it back — the production deployment path.

The artifact (diffusionnet_tpu.serving) is a directory of self-contained
StableHLO modules (one per vertex bucket, batch dimension symbolic), params,
and a manifest. The LOADING side needs only jax + numpy — no flax, no model
class, no geometry stack — and runs on whatever backend is present (the
export below lowers for BOTH cpu and tpu), so the same artifact deploys to a
TPU serving fleet and to a CPU box.

Usage: python examples/serving_export.py [--out_dir /tmp/dnt_artifact]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.meshgen import icosphere, torus  # noqa: E402
from diffusionnet_tpu.geometry import compute_operators, stack_operators  # noqa: E402
from diffusionnet_tpu.models import DiffusionNet  # noqa: E402
from diffusionnet_tpu.serving import export_forward, load_serving_model  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="/tmp/dnt_artifact")
    ap.add_argument("--k_eig", type=int, default=32)
    ap.add_argument("--buckets", type=int, nargs="+", default=[1024, 4096])
    args = ap.parse_args()

    # --- export side (has the model definition + params) ------------------
    model = DiffusionNet(c_in=3, c_out=8, c_width=64, n_block=4,
                         dropout=False, outputs_at="vertices")
    verts, faces = icosphere(subdivisions=3)
    ops = compute_operators(verts, faces, k_eig=args.k_eig)
    sops = stack_operators([ops], v_pad=args.buckets[0])
    x = np.zeros((1, args.buckets[0], 3), np.float32)
    x[0, :verts.shape[0]] = verts
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(sops.mass),
        evals=jnp.asarray(sops.evals), evecs=jnp.asarray(sops.evecs),
        gradX=jnp.asarray(sops.gradX_spec), gradY=jnp.asarray(sops.gradY_spec))

    t0 = time.time()
    export_forward(model, params, v_buckets=args.buckets,
                   out_dir=args.out_dir, k_eig=args.k_eig)
    size = sum(os.path.getsize(os.path.join(args.out_dir, f))
               for f in os.listdir(args.out_dir))
    print(f"exported {args.buckets} buckets to {args.out_dir} "
          f"({size / 1e6:.2f} MB) in {time.time() - t0:.1f}s")

    # --- serving side (artifact + operators only) --------------------------
    sm = load_serving_model(args.out_dir)
    for name, (v, f) in [("sphere", icosphere(subdivisions=3)),
                         ("torus", torus(48, 24))]:
        mops = compute_operators(v, f, k_eig=args.k_eig)
        t0 = time.time()
        out = sm.call_operators(v.astype(np.float32), mops)
        print(f"{name}: {v.shape[0]} verts -> logits {tuple(out.shape)} "
              f"(bucket {sm.pick_bucket(v.shape[0])}, "
              f"{1e3 * (time.time() - t0):.1f} ms incl. compile)")


if __name__ == "__main__":
    main()
