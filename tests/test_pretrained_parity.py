"""Pretrained-checkpoint parity: the reference's shipped .pth weights, converted
by experiments/tools/convert_torch_checkpoint.py, must produce the same forward
outputs here as the torch reference produces with the original .pth."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

for _name in ("robust_laplacian", "potpourri3d"):
    if _name not in sys.modules:
        sys.modules[_name] = types.ModuleType(_name)
if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

ref_layers = pytest.importorskip("diffusion_net.layers")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "experiments", "tools"))
from convert_torch_checkpoint import load_converted  # noqa: E402

from diffusionnet_tpu.geometry import compute_operators, grad_operators  # noqa: E402
from diffusionnet_tpu.models import DiffusionNet  # noqa: E402
from diffusionnet_tpu.ops.spectral import compute_hks_autoscale  # noqa: E402

PTH = ("/root/reference/experiments/human_segmentation_original/"
       "pretrained_models/human_seg_hks_4x128.pth")
NPZ = os.path.join(os.path.dirname(__file__), "..", "experiments",
                   "human_segmentation_original", "pretrained_models",
                   "human_seg_hks_4x128.npz")


@pytest.mark.skipif(not (os.path.exists(PTH) and os.path.exists(NPZ)),
                    reason="pretrained checkpoints unavailable")
def test_human_seg_pretrained_forward_parity():
    from tests.meshgen import icosphere
    verts, faces = icosphere(subdivisions=2)
    jops, (L_sp, gX_sp, gY_sp) = compute_operators(verts, faces, k_eig=32,
                                                   _return_sparse=True)

    # --- torch reference with original weights
    tmodel = ref_layers.DiffusionNet(
        C_in=16, C_out=8, C_width=128, N_block=4, dropout=True,
        outputs_at="faces")
    tmodel.load_state_dict(torch.load(PTH, map_location="cpu"))
    tmodel.eval()

    def sp(m):
        coo = m.tocoo()
        return torch.sparse_coo_tensor(
            torch.tensor(np.stack([coo.row, coo.col])),
            torch.tensor(coo.data.astype(np.float32)), size=coo.shape).coalesce()

    t_evals = torch.tensor(jops.evals)
    t_evecs = torch.tensor(jops.evecs)
    import diffusion_net.geometry as ref_geometry
    t_feats = ref_geometry.compute_hks_autoscale(t_evals, t_evecs, 16)
    with torch.no_grad():
        out_ref = tmodel(t_feats, torch.tensor(jops.mass), L=sp(L_sp),
                         evals=t_evals, evecs=t_evecs, gradX=sp(gX_sp),
                         gradY=sp(gY_sp), faces=torch.tensor(faces)).numpy()

    # --- our model with converted weights
    model = DiffusionNet(c_in=16, c_out=8, c_width=128, n_block=4,
                         dropout=True, outputs_at="faces")
    params = load_converted(NPZ)
    je = jax.tree.map(jnp.asarray, jops)
    feats = compute_hks_autoscale(je.evals, je.evecs, 16)
    gX, gY = grad_operators(jops)
    out = np.asarray(model.apply(
        params, feats, je.mass, L=je.L, evals=je.evals, evecs=je.evecs,
        gradX=jnp.asarray(gX), gradY=jnp.asarray(gY),
        faces=jnp.asarray(faces.astype(np.int32)), deterministic=True))

    np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)
    # and the hard functional check: identical predictions
    assert (out.argmax(-1) == out_ref.argmax(-1)).mean() > 0.999
