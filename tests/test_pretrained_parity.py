"""Pretrained-checkpoint parity: the reference's shipped .pth weights, converted
by experiments/tools/convert_torch_checkpoint.py, must produce the same forward
outputs here as the torch reference produces with the original .pth.

Covers all 6 shipped checkpoints: human_segmentation {hks,xyz} through the
faces-output DiffusionNet, and functional_correspondence {faust,scape}x{hks,xyz}
end-to-end through the fmaps head (feature extractor + regularized solve).

Tolerance note: both sides run float32, sharing the same operators (so
eigenvector gauge cancels); the remaining difference is accumulation order
between torch-CPU BLAS and XLA. Per-element tolerance is 2e-4 over 4-block
128-wide nets; the hard functional guarantee is the argmax-prediction match
(BASELINE's rtol-1e-5 target is met by the randomized-weight parity tests in
test_parity_torch.py at shallower accumulation depths)."""

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

REF_EXP = "/root/reference/experiments"
OUR_EXP = os.path.join(os.path.dirname(__file__), "..", "experiments")


def _paths(suite, name):
    return (os.path.join(REF_EXP, suite, "pretrained_models", name + ".pth"),
            os.path.join(OUR_EXP, suite, "pretrained_models", name + ".npz"))


def _sp(m):
    coo = m.tocoo()
    return torch.sparse_coo_tensor(
        torch.tensor(np.stack([coo.row, coo.col])),
        torch.tensor(coo.data.astype(np.float32)), size=coo.shape).coalesce()


def _features(kind, verts, jops):
    import diffusion_net.geometry as ref_geometry
    t_evals = torch.tensor(jops.evals)
    t_evecs = torch.tensor(jops.evecs)
    if kind == "hks":
        t_feats = ref_geometry.compute_hks_autoscale(t_evals, t_evecs, 16)
        j_feats = compute_hks_autoscale(jnp.asarray(jops.evals),
                                        jnp.asarray(jops.evecs), 16)
    else:
        t_feats = torch.tensor(verts.astype(np.float32))
        j_feats = jnp.asarray(verts.astype(np.float32))
    return t_feats, j_feats


@pytest.mark.parametrize("feat_kind", ["hks", "xyz"])
def test_human_seg_pretrained_forward_parity(feat_kind):
    PTH, NPZ = _paths("human_segmentation_original",
                      f"human_seg_{feat_kind}_4x128")
    if not (os.path.exists(PTH) and os.path.exists(NPZ)):
        pytest.skip("pretrained checkpoints unavailable")
    from tests.meshgen import icosphere
    verts, faces = icosphere(subdivisions=2)
    jops, (L_sp, gX_sp, gY_sp) = compute_operators(verts, faces, k_eig=32,
                                                   _return_sparse=True)
    c_in = {"hks": 16, "xyz": 3}[feat_kind]

    # --- torch reference with original weights
    tmodel = ref_layers.DiffusionNet(
        C_in=c_in, C_out=8, C_width=128, N_block=4, dropout=True,
        outputs_at="faces")
    tmodel.load_state_dict(torch.load(PTH, map_location="cpu"))
    tmodel.eval()

    t_feats, j_feats = _features(feat_kind, verts, jops)
    with torch.no_grad():
        out_ref = tmodel(t_feats, torch.tensor(jops.mass), L=_sp(L_sp),
                         evals=torch.tensor(jops.evals),
                         evecs=torch.tensor(jops.evecs), gradX=_sp(gX_sp),
                         gradY=_sp(gY_sp), faces=torch.tensor(faces)).numpy()

    # --- our model with converted weights
    model = DiffusionNet(c_in=c_in, c_out=8, c_width=128, n_block=4,
                         dropout=True, outputs_at="faces")
    params = load_converted(NPZ)
    je = jax.tree.map(jnp.asarray, jops)
    gX, gY = grad_operators(jops)
    out = np.asarray(model.apply(
        params, j_feats, je.mass, L=je.L, evals=je.evals, evecs=je.evecs,
        gradX=jnp.asarray(gX), gradY=jnp.asarray(gY),
        faces=jnp.asarray(faces.astype(np.int32)), deterministic=True))

    np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)
    # and the hard functional check: identical predictions
    pred_match = (out.argmax(-1) == out_ref.argmax(-1)).mean()
    # machine-readable evidence line (consumed by tools/gen_results.py)
    print(f"PARITY human_seg_{feat_kind}_4x128 "
          f"max_abs_err={np.abs(out - out_ref).max():.3e} "
          f"pred_match={pred_match:.4f}")
    assert pred_match > 0.999


@pytest.mark.parametrize("ds_name", ["faust", "scape"])
@pytest.mark.parametrize("feat_kind", ["hks", "xyz"])
def test_fmaps_pretrained_end_to_end_parity(ds_name, feat_kind):
    """All 4 functional-correspondence checkpoints, through the full fmaps
    head: reference FunctionalMapCorrespondenceWithDiffusionNetFeatures vs our
    FunctionalMapCorrespondence must produce the same C matrix and features."""
    PTH, NPZ = _paths("functional_correspondence", f"{ds_name}_{feat_kind}")
    if not (os.path.exists(PTH) and os.path.exists(NPZ)):
        pytest.skip("pretrained checkpoints unavailable")
    fm_dir = os.path.join(REF_EXP, "functional_correspondence")
    if fm_dir not in sys.path:
        sys.path.insert(0, fm_dir)
    import fmaps_model as ref_fmaps

    from tests.meshgen import icosphere, torus
    from diffusionnet_tpu.models.fmaps import FunctionalMapCorrespondence

    shapes_np = [icosphere(subdivisions=2), torus(16, 8)]
    c_in = {"hks": 16, "xyz": 3}[feat_kind]
    n_fmap = 30

    tmodel = ref_fmaps.FunctionalMapCorrespondenceWithDiffusionNetFeatures(
        n_feat=128, n_fmap=n_fmap, input_features=feat_kind)
    tmodel.load_state_dict(torch.load(PTH, map_location="cpu"))
    tmodel.eval()

    t_shapes, j_shapes = [], []
    for verts, faces in shapes_np:
        jops, (L_sp, gX_sp, gY_sp) = compute_operators(verts, faces, k_eig=32,
                                                       _return_sparse=True)
        t_feats, j_feats = _features(feat_kind, verts, jops)
        t_hks = t_feats if feat_kind == "hks" else None
        t_shapes.append((torch.tensor(verts.astype(np.float32)),
                         torch.tensor(faces), None,
                         torch.tensor(jops.mass), _sp(L_sp),
                         torch.tensor(jops.evals), torch.tensor(jops.evecs),
                         _sp(gX_sp), _sp(gY_sp), t_hks, None))
        gX, gY = grad_operators(jops)
        je = jax.tree.map(jnp.asarray, jops)
        j_shapes.append(dict(features=j_feats, mass=je.mass, L=je.L,
                             evals=je.evals, evecs=je.evecs,
                             gradX=jnp.asarray(gX), gradY=jnp.asarray(gY)))

    with torch.no_grad():
        C_ref, feat1_ref, feat2_ref = tmodel(t_shapes[0], t_shapes[1])
    C_ref = C_ref.numpy()[0]

    model = FunctionalMapCorrespondence(c_in=c_in, c_out=128, c_width=128,
                                        n_fmap=n_fmap)
    params = load_converted(NPZ)
    C, feat1, feat2 = model.apply(params, j_shapes[0], j_shapes[1],
                                  deterministic=True)

    np.testing.assert_allclose(np.asarray(feat1), feat1_ref.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feat2), feat2_ref.numpy(),
                               rtol=2e-4, atol=2e-4)
    scale = np.abs(C_ref).max()
    np.testing.assert_allclose(np.asarray(C), C_ref,
                               atol=2e-4 * scale, rtol=2e-3)
    # machine-readable evidence line (consumed by tools/gen_results.py)
    print(f"PARITY fmaps_{ds_name}_{feat_kind} "
          f"feat_max_abs_err="
          f"{max(np.abs(np.asarray(feat1) - feat1_ref.numpy()).max(), np.abs(np.asarray(feat2) - feat2_ref.numpy()).max()):.3e} "
          f"C_max_rel_err={np.abs(np.asarray(C) - C_ref).max() / scale:.3e}")
