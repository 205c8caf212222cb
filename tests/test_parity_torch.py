"""Golden-value parity vs the PyTorch reference implementation.

Loads the reference package from /root/reference/src (its native deps
robust_laplacian / potpourri3d are stubbed — they're only touched inside
compute_operators, which we never call here), builds the SAME random weights in
both frameworks, and asserts forward-pass parity at rtol 1e-5 on operators
computed by THIS framework. This is the BASELINE.json numerical-parity gate.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# --- import the reference with stubbed native modules -------------------------
for _name in ("robust_laplacian", "potpourri3d"):
    if _name not in sys.modules:
        sys.modules[_name] = types.ModuleType(_name)
if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

ref_layers = pytest.importorskip("diffusion_net.layers")
ref_geometry = pytest.importorskip("diffusion_net.geometry")

import jax
import jax.numpy as jnp

from diffusionnet_tpu import ops
from diffusionnet_tpu.geometry import compute_operators
from diffusionnet_tpu.models import DiffusionNet
from diffusionnet_tpu.ops.sparse import ell_to_dense


@pytest.fixture(scope="module")
def mesh_ops():
    from tests.meshgen import icosphere
    verts, faces = icosphere(subdivisions=2)  # 162 verts
    jops, (L, gX, gY) = compute_operators(verts, faces, k_eig=32,
                                          _return_sparse=True)
    return verts.astype(np.float32), faces, jops, (L, gX, gY)


def _scipy_to_torch_sparse(mat):
    coo = mat.tocoo()
    inds = np.stack([coo.row, coo.col])
    return torch.sparse_coo_tensor(torch.tensor(inds),
                                   torch.tensor(coo.data.astype(np.float32)),
                                   size=coo.shape).coalesce()


def _copy_weights_to_flax(tmodel, fparams, n_block, with_rot=True,
                          with_grad=True):
    """Copy torch DiffusionNet weights into the flax params pytree."""
    p = jax.tree.map(np.asarray, fparams)["params"]
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    def set_dense(dst, prefix):
        dst["kernel"] = sd[prefix + ".weight"].T.copy()
        if prefix + ".bias" in sd:
            dst["bias"] = sd[prefix + ".bias"].copy()

    set_dense(p["first_lin"], "first_lin")
    set_dense(p["last_lin"], "last_lin")
    for b in range(n_block):
        fb = p[f"block_{b}"]
        tb = f"block_{b}"
        fb["diffusion"]["diffusion_time"] = sd[
            tb + ".diffusion.diffusion_time"].copy()
        if with_grad:
            gf = fb["gradient_features"]
            if with_rot:
                gf["A_re"]["kernel"] = sd[
                    tb + ".gradient_features.A_re.weight"].T.copy()
                gf["A_im"]["kernel"] = sd[
                    tb + ".gradient_features.A_im.weight"].T.copy()
            else:
                gf["A"]["kernel"] = sd[
                    tb + ".gradient_features.A.weight"].T.copy()
        mlp_keys = sorted(k for k in sd
                          if k.startswith(tb + ".mlp.") and k.endswith(".weight"))
        for i, wk in enumerate(mlp_keys):
            set_dense(fb["mlp"][f"dense_{i:03d}"], wk[:-len(".weight")])
    return {"params": p}


def _randomize_torch_model(tmodel, seed=7):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for prm in tmodel.parameters():
            prm.copy_(torch.randn(prm.shape, generator=g) * 0.2)
    return tmodel


@pytest.mark.parametrize("outputs_at,with_rot", [
    ("vertices", True),
    ("vertices", False),
    ("global_mean", True),
])
def test_forward_parity(mesh_ops, outputs_at, with_rot):
    verts, faces, jops, (L_sp, gX_sp, gY_sp) = mesh_ops
    V = verts.shape[0]
    C_in, C_out, C_width, N_block = 3, 5, 16, 2

    tmodel = ref_layers.DiffusionNet(
        C_in=C_in, C_out=C_out, C_width=C_width, N_block=N_block,
        dropout=False, outputs_at=outputs_at,
        with_gradient_rotations=with_rot)
    _randomize_torch_model(tmodel)
    tmodel.eval()

    t_x = torch.tensor(verts)
    t_mass = torch.tensor(jops.mass)
    t_L = _scipy_to_torch_sparse(L_sp)
    t_evals = torch.tensor(jops.evals)
    t_evecs = torch.tensor(jops.evecs)
    t_gX = _scipy_to_torch_sparse(gX_sp)
    t_gY = _scipy_to_torch_sparse(gY_sp)

    with torch.no_grad():
        out_ref = tmodel(t_x, t_mass, L=t_L, evals=t_evals, evecs=t_evecs,
                         gradX=t_gX, gradY=t_gY).numpy()

    fmodel = DiffusionNet(c_in=C_in, c_out=C_out, c_width=C_width,
                          n_block=N_block, dropout=False,
                          outputs_at=outputs_at,
                          with_gradient_rotations=with_rot)
    kw = dict(L=jax.tree.map(jnp.asarray, jops.L), evals=jnp.asarray(jops.evals),
              evecs=jnp.asarray(jops.evecs),
              gradX=jax.tree.map(jnp.asarray, jops.gradX),
              gradY=jax.tree.map(jnp.asarray, jops.gradY))
    fparams = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(verts),
                          jnp.asarray(jops.mass), **kw)
    fparams = _copy_weights_to_flax(tmodel, fparams, N_block, with_rot=with_rot)
    out = np.asarray(fmodel.apply(fparams, jnp.asarray(verts),
                                  jnp.asarray(jops.mass), **kw))

    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-5)


def test_spectral_transform_parity(mesh_ops, rng):
    _, _, jops, _ = mesh_ops
    x = rng.randn(jops.evecs.shape[0], 4).astype(np.float32)
    spec_ref = ref_geometry.to_basis(torch.tensor(x), torch.tensor(jops.evecs),
                                     torch.tensor(jops.mass)).numpy()
    spec = np.asarray(ops.to_basis(jnp.asarray(x), jnp.asarray(jops.evecs),
                                   jnp.asarray(jops.mass)))
    np.testing.assert_allclose(spec, spec_ref, rtol=1e-4, atol=1e-5)

    back_ref = ref_geometry.from_basis(torch.tensor(spec),
                                       torch.tensor(jops.evecs)).numpy()
    back = np.asarray(ops.from_basis(jnp.asarray(spec), jnp.asarray(jops.evecs)))
    np.testing.assert_allclose(back, back_ref, rtol=1e-4, atol=1e-5)


def test_hks_parity(mesh_ops):
    _, _, jops, _ = mesh_ops
    hks_ref = ref_geometry.compute_hks_autoscale(
        torch.tensor(jops.evals), torch.tensor(jops.evecs), 16).numpy()
    hks = np.asarray(ops.compute_hks_autoscale(jnp.asarray(jops.evals),
                                               jnp.asarray(jops.evecs), 16))
    np.testing.assert_allclose(hks, hks_ref, rtol=1e-4, atol=1e-6)


def test_implicit_dense_parity(mesh_ops):
    verts, faces, jops, (L_sp, _, _) = mesh_ops
    C = 8
    tmodel = ref_layers.DiffusionNet(
        C_in=3, C_out=3, C_width=C, N_block=1, dropout=False,
        with_gradient_features=False, diffusion_method="implicit_dense")
    _randomize_torch_model(tmodel)
    # implicit_dense needs strictly positive diffusion times in both frameworks
    with torch.no_grad():
        for n, prm in tmodel.named_parameters():
            if "diffusion_time" in n:
                prm.abs_()
    tmodel.eval()

    t_L = _scipy_to_torch_sparse(L_sp)
    with torch.no_grad():
        out_ref = tmodel(torch.tensor(verts), torch.tensor(jops.mass),
                         L=t_L, evals=None, evecs=None,
                         gradX=None, gradY=None).numpy()

    fmodel = DiffusionNet(c_in=3, c_out=3, c_width=C, n_block=1, dropout=False,
                          with_gradient_features=False,
                          diffusion_method="implicit_dense")
    Lj = jax.tree.map(jnp.asarray, jops.L)
    fparams = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(verts),
                          jnp.asarray(jops.mass), L=Lj)
    fparams = _copy_weights_to_flax(tmodel, fparams, 1, with_grad=False)
    out = np.asarray(fmodel.apply(fparams, jnp.asarray(verts),
                                  jnp.asarray(jops.mass), L=Lj))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-4)


def test_label_smoothing_loss_parity(rng):
    sys.path.insert(0, "/root/reference/src")
    import diffusion_net.utils as ref_utils
    from diffusionnet_tpu.utils import label_smoothing_log_loss

    logits = rng.randn(10).astype(np.float32)
    logprobs = np.log(np.exp(logits) / np.exp(logits).sum())
    label = 3
    ref = ref_utils.label_smoothing_log_loss(
        torch.tensor(logprobs), torch.tensor(label), smoothing=0.2).item()
    mine = float(label_smoothing_log_loss(jnp.asarray(logprobs),
                                          jnp.asarray(label), smoothing=0.2))
    assert abs(ref - mine) < 1e-6


def test_edges_output_parity(mesh_ops):
    """outputs_at='edges' gather/mean remap vs torch (reference layers.py:379-384)."""
    verts, faces, jops, _ = mesh_ops
    edges_np = np.stack([faces[:, 0], faces[:, 1]], axis=1)  # (E,2)

    tmodel = ref_layers.DiffusionNet(C_in=3, C_out=4, C_width=16, N_block=1,
                                     dropout=False, outputs_at="edges",
                                     with_gradient_features=False)
    _randomize_torch_model(tmodel)
    tmodel.eval()
    with torch.no_grad():
        out_ref = tmodel(torch.tensor(verts), torch.tensor(jops.mass),
                         L=None, evals=torch.tensor(jops.evals),
                         evecs=torch.tensor(jops.evecs), gradX=None, gradY=None,
                         edges=torch.tensor(edges_np)).numpy()

    fmodel = DiffusionNet(c_in=3, c_out=4, c_width=16, n_block=1,
                          dropout=False, outputs_at="edges",
                          with_gradient_features=False)
    kw = dict(evals=jnp.asarray(jops.evals), evecs=jnp.asarray(jops.evecs),
              edges=jnp.asarray(edges_np))
    fparams = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(verts),
                          jnp.asarray(jops.mass), **kw)
    fparams = _copy_weights_to_flax(tmodel, fparams, 1, with_grad=False)
    out = np.asarray(fmodel.apply(fparams, jnp.asarray(verts),
                                  jnp.asarray(jops.mass), **kw))
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-5)


def test_custom_mlp_hidden_dims_parity(mesh_ops):
    """Non-default mlp_hidden_dims (3 layers, mixed widths) vs torch."""
    verts, faces, jops, (L_sp, gX_sp, gY_sp) = mesh_ops
    hidden = [24, 40, 16]
    tmodel = ref_layers.DiffusionNet(C_in=3, C_out=5, C_width=16, N_block=1,
                                     dropout=False, mlp_hidden_dims=hidden)
    _randomize_torch_model(tmodel)
    tmodel.eval()
    with torch.no_grad():
        out_ref = tmodel(torch.tensor(verts), torch.tensor(jops.mass),
                         L=None, evals=torch.tensor(jops.evals),
                         evecs=torch.tensor(jops.evecs),
                         gradX=_scipy_to_torch_sparse(gX_sp),
                         gradY=_scipy_to_torch_sparse(gY_sp)).numpy()

    fmodel = DiffusionNet(c_in=3, c_out=5, c_width=16, n_block=1,
                          dropout=False, mlp_hidden_dims=tuple(hidden))
    kw = dict(evals=jnp.asarray(jops.evals), evecs=jnp.asarray(jops.evecs),
              gradX=jax.tree.map(jnp.asarray, jops.gradX),
              gradY=jax.tree.map(jnp.asarray, jops.gradY))
    fparams = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(verts),
                          jnp.asarray(jops.mass), **kw)
    fparams = _copy_weights_to_flax(tmodel, fparams, 1)
    out = np.asarray(fmodel.apply(fparams, jnp.asarray(verts),
                                  jnp.asarray(jops.mass), **kw))
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-5)


def test_cache_hash_parity_with_reference():
    """utils.hash_arrays must produce the reference's exact SHA1 keys so the
    operator/geodesic disk caches interoperate (reference utils.py:71-76)."""
    import diffusion_net.utils as ref_utils
    from diffusionnet_tpu.utils import hash_arrays
    rng = np.random.RandomState(0)
    verts = rng.randn(50, 3)
    faces = rng.randint(0, 50, (80, 3)).astype(np.int64)
    assert hash_arrays((verts, faces)) == ref_utils.hash_arrays((verts, faces))


def test_reference_reads_our_operator_cache(tmp_path, mesh_ops):
    """Cache interop, the strong form: a cache entry WRITTEN by this framework
    is loaded by the REFERENCE's own get_operators cache-hit path (which needs
    no native deps on a hit) and returns matching operators."""
    from tests.meshgen import icosphere
    from diffusionnet_tpu.geometry import get_operators as our_get_operators

    verts, faces = icosphere(subdivisions=1)
    cache = str(tmp_path)
    ours = our_get_operators(verts, faces, k_eig=8, op_cache_dir=cache)

    t_verts = torch.tensor(verts.astype(np.float32))
    t_faces = torch.tensor(faces)
    frames, mass, L, evals, evecs, gradX, gradY = ref_geometry.get_operators(
        t_verts, t_faces, k_eig=8, op_cache_dir=cache)

    # same bucket file (no recompute: the reference would have crashed on its
    # stubbed native deps if it missed the cache)
    import os
    assert len(os.listdir(cache)) == 1
    np.testing.assert_allclose(evals.numpy(), ours.evals, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(mass.numpy(), ours.mass, rtol=1e-5)
    np.testing.assert_allclose(frames.numpy(), ours.frames, rtol=1e-4,
                               atol=1e-5)
