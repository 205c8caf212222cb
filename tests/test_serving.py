"""AOT serving artifacts: export -> load -> serve parity and hermeticity.

The artifact contract (serving/export.py): self-contained StableHLO per
vertex bucket + params npz + manifest; loads with jax + numpy only (no model
definition); symbolic batch; pads V to the bucket and slices back."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionnet_tpu.geometry import compute_operators, stack_operators
from diffusionnet_tpu.models import DiffusionNet
from diffusionnet_tpu.serving import (export_forward,
                                      export_sharded_forward,
                                      load_serving_model,
                                      load_sharded_serving_model)
from tests.meshgen import icosphere

K = 16
V_BUCKET = 256


def _setup(outputs_at="vertices", c_out=5):
    verts, faces = icosphere(subdivisions=2)  # 162 verts
    ops = compute_operators(verts, faces, k_eig=K)
    model = DiffusionNet(c_in=3, c_out=c_out, c_width=16, n_block=2,
                         dropout=False, outputs_at=outputs_at)
    sops = stack_operators([ops], v_pad=V_BUCKET)
    x = np.zeros((1, V_BUCKET, 3), np.float32)
    x[0, :verts.shape[0]] = verts
    kw = dict(evals=jnp.asarray(sops.evals), evecs=jnp.asarray(sops.evecs),
              gradX=jnp.asarray(sops.gradX_spec),
              gradY=jnp.asarray(sops.gradY_spec))
    if outputs_at == "faces":
        kw_init = dict(kw, faces=jnp.asarray(faces, jnp.int32)[None])
    elif outputs_at == "edges":
        raise NotImplementedError("tests use vertices/faces")
    else:
        kw_init = kw
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(sops.mass), **kw_init)
    return verts, faces, ops, sops, model, params, x, kw


@pytest.fixture(scope="module")
def vertex_artifact(tmp_path_factory):
    verts, faces, ops, sops, model, params, x, kw = _setup()
    ref = model.apply(params, jnp.asarray(x), jnp.asarray(sops.mass), **kw)
    d = str(tmp_path_factory.mktemp("serving_artifact"))
    export_forward(model, params, v_buckets=(V_BUCKET, 2 * V_BUCKET),
                   out_dir=d, k_eig=K)
    return dict(dir=d, verts=verts, ops=ops, sops=sops, x=x,
                ref=np.asarray(ref))


def test_roundtrip_parity_batched(vertex_artifact):
    a = vertex_artifact
    sm = load_serving_model(a["dir"])
    out = sm(a["x"], a["sops"].mass, a["sops"].evals, a["sops"].evecs,
             a["sops"].gradX_spec, a["sops"].gradY_spec)
    np.testing.assert_allclose(np.asarray(out), a["ref"], rtol=2e-5,
                               atol=2e-6)


def test_unbatched_unpadded_input_pads_to_bucket(vertex_artifact):
    a = vertex_artifact
    sm = load_serving_model(a["dir"])
    v = a["verts"].shape[0]
    ops = a["ops"]
    out = sm(a["verts"].astype(np.float32), ops.mass, ops.evals, ops.evecs,
             ops.gradX_spec, ops.gradY_spec)
    assert out.shape == (v, a["ref"].shape[-1])
    np.testing.assert_allclose(np.asarray(out), a["ref"][0, :v], rtol=2e-5,
                               atol=2e-6)


def test_symbolic_batch_serves_any_batch_size(vertex_artifact):
    a = vertex_artifact
    sm = load_serving_model(a["dir"])
    s = a["sops"]
    rep = lambda arr: np.tile(np.asarray(arr), (3,) + (1,) * (arr.ndim - 1))
    out = sm(rep(a["x"]), rep(s.mass), rep(s.evals), rep(s.evecs),
             rep(s.gradX_spec), rep(s.gradY_spec))
    assert out.shape[0] == 3
    for i in range(3):
        np.testing.assert_allclose(np.asarray(out[i]), a["ref"][0],
                                   rtol=2e-5, atol=2e-6)


def test_k_truncation_and_errors(vertex_artifact):
    a = vertex_artifact
    sm = load_serving_model(a["dir"])
    ops = a["ops"]
    v = a["verts"].shape[0]
    pad_k = lambda arr: np.pad(np.asarray(arr), [(0, 0)] * (arr.ndim - 1)
                               + [(0, 4)])
    # K wider than the artifact: exact truncation (basis is ordered)
    out = sm(a["verts"].astype(np.float32), ops.mass, pad_k(ops.evals),
             pad_k(ops.evecs), pad_k(ops.gradX_spec), pad_k(ops.gradY_spec))
    np.testing.assert_allclose(np.asarray(out), a["ref"][0, :v], rtol=2e-5,
                               atol=2e-6)
    # K narrower: error
    with pytest.raises(ValueError, match="k_eig"):
        sm(a["verts"].astype(np.float32), ops.mass, ops.evals[:4],
           ops.evecs[:, :4], ops.gradX_spec[:, :4], ops.gradY_spec[:, :4])
    # wrong channel count: error
    with pytest.raises(ValueError, match="c_in"):
        sm(np.zeros((v, 7), np.float32), ops.mass, ops.evals, ops.evecs,
           ops.gradX_spec, ops.gradY_spec)
    # V beyond every bucket: error
    big = 3 * V_BUCKET
    with pytest.raises(ValueError, match="bucket"):
        sm(np.zeros((big, 3), np.float32), np.ones(big, np.float32),
           ops.evals, np.zeros((big, K), np.float32),
           np.zeros((big, K), np.float32), np.zeros((big, K), np.float32))


def test_manifest_contents(vertex_artifact):
    with open(os.path.join(vertex_artifact["dir"], "manifest.json")) as f:
        m = json.load(f)
    assert m["c_in"] == 3 and m["k_eig"] == K
    assert m["v_buckets"] == [V_BUCKET, 2 * V_BUCKET]
    assert m["outputs_at"] == "vertices" and m["index_input"] is None


def test_faces_output_artifact(tmp_path):
    verts, faces, ops, sops, model, params, x, kw = _setup(
        outputs_at="faces", c_out=4)
    f_inds = jnp.asarray(faces, jnp.int32)[None]
    ref = model.apply(params, jnp.asarray(x), jnp.asarray(sops.mass),
                      faces=f_inds, **kw)
    d = str(tmp_path / "faces_artifact")
    export_forward(model, params, v_buckets=(V_BUCKET,), out_dir=d, k_eig=K)
    sm = load_serving_model(d)
    with pytest.raises(ValueError, match="inds"):
        sm(x, sops.mass, sops.evals, sops.evecs, sops.gradX_spec,
           sops.gradY_spec)
    out = sm(x, sops.mass, sops.evals, sops.evecs, sops.gradX_spec,
             sops.gradY_spec, inds=np.asarray(f_inds))
    assert out.shape == (1, faces.shape[0], 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)
    # symbolic element count: a face subset through the same module
    out_half = sm(x, sops.mass, sops.evals, sops.evecs, sops.gradX_spec,
                  sops.gradY_spec, inds=np.asarray(f_inds)[:, ::2])
    np.testing.assert_allclose(np.asarray(out_half),
                               np.asarray(ref)[:, ::2], rtol=2e-5, atol=2e-6)


def test_prepared_mesh_parity_and_guards(vertex_artifact):
    """prepare() uploads operators once; handle(x) parity unbatched + batched
    (the batched path broadcasts the resident operators on device)."""
    a = vertex_artifact
    sm = load_serving_model(a["dir"])
    ops, v = a["ops"], a["verts"].shape[0]
    h = sm.prepare(ops.mass, ops.evals, ops.evecs, ops.gradX_spec,
                   ops.gradY_spec)
    assert h.v == v and h.bucket == V_BUCKET
    x = a["verts"].astype(np.float32)
    np.testing.assert_allclose(np.asarray(h(x)), a["ref"][0, :v],
                               rtol=2e-5, atol=2e-6)
    out3 = h(np.tile(x, (3, 1, 1)))
    assert out3.shape == (3, v, a["ref"].shape[-1])
    for i in range(3):
        np.testing.assert_allclose(np.asarray(out3[i]), a["ref"][0, :v],
                                   rtol=2e-5, atol=2e-6)
    # prepare_operators convenience + K-truncation through prepare
    h2 = sm.prepare_operators(ops)
    np.testing.assert_allclose(np.asarray(h2(x)), a["ref"][0, :v],
                               rtol=2e-5, atol=2e-6)
    pad_k = lambda arr: np.pad(np.asarray(arr), [(0, 0)] * (arr.ndim - 1)
                               + [(0, 4)])
    h3 = sm.prepare(ops.mass, pad_k(ops.evals), pad_k(ops.evecs),
                    pad_k(ops.gradX_spec), pad_k(ops.gradY_spec))
    np.testing.assert_allclose(np.asarray(h3(x)), a["ref"][0, :v],
                               rtol=2e-5, atol=2e-6)
    # guards
    with pytest.raises(ValueError, match="UNBATCHED"):
        sm.prepare(a["sops"].mass, a["sops"].evals, a["sops"].evecs,
                   a["sops"].gradX_spec, a["sops"].gradY_spec)
    with pytest.raises(ValueError, match="prepared for V"):
        h(np.zeros((v + 1, 3), np.float32))
    with pytest.raises(ValueError, match="c_in"):
        h(np.zeros((v, 7), np.float32))
    with pytest.raises(ValueError, match="no index input"):
        sm.prepare(ops.mass, ops.evals, ops.evecs, ops.gradX_spec,
                   ops.gradY_spec, inds=np.zeros((4, 3), np.int32))


def test_hot_path_no_implicit_host_transfers(vertex_artifact):
    """THE round-4 serving bug: __call__ round-tripped device operators
    through host numpy per request. With device-resident inputs, neither
    __call__ nor a prepared handle may perform ANY implicit host<->device
    transfer (jax.transfer_guard('disallow') raises on one)."""
    a = vertex_artifact
    sm = load_serving_model(a["dir"])
    s = a["sops"]
    dev = jax.device_put((jnp.asarray(a["x"]), jnp.asarray(s.mass),
                          jnp.asarray(s.evals), jnp.asarray(s.evecs),
                          jnp.asarray(s.gradX_spec),
                          jnp.asarray(s.gradY_spec)))
    ops = a["ops"]
    h = sm.prepare(ops.mass, ops.evals, ops.evecs, ops.gradX_spec,
                   ops.gradY_spec)
    xd = jax.device_put(jnp.asarray(a["verts"], jnp.float32))
    sm(*dev)   # warm both paths (compile outside the guard)
    h(xd)
    with jax.transfer_guard("disallow"):
        out1 = sm(*dev)
        out2 = h(xd)
        out2b = h(jnp.broadcast_to(xd, (4,) + xd.shape))
    jax.block_until_ready((out1, out2, out2b))
    v = a["verts"].shape[0]
    np.testing.assert_allclose(np.asarray(out2), a["ref"][0, :v],
                               rtol=2e-5, atol=2e-6)


def test_prepared_mesh_faces_artifact(tmp_path):
    """prepare() with an index-input artifact: faces indices are resident in
    the handle; requests stream x only."""
    verts, faces, ops, sops, model, params, x, kw = _setup(
        outputs_at="faces", c_out=4)
    f_inds = jnp.asarray(faces, jnp.int32)[None]
    ref = model.apply(params, jnp.asarray(x), jnp.asarray(sops.mass),
                      faces=f_inds, **kw)
    d = str(tmp_path / "faces_prepared")
    export_forward(model, params, v_buckets=(V_BUCKET,), out_dir=d, k_eig=K)
    sm = load_serving_model(d)
    with pytest.raises(ValueError, match="inds"):
        sm.prepare(ops.mass, ops.evals, ops.evecs, ops.gradX_spec,
                   ops.gradY_spec)
    h = sm.prepare(ops.mass, ops.evals, ops.evecs, ops.gradX_spec,
                   ops.gradY_spec, inds=faces)
    out = h(verts.astype(np.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[0],
                               rtol=2e-5, atol=2e-6)


def test_call_operators_convenience(vertex_artifact):
    a = vertex_artifact
    sm = load_serving_model(a["dir"])
    v = a["verts"].shape[0]
    out = sm.call_operators(a["verts"].astype(np.float32), a["ops"])
    np.testing.assert_allclose(np.asarray(out), a["ref"][0, :v], rtol=2e-5,
                               atol=2e-6)


def test_sharded_artifact_roundtrip(tmp_path):
    """Vertex-sharded export -> load -> serve over a 4-device CPU mesh
    matches the single-device forward; padding + K truncation + guards."""
    from jax.sharding import Mesh

    verts, faces, ops, sops, model, params, x, kw = _setup()
    ref = model.apply(params, jnp.asarray(x), jnp.asarray(sops.mass), **kw)
    d = str(tmp_path / "sharded_artifact")
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("vert",))
    export_sharded_forward(model, params, v_bucket=V_BUCKET, out_dir=d,
                           k_eig=K, mesh=mesh)
    with pytest.raises(ValueError, match="sharded"):
        load_serving_model(d)  # kind dispatch
    sm = load_sharded_serving_model(d, devices=jax.devices("cpu"))
    v = verts.shape[0]
    out = sm.call_operators(verts.astype(np.float32), ops)
    assert out.shape == (v, ref.shape[-1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[0, :v],
                               rtol=2e-5, atol=2e-6)
    # K wider than the artifact: exact truncation
    pad_k = lambda arr: np.pad(np.asarray(arr), [(0, 0)] * (arr.ndim - 1)
                               + [(0, 4)])
    out2 = sm(verts.astype(np.float32), ops.mass, pad_k(ops.evals),
              pad_k(ops.evecs), pad_k(ops.gradX_spec), pad_k(ops.gradY_spec))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref)[0, :v],
                               rtol=2e-5, atol=2e-6)
    # guards: batched input, oversized surface, bad bucket/device counts
    with pytest.raises(ValueError, match="ONE surface"):
        sm(x, sops.mass, sops.evals, sops.evecs, sops.gradX_spec,
           sops.gradY_spec)
    big = 2 * V_BUCKET
    with pytest.raises(ValueError, match="bucket"):
        sm(np.zeros((big, 3), np.float32), np.ones(big, np.float32),
           ops.evals, np.zeros((big, K), np.float32),
           np.zeros((big, K), np.float32), np.zeros((big, K), np.float32))
    with pytest.raises(ValueError, match="devices"):
        load_sharded_serving_model(d, devices=jax.devices("cpu")[:2])
    with pytest.raises(ValueError, match="divisible"):
        export_sharded_forward(model, params, v_bucket=V_BUCKET + 2,
                               out_dir=str(tmp_path / "bad"), k_eig=K,
                               mesh=mesh)


def test_sharded_artifact_global_mean(tmp_path):
    from jax.sharding import Mesh

    verts, faces, ops, sops, model, params, x, kw = _setup(
        outputs_at="global_mean", c_out=6)
    ref = model.apply(params, jnp.asarray(x), jnp.asarray(sops.mass), **kw)
    d = str(tmp_path / "gm_artifact")
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("vert",))
    export_sharded_forward(model, params, v_bucket=V_BUCKET, out_dir=d,
                           k_eig=K, mesh=mesh)
    sm = load_sharded_serving_model(d, devices=jax.devices("cpu"))
    out = sm.call_operators(verts.astype(np.float32), ops)
    assert out.shape == (6,)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[0],
                               rtol=2e-5, atol=2e-6)


_HERMETIC_LOADER = r"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")  # the experimental TPU plugin
# force-overrides JAX_PLATFORMS at interpreter start (see tests/conftest.py)

# The artifact must load + run WITHOUT the model stack: ban flax and the
# model/geometry/ops packages, then load serving/export.py by FILE PATH so
# the diffusionnet_tpu package __init__ (which pulls the full stack) never
# runs. This proves the serving module's only deps are jax + numpy.
import builtins
_real_import = builtins.__import__
def guarded(name, *a, **k):
    if (name == "flax" or name.startswith("flax.")
            or name.startswith("diffusionnet_tpu")):
        raise ImportError(f"hermetic serving loader tried to import {name}")
    return _real_import(name, *a, **k)
builtins.__import__ = guarded

import importlib.util
spec = importlib.util.spec_from_file_location("serving_export", sys.argv[3])
serving = importlib.util.module_from_spec(spec)
spec.loader.exec_module(serving)

artifact, inputs = sys.argv[1], sys.argv[2]
z = np.load(inputs)
sm = serving.load_serving_model(artifact)
out = sm(z["x"], z["mass"], z["evals"], z["evecs"], z["gX"], z["gY"])
print("CHECKSUM", float(np.abs(np.asarray(out) - z["ref"]).max()))
"""


def test_hermetic_subprocess_load(vertex_artifact, tmp_path):
    """A fresh process loads + serves the artifact with flax and every
    diffusionnet_tpu package import banned (serving/export.py loaded by file
    path) — the serving boundary is real: jax + numpy only."""
    import diffusionnet_tpu.serving.export as serving_export
    a = vertex_artifact
    s = a["sops"]
    inputs = str(tmp_path / "inputs.npz")
    np.savez(inputs, x=a["x"], mass=s.mass, evals=s.evals, evecs=s.evecs,
             gX=s.gradX_spec, gY=s.gradY_spec, ref=a["ref"])
    script = str(tmp_path / "loader.py")
    with open(script, "w") as f:
        f.write(_HERMETIC_LOADER)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, script, a["dir"], inputs, serving_export.__file__],
        capture_output=True, text=True, timeout=300, env=env)
    assert proc.returncode == 0, proc.stderr
    line = [l for l in proc.stdout.splitlines() if l.startswith("CHECKSUM")]
    assert line, proc.stdout
    assert float(line[0].split()[1]) < 1e-4


def test_export_sharded_rejects_too_few_devices(tmp_path):
    """n_devices larger than the host's device count must raise, not
    silently export a smaller mesh with the wrong shard topology."""
    *_, model, params, x, kw = _setup()
    with pytest.raises(ValueError, match="available"):
        export_sharded_forward(model, params, v_bucket=V_BUCKET,
                               out_dir=str(tmp_path / "nope"), k_eig=K,
                               n_devices=1024)


def test_explicit_platforms_honored(tmp_path, monkeypatch):
    """An explicit platforms list is recorded exactly; when lowering for an
    explicitly requested target fails, the exporter raises instead of
    silently shipping an artifact for a different backend (the default
    platforms=None keeps the local-backend fallback)."""
    import json as _json

    *_, model, params, x, kw = _setup()
    d = str(tmp_path / "cpu_only")
    export_forward(model, params, v_buckets=(V_BUCKET,), out_dir=d, k_eig=K,
                   platforms=("cpu",))
    with open(f"{d}/manifest.json") as f:
        assert _json.load(f)["platforms"] == ["cpu"]

    # simulate a host where cross-platform lowering is unavailable
    import jax.export as jexport
    real_export = jexport.export

    def failing_export(fn, platforms=None, **kw2):
        if platforms and list(platforms) != [jax.default_backend()]:
            raise NotImplementedError("no lowering for requested platforms")
        return real_export(fn, platforms=platforms, **kw2)

    monkeypatch.setattr(jexport, "export", failing_export)
    # explicit request: must propagate the failure
    with pytest.raises(NotImplementedError):
        export_forward(model, params, v_buckets=(V_BUCKET,),
                       out_dir=str(tmp_path / "bad"), k_eig=K,
                       platforms=("cpu", "tpu"))
    # default request: falls back to the local backend and records it
    d2 = str(tmp_path / "local_fb")
    export_forward(model, params, v_buckets=(V_BUCKET,), out_dir=d2, k_eig=K)
    with open(f"{d2}/manifest.json") as f:
        assert _json.load(f)["platforms"] == [jax.default_backend()]


def test_format_version_mismatch_rejected(vertex_artifact, tmp_path):
    """A loader from a different format generation must refuse the artifact
    with a clear error, not mis-read it (VERDICT r3 item 4)."""
    import shutil
    from diffusionnet_tpu.serving.export import MANIFEST_NAME

    d = str(tmp_path / "stale_artifact")
    shutil.copytree(vertex_artifact["dir"], d)
    mpath = os.path.join(d, MANIFEST_NAME)
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["format_version"] = 999
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="format_version"):
        load_serving_model(d)
    # a manifest with NO version field (pre-versioning artifact) is also
    # refused, not treated as current
    del manifest["format_version"]
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="format_version"):
        load_serving_model(d)
