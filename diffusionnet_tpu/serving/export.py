"""AOT serving artifacts: the forward pass exported to portable StableHLO.

The reference "serves" by rebuilding the model class in Python and loading a
torch state_dict into eager CUDA code (each driver, e.g.
/root/reference/experiments/human_segmentation_original/human_segmentation_original.py
model ctor + load_state_dict). The TPU-native story is ahead-of-time:
`export_forward` traces + lowers the jitted forward ONCE into self-contained
StableHLO modules (`jax.export`) — one per vertex bucket, batch dimension
symbolic — and writes them next to the params. A serving process calls
`load_serving_model(dir)` and needs only jax + numpy: no flax, no model class,
no geometry stack, no Python retracing; XLA compiles the shipped module for
whatever backend is present (TPU or CPU), so the same artifact deploys to a
serving fleet and to a laptop.

Inputs are the production spectral path (dense (V, K) spectral gradient
operators, see geometry.operators.Operators): x, mass, evals, evecs,
gradX_spec, gradY_spec — no sparse operators cross the serving boundary, so
per-mesh ELL degree never leaks into the artifact's shapes. Vertex counts are
handled exactly like training handles them: a fixed set of static V buckets
(XLA static shapes); the batch dimension is shape-polymorphic so one artifact
serves any batch size. `outputs_at='edges'/'faces'` adds one index input with
a symbolic element count.

Two artifact kinds share the directory layout:
  * kind="forward" (export_forward / load_serving_model): single-device,
    one module per vertex bucket, symbolic batch.
  * kind="sharded_forward" (export_sharded_forward /
    load_sharded_serving_model): ONE large surface vertex-sharded over an
    n-device mesh axis — the exported module embeds the GSPMD shardings, so
    the serving fleet gets the same collective schedule the exporter
    validated (all V-sized traffic stays device-local; the spectral
    projection reduces over shards).

Artifact directory layout:
    manifest.json          io spec, bucket list, metadata
    params.npz             parameters keyed by '/'-joined pytree path
    bucket_<V>.stablehlo   jax.export.Exported bytes for vertex bucket V
    sharded_<V>x<n>.stablehlo   sharded module (kind="sharded_forward")
"""

from __future__ import annotations

import functools as _functools
import json
import os
from typing import Any, Sequence

import numpy as np

MANIFEST_NAME = "manifest.json"
PARAMS_NAME = "params.npz"
FORMAT_VERSION = 1


# ---------------------------------------------------------------------------
# params (de)serialization — '/'-joined-path npz, reconstructable WITHOUT a
# pytree template (unlike training.checkpoint, which restores into a template;
# the serving loader must not need the model definition to build one)

def _flatten_params(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            k = str(k)
            if "/" in k:
                raise ValueError(f"param key {k!r} contains '/'")
            flat.update(_flatten_params(v, f"{prefix}{k}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for path, leaf in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return tree


# ---------------------------------------------------------------------------
# export

_PORTABLE_PLATFORMS = ("cpu", "tpu")


def _params_spec(params):
    """Shape/dtype skeleton of the param pytree WITHOUT transferring device
    arrays to host (jax arrays and np arrays both expose .shape/.dtype)."""
    import jax

    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            np.shape(a), getattr(a, "dtype", None) or np.asarray(a).dtype),
        params)


def _export_with_platforms(jfn, spec_args, platforms):
    """jax.export with honest platform semantics: an EXPLICIT platforms list
    is honored exactly (failure raises — never silently ship an artifact for
    a different target than requested); platforms=None tries the portable
    ('cpu', 'tpu') pair and falls back to the local backend only when
    cross-platform lowering is unavailable on this host.

    Returns (used_platforms, exported)."""
    import jax
    from jax import export as jexport

    if platforms is not None:
        used = list(platforms)
        return used, jexport.export(jfn, platforms=used)(*spec_args)
    used = list(_PORTABLE_PLATFORMS)
    try:
        return used, jexport.export(jfn, platforms=used)(*spec_args)
    except Exception:
        used = [jax.default_backend()]
        return used, jexport.export(jfn, platforms=used)(*spec_args)


def _write_params_manifest(out_dir: str, params, manifest: dict) -> None:
    import jax

    flat = _flatten_params(jax.tree.map(lambda a: np.asarray(a), params))
    np.savez(os.path.join(out_dir, PARAMS_NAME), **flat)
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1)


def _io_kind(outputs_at: str) -> dict:
    if outputs_at in ("vertices", "global_mean"):
        return {"index_input": None}
    if outputs_at == "edges":
        return {"index_input": "edges", "index_width": 2}
    if outputs_at == "faces":
        return {"index_input": "faces", "index_width": 3}
    raise ValueError(f"unsupported outputs_at={outputs_at!r}")


def export_forward(model, params, v_buckets: Sequence[int], out_dir: str,
                   k_eig: int, platforms: Sequence[str] | None = None,
                   extra_metadata: dict | None = None) -> str:
    """Export `model.apply(params, ...)` (deterministic forward, spectral path)
    as a portable serving artifact under `out_dir`.

    model: a models.DiffusionNet (any outputs_at). params: its init pytree.
    v_buckets: static vertex paddings to export, e.g. (1024, 4096, 16384).
    k_eig: the spectral basis width the operators were computed with.
    platforms: lowering targets baked into each module. An explicit list is
    honored exactly (failure raises); the default None targets ('cpu', 'tpu')
    and falls back to the local backend if cross-platform lowering is
    unavailable on this host.

    Returns out_dir. Loading needs only `load_serving_model` (jax + numpy).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if model.diffusion_method != "spectral":
        raise ValueError("export_forward supports diffusion_method='spectral' "
                         "(the production serving path)")
    v_buckets = sorted(set(int(v) for v in v_buckets))
    if not v_buckets:
        raise ValueError("need at least one vertex bucket")
    io = _io_kind(model.outputs_at)

    os.makedirs(out_dir, exist_ok=True)
    f32 = jnp.float32

    def make_fwd(with_inds: str | None):
        if with_inds is None:
            def fwd(params, x, mass, evals, evecs, gX, gY):
                return model.apply(params, x, mass, evals=evals, evecs=evecs,
                                   gradX=gX, gradY=gY)
        elif with_inds == "edges":
            def fwd(params, x, mass, evals, evecs, gX, gY, inds):
                return model.apply(params, x, mass, evals=evals, evecs=evecs,
                                   gradX=gX, gradY=gY, edges=inds)
        else:
            def fwd(params, x, mass, evals, evecs, gX, gY, inds):
                return model.apply(params, x, mass, evals=evals, evecs=evecs,
                                   gradX=gX, gradY=gY, faces=inds)
        return fwd

    fwd = make_fwd(io["index_input"])
    params_spec = _params_spec(params)

    used_platforms = platforms  # decided by the first bucket's export; every
    # bucket then uses the same list so the manifest is true for all of them
    for v in v_buckets:
        if io["index_input"] is None:
            b, = jexport.symbolic_shape("b")
            args = (jax.ShapeDtypeStruct((b, v, model.c_in), f32),
                    jax.ShapeDtypeStruct((b, v), f32),
                    jax.ShapeDtypeStruct((b, k_eig), f32),
                    jax.ShapeDtypeStruct((b, v, k_eig), f32),
                    jax.ShapeDtypeStruct((b, v, k_eig), f32),
                    jax.ShapeDtypeStruct((b, v, k_eig), f32))
        else:
            b, e = jexport.symbolic_shape("b, e")
            args = (jax.ShapeDtypeStruct((b, v, model.c_in), f32),
                    jax.ShapeDtypeStruct((b, v), f32),
                    jax.ShapeDtypeStruct((b, k_eig), f32),
                    jax.ShapeDtypeStruct((b, v, k_eig), f32),
                    jax.ShapeDtypeStruct((b, v, k_eig), f32),
                    jax.ShapeDtypeStruct((b, v, k_eig), f32),
                    jax.ShapeDtypeStruct((b, e, io["index_width"]),
                                         jnp.int32))
        used_platforms, exported = _export_with_platforms(
            jax.jit(fwd), (params_spec, *args), used_platforms)
        with open(os.path.join(out_dir, f"bucket_{v}.stablehlo"), "wb") as f:
            f.write(exported.serialize())

    manifest = {
        "format_version": FORMAT_VERSION,
        "kind": "forward",
        "c_in": int(model.c_in),
        "c_out": int(model.c_out),
        "k_eig": int(k_eig),
        "outputs_at": model.outputs_at,
        "index_input": io["index_input"],
        "v_buckets": v_buckets,
        "platforms": used_platforms,
        "batch_symbolic": True,
        "metadata": extra_metadata or {},
    }
    _write_params_manifest(out_dir, params, manifest)
    return out_dir


def export_sharded_forward(model, params, v_bucket: int, out_dir: str,
                           k_eig: int, mesh=None, n_devices: int | None = None,
                           platforms: Sequence[str] | None = None,
                           extra_metadata: dict | None = None) -> str:
    """Export a VERTEX-SHARDED forward for one large surface (the 200k+-vertex
    serving case) as a portable artifact.

    The jitted forward is exported with its GSPMD shardings baked in: every
    (V, ...) input/output row-sharded over an n-device 'vert' mesh axis,
    params/evals replicated (parallel.vertex_sharded's recipe — the spectral
    projection phi^T(m x) becomes local matmul + psum; all V-sized traffic
    stays device-local). Loading (`load_sharded_serving_model`) rebuilds an
    n-device mesh and serves a surface padded to v_bucket.

    mesh: a jax.sharding.Mesh with a 'vert' axis to export against; or pass
    n_devices to build one from jax.devices()[:n]. outputs_at must be
    'vertices' or 'global_mean' (edges/faces remaps gather across shards —
    serve those via the bucketed single-device artifact instead).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if model.diffusion_method != "spectral":
        raise ValueError("export_sharded_forward supports "
                         "diffusion_method='spectral'")
    if model.outputs_at not in ("vertices", "global_mean"):
        raise ValueError("sharded serving supports outputs_at='vertices' or "
                         "'global_mean'")
    if mesh is None:
        if n_devices is None:
            raise ValueError("pass mesh= or n_devices=")
        devs = jax.devices()
        if len(devs) < n_devices:
            # a short slice would silently export the wrong shard topology
            raise ValueError(
                f"n_devices={n_devices} but only {len(devs)} devices are "
                f"available on this host; export on a host with >= "
                f"{n_devices} devices (or pass an explicit mesh=)")
        mesh = Mesh(np.array(devs[:n_devices]), ("vert",))
    n = int(np.prod(mesh.devices.shape))
    if v_bucket % n != 0:
        raise ValueError(f"v_bucket={v_bucket} not divisible by the mesh's "
                         f"{n} devices")

    vs1 = NamedSharding(mesh, P("vert"))
    vs2 = NamedSharding(mesh, P("vert", None))
    repl = NamedSharding(mesh, P())

    def fwd(params, x, mass, evals, evecs, gX, gY):
        return model.apply(params, x, mass, evals=evals, evecs=evecs,
                           gradX=gX, gradY=gY)

    out_sharding = vs2 if model.outputs_at == "vertices" else repl
    jfwd = jax.jit(fwd,
                   in_shardings=(repl, vs2, vs1, repl, vs2, vs2, vs2),
                   out_shardings=out_sharding)
    f32 = jnp.float32
    sds = lambda shape: jax.ShapeDtypeStruct(shape, f32)
    params_spec = _params_spec(params)
    v = int(v_bucket)
    args = (sds((v, model.c_in)), sds((v,)), sds((k_eig,)), sds((v, k_eig)),
            sds((v, k_eig)), sds((v, k_eig)))

    used_platforms, exported = _export_with_platforms(
        jfwd, (params_spec, *args), platforms)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"sharded_{v}x{n}.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    manifest = {
        "format_version": FORMAT_VERSION,
        "kind": "sharded_forward",
        "c_in": int(model.c_in),
        "c_out": int(model.c_out),
        "k_eig": int(k_eig),
        "outputs_at": model.outputs_at,
        "v_bucket": v,
        "n_devices": n,
        "platforms": used_platforms,
        "metadata": extra_metadata or {},
    }
    _write_params_manifest(out_dir, params, manifest)
    return out_dir


# ---------------------------------------------------------------------------
# load + serve

def _call_from_operators(serving_model, x, ops, **kw):
    """Shared body of {ServingModel,ShardedServingModel}.call_operators."""
    if ops.gradX_spec is None:
        raise ValueError("Operators bundle lacks spectral gradient "
                         "operators (computed by compute_operators)")
    return serving_model(x, ops.mass, ops.evals, ops.evecs, ops.gradX_spec,
                         ops.gradY_spec, **kw)


def _as_f32(a):
    """Device-put/convert WITHOUT a host round-trip: a jax Array stays on
    device (dtype cast runs there); host data uploads once."""
    import jax.numpy as jnp

    return jnp.asarray(a, jnp.float32)


@_functools.lru_cache(maxsize=None)
def _padder(ndim: int, axis: int, amount: int):
    import jax
    import jax.numpy as jnp

    pads = [(0, 0)] * ndim
    pads[axis] = (0, amount)
    return jax.jit(lambda a: jnp.pad(a, pads))


def _pad_axis(a, axis: int, amount: int):
    """Zero-pad one axis on device. Runs under jit so the fill constant is
    baked into the executable — eager jnp.pad implicitly uploads its scalar,
    which trips jax.transfer_guard('disallow') on the serving hot path."""
    if amount == 0:
        return a
    return _padder(a.ndim, axis % a.ndim, amount)(a)


@_functools.lru_cache(maxsize=None)
def _trunc_v(v: int):
    """jitted `a[..., :v, :]` — eager __getitem__ implicitly uploads index
    scalars, tripping jax.transfer_guard('disallow') on the hot path."""
    import jax

    return jax.jit(lambda a: a[..., :v, :])


@_functools.lru_cache(maxsize=None)
def _first_row():
    """jitted `a[0]` (see _trunc_v)."""
    import jax

    return jax.jit(lambda a: a[0])


class PreparedMesh:
    """Device-resident per-mesh serving handle (the production hot path).

    `ServingModel.prepare(...)` validates, K-truncates, pads to the bucket and
    uploads the per-mesh operators ONCE; each `handle(x)` then moves only the
    signal `x` (V, c_in) or (B, V, c_in) — the operators never re-cross the
    host<->device boundary. This mirrors how the reference serves: operators
    go `.to(device)` once per mesh, not per request
    (reference experiments/human_segmentation_original/human_segmentation_original.py:121-130).

    Batched requests broadcast the resident operators to (B, ...) on device;
    the broadcast result is cached per batch size.
    """

    def __init__(self, sm: "ServingModel", v: int, bucket: int, ops1, inds1):
        self._sm = sm
        self.v = v
        self.bucket = bucket
        self._ops1 = ops1    # (mass, evals, evecs, gX, gY) each batch-1 padded
        self._inds1 = inds1  # (1, E, w) int32 or None
        self._cache = {}     # batch size -> broadcasted operand tuple
        self._fns = {}       # (batch, unbatched) -> one fused jitted request

    def _batched(self, b: int):
        import jax.numpy as jnp

        got = self._cache.get(b)
        if got is None:
            bc = lambda a: jnp.broadcast_to(a, (b,) + a.shape[1:])
            got = tuple(bc(a) for a in self._ops1) + (
                (None if self._inds1 is None else bc(self._inds1)),)
            self._cache[b] = got
        return got

    def _request_fn(self, b: int, unbatched: bool):
        """ONE jitted program per (batch, unbatched): expand + pad + the
        exported call + truncate/squeeze. Chaining those as eager ops costs
        one dispatch each — through a tunneled device that overhead dwarfed
        the model itself (measured 2.3 ms vs 0.75 ms at V=2048)."""
        import jax
        import jax.numpy as jnp

        key = (b, unbatched)
        fn = self._fns.get(key)
        if fn is None:
            m = self._sm.manifest
            bucket, v = self.bucket, self.v
            inner = self._sm._fns[bucket]
            trunc = m["outputs_at"] == "vertices" and bucket != v

            def f(params, x, *ops):
                if unbatched:
                    x = x[None]
                if bucket != v:
                    x = jnp.pad(x, ((0, 0), (0, bucket - v), (0, 0)))
                out = inner(params, x, *ops)
                if trunc:
                    out = out[..., :v, :]
                if unbatched:
                    out = out[0]
                return out

            fn = jax.jit(f)
            self._fns[key] = fn
        return fn

    def __call__(self, x):
        m = self._sm.manifest
        unbatched = np.ndim(x) == 2
        x = _as_f32(x)
        if x.shape[-1] != m["c_in"]:
            raise ValueError(f"x has {x.shape[-1]} channels; artifact "
                             f"expects c_in={m['c_in']}")
        if x.shape[-2] != self.v:
            raise ValueError(f"x has {x.shape[-2]} vertices; this handle was "
                             f"prepared for V={self.v}")
        b = 1 if unbatched else x.shape[0]
        ops_inds = self._batched(b)
        args = ops_inds[:-1] if ops_inds[-1] is None else ops_inds
        return self._request_fn(b, unbatched)(self._sm.params, x, *args)


class ServingModel:
    """A loaded serving artifact: callable, bucket-dispatching forward.

    call(x, mass, evals, evecs, gradX_spec, gradY_spec, inds=None)
      x: (V, c_in) or (B, V, c_in) float; operators shaped to match
      (geometry.Operators fields; inds = edges/faces indices when the artifact
      was exported with outputs_at='edges'/'faces').
    Vertex counts are padded up to the smallest exported bucket >= V; the
    output is sliced back to V (vertex outputs) or returned as-is
    (global_mean). K wider than the artifact's k_eig is truncated (the
    spectral basis is ordered); narrower is an error.
    """

    def __init__(self, manifest: dict, params: dict, buckets: dict):
        import jax
        import jax.numpy as jnp

        self.manifest = manifest
        # params live on device from load time — passing the npz's numpy
        # arrays through jit would re-upload them on EVERY request
        self.params = jax.tree.map(jnp.asarray, params)
        self._buckets = buckets  # v -> jax.export.Exported
        # jit-wrap each module's call once: Exported.call alone rebuilds its
        # wrapper and dispatches eagerly per request; under jit the serving
        # hot loop hits the compiled-executable cache (one entry per
        # (bucket, concrete batch size))
        self._fns = {v: jax.jit(ex.call) for v, ex in buckets.items()}

    @property
    def v_buckets(self):
        return sorted(self._buckets)

    def pick_bucket(self, v: int) -> int:
        """Smallest exported vertex bucket >= v (the serving dispatch rule)."""
        for b in self.v_buckets:
            if v <= b:
                return b
        raise ValueError(
            f"mesh has {v} vertices but the largest exported bucket is "
            f"{self.v_buckets[-1]}; re-export with a larger bucket")

    def __call__(self, x, mass, evals, evecs, gradX_spec, gradY_spec,
                 inds=None):
        import jax.numpy as jnp

        m = self.manifest
        unbatched = np.ndim(x) == 2
        x, mass, evals, evecs, gX, gY = (
            _as_f32(a) for a in (x, mass, evals, evecs, gradX_spec,
                                 gradY_spec))
        if unbatched:
            x, mass, evals = x[None], mass[None], evals[None]
            evecs, gX, gY = evecs[None], gX[None], gY[None]
        if m["index_input"] is not None:
            if inds is None:
                raise ValueError(
                    f"artifact was exported with outputs_at="
                    f"{m['outputs_at']!r}; pass inds={m['index_input']}")
            inds = jnp.asarray(inds, jnp.int32)
            if unbatched:
                inds = inds[None]

        if x.shape[-1] != m["c_in"]:
            raise ValueError(f"x has {x.shape[-1]} channels; artifact "
                             f"expects c_in={m['c_in']}")
        evals, evecs, gX, gY = self._truncate_k(evals, evecs, gX, gY)

        v = x.shape[-2]
        bucket = self.pick_bucket(v)
        if bucket != v:  # all padding on device (no host round-trip)
            pad = bucket - v
            x, evecs = _pad_axis(x, -2, pad), _pad_axis(evecs, -2, pad)
            gX, gY = _pad_axis(gX, -2, pad), _pad_axis(gY, -2, pad)
            mass = _pad_axis(mass, -1, pad)

        args = (self.params, x, mass, evals, evecs, gX, gY)
        if m["index_input"] is not None:
            args = args + (inds,)
        out = self._fns[bucket](*args)

        if m["outputs_at"] == "vertices" and bucket != v:
            out = _trunc_v(v)(out)
        if unbatched:
            out = _first_row()(out)
        return out

    def _truncate_k(self, evals, evecs, gX, gY):
        """K wider than the artifact's k_eig truncates exactly (the spectral
        basis is ordered); narrower is an error."""
        k, want = evals.shape[-1], self.manifest["k_eig"]
        if k < want:
            raise ValueError(f"operators have K={k} < artifact k_eig="
                             f"{want}; recompute with larger k_eig")
        if k > want:
            evals, evecs = evals[..., :want], evecs[..., :want]
            gX, gY = gX[..., :want], gY[..., :want]
        return evals, evecs, gX, gY

    def prepare(self, mass, evals, evecs, gradX_spec, gradY_spec,
                inds=None) -> PreparedMesh:
        """Upload + pad the per-mesh operators ONCE; returns a PreparedMesh
        handle whose `handle(x)` streams only the signal per request.

        Operators are UNBATCHED: mass (V,), evals (K,), evecs/gradX_spec/
        gradY_spec (V, K); inds (E, 2)/(F, 3) when the artifact was exported
        with outputs_at='edges'/'faces'. Use this for the serving hot loop —
        per-request operator shipping is pure data-motion waste (operators
        are per-mesh constants)."""
        import jax.numpy as jnp

        m = self.manifest
        mass, evals, evecs, gX, gY = (
            _as_f32(a) for a in (mass, evals, evecs, gradX_spec, gradY_spec))
        if evecs.ndim != 2 or mass.ndim != 1 or evals.ndim != 1:
            raise ValueError("prepare() takes UNBATCHED operators: mass (V,),"
                             " evals (K,), evecs/gradX_spec/gradY_spec (V, K)")
        evals, evecs, gX, gY = self._truncate_k(evals, evecs, gX, gY)
        v = evecs.shape[0]
        bucket = self.pick_bucket(v)
        pad = bucket - v
        evecs, gX, gY = (_pad_axis(a, 0, pad) for a in (evecs, gX, gY))
        mass = _pad_axis(mass, 0, pad)
        ops1 = tuple(a[None] for a in (mass, evals, evecs, gX, gY))
        inds1 = None
        if m["index_input"] is not None:
            if inds is None:
                raise ValueError(
                    f"artifact was exported with outputs_at="
                    f"{m['outputs_at']!r}; pass inds={m['index_input']}")
            inds1 = jnp.asarray(inds, jnp.int32)[None]
        elif inds is not None:
            raise ValueError("artifact takes no index input")
        return PreparedMesh(self, v, bucket, ops1, inds1)

    def prepare_operators(self, ops) -> PreparedMesh:
        """prepare() from a geometry.Operators bundle (needs ops.gradX_spec;
        faces/edges indices must be passed to prepare() directly)."""
        if ops.gradX_spec is None:
            raise ValueError("Operators bundle lacks spectral gradient "
                             "operators (computed by compute_operators)")
        return self.prepare(ops.mass, ops.evals, ops.evecs, ops.gradX_spec,
                            ops.gradY_spec)

    def call_operators(self, x, ops, inds=None):
        """Convenience: forward from a geometry.Operators bundle (uses the
        dense spectral gradient operators; requires ops.gradX_spec)."""
        return _call_from_operators(self, x, ops, inds=inds)


class ShardedServingModel:
    """A loaded vertex-sharded artifact: serves ONE large surface over an
    n-device mesh. call(x, mass, evals, evecs, gradX_spec, gradY_spec) with
    unbatched (V, ...) inputs; V is padded to the exported bucket and vertex
    outputs sliced back. The module's GSPMD shardings are embedded — XLA
    re-materializes the exporter's collective schedule on the local devices."""

    def __init__(self, manifest: dict, params: dict, exported, devices=None):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        self.manifest = manifest
        self._exported = exported
        self._fn = jax.jit(exported.call)  # cached-executable dispatch
        n = manifest["n_devices"]
        devices = list(jax.devices() if devices is None else devices)
        if len(devices) < n:
            raise ValueError(
                f"artifact was exported for {n} devices; only "
                f"{len(devices)} available (pass devices= to override)")
        self.mesh = Mesh(np.array(devices[:n]), ("vert",))
        self._vs1 = NamedSharding(self.mesh, P("vert"))
        self._vs2 = NamedSharding(self.mesh, P("vert", None))
        self._repl = NamedSharding(self.mesh, P())
        self.params = jax.device_put(params, self._repl)

    def _normalize(self, x, mass, evals, evecs, gX, gY):
        """Validate + K-truncate + pad to the bucket, all device-side;
        returns sharded (x, mass, evals, evecs, gX, gY) and the true V."""
        import jax

        m = self.manifest
        x, mass, evals, evecs, gX, gY = (
            _as_f32(a) for a in (x, mass, evals, evecs, gX, gY))
        if x.ndim != 2:
            raise ValueError("sharded serving takes ONE surface: x (V, c_in)")
        if x.shape[-1] != m["c_in"]:
            raise ValueError(f"x has {x.shape[-1]} channels; artifact "
                             f"expects c_in={m['c_in']}")
        k = evals.shape[-1]
        if k < m["k_eig"]:
            raise ValueError(f"operators have K={k} < artifact k_eig="
                             f"{m['k_eig']}; recompute with larger k_eig")
        if k > m["k_eig"]:
            kk = m["k_eig"]
            evals, evecs = evals[:kk], evecs[:, :kk]
            gX, gY = gX[:, :kk], gY[:, :kk]

        v, bucket = x.shape[0], m["v_bucket"]
        if v > bucket:
            raise ValueError(f"surface has {v} vertices > exported bucket "
                             f"{bucket}; re-export with a larger bucket")
        pad = bucket - v
        x, evecs = _pad_axis(x, 0, pad), _pad_axis(evecs, 0, pad)
        gX, gY = _pad_axis(gX, 0, pad), _pad_axis(gY, 0, pad)
        mass = _pad_axis(mass, 0, pad)
        put = jax.device_put
        return (put(x, self._vs2), put(mass, self._vs1),
                put(evals, self._repl), put(evecs, self._vs2),
                put(gX, self._vs2), put(gY, self._vs2)), v

    def __call__(self, x, mass, evals, evecs, gradX_spec, gradY_spec):
        (x, mass, evals, evecs, gX, gY), v = self._normalize(
            x, mass, evals, evecs, gradX_spec, gradY_spec)
        out = self._fn(self.params, x, mass, evals, evecs, gX, gY)
        m = self.manifest
        if m["outputs_at"] == "vertices" and m["v_bucket"] != v:
            out = _trunc_v(v)(out)
        return out

    def prepare(self, mass, evals, evecs, gradX_spec,
                gradY_spec) -> "PreparedSurface":
        """Shard + pad the surface's operators over the mesh ONCE; returns a
        PreparedSurface handle whose `handle(x)` streams only the signal."""
        dummy_x = np.zeros((evecs.shape[0], self.manifest["c_in"]),
                           np.float32)
        (_, mass, evals, evecs, gX, gY), v = self._normalize(
            dummy_x, mass, evals, evecs, gradX_spec, gradY_spec)
        return PreparedSurface(self, v, (mass, evals, evecs, gX, gY))

    def prepare_operators(self, ops) -> "PreparedSurface":
        """prepare() from a geometry.Operators bundle (needs ops.gradX_spec)."""
        if ops.gradX_spec is None:
            raise ValueError("Operators bundle lacks spectral gradient "
                             "operators (computed by compute_operators)")
        return self.prepare(ops.mass, ops.evals, ops.evecs, ops.gradX_spec,
                            ops.gradY_spec)

    def call_operators(self, x, ops):
        """Forward from a geometry.Operators bundle (needs ops.gradX_spec)."""
        return _call_from_operators(self, x, ops)


class PreparedSurface:
    """Device-resident sharded-serving handle: the surface's operators live
    sharded over the mesh; each call ships only x (V, c_in)."""

    def __init__(self, ssm: ShardedServingModel, v: int, ops):
        self._ssm = ssm
        self.v = v
        self._ops = ops  # (mass, evals, evecs, gX, gY), sharded + padded

    def __call__(self, x):
        import jax

        ssm, m = self._ssm, self._ssm.manifest
        x = _as_f32(x)
        if x.ndim != 2:
            raise ValueError("sharded serving takes ONE surface: x (V, c_in)")
        if x.shape[-1] != m["c_in"]:
            raise ValueError(f"x has {x.shape[-1]} channels; artifact "
                             f"expects c_in={m['c_in']}")
        if x.shape[0] != self.v:
            raise ValueError(f"x has {x.shape[0]} vertices; this handle was "
                             f"prepared for V={self.v}")
        x = jax.device_put(_pad_axis(x, 0, m["v_bucket"] - self.v), ssm._vs2)
        out = ssm._fn(ssm.params, x, *self._ops)
        if m["outputs_at"] == "vertices" and m["v_bucket"] != self.v:
            out = _trunc_v(self.v)(out)
        return out


def _read_manifest_params(artifact_dir: str):
    with open(os.path.join(artifact_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported artifact format_version="
            f"{manifest.get('format_version')} (this build reads "
            f"{FORMAT_VERSION})")
    npz = np.load(os.path.join(artifact_dir, PARAMS_NAME))
    params = _unflatten_params({k: npz[k] for k in npz.files})
    return manifest, params


def load_serving_model(artifact_dir: str) -> ServingModel:
    """Load an artifact written by export_forward. Needs jax + numpy only."""
    from jax import export as jexport

    manifest, params = _read_manifest_params(artifact_dir)
    kind = manifest.get("kind", "forward")
    if kind != "forward":
        raise ValueError(f"artifact kind={kind!r}; use "
                         "load_sharded_serving_model for sharded artifacts")
    buckets = {}
    for v in manifest["v_buckets"]:
        with open(os.path.join(artifact_dir, f"bucket_{v}.stablehlo"),
                  "rb") as f:
            buckets[int(v)] = jexport.deserialize(f.read())
    return ServingModel(manifest, params, buckets)


def load_sharded_serving_model(artifact_dir: str,
                               devices=None) -> ShardedServingModel:
    """Load an artifact written by export_sharded_forward. Needs jax + numpy
    only; builds an n-device 'vert' mesh from `devices` (default
    jax.devices())."""
    from jax import export as jexport

    manifest, params = _read_manifest_params(artifact_dir)
    kind = manifest.get("kind", "forward")
    if kind != "sharded_forward":
        raise ValueError(f"artifact kind={kind!r}; use load_serving_model "
                         "for bucketed single-device artifacts")
    name = f"sharded_{manifest['v_bucket']}x{manifest['n_devices']}.stablehlo"
    with open(os.path.join(artifact_dir, name), "rb") as f:
        exported = jexport.deserialize(f.read())
    return ShardedServingModel(manifest, params, exported, devices=devices)
