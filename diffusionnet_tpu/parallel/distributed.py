"""Multi-host / multi-slice initialization.

The reference is strictly single-GPU (SURVEY §2.6). For TPU pods:
`initialize()` wires up jax.distributed (one process per host), and
`make_pod_mesh` builds a (data, vert) mesh over all global devices, laying the
`vert` (model/vertex-sharding) axis within a slice so its collectives ride ICI
while the `data` axis spans slices over DCN — the standard
fast-axis-inner/slow-axis-outer layout.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or the TPU environment (no-op if
    already initialized or single-process). A genuine init FAILURE with an
    explicit coordinator_address re-raises — silently proceeding would run N
    independent single-process copies that train divergently with no error."""
    # structural already-initialized check first (the exception-text match
    # below is a fallback — a JAX release rewording the message must not turn
    # a harmless double-init into a hard raise)
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        print("jax.distributed already initialized; skipping")
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already" in msg and "initialize" in msg:
            print(f"jax.distributed.initialize skipped: {e}")
            return
        if coordinator_address is None and num_processes in (None, 1):
            # single-process environment probing: nothing to coordinate
            print(f"jax.distributed.initialize skipped: {e}")
            return
        raise


def make_pod_mesh(vert: int = 1) -> Mesh:
    """(data, vert) mesh over all global devices; `vert` kept within a slice.

    Devices are ordered so consecutive devices share a slice (jax.devices()
    already groups by process/slice); reshaping to (-1, vert) therefore puts
    the vert axis on ICI neighbors.
    """
    devices = np.asarray(jax.devices())
    if devices.size % vert != 0:
        raise ValueError(f"{devices.size} devices not divisible by vert={vert}")
    local = jax.local_device_count()
    if vert > 1 and local % vert != 0 and vert % local != 0:
        # a vert group would straddle a host/slice boundary, so the per-block
        # psum would ride DCN instead of ICI — refuse instead of silently
        # delivering orders-of-magnitude slower collectives
        raise ValueError(
            f"vert={vert} does not tile the {local} devices per process; "
            "vert groups would span slices (collectives over DCN)")
    return Mesh(devices.reshape(-1, vert), axis_names=("data", "vert"))


# ---------------------------------------------------------------------------
# Real multi-PROCESS execution (round 3, VERDICT r2 item 2): spawn N OS
# processes, wire them through jax.distributed.initialize, and run (a) a
# data-parallel train step whose collectives actually cross process
# boundaries and (b) precompute_shard_for_host into a shared cache. On a
# real pod each host runs the same code with the TPU runtime's coordinator;
# here the CPU backend's cross-process collectives prove the code path.
# ---------------------------------------------------------------------------


def _mp_child_main(coordinator: str, num_processes: int, process_id: int,
                   out_path: str, cache_dir: str) -> None:
    """Entry point of one spawned process (see run_multiprocess_dryrun)."""
    import json
    import hashlib

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    initialize(coordinator_address=coordinator,
               num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = jax.device_count()
    n_local = jax.local_device_count()
    assert n_global == n_local * num_processes, (n_global, n_local)

    mesh = make_pod_mesh(vert=1)

    # (a) one DP train step: grads pmean over a mesh spanning BOTH processes
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .data_parallel import make_dp_train_step

    B_global = n_global * 2
    rs = np.random.RandomState(0)                 # same data in both procs
    X_all = rs.randn(B_global, 8).astype(np.float32)
    y_all = rs.randn(B_global, 1).astype(np.float32)
    sharding = NamedSharding(mesh, P("data"))
    # each process contributes its local rows of the global batch
    def make_global(a):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")),
            a.reshape(num_processes, -1, *a.shape[1:])[process_id])
    Xs, ys = make_global(X_all), make_global(y_all)

    params = {"w": jnp.zeros((8, 1)), "b": jnp.zeros((1,))}

    def loss_fn(p, batch, rng):
        X, y = batch
        return jnp.mean((X @ p["w"] + p["b"] - y) ** 2)

    optimizer = optax.adam(1e-1)
    opt_state = optimizer.init(params)
    step = make_dp_train_step(loss_fn, optimizer, mesh, donate=False)
    params, opt_state, loss = step(params, opt_state, (Xs, ys),
                                   jax.random.PRNGKey(0))
    loss = float(loss)

    # parameter replicas must agree bit-for-bit across processes
    w_local = np.asarray(jax.device_get(params["w"]))
    param_hash = hashlib.sha1(w_local.tobytes()).hexdigest()

    # (c) two-axis (data, vert) TRAIN step with the vert axis CROSSING the
    # process boundary: devices arrive grouped by process
    # [p0d0..p0dk, p1d0..], so reshape(num_processes, n_local).T makes each
    # vert group a column of one device per process — the per-block (K, C)
    # psum and the grad psum over `vert` must ride the cross-process
    # transport (DCN on a pod; gloo here). Validated two ways: the updated
    # params must agree bit-for-bit across processes AND match a
    # single-device reference step computed locally.
    two_axis = None
    if n_local >= 2 and num_processes >= 2:
        two_axis = _two_axis_cross_process_step(num_processes, n_local)

    # (b) multi-host precompute: this process computes its round-robin slice
    # of 4 tiny meshes into the SHARED cache; afterwards a full cache-hit
    # load must succeed from this process alone
    from ..geometry.parallel_precompute import precompute_shard_for_host
    from ..geometry import get_operators

    def tiny_mesh(i):
        t = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        ring = np.stack([np.cos(t), np.sin(t), np.zeros(8)], 1)
        verts = np.concatenate([[[0.0, 0.0, 0.2 + 0.01 * i]], ring])
        faces = np.array([[0, 1 + j, 1 + (j + 1) % 8] for j in range(8)])
        return verts, faces

    meshes = [tiny_mesh(i) for i in range(4)]
    mine = precompute_shard_for_host(
        [v for v, _ in meshes], [f for _, f in meshes], k_eig=3,
        op_cache_dir=cache_dir, n_workers=1)

    # cross-process barrier so cache-hit loads see the other host's writes
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("precompute_done")
    loaded = [get_operators(v, f, k_eig=3, op_cache_dir=cache_dir,
                            cache_only=True) for v, f in meshes]
    all_cached = all(o is not None for o in loaded)

    report = {"process_id": process_id,
              "n_global_devices": n_global,
              "process_count": jax.process_count(),
              "loss": loss, "param_hash": param_hash,
              "computed_indices": list(mine),
              "all_cached_after_barrier": bool(all_cached)}
    if two_axis is not None:
        report["two_axis"] = two_axis
    with open(out_path, "w") as f:
        json.dump(report, f)


def _two_axis_cross_process_step(num_processes: int, n_local: int) -> dict:
    """One (data=n_local, vert=num_processes) megakernel train step whose
    vert collectives cross the process boundary (see _mp_child_main stage c).
    Returns {param_hash, vs_single_max_rel_err, vert_crosses_processes}."""
    import hashlib

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, PartitionSpec as P

    from ..data.dataset import PaddedBatch
    from ..geometry import compute_operators, stack_operators, grad_operators
    from ..models import DiffusionNet
    from ..models.fast_path import megablock_apply
    from ..training import make_train_step
    from .vertex_sharded import batch_pspecs, make_two_axis_train_step

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices.reshape(num_processes, n_local).T, ("data", "vert"))
    vert_groups = [mesh.devices[d, :] for d in range(mesh.shape["data"])]
    crosses = all(len({dev.process_index for dev in grp}) == num_processes
                  for grp in vert_groups)
    assert crosses, "vert axis does not span processes — mesh layout bug"

    # same tiny batch in every process (icosahedron, k_eig=8, no device work)
    from math import sqrt
    phi = (1 + sqrt(5)) / 2
    verts = np.array([[-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
                      [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
                      [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1]],
                     np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10],
                      [0, 10, 11], [1, 5, 9], [5, 11, 4], [11, 10, 2],
                      [10, 7, 6], [7, 1, 8], [3, 9, 4], [3, 4, 2],
                      [3, 2, 6], [3, 6, 8], [3, 8, 9], [4, 9, 5],
                      [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int64)
    ops1 = compute_operators(verts, faces, k_eig=8, eigensolver="host")
    B = mesh.shape["data"]
    v_pad = 128 * mesh.shape["vert"]            # one 128-tile per vert shard
    ops = stack_operators([ops1] * B, v_pad=v_pad)
    x = np.zeros((B, v_pad, 3), np.float32)
    x[:, :12] = verts
    labels = np.full((B, v_pad), -1, np.int32)
    labels[:, :12] = (verts[:, 2] > 0).astype(np.int32)
    batch_np = PaddedBatch(verts=x, ops=ops, labels=labels,
                           faces=np.zeros((B, 4, 3), np.int32),
                           face_mask=np.zeros((B, 4), bool))

    model = DiffusionNet(c_in=3, c_out=2, c_width=8, n_block=1, dropout=False,
                         last_activation=jax.nn.log_softmax)
    gX, gY = grad_operators(ops)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(ops.mass), evals=jnp.asarray(ops.evals),
                        evecs=jnp.asarray(ops.evecs), gradX=jnp.asarray(gX),
                        gradY=jnp.asarray(gY))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    def apply_mega(params, batch, vert_axis=None):
        xr = (None if vert_axis is None
              else (lambda h: jax.lax.psum(h, vert_axis)))
        logits = megablock_apply(params, batch.verts, batch.ops.mass,
                                 batch.ops.evals, batch.ops.evecs,
                                 batch.ops.gradX_spec, batch.ops.gradY_spec,
                                 n_block=1, tile_v=128, xhat_reduce=xr,
                                 interpret=True)
        return jax.nn.log_softmax(logits)

    def sums(preds, batch):
        valid = batch.labels >= 0
        safe = jnp.maximum(batch.labels, 0)
        per = -jnp.take_along_axis(preds, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(per * valid), jnp.sum(valid)

    # single-device reference on this process's first local device (the
    # global arrays are replicated host-side, so every process computes the
    # same reference)
    def sd_loss(params, batch, rng):
        S, N = sums(apply_mega(params, batch), batch)
        return S / jnp.maximum(N, 1), N

    batch_local = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a), jax.local_devices()[0]),
        batch_np)
    sd_step = make_train_step(sd_loss, optimizer, donate=False)
    p_sd, _, _, _ = sd_step(params, opt_state, batch_local,
                            jax.random.PRNGKey(1))
    p_sd = jax.tree.map(lambda a: np.asarray(jax.device_get(a)), p_sd)

    # two-axis cross-process step: build the global sharded batch from the
    # (identical) host copy each process holds
    from jax.sharding import NamedSharding

    specs = batch_pspecs(batch_np, labels_kind="vertex")

    def to_global(a, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(np.asarray(a).shape, sh,
                                            lambda idx: np.asarray(a)[idx])

    batch_g = jax.tree.map(to_global, batch_np, specs)

    def vs_loss(params, batch, rng):
        S, N = sums(apply_mega(params, batch, vert_axis="vert"), batch)
        return S, N, N

    vs_step = make_two_axis_train_step(vs_loss, optimizer, mesh, specs,
                                       donate=False)
    p_vs, _, loss_vs, _ = vs_step(params, opt_state, batch_g,
                                  jax.random.PRNGKey(1))
    # fully-addressable per-leaf gather: params are replicated (P()) so every
    # process holds complete values
    p_vs = jax.tree.map(lambda a: np.asarray(jax.device_get(a)), p_vs)

    scale = max(abs(float(np.abs(l).max())) for l in jax.tree.leaves(p_sd))
    err = max(float(np.abs(a - b).max()) for a, b in
              zip(jax.tree.leaves(p_vs), jax.tree.leaves(p_sd)))
    rel = err / max(scale, 1e-30)
    if rel > 1e-3:
        raise RuntimeError(f"two-axis cross-process step diverged from the "
                           f"single-device step: max rel err {rel:.3e}")
    h = hashlib.sha1()
    for leaf in jax.tree.leaves(p_vs):
        h.update(np.asarray(leaf, np.float32).tobytes())
    return {"param_hash": h.hexdigest(),
            "vs_single_max_rel_err": rel,
            "mesh_shape": {"data": int(mesh.shape["data"]),
                           "vert": int(mesh.shape["vert"])},
            "vert_crosses_processes": True,
            "loss": float(loss_vs)}


def run_multiprocess_dryrun(n_processes: int = 2, devices_per_process: int = 2,
                            timeout_s: float = 600.0) -> list[dict]:
    """Spawn n_processes OS processes on the CPU backend, initialize
    jax.distributed against a local coordinator, and run a cross-process DP
    train step + sharded precompute. Returns the per-process reports;
    raises if any process fails or the replicas diverge."""
    import json
    import socket
    import subprocess
    import sys
    import tempfile

    with socket.socket() as s:                   # grab a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    tmp = tempfile.mkdtemp(prefix="dnet_mp_")
    cache_dir = f"{tmp}/op_cache"
    outs = [f"{tmp}/proc{i}.json" for i in range(n_processes)]

    import os as _os
    # the children import `diffusionnet_tpu` with `python -m`; the parent may
    # have it on sys.path via an insert (conftest) that a fresh interpreter
    # does not inherit — prepend the package root to PYTHONPATH explicitly
    pkg_root = _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    procs = []
    for i in range(n_processes):
        env = dict(_os.environ)
        env["PYTHONPATH"] = (pkg_root + _os.pathsep + env["PYTHONPATH"]
                             if env.get("PYTHONPATH") else pkg_root)
        env["JAX_PLATFORMS"] = "cpu"
        # drop any experimental TPU-plugin hooks: N processes cannot share
        # one chip, and some plugins ignore JAX_PLATFORMS and report their
        # own process topology (breaking jax.distributed on CPU)
        for k in list(env):
            if "AXON" in k or k.startswith("TPU_"):
                env.pop(k)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            .replace("--xla_force_host_platform_device_count=8", "")
                            + f" --xla_force_host_platform_device_count="
                              f"{devices_per_process}")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "diffusionnet_tpu.parallel.distributed",
             "--coordinator", coordinator, "--num_processes", str(n_processes),
             "--process_id", str(i), "--out", outs[i], "--cache", cache_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    reports = []
    try:
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=timeout_s)
            if p.returncode != 0:
                raise RuntimeError(
                    f"multiprocess child {i} failed (rc={p.returncode}):\n"
                    + out.decode(errors="replace")[-4000:])
            with open(outs[i]) as f:
                reports.append(json.load(f))
    finally:
        # one hung/failed child must not leak the coordinator-blocked rest
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()

    hashes = {r["param_hash"] for r in reports}
    if len(hashes) != 1:
        raise RuntimeError(f"param replicas diverged across processes: "
                           f"{hashes}")
    covered = sorted(i for r in reports for i in r["computed_indices"])
    if covered != list(range(4)):
        raise RuntimeError(f"precompute shards did not partition the "
                           f"dataset: {covered}")
    if not all(r["all_cached_after_barrier"] for r in reports):
        raise RuntimeError("some process missed cache entries after the "
                           "barrier")
    # the child only runs the two-axis step when BOTH axes are non-trivial
    # (n_local >= 2 and num_processes >= 2 in _mp_child_main) — mirror that
    # here so a 1-process/2-device dryrun doesn't spuriously fail
    if n_processes >= 2 and devices_per_process >= 2:
        ta = [r.get("two_axis") for r in reports]
        if any(t is None for t in ta):
            raise RuntimeError("two-axis cross-process step missing from a "
                               "process report")
        if len({t["param_hash"] for t in ta}) != 1:
            raise RuntimeError("two-axis param replicas diverged across "
                               f"processes: {[t['param_hash'] for t in ta]}")
    return reports


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cache", required=True)
    a = ap.parse_args()
    _mp_child_main(a.coordinator, a.num_processes, a.process_id, a.out,
                   a.cache)
