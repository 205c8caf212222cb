"""Vertex-sharded inference for very large surfaces (200k+ vertices).

The reference handles large meshes on one GPU by spectral truncation alone
(README.md:4). On TPU we additionally shard the V axis of the per-vertex arrays
(x, mass, evecs rows, ELL operator rows) across the `vert` mesh axis and let XLA
insert the collectives: the spectral projection phi^T(Mx) becomes a local matmul +
psum (reduce over V shards); the back-projection is fully local; the ELL gather
over a V-sharded activation lowers to an all-gather of x. This follows the
annotate-shardings-and-let-XLA-partition recipe rather than hand-written NCCL-style
code.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.operators import Operators
from ..ops.sparse import Ell


def shard_operators_by_vertex(ops: Operators, mesh: Mesh) -> Operators:
    """device_put an (unbatched, padded) Operators bundle with its V axes sharded
    over the `vert` mesh axis. evals (K,) are replicated; evecs (V,K) row-sharded;
    ELL operators row-sharded (their column indices stay global)."""
    vshard = NamedSharding(mesh, P("vert"))
    repl = NamedSharding(mesh, P())

    def put_v(x):
        return jax.device_put(x, vshard)

    def put_spec(g):
        return None if g is None else put_v(g)

    return Operators(
        frames=put_v(ops.frames),
        mass=put_v(ops.mass),
        L=Ell(put_v(ops.L.idx), put_v(ops.L.val)),
        evals=jax.device_put(ops.evals, repl),
        evecs=put_v(ops.evecs),
        gradX=Ell(put_v(ops.gradX.idx), put_v(ops.gradX.val)),
        gradY=Ell(put_v(ops.gradY.idx), put_v(ops.gradY.val)),
        gradX_spec=put_spec(ops.gradX_spec),
        gradY_spec=put_spec(ops.gradY_spec),
    )


def vertex_sharded_megakernel_forward(params, x_in, ops: Operators,
                                      mesh: Mesh, n_block: int,
                                      tile_v: int = 1024,
                                      last_activation=None,
                                      interpret: bool = False):
    """Vertex-sharded fast path: each device runs the whole-block Pallas
    megakernel on its V shard; the chained kernels emit PARTIAL
    x_hat = Phi^T(m x) over the local vertices, and a (K, C) psum over the
    `vert` axis is the ONLY cross-shard communication per block — the
    collective is tiny (K*C floats) while all (V, ...) traffic stays local.

    x_in: (V, C_in) for ONE large surface. Requires dense spectral gradient
    operators (ops.gradX_spec) and V divisible by n_vert_shards * tile_v."""
    vshard = NamedSharding(mesh, P("vert"))
    x_in = jax.device_put(x_in, vshard)
    ops = shard_operators_by_vertex(ops, mesh)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    if ops.gradX_spec is None:
        raise ValueError("vertex-sharded megakernel needs spectral gradient "
                         "operators (ops.gradX_spec)")

    fwd = _sharded_mega_fn(mesh, n_block, tile_v, last_activation, interpret)
    return fwd(params, x_in, ops.mass, ops.evals, ops.evecs,
               ops.gradX_spec, ops.gradY_spec)


@lru_cache(maxsize=32)
def _sharded_mega_fn(mesh, n_block, tile_v, last_activation, interpret):
    """One jitted shard_map program per (mesh, config) — calling the forward
    in a loop over same-shape meshes must hit jit's cache, not retrace (a
    fresh closure per call would recompile the full program every time)."""
    from jax import shard_map
    from ..models.fast_path import megablock_apply

    def device_fn(params, x, mass, evals, evecs, gX, gY):
        out = megablock_apply(
            params, x[None], mass[None], evals[None], evecs[None], gX[None],
            gY[None], n_block=n_block, tile_v=tile_v,
            last_activation=last_activation, interpret=interpret,
            xhat_reduce=lambda h: jax.lax.psum(h, "vert"))
        return out[0]

    return jax.jit(shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P("vert"), P("vert"), P(), P("vert"), P("vert"),
                  P("vert")),
        out_specs=P("vert"),
        check_vma=False,
    ))


# jitted forward per (model, mesh, kwarg-names): repeat calls over same-shape
# meshes hit jit's cache instead of retracing a fresh closure every time.
# Bounded (FIFO, like _sharded_mega_fn's lru_cache): a long-lived process
# sweeping many model/mesh configs must not pin compiled executables forever.
_FWD_CACHE: dict = {}
_FWD_CACHE_MAX = 32


def vertex_sharded_forward(model, params, x_in, ops: Operators, mesh: Mesh,
                           **call_kwargs):
    """Run model.apply with the V axis sharded over the `vert` mesh axis.

    x_in: (V, C_in) for ONE large surface (no batch dim). Returns the output with
    XLA-chosen output sharding (per-vertex outputs come back V-sharded)."""
    vshard = NamedSharding(mesh, P("vert"))
    x_in = jax.device_put(x_in, vshard)
    ops = shard_operators_by_vertex(ops, mesh)
    params = jax.device_put(params, NamedSharding(mesh, P()))

    # arrays travel as jit arguments; everything else (bools, strings) is
    # static — closed over and part of the cache key, so Python control flow
    # on those kwargs inside the model never sees a tracer
    def _is_array(v):
        import numpy as _np
        return isinstance(v, (jax.Array, _np.ndarray))

    arr_names = tuple(sorted(k for k, v in call_kwargs.items()
                             if _is_array(v)))
    static = {k: v for k, v in call_kwargs.items() if k not in arr_names}
    key = (model, mesh, arr_names, tuple(sorted(static.items())))
    fwd = _FWD_CACHE.get(key)
    if fwd is None:
        @jax.jit
        def fwd(params, x_in, ops, kw_vals):
            # prefer the dense spectral gradient operators: with the V axis
            # sharded they are plain sharded matmuls (psum/all-gather
            # inserted by XLA), whereas the ELL gather needs a full
            # all-gather of x
            gX = ops.gradX_spec if ops.gradX_spec is not None else ops.gradX
            gY = ops.gradY_spec if ops.gradY_spec is not None else ops.gradY
            return model.apply(params, x_in, ops.mass, L=ops.L,
                               evals=ops.evals, evecs=ops.evecs, gradX=gX,
                               gradY=gY, **dict(zip(arr_names, kw_vals)),
                               **static)
        while len(_FWD_CACHE) >= _FWD_CACHE_MAX:
            _FWD_CACHE.pop(next(iter(_FWD_CACHE)))
        _FWD_CACHE[key] = fwd

    return fwd(params, x_in, ops, tuple(call_kwargs[k] for k in arr_names))


# ---------------------------------------------------------------------------
# Two-axis (data x vert) TRAINING (round 3, VERDICT r2 item 3): the promoted
# version of the dryrun's dp x vert step — train a larger-than-HBM surface by
# row-sharding every (B, V, ...) batch leaf over `vert` while sharding the
# batch over `data`. The megakernel runs per-shard with one (K, C) psum per
# block (xhat_reduce); grads/loss/counts psum over both axes.
# ---------------------------------------------------------------------------


def batch_pspecs(batch, labels_kind: str = "vertex",
                 data_axis: str = "data", vert_axis: str = "vert"):
    """PartitionSpec pytree for a data.PaddedBatch on a (data, vert) mesh:
    every (B, V, ...) leaf is sharded (data, vert); evals/labels-global/faces
    shard over data only."""
    from jax.sharding import PartitionSpec as P
    from ..geometry.operators import Operators

    pv = P(data_axis, vert_axis)
    pd = P(data_axis)

    def ell_spec(e):
        return Ell(pv, pv)

    ops = batch.ops
    ops_spec = Operators(
        frames=pv, mass=pv, L=ell_spec(ops.L),
        evals=pd, evecs=pv,
        gradX=ell_spec(ops.gradX), gradY=ell_spec(ops.gradY),
        gradX_spec=None if ops.gradX_spec is None else pv,
        gradY_spec=None if ops.gradY_spec is None else pv,
    )
    return type(batch)(
        verts=pv, ops=ops_spec,
        labels=pv if labels_kind != "global" else pd,
        faces=pd, face_mask=pd)


def make_two_axis_train_step(sum_loss_fn, optimizer, mesh, batch_specs,
                             data_axis: str = "data",
                             vert_axis: str = "vert", donate: bool = True):
    """Jitted (data x vert)-sharded train step.

    sum_loss_fn(params, batch, rng) -> (loss_sum, count, aux_sums): LOCAL
    SUMS over this shard's (batch, vertex) block — the step psums the
    normalizer over both axes before dividing, so the global objective is
    sum(per-element loss) / sum(valid), exactly as the single-device loss.
    Returns train_step(params, opt_state, batch, rng) ->
    (params, opt_state, loss, aux_sums) with loss/aux globally reduced."""
    import optax

    def psum2(x):
        return jax.lax.psum(jax.lax.psum(x, data_axis), vert_axis)

    def device_fn(params, opt_state, batch, rng):
        # decorrelate dropout across data shards only: the same surface's
        # vert shards must agree on sample-level randomness (rotations);
        # per-vertex dropout inside the megakernel is decorrelated by
        # folding the vert index into the kernel seed at the caller
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))

        def local_obj(p):
            S, N, aux = sum_loss_fn(p, batch, rng)
            N_g = psum2(N)
            return S / jnp.maximum(N_g, 1), (N_g, aux)

        (loss_i, (_, aux)), grads_i = jax.value_and_grad(
            local_obj, has_aux=True)(params)
        grads = psum2(grads_i)
        loss = psum2(loss_i)
        aux = psum2(aux)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    sharded = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(), batch_specs, P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1) if donate else ())


def make_two_axis_eval_step(sum_metric_fn, mesh, batch_specs,
                            data_axis: str = "data", vert_axis: str = "vert"):
    """sum_metric_fn(params, batch) -> pytree of LOCAL SUMS; psum'd over both
    axes."""
    def device_fn(params, batch):
        out = sum_metric_fn(params, batch)
        return jax.lax.psum(jax.lax.psum(out, data_axis), vert_axis)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    return jax.jit(shard_map(device_fn, mesh=mesh,
                             in_specs=(P(), batch_specs), out_specs=P(),
                             check_vma=False))
