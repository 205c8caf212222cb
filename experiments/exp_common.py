"""Shared experiment harness.

The reference duplicates one train/eval skeleton across its five drivers
(argparse -> Adam(lr=1e-3) -> manual lr*0.5 every 50 epochs -> per-mesh loop; e.g.
classification_shrec11.py:99-217). Here the skeleton is a single jitted,
fixed-shape, batched harness shared by every suite.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

import diffusionnet_tpu as dnt
dnt.utils.enable_compilation_cache()
from diffusionnet_tpu.data import (DeviceDataset, make_padded_batches,
                                   prefetch_to_device)
from diffusionnet_tpu.data.features import FEATURE_DIMS, get_features
from diffusionnet_tpu.models import DiffusionNet
from diffusionnet_tpu.training import (
    adam_with_step_decay, make_train_step, make_eval_step,
    save_checkpoint, restore_checkpoint,
)


class graceful_stop:
    """Context manager for preemption-safe loops: installs SIGTERM/SIGINT
    handlers that append to the returned list (truthy once a signal arrived),
    and ALWAYS restores the prior dispositions on exit — including when the
    loop body raises, so a crashed run never leaves the process
    un-interruptible. No-op (always-empty list) off the main thread."""

    def __enter__(self):
        import signal
        self.stop_requested: list = []

        def _request_stop(signum, frame):
            self.stop_requested.append(signum)
            print(f"signal {signum}: checkpointing at the next boundary "
                  "and exiting")
        try:
            self._prev = {s: signal.signal(s, _request_stop)
                          for s in (signal.SIGTERM, signal.SIGINT)}
        except ValueError:  # not the main thread
            self._prev = {}
        return self.stop_requested

    def __exit__(self, *exc):
        import signal
        for s, h in self._prev.items():
            signal.signal(s, h)
        return False


@dataclass
class FitConfig:
    n_epoch: int = 200
    lr: float = 1e-3
    decay_every: int = 50          # epochs (reference semantics)
    decay_rate: float = 0.5
    batch_size: int = 8
    input_features: str = "hks"    # 'xyz' or 'hks'
    augment_rotate: bool = False   # random SO(3) rotation of xyz features
    rotate_axis: str = "full"      # 'full' or 'y'
    label_smoothing: float = 0.0
    labels_kind: str = "global"    # 'global' | 'vertex' | 'face'
    buckets: tuple | None = None   # vertex buckets for mixed-size datasets
    data_parallel: bool = False    # shard the batch over all devices (batch
    # size must be divisible by the device count); params stay replicated
    mesh_shape: tuple | None = None  # (data, vert): two-axis sharded
    # training — the batch over `data` AND every (B, V, ...) array over
    # `vert` (train meshes larger than one chip's HBM; requires
    # use_megakernel, labels_kind='vertex', V divisible by vert)
    bf16: bool = False             # mixed precision: bf16 activations/matmul
    # operands, f32 params and accumulation (f32 keeps reference parity)
    use_megakernel: bool = False   # whole-block Pallas megakernel (TPU;
    # requires dropout off, default MLP dims, vertex outputs, V % 1024 == 0)
    device_data: bool = False      # upload the stacked dataset to HBM once
    # and gather batches on device (no per-epoch host restack; the dataset
    # must fit in HBM next to the model/optimizer)
    graceful_sigterm: bool = False  # on SIGTERM/SIGINT: finish the current
    # epoch, checkpoint the FULL train state, and return early — a preempted
    # run (spot/TPU maintenance) resumes bit-identically via resume_from
    seed: int = 0


def build_model(n_class: int, c_width: int, outputs_at: str,
                dropout: bool, input_features: str, n_block: int = 4,
                bf16: bool = False):
    return DiffusionNet(
        c_in=FEATURE_DIMS[input_features], c_out=n_class, c_width=c_width,
        n_block=n_block, dropout=dropout, outputs_at=outputs_at,
        last_activation=jax.nn.log_softmax,
        compute_dtype=jnp.bfloat16 if bf16 else None)


def _augment(verts, rng, cfg: FitConfig):
    if not (cfg.augment_rotate and cfg.input_features == "xyz"):
        return verts
    keys = jax.random.split(rng, verts.shape[0])
    rot = (dnt.utils.random_rotate_points_y if cfg.rotate_axis == "y"
           else dnt.utils.random_rotate_points)
    return jax.vmap(rot)(verts, keys)


def _apply_model(model, params, batch, rng, cfg: FitConfig,
                 deterministic: bool, vert_axis: str | None = None):
    """vert_axis: set when called INSIDE a (data, vert) shard_map — the
    megakernel then emits partial x_hat reduced by a (K,C) psum per block,
    and per-vertex dropout decorrelates across vert shards (sample-level
    randomness like rotations stays shard-consistent: the caller folds only
    the data axis into rng)."""
    verts = batch.verts
    if rng is not None:
        rng_rot, rng_drop = jax.random.split(rng)
        verts = _augment(verts, rng_rot, cfg)
        if vert_axis is not None:
            rng_drop = jax.random.fold_in(rng_drop,
                                          jax.lax.axis_index(vert_axis))
        rngs = {"dropout": rng_drop}
    else:
        rngs = None
    feats = get_features(cfg.input_features, verts, batch.ops.evals,
                         batch.ops.evecs)
    gX, gY = dnt.geometry.grad_operators(batch.ops)

    V = feats.shape[-2]
    mega_tile = next((t for t in (2048, 1024, 512, 256, 128) if V % t == 0),
                     None)
    if cfg.use_megakernel:
        # validate the supported envelope explicitly (never fail by KeyError)
        problems = []
        if model.diffusion_method != "spectral":
            problems.append("diffusion_method must be 'spectral'")
        if not model.with_gradient_features:
            problems.append("gradient features required")
        if model.outputs_at == "edges":
            problems.append("outputs_at='edges' not supported")
        if mega_tile is None:
            problems.append(f"padded V={V} has no tile divisor in "
                            "{2048,1024,512,256,128}")
        if problems:
            raise ValueError("use_megakernel unsupported for this model: "
                             + "; ".join(problems))
        from diffusionnet_tpu.models.fast_path import megablock_apply
        # Pallas interpret mode when running on CPU (tests / machines without
        # an accelerator) — same code path, executed by XLA:CPU. The pinned
        # jax_default_device wins over default_backend(): some TPU plugins
        # ignore JAX_PLATFORMS while tests pin the default device to CPU.
        dd = jax.config.jax_default_device
        interpret = (dd.platform == "cpu" if dd is not None
                     else jax.default_backend() == "cpu")
        dropout_rng = (rngs or {}).get("dropout") if (model.dropout
                                                      and not deterministic) else None
        evecs = batch.ops.evecs
        if cfg.bf16:
            # bf16 tiles: halve the DMA traffic of the big (V,K) operand
            # streams; MXU accumulation stays f32 inside the kernel
            feats = feats.astype(jnp.bfloat16)
            evecs = evecs.astype(jnp.bfloat16)
            gX, gY = gX.astype(jnp.bfloat16), gY.astype(jnp.bfloat16)
        xhat_reduce = (None if vert_axis is None
                       else (lambda h: jax.lax.psum(h, vert_axis)))
        logits = megablock_apply(
            params, feats, batch.ops.mass, batch.ops.evals, evecs,
            gX, gY, n_block=model.n_block, tile_v=mega_tile,
            dropout_rng=dropout_rng, xhat_reduce=xhat_reduce,
            interpret=interpret).astype(jnp.float32)
        if model.outputs_at == "global_mean":
            logits = (jnp.sum(logits * batch.ops.mass[..., None], axis=-2)
                      / jnp.sum(batch.ops.mass, axis=-1, keepdims=True))
        elif model.outputs_at == "faces":
            # mean over the 3 incident vertices (reference layers.py:386-391)
            f = batch.faces
            gathered = [jnp.take_along_axis(
                logits, jnp.maximum(f[..., i], 0)[..., None], axis=-2)
                for i in range(3)]
            logits = sum(gathered) / 3.0
        return (model.last_activation(logits)
                if model.last_activation is not None else logits)

    kwargs = dict(L=batch.ops.L, evals=batch.ops.evals, evecs=batch.ops.evecs,
                  gradX=gX, gradY=gY,
                  deterministic=deterministic)
    if cfg.labels_kind == "face":
        kwargs["faces"] = batch.faces
    return model.apply(params, feats, batch.ops.mass, rngs=rngs, **kwargs)


def _loss_and_counts(preds, batch, cfg: FitConfig):
    """Masked loss + (correct, total) counts. Padding labels are -1."""
    preds = preds.astype(jnp.float32)
    labels = batch.labels
    if cfg.labels_kind == "global":
        valid = labels >= 0
        safe = jnp.maximum(labels, 0)
        n_class = preds.shape[-1]
        s = cfg.label_smoothing
        one_hot = jax.nn.one_hot(safe, n_class, dtype=preds.dtype)
        one_hot = one_hot * (1.0 - s) + (1.0 - one_hot) * s / (n_class - 1)
        per = -jnp.sum(one_hot * preds, axis=-1)
        loss = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1)
        correct = jnp.sum((jnp.argmax(preds, -1) == labels) & valid)
        total = jnp.sum(valid)
    else:
        # per-element (vertex/face) NLL with -1 = ignore
        valid = labels >= 0
        if cfg.labels_kind == "face":
            valid = valid & batch.face_mask
        safe = jnp.maximum(labels, 0)
        per = -jnp.take_along_axis(preds, safe[..., None], axis=-1)[..., 0]
        loss = jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1)
        correct = jnp.sum((jnp.argmax(preds, -1) == labels) & valid)
        total = jnp.sum(valid)
    return loss, (correct, total)


def _loss_sums(preds, batch, cfg: FitConfig):
    """Local SUMS (loss_sum, correct, total) for the two-axis sharded step —
    the caller psums the normalizer over the mesh before dividing, making
    the global objective identical to _loss_and_counts' masked mean.
    labels_kind='vertex'; -1 labels are padding."""
    preds = preds.astype(jnp.float32)
    labels = batch.labels
    valid = labels >= 0
    safe = jnp.maximum(labels, 0)
    per = -jnp.take_along_axis(preds, safe[..., None], axis=-1)[..., 0]
    S = jnp.sum(per * valid)
    correct = jnp.sum((jnp.argmax(preds, -1) == labels) & valid)
    total = jnp.sum(valid)
    return S, correct, total


def fit(model, train_ds, test_ds, cfg: FitConfig,
        model_save_path: str | None = None,
        params=None, eval_every: int = 1,
        geodesic_eval=None, verbose: bool = True,
        log_path: str | None = None, devices=None,
        resume_from: str | None = None):
    """Train `model` on train_ds, evaluating on test_ds each epoch.

    Returns (params, history, evaluate) where `evaluate(params, ds)` is the
    jitted accuracy function. `geodesic_eval(params, predict_fn)` is an
    optional extra per-epoch metric hook (used by sampling_invariance).
    With cfg.data_parallel, batches are sharded over `devices` (default: all)
    and XLA auto-parallelizes the step (gradient all-reduce over ICI).

    Checkpoints are written under `<model_save_path>_ckpt/` (one dir per
    config, so configs sharing a dataset dir never clobber each other) and
    hold the FULL train state — params, optimizer state, epoch, and the
    PRNG chain — so `resume_from=<model_save_path>_ckpt` continues a
    crashed run bit-identically to an uninterrupted one (the reference
    restarts from epoch 0, SURVEY §5). A non-finite training loss raises
    immediately instead of silently corrupting the run.
    """
    rng = jax.random.PRNGKey(cfg.seed)

    def _default_devices():
        # honor a pinned jax_default_device (tests pin the 8-way virtual CPU;
        # some TPU plugins ignore JAX_PLATFORMS, so jax.devices() would
        # return the single real chip and starve the mesh axes)
        dd = jax.config.jax_default_device
        if dd is not None:
            return jax.devices(dd.platform)
        return jax.devices()

    if cfg.mesh_shape is not None:
        if len(cfg.mesh_shape) != 2 or any(a < 1 for a in cfg.mesh_shape):
            raise ValueError(f"mesh_shape must be (data>=1, vert>=1), got "
                             f"{cfg.mesh_shape}")
        if cfg.mesh_shape[1] == 1:
            # a (data, 1) mesh is plain data parallelism over `data` devices
            # — route it there explicitly rather than silently falling
            # through to the single-device step
            import dataclasses as _dc
            d_ax = cfg.mesh_shape[0]
            devs = list(devices) if devices is not None else _default_devices()
            if len(devs) < d_ax:
                raise ValueError(f"mesh_shape={cfg.mesh_shape} needs {d_ax} "
                                 f"devices, have {len(devs)}")
            devices = devs[:d_ax]
            cfg = _dc.replace(cfg, mesh_shape=None,
                              data_parallel=(d_ax > 1 or cfg.data_parallel))

    shard_batch = None
    dp_mesh = None
    if cfg.data_parallel:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        devs = list(devices) if devices is not None else _default_devices()
        if cfg.batch_size % len(devs) != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by "
                f"{len(devs)} devices")
        dp_mesh = Mesh(np.asarray(devs), axis_names=("data",))
        batch_sharding = NamedSharding(dp_mesh, P("data"))

        def shard_batch(batch):
            return jax.device_put(batch, batch_sharding)

    # init from the first batch
    first = next(iter(make_padded_batches(train_ds, cfg.batch_size,
                                          shuffle=False)))
    first = jax.tree.map(jnp.asarray, first)
    if params is None:
        rng, init_rng = jax.random.split(rng)
        feats = get_features(cfg.input_features, first.verts,
                             first.ops.evals, first.ops.evecs)
        kwargs = dict(L=first.ops.L, evals=first.ops.evals,
                      evecs=first.ops.evecs, gradX=first.ops.gradX,
                      gradY=first.ops.gradY)
        if cfg.labels_kind == "face":
            kwargs["faces"] = first.faces
        params = model.init({"params": init_rng}, feats, first.ops.mass,
                            **kwargs)

    steps_per_epoch = max(1, -(-len(train_ds) // cfg.batch_size))
    optimizer = adam_with_step_decay(
        cfg.lr, cfg.decay_every * steps_per_epoch, cfg.decay_rate)
    opt_state = optimizer.init(params)

    def loss_fn(params, batch, rng):
        preds = _apply_model(model, params, batch, rng, cfg,
                             deterministic=False)
        return _loss_and_counts(preds, batch, cfg)

    vs_specs = None
    if cfg.mesh_shape is not None and cfg.mesh_shape[1] > 1:
        # two-axis (data x vert) sharded training: batch over `data`, every
        # (B, V, ...) array row-sharded over `vert` — the megakernel emits
        # partial x_hat with one (K, C) psum per block; grads/counts psum
        # over both axes (VERDICT r2 item 3: the 200k story for TRAINING)
        problems = []
        if not cfg.use_megakernel:
            problems.append("use_megakernel=True required (the ELL/XLA path "
                            "would all-gather V-sized activations)")
        if cfg.labels_kind != "vertex":
            problems.append("labels_kind='vertex' required")
        if getattr(model, "outputs_at", "vertices") != "vertices":
            problems.append("outputs_at='vertices' required")
        if cfg.data_parallel:
            problems.append("mesh_shape supersedes data_parallel")
        if problems:
            raise ValueError("mesh_shape=(data,vert) unsupported: "
                             + "; ".join(problems))
        from jax.sharding import NamedSharding, PartitionSpec
        from diffusionnet_tpu.parallel import make_mesh
        from diffusionnet_tpu.parallel.vertex_sharded import (
            batch_pspecs, make_two_axis_train_step, make_two_axis_eval_step)
        d_ax, v_ax = cfg.mesh_shape
        devs = list(devices) if devices is not None else _default_devices()
        if cfg.batch_size % d_ax != 0:
            raise ValueError(f"batch_size {cfg.batch_size} not divisible by "
                             f"data={d_ax}")
        if cfg.buckets is not None:
            # per-shard V must divide into 128-row megakernel tiles, so each
            # bucket must be a multiple of 128 * vert (the --mesh help text's
            # promised rounding)
            q = 128 * v_ax
            rounded = tuple(-(-int(b) // q) * q for b in cfg.buckets)
            if rounded != tuple(cfg.buckets):
                import dataclasses as _dc
                if verbose:
                    print(f"[fit] rounding buckets {tuple(cfg.buckets)} -> "
                          f"{rounded} (megakernel tiles across vert={v_ax})")
                cfg = _dc.replace(cfg, buckets=rounded)
        vs_mesh = make_mesh(data=d_ax, vert=v_ax, devices=devs[:d_ax * v_ax])
        vs_specs = batch_pspecs(first, labels_kind=cfg.labels_kind)
        vs_shardings = jax.tree.map(
            lambda s: NamedSharding(vs_mesh, s), vs_specs,
            is_leaf=lambda x: isinstance(x, PartitionSpec))

        def shard_batch(batch):
            return jax.device_put(batch, vs_shardings)

        def vs_sum_loss(params, batch, rng):
            preds = _apply_model(model, params, batch, rng, cfg,
                                 deterministic=False, vert_axis="vert")
            S, C, N = _loss_sums(preds, batch, cfg)
            return S, N, (C, N)

        train_step = make_two_axis_train_step(vs_sum_loss, optimizer,
                                              vs_mesh, vs_specs)

        def vs_sum_metric(params, batch):
            preds = _apply_model(model, params, batch, None, cfg,
                                 deterministic=True, vert_axis="vert")
            _, C, N = _loss_sums(preds, batch, cfg)
            return (C, N)

        vs_eval = make_two_axis_eval_step(vs_sum_metric, vs_mesh, vs_specs)

        def eval_step(params, batch):
            return vs_eval(params, shard_batch(batch)), None
    elif dp_mesh is not None:
        # data-parallel via shard_map: each device runs the model (including
        # Pallas megakernels, which XLA cannot auto-partition) on its batch
        # shard; grads pmean over ICI; counts psum. Same step signature as
        # the single-device primitive below.
        from diffusionnet_tpu.parallel import make_dp_train_step
        train_step = make_dp_train_step(loss_fn, optimizer, dp_mesh,
                                        has_aux=True)
    else:
        train_step = make_train_step(loss_fn, optimizer)

    if vs_specs is None:
        def metric_fn(params, batch):
            preds = _apply_model(model, params, batch, None, cfg,
                                 deterministic=True)
            _, counts = _loss_and_counts(preds, batch, cfg)
            return counts, preds

        eval_step = make_eval_step(metric_fn)

    # input pipeline: host path = background-thread stacking + async
    # device_put; device path = dataset uploaded to HBM once, batches gathered
    # on device (cfg.device_data)
    device_sets: dict = {}

    def _device_set(ds):
        if id(ds) not in device_sets:
            device_sets[id(ds)] = DeviceDataset(ds, buckets=cfg.buckets)
        return device_sets[id(ds)]

    def _batches(ds, shuffle, seed=0):
        if cfg.device_data:
            return _device_set(ds).batches(cfg.batch_size, shuffle=shuffle,
                                           seed=seed)
        return prefetch_to_device(
            make_padded_batches(ds, cfg.batch_size, shuffle=shuffle,
                                seed=seed, buckets=cfg.buckets))

    def evaluate(params, ds):
        correct = total = 0
        for batch in _batches(ds, shuffle=False):
            (c, t), _ = eval_step(params, batch)
            correct += int(c)
            total += int(t)
        return correct / max(total, 1)

    start_epoch = 0
    if resume_from is not None:
        from diffusionnet_tpu.training.checkpoint import latest_checkpoint
        path = latest_checkpoint(resume_from)
        if path is None:
            raise FileNotFoundError(f"no checkpoint found under {resume_from}")
        template = {"params": params, "opt_state": opt_state,
                    "epoch": np.zeros((), np.int32), "rng": rng}
        state = restore_checkpoint(path, template)
        params, opt_state = state["params"], state["opt_state"]
        rng = jnp.asarray(state["rng"])
        start_epoch = int(state["epoch"]) + 1
        if verbose:
            print(f"resumed from {path} at epoch {start_epoch}")

    def save_state(epoch):
        # per-CONFIG checkpoint dir: saving into dirname(model_save_path)
        # would make every config sharing a dataset dir clobber the same
        # step_N files (and resume could silently restore another config's
        # same-shaped weights)
        save_checkpoint(model_save_path + "_ckpt",
                        {"params": params, "opt_state": opt_state,
                         "epoch": np.asarray(epoch, np.int32),
                         "rng": np.asarray(rng)},
                        step=epoch)

    # preemption safety: a SIGTERM/SIGINT sets a flag; the loop finishes the
    # epoch in flight, checkpoints the full train state, and returns — so a
    # spot eviction costs at most one epoch of work and resumes bit-identically.
    # graceful_stop restores the prior handlers even if the loop raises.
    import contextlib
    _stack = contextlib.ExitStack()
    stop_requested = (_stack.enter_context(graceful_stop())
                      if cfg.graceful_sigterm else [])

    history = []
    best_test_acc = -1.0
    import time as _time
    with _stack:
        for epoch in range(start_epoch, cfg.n_epoch):
            epoch_t0 = _time.time()
            correct = total = 0
            last_loss = None
            for batch in _batches(train_ds, shuffle=True, seed=cfg.seed + epoch):
                if shard_batch is not None:
                    batch = shard_batch(batch)
                rng, step_rng = jax.random.split(rng)
                params, opt_state, loss, (c, t) = train_step(
                    params, opt_state, batch, step_rng)
                correct += int(c)
                total += int(t)
                last_loss = float(loss)
                if not np.isfinite(last_loss):
                    raise FloatingPointError(
                        f"non-finite training loss at epoch {epoch} "
                        "(step skipped would silently corrupt the run); inspect "
                        "the learning rate / input data, or resume from the last "
                        "checkpoint")
            train_acc = correct / max(total, 1)

            test_acc = evaluate(params, test_ds) if (epoch % eval_every == 0) else None
            history.append((epoch, train_acc, test_acc))
            if verbose:
                ta = f"{100 * test_acc:06.3f}%" if test_acc is not None else "--"
                print(f"Epoch {epoch} - Train overall: {100 * train_acc:06.3f}%  "
                      f"Test overall: {ta}")
            if log_path is not None:
                import json
                with open(log_path, "a") as f:
                    f.write(json.dumps({
                        "epoch": epoch, "train_acc": train_acc,
                        "test_acc": test_acc, "train_loss": last_loss,
                        # the staircase factor THIS epoch's steps actually
                        # used ((epoch+1)*spe reported the NEXT epoch's lr
                        # at every decay boundary)
                        "lr": float(cfg.lr * cfg.decay_rate
                                    ** (epoch // max(1, cfg.decay_every))),
                        "epoch_seconds": round(_time.time() - epoch_t0, 3),
                    }) + "\n")
            # periodic best-checkpointing (the reference only saves once at the
            # end, human_segmentation_original.py:209; full train state here so a
            # crashed run resumes bit-identically)
            if (model_save_path is not None and test_acc is not None
                    and test_acc > best_test_acc):
                best_test_acc = test_acc
                save_state(epoch)
            if stop_requested:
                if model_save_path is not None:
                    save_state(epoch)
                    print(f"preemption checkpoint written at epoch {epoch}; "
                          "resume with resume_from=")
                break

    if stop_requested:
        return params, history, evaluate

    if model_save_path is not None and cfg.n_epoch > 0:
        # the stored epoch is the last COMPLETED one (resume continues at +1)
        save_state(cfg.n_epoch - 1)
        print(" ==> saved model checkpoint near " + model_save_path)

    return params, history, evaluate
