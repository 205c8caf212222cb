"""SurfaceDataset + static-shape padded batching.

TPU-first replacement for the reference's per-experiment
torch.utils.data.Dataset + DataLoader(batch_size=None) pattern (one
variable-shape mesh per optimizer step, reference classification_shrec11.py:64,
human_segmentation_original_dataset.py:120-147). XLA compiles one program per
shape signature, so variable shapes are poison; here every batch is padded to a
vertex *bucket* with masked filler, giving a bounded number of compilations
(SURVEY §7 "fixed shapes everywhere") and real batching (the reference model
supports a batch dim but its loaders never use it, layers.py:324).

Padding invariants:
  * padded vertices have mass == 0 -> exact no-ops in every mass-weighted
    reduction (reference layers.py:393-397);
  * padded ELL entries have val == 0 -> exact no-ops in operator application;
  * padding labels are -1 -> excluded from losses/metrics by the harness;
  * filler samples (to square off a partial final batch) copy a real sample's
    geometry but carry labels == -1 everywhere, so they never contribute.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Sequence

import numpy as np

from .. import utils
from ..geometry.operators import Operators, pad_operators

LABEL_KINDS = ("global", "vertex", "face")


class PaddedBatch(NamedTuple):
    """One statically-shaped training batch (a pytree of arrays; every leaf has
    leading batch dim B, so `jax.device_put(batch, NamedSharding(mesh, P('data')))`
    shards the whole batch data-parallel in one call)."""
    verts: np.ndarray      # (B, Vp, 3) float32
    ops: Operators         # stacked/padded operator bundle (leaves lead with B)
    labels: np.ndarray     # (B,) | (B, Vp) | (B, Fp) int32; -1 = ignore
    faces: np.ndarray      # (B, Fp, 3) int32; -1 rows = padding
    face_mask: np.ndarray  # (B, Fp) bool; True on real faces of real samples


class SurfaceDataset:
    """A list of surfaces (mesh or point cloud), labels, and — after
    `precompute()` — their spectral operator bundles.

    labels_kind: 'global' (one int per shape), 'vertex' (V ints), or 'face'
    (F ints) — matching the three label granularities of the reference suites
    (classification_shrec11 / rna+sampling_invariance / human_segmentation).
    """

    def __init__(self, labels_kind: str = "global"):
        if labels_kind not in LABEL_KINDS:
            raise ValueError(f"labels_kind must be one of {LABEL_KINDS}, "
                             f"got '{labels_kind}'")
        self.labels_kind = labels_kind
        self.verts_list: list[np.ndarray] = []
        self.faces_list: list[np.ndarray] = []
        self.labels_list: list[np.ndarray] = []
        self.ops_list: list[Operators] = []

    def __len__(self) -> int:
        return len(self.verts_list)

    def add(self, verts, faces, labels) -> None:
        """Add one surface. faces: (F,3) int, or None/empty for a point cloud.
        labels: an int ('global'), (V,) ints ('vertex'), or (F,) ints ('face')."""
        verts = np.asarray(verts, dtype=np.float32)
        if verts.ndim != 2 or verts.shape[1] != 3:
            raise ValueError(f"verts must be (V, 3), got {verts.shape}")
        if faces is None or np.asarray(faces).size == 0:
            faces = np.zeros((0, 3), dtype=np.int64)
        else:
            faces = np.asarray(faces, dtype=np.int64)
        labels = np.asarray(labels, dtype=np.int32)
        if self.labels_kind == "global":
            if labels.ndim != 0:
                raise ValueError("'global' labels must be scalars")
        elif self.labels_kind == "vertex":
            if labels.shape != (verts.shape[0],):
                raise ValueError(f"'vertex' labels must be (V,)={verts.shape[0]}, "
                                 f"got {labels.shape}")
        else:  # face
            if labels.shape != (faces.shape[0],):
                raise ValueError(f"'face' labels must be (F,)={faces.shape[0]}, "
                                 f"got {labels.shape}")
        self.verts_list.append(verts)
        self.faces_list.append(faces)
        self.labels_list.append(labels)

    def precompute(self, k_eig: int, op_cache_dir: str | None = None,
                   normals_list: Sequence | None = None,
                   verbose: bool = True,
                   eigensolver: str | None = None) -> None:
        """Compute (or load from cache) the Operators bundle for every surface
        (reference get_all_operators, geometry.py:395-424). normals_list:
        optional per-sample (V,3) normal overrides (the sampling_invariance
        cloud flow, reference dataset.py:107-115,146). eigensolver: 'device'
        (TPU-resident, the get_operators default) or 'host' (ARPACK)."""
        n = len(self)
        if normals_list is not None and len(normals_list) != n:
            raise ValueError(f"normals_list has {len(normals_list)} entries "
                             f"for {n} samples")
        # delegate to get_all_operators — it owns the pipeline policy
        # (2-thread host/device overlap for the device eigensolver on
        # multi-core hosts, sequential otherwise)
        from ..geometry.operators import get_all_operators, DEFAULT_EIGENSOLVER
        solver = eigensolver if eigensolver is not None else DEFAULT_EIGENSOLVER
        self.ops_list = get_all_operators(
            self.verts_list, self.faces_list, k_eig,
            op_cache_dir=op_cache_dir, normals=normals_list,
            eigensolver=solver, verbose=verbose)


def _group_by_bucket(ds: SurfaceDataset, buckets) -> dict[int, list[int]]:
    """sample index -> vertex bucket; buckets=None puts the whole dataset in
    one bucket sized for its largest shape."""
    if buckets is None:
        v_pad = utils.bucket_size(max(v.shape[0] for v in ds.verts_list))
        return {v_pad: list(range(len(ds)))}
    groups: dict[int, list[int]] = {}
    for i, v in enumerate(ds.verts_list):
        groups.setdefault(utils.bucket_size(v.shape[0], buckets), []).append(i)
    return dict(sorted(groups.items()))


def _stack_group(ds: SurfaceDataset, idx: Sequence[int], n_fill: int,
                 v_pad: int, f_pad: int, k_eig: int, d_l: int, d_g: int
                 ) -> PaddedBatch:
    """Assemble one PaddedBatch from sample indices + n_fill filler copies."""
    import jax  # tree.map only; leaves stay numpy

    take = list(idx) + [idx[0]] * n_fill
    verts = np.stack([utils.pad_to(ds.verts_list[i], v_pad) for i in take])
    faces = np.stack([utils.pad_to(ds.faces_list[i].astype(np.int32), f_pad,
                                   value=-1) for i in take])
    face_mask = np.zeros((len(take), f_pad), dtype=bool)
    for b, i in enumerate(idx):
        face_mask[b, :ds.faces_list[i].shape[0]] = True

    if ds.labels_kind == "global":
        labels = np.asarray([ds.labels_list[i] for i in idx]
                            + [-1] * n_fill, np.int32)
    else:
        pad_len = v_pad if ds.labels_kind == "vertex" else f_pad
        rows = [utils.pad_to(ds.labels_list[i], pad_len, value=-1) for i in idx]
        rows += [np.full(pad_len, -1, np.int32)] * n_fill
        labels = np.stack(rows).astype(np.int32)

    def prep(o: Operators) -> Operators:
        o = o._replace(
            evals=o.evals[:k_eig], evecs=o.evecs[:, :k_eig],
            gradX_spec=None if o.gradX_spec is None else o.gradX_spec[:, :k_eig],
            gradY_spec=None if o.gradY_spec is None else o.gradY_spec[:, :k_eig])
        return pad_operators(o, v_pad, k_eig, d_l, d_g)

    ops = jax.tree.map(lambda *xs: np.stack(xs, axis=0),
                       *[prep(ds.ops_list[i]) for i in take])
    return PaddedBatch(verts=verts, ops=ops, labels=labels, faces=faces,
                       face_mask=face_mask)


def _stacked_groups(ds: SurfaceDataset, buckets):
    """One padded, stacked pytree per vertex-bucket group, built ONCE per
    (dataset, bucket config) and cached on the dataset — per-epoch batch
    assembly is then a fancy-index copy instead of a re-pad + re-stack (at
    20k-vertex scale the naive per-batch restack costs ~10 s/batch of host
    work vs ~0.2 s of memcpy). Memory: one padded copy of the dataset in RAM
    (padding waste is bounded by the bucket granularity). The cache key holds
    the ops_list OBJECT (identity-compared): re-running precompute() rebinds
    the attribute to a new list and invalidates the cache. Storing id() would
    not — CPython reuses a freed list's id almost immediately."""
    # the key holds the list OBJECT (rebinding ops_list invalidates) AND the
    # element objects themselves, identity-compared (in-place element
    # replacement like `ds.ops_list[i] = other` keeps the same list object
    # but must also invalidate). STRONG references on purpose: an id()
    # fingerprint would be subject to CPython id reuse after the old element
    # is freed — holding the objects makes identity comparison sound.
    key = (ds.ops_list, tuple(ds.ops_list), len(ds),
           tuple(buckets) if buckets is not None else None)
    cached = getattr(ds, "_stacked_cache", None)
    if (cached is not None and cached[0][0] is key[0]
            and len(cached[0][1]) == len(key[1])
            and all(a is b for a, b in zip(cached[0][1], key[1]))
            and cached[0][2:] == key[2:]):
        return cached[1]

    k_eig = min(o.evals.shape[0] for o in ds.ops_list)
    groups = []
    for v_pad, idx in _group_by_bucket(ds, buckets).items():
        group_ops = [ds.ops_list[i] for i in idx]
        # group-wide static shapes (rounded so near-identical datasets share
        # compiled programs)
        d_l = utils.round_up_to_multiple(
            max(o.L.max_degree for o in group_ops), 4)
        d_g = utils.round_up_to_multiple(
            max(max(o.gradX.max_degree, o.gradY.max_degree)
                for o in group_ops), 4)
        max_f = max(ds.faces_list[i].shape[0] for i in idx)
        f_pad = utils.round_up_to_multiple(max_f, 128) if max_f else 4
        stacked = _stack_group(ds, idx, 0, v_pad, f_pad, k_eig, d_l, d_g)
        groups.append((np.asarray(idx), stacked))
    ds._stacked_cache = (key, groups)
    return groups


def _batch_rows(stacked: PaddedBatch, order, start: int, batch_size: int,
                take_fn, on_device: bool = False) -> PaddedBatch:
    """Assemble one batch from stacked group rows; filler rows repeat the
    chunk's first sample with labels -1 / face_mask False. With on_device the
    filler masking happens with jnp.where so device-resident batches never
    round-trip through the host (np.asarray on a device array is a blocking
    transfer)."""
    chunk = order[start:start + batch_size]
    n_fill = batch_size - len(chunk)
    rows = np.concatenate([chunk, np.full(n_fill, chunk[0], chunk.dtype)])
    batch = take_fn(stacked, rows)
    if n_fill:
        if on_device:
            import jax.numpy as jnp
            fill = jnp.arange(batch_size) >= len(chunk)
            lbl_fill = fill.reshape((-1,) + (1,) * (batch.labels.ndim - 1))
            batch = batch._replace(
                labels=jnp.where(lbl_fill, jnp.int32(-1), batch.labels),
                face_mask=jnp.where(fill[:, None], False, batch.face_mask))
        else:
            labels = np.asarray(batch.labels).copy()
            labels[len(chunk):] = -1
            face_mask = np.asarray(batch.face_mask).copy()
            face_mask[len(chunk):] = False
            batch = batch._replace(labels=labels, face_mask=face_mask)
    return batch


def make_padded_batches(ds: SurfaceDataset, batch_size: int,
                        shuffle: bool = False, seed: int = 0,
                        buckets=None) -> Iterator[PaddedBatch]:
    """Yield statically-shaped PaddedBatch pytrees.

    Samples are grouped by vertex bucket (buckets=None: one bucket sized for
    the dataset's largest shape); each group's pad shapes — v_pad, f_pad, ELL
    max-degrees — are GROUP-wide constants so every batch of a group shares one
    XLA program across epochs. A partial final batch is squared off with filler
    samples whose labels are -1 everywhere (masked out by the loss/metrics).
    """
    import jax

    if not ds.ops_list:
        raise RuntimeError("call SurfaceDataset.precompute() before batching")
    if len(ds.ops_list) != len(ds):
        raise RuntimeError("ops_list is stale: precompute() after every add()")

    rng = np.random.RandomState(seed) if shuffle else None

    def take(stacked, rows):
        return jax.tree.map(lambda a: a[rows], stacked)

    for idx, stacked in _stacked_groups(ds, buckets):
        n = len(idx)
        order = rng.permutation(n) if rng is not None else np.arange(n)
        for start in range(0, n, batch_size):
            yield _batch_rows(stacked, order, start, batch_size, take)


def prefetch_to_device(batches, size: int = 2):
    """Move PaddedBatch pytrees to the default device ahead of consumption.

    The producer (host-side batch stacking, which is the expensive part at
    20k-vertex scale — ~100 MB of memcpy per batch) runs on a BACKGROUND
    thread, and jax.device_put is async, so both the stacking and the
    host->device copy overlap the device step (the reference's .to(device)
    x10 per step is fully synchronous, classification_shrec11.py:121-130).
    """
    import queue as queue_mod
    import threading

    import jax

    q: queue_mod.Queue = queue_mod.Queue(maxsize=max(1, size))
    sentinel = object()
    errors: list[BaseException] = []
    abandoned = threading.Event()

    def producer():
        try:
            for b in batches:
                item = jax.device_put(b)
                # bounded put that notices consumer abandonment — a consumer
                # that breaks out of the epoch early (exception, early stop)
                # must not leave this thread blocked forever holding
                # device-resident batches in HBM
                while not abandoned.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue_mod.Full:
                        continue
                if abandoned.is_set():
                    return
        except BaseException as e:  # surfaced on the consumer side
            errors.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        # generator closed/abandoned: release the producer and drain so the
        # queued device arrays are dropped promptly
        abandoned.set()
        try:
            while True:
                q.get_nowait()
        except queue_mod.Empty:
            pass


# ---------------------------------------------------------------------------
# Device-resident dataset (TPU-idiomatic input pipeline — new capability)
# ---------------------------------------------------------------------------

class DeviceDataset:
    """The whole (padded, stacked) dataset uploaded to device HBM ONCE;
    per-batch assembly is an on-device gather instead of a host restack.

    At 20k-vertex scale one padded sample is ~15-20 MB of operators, so
    host-side per-epoch restacking (make_padded_batches) moves ~100 MB per
    batch through memcpy + PCIe — 10x+ the device step time. Gathering rows
    of a device-resident (N, ...) pytree is an HBM-to-HBM copy at memory
    bandwidth and costs ~0.1 ms. Opt-in: the dataset must fit in HBM next to
    the model/optimizer (e.g. ~7 GB for 380 meshes at the 8192 bucket).

    Mixed-size datasets keep one device pytree per vertex bucket.
    """

    def __init__(self, ds: SurfaceDataset, buckets=None):
        import jax
        import jax.numpy as jnp

        if not ds.ops_list or len(ds.ops_list) != len(ds):
            raise RuntimeError("precompute() the dataset before uploading")
        self.labels_kind = ds.labels_kind
        # (sample_indices, device-resident PaddedBatch of ALL group rows)
        self.groups = [(idx, jax.tree.map(jnp.asarray, stacked))
                       for idx, stacked in _stacked_groups(ds, buckets)]

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0):
        """Yield PaddedBatch pytrees gathered on device. A partial final batch
        repeats the chunk's first row with labels -1 / face_mask False
        (identical semantics — and identical leaves — to make_padded_batches)."""
        import jax
        import jax.numpy as jnp

        def take(stacked, rows):
            r = jnp.asarray(rows)
            return jax.tree.map(lambda a: jnp.take(a, r, axis=0), stacked)

        rng = np.random.RandomState(seed) if shuffle else None
        for idx, stacked in self.groups:
            n = len(idx)
            order = rng.permutation(n) if rng is not None else np.arange(n)
            for start in range(0, n, batch_size):
                yield _batch_rows(stacked, order, start, batch_size, take,
                                  on_device=True)
