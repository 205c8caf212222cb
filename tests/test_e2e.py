"""End-to-end pipeline tests on synthetic data: dataset -> precompute -> padded
batching -> jitted training -> eval metrics. These stand in for the reference's
experiments-as-integration-tests strategy (SURVEY §4) since the real datasets
require downloads.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))

from diffusionnet_tpu.data import SurfaceDataset


def _make_classification_sets(n_per_class=6, n_test=2, seed=0):
    """3-class dataset: sphere / torus / thin torus, with random scale jitter."""
    from tests.meshgen import icosphere, torus
    rs = np.random.RandomState(seed)

    def sample(cls):
        if cls == 0:
            v, f = icosphere(subdivisions=2)
        elif cls == 1:
            v, f = torus(n_major=14, n_minor=10, r=0.35)
        else:
            v, f = torus(n_major=14, n_minor=10, r=0.15)
        v = v * (1.0 + 0.05 * rs.randn(*v.shape))  # jitter
        return v, f

    train = SurfaceDataset(labels_kind="global")
    test = SurfaceDataset(labels_kind="global")
    for cls in range(3):
        for i in range(n_per_class):
            train.add(*sample(cls), cls)
        for i in range(n_test):
            test.add(*sample(cls), cls)
    train.precompute(k_eig=16, verbose=False)
    test.precompute(k_eig=16, verbose=False)
    return train, test


@pytest.mark.e2e
def test_classification_pipeline_learns():
    from exp_common import FitConfig, build_model, fit
    train_ds, test_ds = _make_classification_sets()

    cfg = FitConfig(n_epoch=12, lr=1e-2, decay_every=50, batch_size=6,
                    input_features="hks", label_smoothing=0.2,
                    labels_kind="global")
    model = build_model(n_class=3, c_width=16, outputs_at="global_mean",
                        dropout=False, input_features="hks", n_block=2)
    params, history, evaluate = fit(model, train_ds, test_ds, cfg,
                                    verbose=False)
    final_train_acc = history[-1][1]
    test_acc = evaluate(params, test_ds)
    assert final_train_acc >= 0.9, history
    assert test_acc >= 0.8, history


@pytest.mark.e2e
def test_vertex_segmentation_pipeline_learns():
    """Hemisphere labeling on jittered spheres: per-vertex 2-class seg."""
    from exp_common import FitConfig, build_model, fit
    from tests.meshgen import icosphere
    rs = np.random.RandomState(0)

    def make(n, ds):
        for i in range(n):
            v, f = icosphere(subdivisions=2)
            v = v * (1.0 + 0.03 * rs.randn(*v.shape))
            labels = (v[:, 2] > 0).astype(np.int32)
            ds.add(v, f, labels)
        ds.precompute(k_eig=16, verbose=False)
        return ds

    train_ds = make(6, SurfaceDataset(labels_kind="vertex"))
    test_ds = make(2, SurfaceDataset(labels_kind="vertex"))

    cfg = FitConfig(n_epoch=10, lr=1e-2, decay_every=50, batch_size=6,
                    input_features="xyz", augment_rotate=False,
                    labels_kind="vertex")
    model = build_model(n_class=2, c_width=16, outputs_at="vertices",
                        dropout=False, input_features="xyz", n_block=2)
    params, history, evaluate = fit(model, train_ds, test_ds, cfg,
                                    verbose=False)
    assert history[-1][1] >= 0.9, history
    assert evaluate(params, test_ds) >= 0.85


@pytest.mark.e2e
def test_fmap_head_shapes_and_identity():
    """compute_fmap recovers ~identity when both shapes and features match."""
    import jax
    import jax.numpy as jnp
    from tests.meshgen import icosphere
    from diffusionnet_tpu.geometry import compute_operators
    from diffusionnet_tpu.models.fmaps import compute_fmap

    verts, faces = icosphere(subdivisions=2)
    ops = compute_operators(verts, faces, k_eig=16)
    k = 8
    feats = jnp.asarray(np.random.RandomState(0).randn(
        verts.shape[0], 24).astype(np.float32))
    evecs_t = jnp.asarray(ops.evecs[:, :k].T * ops.mass[None, :])
    C = compute_fmap(feats, feats, jnp.asarray(ops.evals[:k]),
                     jnp.asarray(ops.evals[:k]), evecs_t, evecs_t,
                     lambda_param=1e-3)
    assert C.shape == (k, k)
    # identity map up to regularization bias
    np.testing.assert_allclose(np.asarray(C), np.eye(k), atol=0.15)


@pytest.mark.e2e
def test_face_segmentation_batching():
    """outputs_at='faces' path through the padded batcher."""
    from exp_common import FitConfig, build_model, fit
    from tests.meshgen import icosphere
    rs = np.random.RandomState(1)

    def make(n, ds):
        for i in range(n):
            v, f = icosphere(subdivisions=1)
            v = v * (1.0 + 0.05 * rs.randn(*v.shape))
            centers = v[f].mean(axis=1)
            labels = (centers[:, 1] > 0).astype(np.int32)
            ds.add(v, f, labels)
        ds.precompute(k_eig=8, verbose=False)
        return ds

    train_ds = make(4, SurfaceDataset(labels_kind="face"))
    cfg = FitConfig(n_epoch=6, lr=1e-2, batch_size=4, input_features="xyz",
                    labels_kind="face")
    model = build_model(n_class=2, c_width=16, outputs_at="faces",
                        dropout=False, input_features="xyz", n_block=1)
    params, history, evaluate = fit(model, train_ds, train_ds, cfg,
                                    verbose=False)
    assert history[-1][1] >= 0.85, history


@pytest.mark.e2e
def test_inference_session(tmp_path):
    """Mesh-in/predictions-out through the high-level InferenceSession."""
    import jax
    import jax.numpy as jnp
    from tests.meshgen import icosphere
    from diffusionnet_tpu.models import DiffusionNet
    from diffusionnet_tpu.training import InferenceSession
    from diffusionnet_tpu.geometry import compute_operators, grad_operators

    verts, faces = icosphere(subdivisions=2)
    model = DiffusionNet(c_in=16, c_out=4, c_width=16, n_block=1,
                         dropout=False, outputs_at="vertices",
                         last_activation=jax.nn.log_softmax)
    ops = compute_operators(verts, faces, k_eig=16)
    from diffusionnet_tpu.data.features import get_features
    jo = jax.tree.map(jnp.asarray, ops)
    feats = get_features("hks", jnp.asarray(verts.astype(np.float32)),
                         jo.evals, jo.evecs)
    gX, gY = grad_operators(ops)
    params = model.init(jax.random.PRNGKey(0), feats, jo.mass, evals=jo.evals,
                        evecs=jo.evecs, gradX=jnp.asarray(gX),
                        gradY=jnp.asarray(gY))

    session = InferenceSession(model, params, k_eig=16, input_features="hks",
                               op_cache_dir=str(tmp_path), buckets=(1024,))
    preds = session(verts, faces)
    assert preds.shape == (verts.shape[0], 4)
    assert np.isfinite(preds).all()
    np.testing.assert_allclose(np.exp(preds).sum(-1), 1.0, rtol=1e-4)
    preds2 = session(verts, faces)  # cached precompute, compiled fn reuse
    np.testing.assert_allclose(preds, preds2, rtol=1e-6)


@pytest.mark.e2e
def test_point_cloud_classification_pipeline():
    """Full pipeline on POINT CLOUDS (no faces): point-cloud Laplacian + kNN
    tangent gradients through the batcher and trainer (the sampling_invariance
    cloud path, reference dataset.py:85-138)."""
    from exp_common import FitConfig, build_model, fit
    from tests.meshgen import icosphere, torus
    rs = np.random.RandomState(3)

    def make(n_each, ds):
        for cls in range(2):
            for i in range(n_each):
                v, _ = (icosphere(subdivisions=2) if cls == 0
                        else torus(n_major=14, n_minor=10))
                v = v * (1.0 + 0.04 * rs.randn(*v.shape))
                ds.add(v, None, cls)  # None faces -> point cloud
        ds.precompute(k_eig=12, verbose=False)
        return ds

    train_ds = make(4, SurfaceDataset(labels_kind="global"))
    cfg = FitConfig(n_epoch=10, lr=1e-2, batch_size=4, input_features="hks",
                    labels_kind="global")
    model = build_model(n_class=2, c_width=16, outputs_at="global_mean",
                        dropout=False, input_features="hks", n_block=2)
    params, history, evaluate = fit(model, train_ds, train_ds, cfg,
                                    verbose=False)
    assert history[-1][1] >= 0.9, history


@pytest.mark.e2e
def test_rotation_augmentation_path():
    """xyz features + random SO(3) rotation augmentation through the jitted
    train step (the reference's augment_random_rotate flow)."""
    from exp_common import FitConfig, build_model, fit
    train_ds, test_ds = _make_classification_sets(n_per_class=4, n_test=1)
    cfg = FitConfig(n_epoch=30, lr=1e-2, batch_size=6, input_features="xyz",
                    augment_rotate=True, labels_kind="global")
    model = build_model(n_class=3, c_width=16, outputs_at="global_mean",
                        dropout=False, input_features="xyz", n_block=2)
    params, history, evaluate = fit(model, train_ds, test_ds, cfg,
                                    verbose=False)
    # rotation augmentation makes xyz classification rotation-invariant-hard;
    # expect clearly-above-chance learning in a short run (chance = 1/3)
    assert history[-1][1] >= 0.6, history


@pytest.mark.e2e
def test_classification_mixed_precision_bf16():
    """compute_dtype=bfloat16 (f32 params/accumulation) must not hurt learning
    on the synthetic classification task."""
    import jax.numpy as jnp
    from exp_common import FitConfig, build_model, fit
    from diffusionnet_tpu.models import DiffusionNet
    import jax

    train_ds, test_ds = _make_classification_sets()
    cfg = FitConfig(n_epoch=12, lr=1e-2, batch_size=6, input_features="hks",
                    label_smoothing=0.2, labels_kind="global")
    model = DiffusionNet(c_in=16, c_out=3, c_width=16, n_block=2,
                         dropout=False, outputs_at="global_mean",
                         last_activation=jax.nn.log_softmax,
                         compute_dtype=jnp.bfloat16)
    params, history, evaluate = fit(model, train_ds, test_ds, cfg,
                                    verbose=False)
    assert history[-1][1] >= 0.9, history
    assert evaluate(params, test_ds) >= 0.8


@pytest.mark.e2e
def test_megakernel_harness_path_learns():
    """cfg.use_megakernel through the experiment harness (interpret mode on
    this CPU backend — identical code path to the TPU fast path)."""
    from exp_common import FitConfig, build_model, fit
    train_ds, test_ds = _make_classification_sets(n_per_class=6, n_test=2)

    cfg = FitConfig(n_epoch=14, lr=1e-2, decay_every=50, batch_size=6,
                    input_features="hks", label_smoothing=0.2,
                    labels_kind="global", use_megakernel=True)
    model = build_model(n_class=3, c_width=16, outputs_at="global_mean",
                        dropout=False, input_features="hks", n_block=2)
    params, history, evaluate = fit(model, train_ds, test_ds, cfg,
                                    verbose=False)
    assert history[-1][1] >= 0.85, history


@pytest.mark.e2e
def test_data_parallel_megakernel_learns(cpu_devices):
    """cfg.data_parallel + cfg.use_megakernel: the shard_map DP path launches
    the (interpret-mode) megakernel per device — the composition XLA's
    auto-partitioner cannot do with custom calls."""
    from exp_common import FitConfig, build_model, fit
    train_ds, test_ds = _make_classification_sets(n_per_class=6, n_test=2)

    cfg = FitConfig(n_epoch=12, lr=1e-2, decay_every=50, batch_size=8,
                    input_features="hks", label_smoothing=0.2,
                    labels_kind="global", use_megakernel=True,
                    data_parallel=True)
    model = build_model(n_class=3, c_width=16, outputs_at="global_mean",
                        dropout=False, input_features="hks", n_block=2)
    params, history, evaluate = fit(model, train_ds, test_ds, cfg,
                                    verbose=False, devices=cpu_devices)
    assert history[-1][1] >= 0.85, history
