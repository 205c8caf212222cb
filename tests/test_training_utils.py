"""Training utilities: checkpoint roundtrip, profiling helpers, schedules."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from diffusionnet_tpu.training import (
    save_checkpoint, restore_checkpoint, step_decay_schedule, StageTimer,
    slope_throughput,
)


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                        "b": jnp.ones(3)},
             "step": jnp.asarray(7)}
    path = save_checkpoint(str(tmp_path / "ckpt"), state, step=7)
    template = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_step_decay_schedule_matches_reference_semantics():
    """lr *= 0.5 every `decay_every` steps (reference
    classification_shrec11.py:102-106 per-epoch decay)."""
    sched = step_decay_schedule(1e-3, decay_every_steps=10, decay_rate=0.5)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(9)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 2.5e-4, rtol=1e-6)


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report()


def test_slope_throughput():
    @jax.jit
    def f(x):
        return x * 1.0001

    def step(x):
        y = f(x)
        return y, jnp.sum(y)

    rate, _ = slope_throughput(step, jnp.ones(16))
    assert rate > 0


def test_fit_resume_bit_identical(tmp_path):
    """A run checkpointed at epoch k and resumed equals an uninterrupted run
    (full train state incl. optimizer and PRNG chain is saved — the reference
    restarts from epoch 0 on a crash, SURVEY §5)."""
    import sys, os
    import numpy as np
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "experiments"))
    from exp_common import FitConfig, build_model, fit
    from diffusionnet_tpu.data import SurfaceDataset
    from tests.meshgen import icosphere
    import jax

    rs = np.random.RandomState(0)
    ds = SurfaceDataset(labels_kind="global")
    for cls in range(2):
        for _ in range(4):
            v, f = icosphere(subdivisions=1)
            v = v * (1.0 + 0.05 * rs.randn(*v.shape)) * (1.0 + cls)
            ds.add(v, f, cls)
    ds.precompute(k_eig=8, verbose=False)

    def make_cfg(n_epoch):
        return FitConfig(n_epoch=n_epoch, lr=1e-2, batch_size=4,
                         input_features="xyz", labels_kind="global")

    model = build_model(n_class=2, c_width=8, outputs_at="global_mean",
                        dropout=False, input_features="xyz", n_block=1)

    # uninterrupted 4-epoch run
    p_full, _, _ = fit(model, ds, ds, make_cfg(4), verbose=False)

    # 2 epochs with checkpointing, then resume for 2 more
    ck = str(tmp_path / "run" / "model")
    fit(model, ds, ds, make_cfg(2), model_save_path=ck, verbose=False)
    p_res, _, _ = fit(model, ds, ds, make_cfg(4), model_save_path=ck,
                      resume_from=ck + "_ckpt", verbose=False)

    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7), p_full, p_res)


def test_fit_graceful_sigterm_checkpoints_and_resumes(tmp_path):
    """cfg.graceful_sigterm: a SIGTERM mid-run finishes the epoch in flight,
    checkpoints the full train state, and returns early; resuming completes
    the run bit-identically to an uninterrupted one (preemption safety —
    spot evictions / TPU maintenance cost at most one epoch)."""
    import os
    import signal
    import sys
    import threading

    import numpy as np
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "experiments"))
    from exp_common import FitConfig, build_model, fit
    from diffusionnet_tpu.data import SurfaceDataset
    from tests.meshgen import icosphere
    import jax

    rs = np.random.RandomState(0)
    ds = SurfaceDataset(labels_kind="global")
    for cls in range(2):
        for _ in range(4):
            v, f = icosphere(subdivisions=1)
            v = v * (1.0 + 0.05 * rs.randn(*v.shape)) * (1.0 + cls)
            ds.add(v, f, cls)
    ds.precompute(k_eig=8, verbose=False)

    def make_cfg(n_epoch):
        return FitConfig(n_epoch=n_epoch, lr=1e-2, batch_size=4,
                         input_features="xyz", labels_kind="global",
                         graceful_sigterm=True)

    model = build_model(n_class=2, c_width=8, outputs_at="global_mean",
                        dropout=False, input_features="xyz", n_block=1)

    p_full, _, _ = fit(model, ds, ds, make_cfg(4), verbose=False)

    # fire SIGTERM repeatedly once training starts; the loop must stop at an
    # epoch boundary with a checkpoint on disk instead of dying mid-step.
    # A benign handler is pre-installed so a signal racing fit()'s handler
    # installation can't kill the test process, and the signals repeat until
    # one lands inside the guarded loop. n_epoch is far larger than the
    # window can cover, so the run always stops early.
    ck = str(tmp_path / "run" / "model")
    benign = lambda *a: None
    prior_handler = signal.signal(signal.SIGTERM, benign)
    done = threading.Event()

    def keep_signaling():
        while not done.wait(1.0):
            os.kill(os.getpid(), signal.SIGTERM)

    sender = threading.Thread(target=keep_signaling, daemon=True)
    sender.start()
    try:
        _, hist, _ = fit(model, ds, ds, make_cfg(100000),
                         model_save_path=ck, verbose=False)
        # fit must have restored the disposition it found (the benign one)
        restored_to = signal.getsignal(signal.SIGTERM)
    finally:
        done.set()
        sender.join()
        signal.signal(signal.SIGTERM, prior_handler)
    assert 0 < len(hist) < 100000, "SIGTERM did not stop the run early"
    from diffusionnet_tpu.training.checkpoint import latest_checkpoint
    assert latest_checkpoint(ck + "_ckpt") is not None
    assert restored_to is benign

    # resume from the preemption checkpoint to the 4-epoch horizon; where the
    # interruption landed at epoch >= 4 the comparison is void, so force a
    # deterministic small case too: interrupt-free short run equivalence is
    # already covered by test_fit_resume_bit_identical — here assert the
    # resumed run completes and produces finite params
    p_res, hist2, _ = fit(model, ds, ds, make_cfg(len(hist) + 2),
                          model_save_path=ck,
                          resume_from=ck + "_ckpt", verbose=False)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(p_res))
    assert hist2[0][0] == len(hist)  # resumed at the next epoch


def test_fit_raises_on_nonfinite_loss():
    import sys, os
    import numpy as np
    import pytest
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "experiments"))
    from exp_common import FitConfig, build_model, fit
    from diffusionnet_tpu.data import SurfaceDataset
    from tests.meshgen import icosphere

    ds = SurfaceDataset(labels_kind="global")
    v, f = icosphere(subdivisions=1)
    ds.add(v, f, 0)
    ds.add(v * 2, f, 1)
    ds.precompute(k_eig=8, verbose=False)
    cfg = FitConfig(n_epoch=3, lr=1e38, batch_size=2,  # lr overflow -> NaN
                    input_features="xyz", labels_kind="global")
    model = build_model(n_class=2, c_width=8, outputs_at="global_mean",
                        dropout=False, input_features="xyz", n_block=1)
    with pytest.raises(FloatingPointError):
        fit(model, ds, ds, cfg, verbose=False)


def test_restore_params_only_from_full_state_checkpoint(tmp_path):
    """--evaluate --load_model against a training checkpoint: a params-only
    template extracts the params subtree from a full-train-state save."""
    import numpy as np
    from diffusionnet_tpu.training import (save_checkpoint, restore_checkpoint,
                                           latest_checkpoint)
    params = {"params": {"dense": {"kernel": np.ones((3, 4), np.float32),
                                   "bias": np.zeros(4, np.float32)}}}
    state = {"params": params, "opt_state": {"count": np.int32(7)},
             "epoch": np.asarray(3, np.int32), "rng": np.zeros(2, np.uint32)}
    p = save_checkpoint(str(tmp_path), state, step=3)
    assert latest_checkpoint(str(tmp_path)) == p
    full = restore_checkpoint(p, state)
    assert int(full["epoch"]) == 3
    only = restore_checkpoint(p, params)
    np.testing.assert_array_equal(only["params"]["dense"]["kernel"],
                                  params["params"]["dense"]["kernel"])


def test_inference_session_megakernel_matches_xla(tmp_path):
    """InferenceSession(use_megakernel=True) equals the XLA session."""
    import numpy as np
    import jax
    from diffusionnet_tpu.models import DiffusionNet
    from diffusionnet_tpu.training import InferenceSession
    from tests.meshgen import icosphere

    verts, faces = icosphere(subdivisions=2)
    model = DiffusionNet(c_in=16, c_out=4, c_width=8, n_block=2,
                         dropout=False, outputs_at="vertices",
                         last_activation=jax.nn.log_softmax)
    base = InferenceSession(model, None, k_eig=8, input_features="hks",
                            op_cache_dir=str(tmp_path), buckets=(1024,))
    # init params through one probe call pathway
    import jax.numpy as jnp
    from diffusionnet_tpu.geometry import (get_operators, pad_operators,
                                           grad_operators)
    from diffusionnet_tpu.data.features import get_features
    ops = pad_operators(get_operators(verts, faces, k_eig=8), 1024)
    gX, gY = grad_operators(ops)
    jo = jax.tree.map(jnp.asarray, ops)
    x = jnp.asarray(np.pad(verts.astype(np.float32), ((0, 1024 - len(verts)),
                                                      (0, 0))))
    feats = get_features("hks", x, jo.evals, jo.evecs)
    params = model.init(jax.random.PRNGKey(0), feats, jo.mass,
                        evals=jo.evals, evecs=jo.evecs,
                        gradX=jnp.asarray(gX), gradY=jnp.asarray(gY))
    base.params = params
    fast = InferenceSession(model, params, k_eig=8, input_features="hks",
                            op_cache_dir=str(tmp_path), buckets=(1024,),
                            use_megakernel=True)
    out_base = base(verts, faces)
    out_fast = fast(verts, faces)
    np.testing.assert_allclose(out_fast, out_base, rtol=2e-4, atol=2e-4)


def test_checkpoint_relative_path_and_params_only_restore(tmp_path,
                                                          monkeypatch):
    """Relative checkpoint dirs restore (Orbax requires absolute paths — the
    API absolutizes), and a params-only template extracts the params subtree
    from a full-train-state checkpoint in BOTH backends (Orbax and the keyed
    npz fallback)."""
    import builtins

    from diffusionnet_tpu.training.checkpoint import latest_checkpoint

    state = {"params": {"w": jnp.arange(4.0)},
             "opt_state": {"m": jnp.ones(3)},
             "epoch": np.asarray(3, np.int32)}
    monkeypatch.chdir(tmp_path)

    # Orbax branch, relative dir
    save_checkpoint("ck", state, step=1)
    p = latest_checkpoint("ck")
    full = restore_checkpoint(p, jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(np.asarray(full["params"]["w"]), [0, 1, 2, 3])
    po = restore_checkpoint(p, {"w": jnp.zeros(4)})
    np.testing.assert_allclose(np.asarray(po["w"]), [0, 1, 2, 3])

    # npz fallback branch (orbax import blocked)
    real_import = builtins.__import__

    def no_orbax(name, *a, **k):
        if name.startswith("orbax"):
            raise ImportError("simulated absence")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_orbax)
    save_checkpoint("ck2", state, step=1)
    p2 = latest_checkpoint("ck2")
    assert p2.endswith(".npz")
    full2 = restore_checkpoint(p2, jax.tree.map(jnp.zeros_like, state))
    np.testing.assert_allclose(np.asarray(full2["params"]["w"]), [0, 1, 2, 3])
    po2 = restore_checkpoint(p2, {"w": jnp.zeros(4)})
    np.testing.assert_allclose(np.asarray(po2["w"]), [0, 1, 2, 3])


def test_train_step_primitives_learn():
    """make_train_step/make_eval_step/adam_with_step_decay (the primitives
    exp_common.fit composes) drive a toy regression loss to ~0."""
    import jax
    import jax.numpy as jnp
    from diffusionnet_tpu.training import (adam_with_step_decay,
                                           make_train_step, make_eval_step)

    w_true = jnp.asarray([2.0, -1.0, 0.5])
    X = jax.random.normal(jax.random.PRNGKey(0), (64, 3))
    y = X @ w_true

    def loss_fn(params, batch, rng):
        pred = batch["X"] @ params
        loss = jnp.mean((pred - batch["y"]) ** 2)
        return loss, loss

    opt = adam_with_step_decay(0.1, decay_every_steps=200)
    params = jnp.zeros(3)
    opt_state = opt.init(params)
    step = make_train_step(loss_fn, opt, donate=False)
    batch = {"X": X, "y": y}
    for i in range(150):
        params, opt_state, loss, aux = step(params, opt_state, batch,
                                            jax.random.PRNGKey(i))
    assert float(loss) < 1e-3, float(loss)
    ev = make_eval_step(lambda p, b: jnp.mean((b["X"] @ p - b["y"]) ** 2))
    assert float(ev(params, batch)) < 1e-3
