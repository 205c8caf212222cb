"""Serving-path performance evidence (VERDICT r3 item 4) -> BENCH_SERVING.json.

The AOT serving subsystem (serving/export.py) is correctness-tested; this
bench records its latency claims on the flagship model (4x128, k=128):

  1. export time per vertex bucket (trace + lower + serialize);
  2. time-to-first-inference, AOT-load vs jit-from-source, each in a FRESH
     subprocess on the local accelerator (what a serving replica pays at
     boot: deserialize + XLA-compile the shipped module + 1 call, vs
     rebuild the flax model + trace + compile + 1 call);
  3. steady-state latency / meshes-per-second per bucket at batch 1 and 8
     (slope timing, median of 3);
  4. the same artifact on CPU (JAX_PLATFORMS=cpu subprocess): portability
     latency evidence — one artifact, two backends;
  5. the vertex-sharded artifact loaded on an 8-device virtual CPU mesh:
     load + first-call + steady latency (same GSPMD program as a pod slice).

Usage: python bench_serving.py            # full run, writes BENCH_SERVING.json
       (internal worker modes: --ttfi {aot,jit}, --cpu_worker)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
ARTIFACT = os.path.join(REPO, "data", "serving_bench_artifact")
SHARDED_ARTIFACT = os.path.join(REPO, "data", "serving_bench_sharded")
BUCKETS = (2048, 16384)
K_EIG = 128
C_WIDTH = 128
N_BLOCK = 4
C_IN = 3


def synth_inputs(V, B, k=K_EIG, seed=0):
    """Random spectral-path inputs with the right shapes/scales (latency is
    shape-determined; no geometry precompute needed)."""
    rs = np.random.RandomState(seed)
    f32 = np.float32
    x = rs.randn(B, V, C_IN).astype(f32)
    mass = np.abs(rs.rand(B, V)).astype(f32) + 1e-3
    evals = np.cumsum(np.abs(rs.rand(B, k)), axis=1).astype(f32)
    evecs = (rs.randn(B, V, k) / np.sqrt(V)).astype(f32)
    gX = (rs.randn(B, V, k) / np.sqrt(V)).astype(f32)
    gY = (rs.randn(B, V, k) / np.sqrt(V)).astype(f32)
    return x, mass, evals, evecs, gX, gY


def build_model_params():
    import jax
    import jax.numpy as jnp
    from diffusionnet_tpu.models import DiffusionNet

    model = DiffusionNet(c_in=C_IN, c_out=8, c_width=C_WIDTH, n_block=N_BLOCK,
                         dropout=False, outputs_at="vertices")
    xs = synth_inputs(256, 1)
    args = tuple(jnp.asarray(a) for a in xs)
    params = model.init(jax.random.PRNGKey(0), args[0], args[1],
                        evals=args[2], evecs=args[3], gradX=args[4],
                        gradY=args[5])
    return model, params


def export_artifacts():
    """Export the bench artifact (timing each bucket) + return the records."""
    from diffusionnet_tpu.serving.export import export_forward

    model, params = build_model_params()
    records = []
    # warm, untimed dummy export: the first export in a process pays jax
    # tracing/lowering machinery warm-up (~80 s) that is not per-bucket cost
    export_forward(model, params, [256], ARTIFACT + "_warm", k_eig=K_EIG)
    # per-bucket export timing (separate dirs so each is a full artifact)
    for v in BUCKETS:
        d = ARTIFACT + f"_single{v}"
        t0 = time.perf_counter()
        export_forward(model, params, [v], d, k_eig=K_EIG)
        records.append({
            "metric": f"AOT export (trace+lower+serialize) @ bucket V={v}, "
                      f"{N_BLOCK}x{C_WIDTH}, k={K_EIG}",
            "value": round(time.perf_counter() - t0, 2), "unit": "s"})
    # the combined artifact every other stage uses
    export_forward(model, params, BUCKETS, ARTIFACT, k_eig=K_EIG)
    return records


def steady_state(fn, args, n1=5, n2=20, repeats=3):
    """Slope latency: median over `repeats` of (t(n2)-t(n1))/(n2-n1)."""
    import jax

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    run(3)  # warm
    dts = sorted((run(n2) - run(n1)) / (n2 - n1) for _ in range(repeats))
    return dts[len(dts) // 2], (dts[0], dts[-1])


def bench_steady(platform_label):
    """Steady-state latency per (bucket, batch) on the current backend.

    Two paths per (bucket, batch):
      * full-args: every operator passed per call (device-resident already —
        measures the dispatch + padding overhead of the generic entrypoint);
      * prepared: `sm.prepare(...)` handle holding the operators resident on
        device; each request streams ONLY x. This is the production serving
        pattern (the round-4 bug was re-shipping ~200 MB of operators per
        request through host numpy)."""
    from diffusionnet_tpu.serving.export import load_serving_model

    import jax

    sm = load_serving_model(ARTIFACT)
    out = []
    for v in BUCKETS:
        x1, mass, evals, evecs, gX, gY = synth_inputs(v, 1)
        h = sm.prepare(mass[0], evals[0], evecs[0], gX[0], gY[0])
        for b in (1, 8):
            # operators/features live on device in a serving replica; feeding
            # numpy here would time the tunnel's H2D transfer (~100 ms for
            # 4 MB), not the model
            xs = jax.device_put(synth_inputs(v, b))
            dt, (lo, hi) = steady_state(sm, xs)
            out.append({
                "metric": f"AOT serving steady-state fwd @ V={v}, batch={b} "
                          f"({platform_label}, full-args)",
                "value": round(dt * 1e3, 2), "unit": "ms/batch",
                "meshes_per_sec": round(b / dt, 1),
                "spread_ms": [round(lo * 1e3, 2), round(hi * 1e3, 2)]})
            xb = jax.device_put(
                x1[0] if b == 1 else np.repeat(x1, b, axis=0))
            dt, (lo, hi) = steady_state(h, (xb,))
            rec = {
                "metric": f"AOT serving steady-state fwd @ V={v}, batch={b} "
                          f"({platform_label}, prepared handle, streams x "
                          "only)",
                "value": round(dt * 1e3, 2), "unit": "ms/batch",
                "meshes_per_sec": round(b / dt, 1),
                "spread_ms": [round(lo * 1e3, 2), round(hi * 1e3, 2)]}
            if v * b <= 32768:
                # sanity for the eye-popping small-bucket rows: slope timing
                # cancels dispatch, so this is pure device rate — verified
                # against blocking-every-call round-trips (~0.1 ms at
                # V=2048/b=8; the exported module runs default-precision
                # bf16 MXU passes, ~16 GF / 197 TFLOP/s ~= 0.08 ms)
                rec["note"] = ("slope timing (dispatch cancelled); "
                               "device-rate, cross-checked vs per-call "
                               "blocking round-trips")
            out.append(rec)
    return out


def ttfi_worker(mode: str):
    """Fresh-process time-to-first-inference. mode='aot': deserialize the
    shipped module + compile + 1 call. mode='jit': rebuild the flax model,
    trace + compile + 1 call. Prints one JSON line."""
    import jax
    import jax.numpy as jnp

    v = BUCKETS[0]
    xs = synth_inputs(v, 1)
    jax.devices()  # client init paid outside the measured window for both
    t0 = time.perf_counter()
    if mode == "aot":
        from diffusionnet_tpu.serving.export import load_serving_model
        sm = load_serving_model(ARTIFACT)
        t_load = time.perf_counter() - t0
        t1 = time.perf_counter()
        out = sm(*xs)
        jax.block_until_ready(out)
        t_first = time.perf_counter() - t1
    else:
        model, params = build_model_params()
        t_load = time.perf_counter() - t0   # model rebuild + init
        t1 = time.perf_counter()
        args = tuple(jnp.asarray(a) for a in xs)
        fn = jax.jit(lambda p, x, m, ev, evec, gx, gy: model.apply(
            p, x, m, evals=ev, evecs=evec, gradX=gx, gradY=gy))
        out = fn(params, *args)
        jax.block_until_ready(out)
        t_first = time.perf_counter() - t1
    print(json.dumps({"mode": mode, "load_s": round(t_load, 2),
                      "first_call_s": round(t_first, 2),
                      "ttfi_s": round(t_load + t_first, 2)}))


def cpu_worker():
    """CPU-backend measurements in a JAX_PLATFORMS=cpu process: portability
    steady-state at the small bucket + the sharded artifact on an 8-device
    virtual mesh. Prints JSON lines."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from diffusionnet_tpu.serving.export import (
        load_serving_model, load_sharded_serving_model,
        export_sharded_forward)

    sm = load_serving_model(ARTIFACT)
    v = BUCKETS[0]
    xs = jax.device_put(synth_inputs(v, 1))
    t0 = time.perf_counter()
    out = sm(*xs)
    jax.block_until_ready(out)
    t_first = time.perf_counter() - t0
    dt, (lo, hi) = steady_state(sm, xs, n1=2, n2=6)
    print(json.dumps({
        "metric": f"AOT serving steady-state fwd @ V={v}, batch=1 (CPU, same "
                  "artifact as TPU, full-args)",
        "value": round(dt * 1e3, 2), "unit": "ms/batch",
        "first_call_s": round(t_first, 2),
        "spread_ms": [round(lo * 1e3, 2), round(hi * 1e3, 2)]}))
    x1, mass, evals, evecs, gX, gY = synth_inputs(v, 1)
    h = sm.prepare(mass[0], evals[0], evecs[0], gX[0], gY[0])
    xd = jax.device_put(x1[0])
    dt, (lo, hi) = steady_state(h, (xd,), n1=2, n2=6)
    print(json.dumps({
        "metric": f"AOT serving steady-state fwd @ V={v}, batch=1 (CPU, same "
                  "artifact as TPU, prepared handle)",
        "value": round(dt * 1e3, 2), "unit": "ms/batch",
        "spread_ms": [round(lo * 1e3, 2), round(hi * 1e3, 2)]}))

    # sharded artifact: export here (needs the 8-device mesh) + load + run
    devices = jax.devices("cpu")[:8]
    model, params = build_model_params()
    t0 = time.perf_counter()
    export_sharded_forward(model, params, BUCKETS[1], SHARDED_ARTIFACT,
                           k_eig=K_EIG, n_devices=8)
    t_export = time.perf_counter() - t0
    t0 = time.perf_counter()
    ssm = load_sharded_serving_model(SHARDED_ARTIFACT, devices=devices)
    t_load = time.perf_counter() - t0
    x, mass, evals, evecs, gX, gY = synth_inputs(BUCKETS[1], 1)
    args = jax.device_put((x[0], mass[0], evals[0], evecs[0], gX[0], gY[0]))
    t0 = time.perf_counter()
    out = ssm(*args)
    jax.block_until_ready(out)
    t_first = time.perf_counter() - t0
    dt, (lo, hi) = steady_state(ssm, args, n1=2, n2=6)
    print(json.dumps({
        "metric": f"8-way vertex-sharded AOT serving @ V={BUCKETS[1]} "
                  "(virtual CPU mesh; GSPMD program identical on a pod)",
        "value": round(dt * 1e3, 2), "unit": "ms/surface",
        "export_s": round(t_export, 2), "load_s": round(t_load, 2),
        "first_call_s": round(t_first, 2),
        "spread_ms": [round(lo * 1e3, 2), round(hi * 1e3, 2)]}))
    hs = ssm.prepare(mass[0], evals[0], evecs[0], gX[0], gY[0])
    dt, (lo, hi) = steady_state(hs, (args[0],), n1=2, n2=6)
    print(json.dumps({
        "metric": f"8-way vertex-sharded AOT serving @ V={BUCKETS[1]} "
                  "(virtual CPU mesh, prepared handle, streams x only)",
        "value": round(dt * 1e3, 2), "unit": "ms/surface",
        "spread_ms": [round(lo * 1e3, 2), round(hi * 1e3, 2)]}))


def _spawn(args, extra_env=None):
    env = dict(os.environ)
    env.update(extra_env or {})
    p = subprocess.run([sys.executable, os.path.abspath(__file__)] + args,
                       capture_output=True, text=True, env=env, cwd=REPO,
                       timeout=1800)
    if p.returncode != 0:
        raise RuntimeError(f"worker {args} failed:\n{p.stdout[-2000:]}\n"
                           f"{p.stderr[-2000:]}")
    return [json.loads(line) for line in p.stdout.splitlines()
            if line.startswith("{")]


def main():
    import jax
    platform = jax.devices()[0].platform
    results = []
    print(f"exporting bench artifacts ({N_BLOCK}x{C_WIDTH}, k={K_EIG}, "
          f"buckets {BUCKETS}) ...", flush=True)
    results.extend(export_artifacts())

    # fresh-process TTFI, AOT vs jit-from-source, on the local accelerator
    aot = _spawn(["--ttfi", "aot"])[0]
    jit = _spawn(["--ttfi", "jit"])[0]
    results.append({
        "metric": f"time-to-first-inference @ V={BUCKETS[0]}, fresh process "
                  f"({platform}): AOT-load vs jit-from-source",
        "value": aot["ttfi_s"], "unit": "s",
        "aot": aot, "jit_from_source": jit,
        "aot_speedup": round(jit["ttfi_s"] / max(aot["ttfi_s"], 1e-9), 2)})

    results.extend(bench_steady(platform))
    results.extend(_spawn(
        ["--cpu_worker"],
        {"JAX_PLATFORMS": "cpu",
         "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
         + " --xla_force_host_platform_device_count=8"}))

    for r in results:
        print(json.dumps(r))
    with open(os.path.join(REPO, "BENCH_SERVING.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ttfi", choices=["aot", "jit"])
    ap.add_argument("--cpu_worker", action="store_true")
    a = ap.parse_args()
    if a.ttfi:
        ttfi_worker(a.ttfi)
    elif a.cpu_worker:
        cpu_worker()
    else:
        main()
