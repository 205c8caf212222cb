"""Consolidated results artifact generator (VERDICT r2 item 4).

Collects every per-suite evidence number a reviewer needs to compare this
framework against the reference's claims (/root/reference/experiments/*/
README.md) into docs/results/*.jsonl, and renders docs/RESULTS.md from them.
Each section is regenerable independently; the rendered doc records which
sections were refreshed when.

Usage:
  python experiments/tools/gen_results.py --sections bench,eigen,render
  python experiments/tools/gen_results.py --sections parity,synthetic,render
  python experiments/tools/gen_results.py --sections soak,render   # TPU, ~7 min

Sections:
  bench      aggregate BENCH_*.json / MULTICHIP_*.json artifacts (no compute)
  eigen      measure device-vs-ARPACK eigensolver parity at 20k (CPU ok)
  parity     run the 6 pretrained-checkpoint parity tests, capture measured
             errors (needs torch + /root/reference checkpoints)
  synthetic  run the synthetic E1/E4/E5 pipelines end-to-end, capture final
             accuracies (each trains for real; minutes per suite)
  soak       the 200-epoch full-config E1 soak (megakernel+bf16; TPU)
  render     regenerate docs/RESULTS.md from whatever jsonl files exist
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
OUT_DIR = os.path.join(REPO, "docs", "results")


def _write_jsonl(name: str, records: list[dict]) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    with open(os.path.join(OUT_DIR, name + ".jsonl"), "w") as f:
        for r in records:
            f.write(json.dumps({"generated_utc": stamp, **r}) + "\n")
    print(f"wrote docs/results/{name}.jsonl ({len(records)} records)")


def _read_jsonl(name: str) -> list[dict]:
    path = os.path.join(OUT_DIR, name + ".jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def section_bench() -> None:
    records = []
    for fname in sorted(os.listdir(REPO)):
        if not (fname.startswith(("BENCH", "MULTICHIP"))
                and fname.endswith(".json")):
            continue
        if fname == "BENCH_SERVING.json":
            continue  # rendered as its own Serving section
        with open(os.path.join(REPO, fname)) as f:
            data = json.load(f)
        if isinstance(data, dict):
            # round-driver wrappers (BENCH_rNN/MULTICHIP_rNN) embed the
            # bench's own JSON line(s) in their "tail" field
            if "tail" in data:
                embedded = [json.loads(ln) for ln in
                            str(data["tail"]).splitlines()
                            if ln.strip().startswith("{")]
                keep = {k: v for k, v in data.items()
                        if k in ("ok", "skipped", "n_devices", "rc")}
                data = ([{**e, **keep} for e in embedded]
                        or [{"metric": "driver wrapper", **keep}])
            else:
                data = [data]
        for entry in data:
            records.append({"artifact": fname, **entry})
    _write_jsonl("bench", records)


def section_eigen() -> None:
    """Device-vs-ARPACK gauge-invariant parity at ~20k, k=128, measured by
    the SAME procedure as the 200k artifact (bench_large.eigensolver_bench,
    reused with a mesh override — one copy of the parity math)."""
    sys.path.insert(0, REPO)
    import jax
    from tests.meshgen import flat_grid
    import bench_large

    rec = bench_large.eigensolver_bench(
        mesh=flat_grid(n=142, jitter=0.4))[0]
    # the compute_operators default path = device sweeps + f64 polish:
    # report the polished errors/time under the renderer's field names
    _write_jsonl("eigensolver", [{
        "metric": rec["metric"] + " (device sweeps + f64 polish)",
        "backend": jax.default_backend(),
        "band_max_rel_err": rec["polished_band_max_rel_err"],
        "diffusion_output_max_rel_err":
            rec["polished_diffusion_output_max_rel_err"],
        "hks_max_rel_err": rec["polished_hks_max_rel_err"],
        "device_s": rec["with_f64_polish_s"],
        "arpack_s": rec["arpack_host_s"],
    }])


def section_parity() -> None:
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-s",
         "tests/test_pretrained_parity.py", "tests/test_parity_torch.py"],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    out = proc.stdout + proc.stderr
    records = []
    # pytest's progress dots can prefix the line ('.PARITY ...')
    for m in re.finditer(r"PARITY (\S+) ([^\n]+)", out):
        rec = {"checkpoint": m.group(1)}
        for kv in m.group(2).split():
            key, val = kv.split("=")
            rec[key] = float(val)
        records.append(rec)
    summary = re.search(r"(\d+) passed", out)
    records.append({"suite": "parity tests",
                    "passed": int(summary.group(1)) if summary else 0,
                    "returncode": proc.returncode})
    if proc.returncode != 0:
        print(out[-3000:])
    _write_jsonl("pretrained_parity", records)


def _run_example(script: str, args: list[str], patterns: dict[str, str],
                 timeout: int = 5400) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "examples", script)] + args
    t0 = datetime.datetime.now()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)
    out = proc.stdout + proc.stderr
    rec = {"script": f"examples/{script}", "args": " ".join(args),
           "returncode": proc.returncode,
           "wall_s": round((datetime.datetime.now() - t0).total_seconds(), 1)}
    for key, pat in patterns.items():
        matches = re.findall(pat, out)
        if matches:
            rec[key] = float(matches[-1])
    if proc.returncode != 0:
        print(out[-3000:])
    return rec


def section_synthetic() -> None:
    records = [
        _run_example("synthetic_shrec.py", ["--n_epoch", "40"],
                     {"test_accuracy_pct":
                      r"Overall test accuracy:\s*([\d.]+)%"}),
        _run_example("fmaps_synthetic.py", [],
                     {"heldout_fmap_l2": r"held-out pair: fmap L2 ([\d.e+-]+)"}),
        # also appends its per-mutation table to sampling_invariance.jsonl
        # and exits nonzero if the invariance gate fails
        _run_example("sampling_invariance_synthetic.py", ["--gate"],
                     {"last_exact_label_acc_pct":
                      r"exact-label acc\s+([\d.]+)%"}),
    ]
    _write_jsonl("synthetic", records)


def section_soak() -> None:
    rec = _run_example(
        "synthetic_shrec.py",
        ["--n_epoch", "200", "--per_class", "10", "--mega", "--bf16"],
        {"test_accuracy_pct": r"Overall test accuracy:\s*([\d.]+)%"})
    rec["config"] = ("reference E1 config, 200 epochs, megakernel + bf16 "
                     "(the full-schedule numerical-stability soak)")
    _write_jsonl("soak", [rec])


def section_render() -> None:
    lines = [
        "# Results",
        "",
        "Consolidated evidence for every suite, generated by "
        "`experiments/tools/gen_results.py` from `docs/results/*.jsonl` "
        "(regenerate any section with `--sections <name>,render`). The "
        "reference publishes prose claims, not numbers "
        "(`/root/reference/experiments/*/README.md`); each section names the "
        "claim it anchors to.",
        "",
    ]

    bench = _read_jsonl("bench")
    if bench:
        lines += ["## Performance benches (TPU v5e, one chip)", "",
                  "Reference anchor: README.md:4 — \"easily train on meshes "
                  "of 20k vertices... infer on meshes with 200k vertices\"; "
                  "the reference publishes no throughput numbers (modeled "
                  "baseline derivation in bench.py docstring).", "",
                  "| artifact | metric | value | unit | key extras |", "|---|---|---|---|---|"]
        for r in bench:
            extras = {k: v for k, v in r.items()
                      if k in ("meshes_per_sec", "mfu_vs_bf16_peak",
                               "tflops_per_sec", "vs_baseline",
                               "speedup_vs_arpack", "band_max_rel_err",
                               "polished_diffusion_output_max_rel_err",
                               "max_rel_err_vs_unsharded", "ok")}
            lines.append(
                f"| {r.get('artifact','')} | {r.get('metric','')} | "
                f"{r.get('value','')} | {r.get('unit','')} | "
                f"{json.dumps(extras) if extras else ''} |")
        lines.append("")

    eig = _read_jsonl("eigensolver")
    if eig:
        lines += ["## TPU eigensolver parity (primary precompute solver)", "",
                  "Gauge-invariant parity of `eigensolver='device'` (the "
                  "compute_operators default) vs the ARPACK ladder; "
                  "VERDICT r2 gate: <= 1e-4.", ""]
        for r in eig:
            lines.append(
                f"- {r['metric']} ({r['backend']}): band "
                f"{r['band_max_rel_err']:.2e}, diffusion outputs "
                f"{r['diffusion_output_max_rel_err']:.2e}, HKS "
                f"{r['hks_max_rel_err']:.2e}; device {r['device_s']} s vs "
                f"ARPACK {r['arpack_s']} s")
        lines.append("")

    par = _read_jsonl("pretrained_parity")
    if par:
        lines += ["## Pretrained-checkpoint parity (6 shipped reference "
                  "checkpoints)", "",
                  "The reference's own .pth weights, converted, must "
                  "reproduce the torch forward outputs (same operators, so "
                  "eigenvector gauge cancels).", ""]
        for r in par:
            if "checkpoint" in r:
                kv = ", ".join(f"{k} {v:.2e}" for k, v in r.items()
                               if k not in ("checkpoint", "generated_utc"))
                lines.append(f"- `{r['checkpoint']}`: {kv}")
            elif "suite" in r:
                lines.append(f"- full torch-parity test run: {r['passed']} "
                             f"passed (rc={r['returncode']})")
        lines.append("")

    serving = []
    serving_path = os.path.join(REPO, "BENCH_SERVING.json")
    if os.path.exists(serving_path):
        with open(serving_path) as f:
            serving = json.load(f)
    if serving:
        lines += ["## Serving (AOT StableHLO artifacts)", "",
                  "Latency evidence for serving/export.py (flagship 4x128, "
                  "k=128): export cost, fresh-process time-to-first-"
                  "inference (AOT-load vs jit-from-source), steady-state "
                  "throughput per bucket, the same artifact on CPU, and the "
                  "vertex-sharded artifact on an 8-device mesh. Source: "
                  "BENCH_SERVING.json (python bench_serving.py).", ""]
        for r in serving:
            extras = {k: v for k, v in r.items()
                      if k in ("meshes_per_sec", "aot_speedup",
                               "first_call_s", "export_s", "load_s")}
            kv = (" — " + ", ".join(f"{k}={v}" for k, v in extras.items())
                  if extras else "")
            lines.append(f"- {r['metric']}: {r['value']} {r['unit']}{kv}")
        lines.append("")

    mut = _read_jsonl("sampling_invariance")
    if mut:
        r = mut[-1]
        g = r["gate"]
        lines += ["## Discretization invariance (six-mutation table + gate)",
                  "",
                  "The reference's headline property, per-mutation "
                  "(sampling_invariance.py:212-225's table, realized on the "
                  "synthetic sphere family; examples/"
                  "sampling_invariance_synthetic.py). Gate: every mutation's "
                  f"mean angular error <= {g['limit_deg']} deg "
                  f"({g['rule']}); collapse reads ~90 deg. "
                  f"Gate {'PASSED' if g['ok'] else 'FAILED'}; "
                  "tests/test_sampling_invariance_gate.py enforces a "
                  "collapse-level bound in the suite.", "",
                  "| mutation | exact-label acc | mean angular err (deg) | "
                  "n_verts |", "|---|---|---|---|"]
        for name in ("orig", "iso", "qes", "mc", "dense", "cloud"):
            if name not in r["per_mutation"]:
                continue
            pm = r["per_mutation"][name]
            tag = " (point cloud)" if pm.get("is_cloud") else ""
            lines.append(f"| {name}{tag} | {pm['exact_label_acc_pct']}% | "
                         f"{pm['mean_angular_err_deg']} | {pm['n_verts']} |")
        lines.append("")

    syn = _read_jsonl("synthetic")
    if syn:
        lines += ["## Synthetic end-to-end suites (no-download stand-ins)", "",
                  "Reference anchors: classification_shrec11/README.md "
                  "(\"nearly perfect... 0-3 wrong of 300\"), "
                  "functional_correspondence/README.md, sampling_invariance. "
                  "Real datasets require downloads unavailable here; these "
                  "run the same drivers/configs on parametric shape "
                  "families.", ""]
        for r in syn:
            kv = ", ".join(f"{k}={v}" for k, v in r.items()
                           if k not in ("script", "args", "generated_utc"))
            lines.append(f"- `{r['script']} {r['args']}`: {kv}")
        lines.append("")

    soak = _read_jsonl("soak")
    if soak:
        lines += ["## 200-epoch soak (full reference schedule)", ""]
        for r in soak:
            lines.append(f"- `{r['script']} {r['args']}`: "
                         f"test accuracy {r.get('test_accuracy_pct','?')}%, "
                         f"wall {r.get('wall_s','?')} s (rc="
                         f"{r['returncode']}) — {r.get('config','')}")
        lines.append("")

    lines += [
        "## Provenance",
        "",
        "Each jsonl record carries `generated_utc`. Test-suite evidence "
        "(155+ tests incl. driver smoke runs on fabricated dataset trees, "
        "multi-process collectives, vertex-sharded training parity) runs in "
        "CI fashion via `python -m pytest tests/ -q`.",
        "",
    ]
    with open(os.path.join(REPO, "docs", "RESULTS.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote docs/RESULTS.md")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="bench,render",
                    help="comma list: bench,eigen,parity,synthetic,soak,render")
    args = ap.parse_args()
    for s in args.sections.split(","):
        fn = globals().get(f"section_{s.strip()}")
        if fn is None:
            raise SystemExit(f"unknown section '{s}'")
        fn()


if __name__ == "__main__":
    main()
