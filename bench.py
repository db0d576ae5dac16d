"""Headline benchmark (driver contract: prints ONE small JSON line).

Mirrors the reference's criterion ``graph_slam_intel`` harness
(benches/graph_slam.rs:6-16): 10 Gauss-Newton iterations on intel.g2o
(1728 poses / 4830 edges / 5184 dof). Here the 10 iterations are ONE jitted
XLA program on the TPU (vmapped linearization + scatter assembly + blocked
Cholesky on the MXU per iteration).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
speedup of the device path over this repo's host pipeline (f64 scipy
SuperLU direct solve per iteration — the same CPU sparse-direct architecture
as the reference's UMFPACK path, measured on this machine).

Artifact contract (learned the hard way across rounds 3-4):
- the driver captures only the TAIL of stdout and parses the LAST JSON
  line, so the line must be SMALL (< ~1 KB). Bulky per-row data (the
  per-graph suite, scaling curves) goes to ``BENCH_SUITE.json`` on disk,
  referenced from the headline line by path — never embedded (embedding
  truncated round 3's line mid-JSON);
- the whole run must finish inside a hard wall-clock budget
  (``RUSTROBOTICS_BENCH_BUDGET_S``, default 1200 s): round 4 ran past the
  driver's timeout and produced nothing. The compact headline line is
  printed IMMEDIATELY after the headline measurement as a safety net;
  optional stages are budget-gated and an enriched (equally compact)
  line is printed at the end.
"""

import json
import os
import sys
import time

T0 = time.monotonic()
BUDGET_S = float(os.environ.get("RUSTROBOTICS_BENCH_BUDGET_S", "1200"))


def _remaining():
    return BUDGET_S - (time.monotonic() - T0)


def _spent():
    return time.monotonic() - T0


def _tpu_alive_probe(timeout_s=90):
    """Probe TPU/backend health in a SUBPROCESS: a dead axon tunnel makes
    jax.devices() hang forever in-process, which would hang the whole
    bench. The probe times out instead. The probe also executes a tiny
    matmul so a tunnel that lists devices but can't dispatch counts as
    dead. Returns "tpu" / "cpu" (deterministic: no TPU plugin) /
    "dead" (timeout or crash — possibly transient)."""
    import subprocess
    import sys as _sys

    # aliveness is proven by FETCHING the matmul's value: over the axon
    # tunnel block_until_ready is a no-op, so a tunnel that accepts
    # dispatches but cannot execute would otherwise pass the probe
    code = (
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()[0]\n"
        "x = jnp.ones((128, 128))\n"
        "assert float((x @ x).sum()) > 0\n"
        "print(d.platform)\n"
    )
    try:
        r = subprocess.run(
            [_sys.executable, "-c", code],
            capture_output=True, timeout=timeout_s, text=True,
        )
    except Exception:
        return "dead"
    if r.returncode != 0:
        return "dead"
    return "cpu" if "cpu" in r.stdout else "tpu"


def _tpu_alive_once(timeout_s=90):
    return _tpu_alive_probe(timeout_s) == "tpu"


def _tpu_alive(attempts=4, backoffs=(15, 30, 45)):
    """Retry the probe with backoff: a transient tunnel outage must not
    silently downgrade the round's headline artifact to CPU (that is
    what happened to BENCH_r02.json). Total probe spend is capped at
    ~35% of the wall budget so a dead tunnel cannot eat the round
    (that is what happened to BENCH_r04.json)."""
    if os.environ.get("RUSTROBOTICS_BENCH_SINGLE_PROBE"):
        return _tpu_alive_once()
    for k in range(attempts):
        probe = _tpu_alive_probe()
        if probe == "tpu":
            return True
        if probe == "cpu":
            # deterministic answer: jax is up with no TPU plugin at all —
            # retrying cannot change that (retries are for dead-tunnel
            # timeouts)
            return False
        if _spent() > 0.35 * BUDGET_S:
            print("[bench] probe budget exhausted; CPU fallback",
                  file=sys.stderr)
            return False
        if k < len(backoffs):
            print(f"[bench] tpu probe attempt {k + 1}/{attempts} failed; "
                  f"retrying in {backoffs[k]}s", file=sys.stderr)
            time.sleep(backoffs[k])
    return False


# Probe (with retries) only when executed as the driver's bench entry;
# importing bench as a module (tests, helper reuse) gets the CPU path
# immediately instead of paying probe retries at import time.
_TPU_OK = _tpu_alive() if __name__ == "__main__" else False

import jax  # noqa: E402

if not _TPU_OK:
    # degrade to CPU rather than hanging the driver: the JSON line still
    # lands, marked with the fallback platform
    jax.config.update("jax_platforms", "cpu")

# NOTE: the scaling proxy's virtual 8-device CPU mesh runs in a
# SUBPROCESS (_scaling_start): setting jax_num_cpu_devices here was
# measured to slow the CPU-fallback headline ~16%.

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _load_graph():
    path = os.environ.get(
        "RUSTROBOTICS_DATASET", "/root/reference/dataset"
    ) + "/g2o/intel.g2o"
    from rustrobotics_tpu.mapping import load_g2o

    if os.path.exists(path):
        return load_g2o(path), "intel"
    # dataset not mounted: synthetic graph of comparable size
    from rustrobotics_tpu.mapping.synthetic import synthetic_pose_graph_2d

    return synthetic_pose_graph_2d(num_poses=1728, num_landmarks=0), "synthetic1728"


_PALLAS_ERR = None


def _pallas_preflight_ok(timeout_s=300):
    """Subprocess pre-flight of the fused Mosaic kernel: compile + run
    ONE solve out-of-process (a TPU-worker crash must cost us the pallas
    variant, not the bench). Budget note: a fresh process pays ~3 min of
    import + tunnel backend init BEFORE the ~15 s kernel compile
    (measured 2026-08-20, when the kernel passed), so the cap must be
    >=240 s or it fails spuriously — round 4's 600 s version ate the
    driver budget instead; this one is skipped entirely when the wall
    budget can't afford it. Captures stderr for the artifact."""
    import subprocess

    global _PALLAS_ERR
    code = (
        "import jax, jax.numpy as jnp\n"
        "from rustrobotics_tpu.mapping import load_g2o\n"
        "from rustrobotics_tpu.mapping.assemble import build_layout,"
        " system_values\n"
        "from rustrobotics_tpu.mapping import solvers\n"
        "import os\n"
        "g = load_g2o(os.environ.get('RUSTROBOTICS_DATASET',"
        " '/root/reference/dataset') + '/g2o/intel.g2o')"
        ".astype(jnp.float32)\n"
        "lay = build_layout(g)\n"
        "vals, b, _ = system_values(g, jnp.float32(0.0))\n"
        "solve = solvers.make_banded_pallas(lay)\n"
        "assert solve is not None\n"
        "x = jax.jit(solve)(vals, b)\n"
        "assert bool(jnp.all(jnp.isfinite(x)))\n"
        "print('ok')\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if r.returncode == 0 and "ok" in r.stdout:
            return True
        _PALLAS_ERR = (r.stderr or "no stderr").strip().splitlines()[-1][:200]
    except Exception as exc:
        _PALLAS_ERR = f"{type(exc).__name__}"[:200]
    return False


def _time_device_path(graph, iters=10, repeats=5):
    """Measure the headline backends, returning whichever is fastest.
    banded-direct (latency-bound chain) and banded-cr (log-depth batched
    CR) bracket the design space and always run; banded-mixed joins
    when the wall budget allows (each backend costs a 20-90 s
    compile)."""
    from rustrobotics_tpu.mapping.pgo import make_optimize_jit

    g32 = graph.astype(jnp.float32)
    backends = ["banded-direct", "banded-cr"]
    if jax.devices()[0].platform == "tpu":
        if _remaining() > 0.55 * BUDGET_S:
            backends.append("banded-mixed")
        # banded-pallas is NOT in the headline race: its subprocess
        # pre-flight costs ~5 min of budget (3 min of that is fresh-
        # process import + tunnel init) that round 4 paid up front and
        # then had nothing left for the suite. It runs as a budget-
        # gated post-suite stage instead (_pallas_stage).
    # block_until_ready does NOT block over the axon tunnel (measured
    # 2026-08-20); completion is forced by fetching one scalar per leaf
    # (utils.devtime.fetch), so each timed call includes one real
    # dispatch+fetch RTT — the same "one sync" convention as always,
    # now actually enforced.
    from rustrobotics_tpu.utils.devtime import fetch

    timed = {}
    outs = {}
    for backend in backends:
        if timed and _remaining() < 0.25 * BUDGET_S:
            print(f"[bench] budget: skipping backend {backend}",
                  file=sys.stderr)
            continue
        try:
            run = make_optimize_jit(
                g32, num_iterations=iters, backend=backend, tolerance=0.0
            )
            out = fetch(run(g32))  # compile + warmup
        except Exception as exc:  # a failing variant must not sink the bench
            print(f"[bench] backend {backend} failed: {exc}"[:300],
                  file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fetch(run(g32))
            best = min(best, time.perf_counter() - t0)
        timed[backend] = best
        outs[backend] = out
    # validity gate: a backend only competes on speed if its chi2 trace is
    # sane — finite, decreasing, and near the best final chi2 across
    # candidates (guards against e.g. a low-precision factor going
    # indefinite on hardware the test suite can't reach)
    finals = {}
    for k, (_, errs, _) in outs.items():
        e = np.asarray(errs)
        # tolerance=0.0 runs every iteration, so the trace has no benign
        # NaN padding: ANY non-finite entry is divergence. Check the raw
        # trace BEFORE selecting the last positive entry (filtering
        # first would hide a mid-run NaN).
        if not np.all(np.isfinite(e)):
            finals[k] = float("inf")
            continue
        ep = e[e > 0] if (e > 0).any() else e
        finals[k] = float(ep[-1])
    if not timed:  # every backend failed compile/warmup: no headline
        raise RuntimeError("all solver backends failed to run")
    best_final = min(finals.values())
    valid = {
        k: v for k, v in timed.items()
        if np.isfinite(finals[k])
        and finals[k] <= 1.5 * best_final + 1e-6
        and finals[k] <= float(np.asarray(outs[k][1])[0])
    }
    if not valid:  # pragma: no cover - all backends degenerate
        valid = timed
    backend = min(valid, key=valid.get)
    _, errors, _ = outs[backend]
    return timed[backend], np.asarray(errors), backend, timed


def _time_host_path(graph, iters=10):
    from rustrobotics_tpu.mapping.pgo import optimize

    t0 = time.perf_counter()
    optimize(graph, num_iterations=iters, backend="host", tolerance=0.0)
    return time.perf_counter() - t0


def _roofline_extra(graph, device_s, iters, backend, timed):
    """Achieved TFLOP/s + MFU of the headline run (roofline.py)."""
    from rustrobotics_tpu.mapping.assemble import build_layout
    from rustrobotics_tpu.ops.band_chol import build_band_chol
    from rustrobotics_tpu.roofline import mfu, pgo_iteration_flops

    bl = build_band_chol(build_layout(graph))
    if bl is None:
        backend = "dense"
    flops = pgo_iteration_flops(graph, backend, bl) * iters
    platform = jax.devices()[0].platform
    u = mfu(flops / device_s, platform)
    return {
        "tflops": round(flops / device_s / 1e12, 3),
        "mfu_vs_f32_peak": round(u, 4) if u is not None else None,
        "solver_backend": backend,
        "backend_ms_per_10it": {
            k: round(v * 1e3, 1) for k, v in timed.items()
        },
    }


def _scaling_start():
    """Launch the weak/strong map-block scaling proxy (virtual 8-device
    CPU mesh; BASELINE.md '>=80% 1->N' target) as a NON-BLOCKING
    subprocess. It is CPU-only, so it overlaps the TPU-bound suite in
    the main process (running it serially at the end is what timed it
    out in the first r5 bench run). Returns the Popen handle."""
    import subprocess

    # The proxy's cost is ~600 s of compiles of IDENTICAL tiny-shape
    # distributed programs — cached persistently (.jax_scaling_cache,
    # gitignored) so only the first run on a machine pays it. Unlike the
    # headline path, the proxy's value is collective overhead, not
    # compile time, so caching does not corrupt the metric.
    code = (
        "import jax, json\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 8)\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '.jax_scaling_cache')\n"
        "jax.config.update("
        "'jax_persistent_cache_min_compile_time_secs', 0.5)\n"
        "from rustrobotics_tpu.benchmarks import bench_block_scaling\n"
        "res = []\n"
        "bench_block_scaling(res, devices=(1, 2, 4, 8), base_poses=1024,"
        " iters=4)\n"
        "print(json.dumps(res))\n"
    )
    try:
        # stderr to a file, NOT a pipe: the CPU backend emits multi-KB
        # warnings per cached-program load; an unread 64 KB pipe would
        # block the child mid-run
        errf = open("/tmp/rustrobotics_bench_scaling.err", "w")
        return subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE,
            stderr=errf, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except Exception:
        return None


def _scaling_collect(proc, timeout_s):
    """Harvest the scaling subprocess. Returns (rows, summary)."""
    import json as _json

    if proc is None:
        return [], {"scaling_error": "failed to launch"}
    try:
        out, _ = proc.communicate(timeout=max(5, timeout_s))
        if proc.returncode != 0:
            try:
                err = open("/tmp/rustrobotics_bench_scaling.err").read()
            except Exception:
                err = ""
            return [], {"scaling_error": (err or "subprocess failed")[-120:]}
        res = _json.loads(out.strip().splitlines()[-1])
    except Exception as exc:  # scaling proxy must never sink the bench
        try:
            proc.kill()
        except Exception:
            pass
        return [], {"scaling_error": str(exc)[:120]}
    summary = {}
    for row in res:
        if row["metric"].endswith("_d8") and "efficiency_pct" in row:
            kind = "weak" if "weak" in row["metric"] else "strong"
            summary[f"{kind}_scaling_eff_pct_8dev_cpu_proxy"] = (
                row["efficiency_pct"])
    return res, summary


def _suite_rows(on_tpu, headline_backend, phase):
    """Per-family suite rows, budget-gated per family and ordered by
    evidentiary priority (banked filters and the fleet batch row first —
    the round-4/5 claims that need driver corroboration). Full rows land
    in BENCH_SUITE.json; only scalar picks go on the headline line.
    ``phase`` 1 = the cheap high-priority families; 2 = the compile-
    heavy tail (the serial scaling proxy runs between the phases: its
    virtual-CPU-mesh timings are crushed by XLA compile threads if run
    concurrently — measured 37% vs ~120% efficiency)."""
    from rustrobotics_tpu import benchmarks as bm

    rows = []
    summary = {}
    backends = (headline_backend,) if on_tpu else ("banded-direct",)
    families1 = [
        # (label, min remaining s to start, callable)
        ("filters", 120, lambda: bm.bench_filter_updates(rows)),
        ("fleet_replay", 90, lambda: bm.bench_fleet_replay(rows)),
        ("pgo_batch", 120, lambda: bm.bench_pgo_batch(rows)),
        ("pgo_batch32", 150, lambda: bm.bench_pgo_batch(rows, batch=32)),
    ]
    families2 = [
        # graph_slam's 4 graphs cost ~360 s of uncached compiles: only
        # start it when it can also FINISH inside the budget
        ("graph_slam", 400,
         lambda: bm.bench_graph_slam(rows, backends=backends)),
        ("fixed_lag", 60, lambda: bm.bench_fixed_lag(rows)),
        ("pf_scale", 60, lambda: bm.bench_pf_scale(rows)),
    ]
    for label, need_s, call in (families1 if phase == 1 else families2):
        if _remaining() < need_s:
            summary.setdefault("suite_skipped", []).append(label)
            continue
        try:
            call()
        except Exception as exc:  # pragma: no cover - defensive
            summary[f"suite_error_{label}"] = str(exc)[:160]
    # scalar picks for the compact line
    for row in rows:
        m = row.get("metric", "")
        if m.endswith("banked_update_throughput"):
            summary[m.replace("_update_throughput", "_Mups")] = row["value"]
        if m.startswith("pgo_batch") and "speedup_vs_sequential" in row:
            b = row.get("batch")
            summary[f"fleet{b}_speedup"] = row["speedup_vs_sequential"]
            summary[f"fleet{b}_graphs_per_sec"] = row["value"]
    return rows, summary


def _pallas_stage(graph, iters=10):
    """Post-suite banded-pallas stage (VERDICT r4 item 5): pre-flight in
    a subprocess (crash containment), then time the fused Mosaic chain
    like a headline backend. Returns a small dict for the compact line."""
    from rustrobotics_tpu.mapping.pgo import make_optimize_jit
    from rustrobotics_tpu.utils.devtime import fetch

    if not _pallas_preflight_ok(min(300, max(240, int(_remaining() - 90)))):
        return {"pallas_preflight": _PALLAS_ERR or "failed"}
    try:
        g32 = graph.astype(jnp.float32)
        run = make_optimize_jit(g32, num_iterations=iters,
                                backend="banded-pallas", tolerance=0.0)
        fetch(run(g32))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(run(g32))
            best = min(best, time.perf_counter() - t0)
        return {"pallas_ms_per_10it": round(best * 1e3, 1)}
    except Exception as exc:
        return {"pallas_error": str(exc)[:120]}


def _revived_tpu_rerun():
    """After a CPU-fallback run, re-probe once: if the tunnel revived,
    re-exec the bench in a fresh process (the platform can't be switched
    after backend init) and forward its JSON line."""
    import subprocess

    if os.environ.get("RUSTROBOTICS_BENCH_NO_RERUN"):
        return None  # we ARE the re-exec: never nest under a flapping tunnel
    if _remaining() < 240 or not _tpu_alive_once():
        return None
    env = dict(os.environ, RUSTROBOTICS_BENCH_SINGLE_PROBE="1",
               RUSTROBOTICS_BENCH_NO_RERUN="1",
               RUSTROBOTICS_BENCH_BUDGET_S=str(int(_remaining() - 30)))
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, timeout=_remaining() - 10,
            env=env,
        )
    except Exception:
        return None
    if r.returncode != 0:
        return None
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    return lines[-1] if lines else None


def _rtt_extra():
    """Host->device dispatch+sync round-trip of a trivial program (ms).

    Context for every latency row in the artifact: over the axon tunnel
    this floor is ~20-30 ms, so single-call numbers measure the tunnel,
    not the device — the throughput rows and the one-jitted-program
    headline are the device-side truth."""
    from rustrobotics_tpu.utils.devtime import scalar_fetch_rtt

    return round(scalar_fetch_rtt(samples=9) * 1e3, 3)


def _emit(name, iters_per_sec, host_s, device_s, extra):
    """The ONE-line driver artifact. Keep it SMALL: the driver's tail
    capture is ~2 KB and cuts from the front — an oversized line is how
    round 3's rc=0 run still parsed to null."""
    line = json.dumps(
        {
            "metric": f"pgo_{name}_gn_iters_per_sec",
            "value": round(iters_per_sec, 3),
            "unit": "iters/s",
            "vs_baseline": round(host_s / device_s, 3),
            "extra": extra,
        }
    )
    if len(line) > 1400:  # hard cap: drop to the essential keys
        keep = ("tflops", "mfu_vs_f32_peak", "solver_backend",
                "iters_per_sec_device_est", "dispatch_rtt_ms",
                "suite_file", "platform_fallback")
        extra = {k: extra[k] for k in keep if k in extra}
        line = json.dumps(
            {
                "metric": f"pgo_{name}_gn_iters_per_sec",
                "value": round(iters_per_sec, 3),
                "unit": "iters/s",
                "vs_baseline": round(host_s / device_s, 3),
                "extra": extra,
            }
        )
    print(line, flush=True)


def main():
    graph, name = _load_graph()
    iters = 10
    device_s, errors, backend, timed = _time_device_path(graph, iters=iters)
    host_s = _time_host_path(graph, iters=iters)
    iters_per_sec = iters / device_s
    extra = _roofline_extra(graph, device_s, iters, backend, timed)
    extra["dispatch_rtt_ms"] = _rtt_extra()
    # Device-side estimate: the wall time of one call includes exactly one
    # host->device sync, whose cost on the axon tunnel flaps between
    # ~30 us and ~25 ms (TPU_STATUS_r04.md). The headline keeps the raw
    # wall convention (comparable across rounds); this row removes the
    # tunnel artifact so the chip's own rate is visible either way.
    dev_s = device_s - extra["dispatch_rtt_ms"] / 1e3
    if 0 < dev_s < device_s:
        extra["iters_per_sec_device_est"] = round(iters / dev_s, 1)
    if not _TPU_OK:
        extra["platform_fallback"] = (
            "tpu tunnel unreachable at bench time; CPU numbers")
    print(
        f"[bench] {name}: device {device_s*1e3:.1f} ms /10 GN iters "
        f"({iters_per_sec:.1f} it/s) on {jax.devices()[0].platform}; "
        f"host-direct pipeline {host_s*1e3:.1f} ms; "
        f"chi2 trace head {errors[:4].tolist()}",
        file=sys.stderr,
    )
    # SAFETY NET: the compact headline line lands NOW. If any optional
    # stage below dies or the driver's timeout hits, this line is still
    # in the tail for the parser.
    _emit(name, iters_per_sec, host_s, device_s, extra)

    if not _TPU_OK:
        revived = _revived_tpu_rerun()
        if revived is not None:
            print("[bench] tpu tunnel revived after CPU fallback; "
                  "reporting the fresh TPU run", file=sys.stderr)
            print(revived, flush=True)
            return

    # ---- optional stages, each budget-gated; bulky rows go to disk ----
    suite_rows, suite_summary = [], {}
    if _remaining() > 90:
        suite_rows, suite_summary = _suite_rows(_TPU_OK, backend, phase=1)
        extra.update(suite_summary)
    scaling_rows = []
    if _remaining() > 300:
        # serial, between the suite phases: concurrent with the
        # compile-heavy families it measures the host's XLA compile
        # threads, not the collectives
        scaling_rows, ssum = _scaling_collect(
            _scaling_start(), timeout_s=min(540, int(_remaining() - 200)))
        extra.update(ssum)
    if _remaining() > 90:
        rows2, summary2 = _suite_rows(_TPU_OK, backend, phase=2)
        suite_rows += rows2
        extra.update(summary2)
    if _TPU_OK and _remaining() > 420:
        extra.update(_pallas_stage(graph))
    if suite_rows or scaling_rows:
        suite_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_SUITE.json")
        with open(suite_path, "w") as fh:
            json.dump({"platform": jax.devices()[0].platform,
                       "suite": suite_rows, "scaling": scaling_rows},
                      fh, indent=1)
        extra["suite_file"] = "BENCH_SUITE.json"
        extra["suite_rows"] = len(suite_rows) + len(scaling_rows)
    extra["budget_spent_s"] = round(_spent(), 1)

    # the enriched final line (the driver parses the LAST JSON line)
    _emit(name, iters_per_sec, host_s, device_s, extra)


if __name__ == "__main__":
    main()
