"""Headline benchmark (driver contract: prints ONE JSON line).

Mirrors the reference's criterion ``graph_slam_intel`` harness
(benches/graph_slam.rs:6-16): 10 Gauss-Newton iterations on intel.g2o
(1728 poses / 4830 edges / 5184 dof). Here the 10 iterations are ONE jitted
XLA program on the TPU (vmapped linearization + scatter assembly + blocked
Cholesky on the MXU per iteration).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
speedup of the device path over this repo's host pipeline (f64 scipy
SuperLU direct solve per iteration — the same CPU sparse-direct architecture
as the reference's UMFPACK path, measured on this machine).
"""

import json
import os
import sys
import time

def _tpu_alive_probe(timeout_s=120):
    """Probe TPU/backend health in a SUBPROCESS: a dead axon tunnel makes
    jax.devices() hang forever in-process, which would hang the whole
    bench. The probe times out instead. The probe also executes a tiny
    matmul so a tunnel that lists devices but can't dispatch counts as
    dead. Returns "tpu" / "cpu" (deterministic: no TPU plugin) /
    "dead" (timeout or crash — possibly transient)."""
    import subprocess
    import sys as _sys

    code = (
        "import jax, jax.numpy as jnp\n"
        "d = jax.devices()[0]\n"
        "x = jnp.ones((128, 128))\n"
        "jnp.asarray((x @ x).sum()).block_until_ready()\n"
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


def _tpu_alive_once(timeout_s=120):
    return _tpu_alive_probe(timeout_s) == "tpu"


def _tpu_alive(attempts=4, backoffs=(30, 60, 120)):
    """Retry the probe with backoff (~6 min worst case): a transient
    tunnel outage must not silently downgrade the round's headline
    artifact to CPU (that is exactly what happened to BENCH_r02.json)."""
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
        if k < len(backoffs):
            print(f"[bench] tpu probe attempt {k + 1}/{attempts} failed; "
                  f"retrying in {backoffs[k]}s", file=sys.stderr)
            time.sleep(backoffs[k])
    return False


# Probe (with retries) only when executed as the driver's bench entry;
# importing bench as a module (tests, helper reuse of _scaling_extra /
# _suite_extra) gets the CPU path immediately instead of paying up to
# ~6 min of dead-tunnel probe retries at import time.
_TPU_OK = _tpu_alive() if __name__ == "__main__" else False

import jax

if not _TPU_OK:
    # degrade to CPU rather than hanging the driver: the JSON line still
    # lands, marked with the fallback platform
    jax.config.update("jax_platforms", "cpu")

# NOTE: the scaling proxy's virtual 8-device CPU mesh runs in a
# SUBPROCESS (_scaling_extra): setting jax_num_cpu_devices here was
# measured to slow the CPU-fallback headline ~16% (8 virtual devices
# contending for the host's cores during the single-device timing).

import jax.numpy as jnp
import numpy as np


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


_PALLAS_OK = None


def _pallas_ok():
    """Cached subprocess pre-flight of the fused Mosaic kernel: compile
    + run ONE solve out-of-process. Returns False on crash/timeout/NaN
    — a TPU-worker crash (round 2 lost a whole session to one) must
    cost us the pallas variant, not the entire bench artifact."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        _PALLAS_OK = _pallas_preflight_ok()
        if not _PALLAS_OK:
            print("[bench] banded-pallas pre-flight failed; skipping",
                  file=sys.stderr)
    return _PALLAS_OK


def _pallas_preflight_ok(timeout_s=600):
    import subprocess

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
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def _time_device_path(graph, iters=10, repeats=5):
    """Measure the headline backend AND the cyclic-reduction variant,
    returning whichever is faster. The chain factorization is
    latency-bound (sequential 256-wide stages) and CR is
    throughput-bound (log-depth batched stages, ~4x FLOPs): which wins
    depends on the platform, so the headline must pick by measurement —
    especially when this bench runs unattended at round end."""
    from rustrobotics_tpu.mapping.pgo import make_optimize_jit

    g32 = graph.astype(jnp.float32)
    backends = ["banded-direct", "banded-cr"]
    if jax.devices()[0].platform == "tpu":
        # the fused Pallas chain only makes sense compiled (interpret
        # mode on the CPU fallback would take minutes); banded-mixed's
        # bf16 factor only pays off at MXU matmul rates
        backends.append("banded-mixed")
        if _pallas_ok():
            backends.append("banded-pallas")
    timed = {}
    outs = {}
    for backend in backends:
        try:
            run = make_optimize_jit(
                g32, num_iterations=iters, backend=backend, tolerance=0.0
            )
            out = run(g32)  # compile + warmup
            jax.block_until_ready(out)
        except Exception as exc:  # a failing variant must not sink the bench
            print(f"[bench] backend {backend} failed: {exc}"[:300],
                  file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = run(g32)
            jax.block_until_ready(out)
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


def _scaling_extra():
    """Weak/strong map-block scaling efficiency on the virtual 8-device
    CPU mesh (multi-chip proxy; BASELINE.md '>=80% 1->N' target). Runs
    in a SUBPROCESS so the 8 virtual CPU devices never contend with the
    headline measurement in this process."""
    import json as _json
    import subprocess

    code = (
        "import jax, json\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 8)\n"
        "from rustrobotics_tpu.benchmarks import bench_block_scaling\n"
        "res = []\n"
        "bench_block_scaling(res, devices=(1, 2, 4, 8), base_poses=1024,"
        " iters=4)\n"
        "print(json.dumps(res))\n"
    )
    res = []
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=1800, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if r.returncode != 0:
            return {"scaling_error": (r.stderr or "subprocess failed")[-120:]}
        res = _json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as exc:  # scaling proxy must never sink the bench
        return {"scaling_error": str(exc)[:120]}
    out = {"scaling": res}
    for r in res:
        if r["metric"].endswith("_d8") and "efficiency_pct" in r:
            kind = "weak" if "weak" in r["metric"] else "strong"
            out[f"{kind}_scaling_eff_pct_8dev_cpu_proxy"] = (
                r["efficiency_pct"])
        if r["metric"] == "block_pgo_cg_round_d8":
            out["cg_round_overhead_us_8dev_cpu_proxy"] = r.get(
                "collective_overhead_us_vs_d1")
    return out


def _suite_extra(on_tpu):
    """Per-graph graph-slam rows ({iters/s, tflops, mfu, compile_s} for
    intel, dlr, sphere2500, torus3D) + the criterion-analog filter rows
    (benches/kalman_filter.rs:11-60) — the driver-artifact rows VERDICT
    round 2 asked for. Failures are recorded, never fatal."""
    from rustrobotics_tpu.benchmarks import (
        bench_filter_updates,
        bench_fixed_lag,
        bench_graph_slam,
        bench_pf_scale,
        bench_pgo_batch,
    )

    rows = []
    out = {}
    # on the CPU fallback keep only one backend per graph so a
    # degraded run still finishes inside the driver budget; the
    # chain factorization wins on CPU (CR trades ~2.5x FLOPs for
    # log-depth, a TPU-only bargain)
    if on_tpu:
        backends = ("banded-cr", "banded-direct", "banded-mixed")
        if _pallas_ok():
            backends += ("banded-pallas",)
    else:
        backends = ("banded-direct",)
    # one try per family: a failure loses that family's rows, never the
    # rest of the suite
    for label, call in [
        ("graph_slam", lambda: bench_graph_slam(rows, backends=backends)),
        ("pgo_batch", lambda: bench_pgo_batch(rows)),
        ("filters", lambda: bench_filter_updates(rows)),
        ("pf_scale", lambda: bench_pf_scale(rows)),
        ("fixed_lag", lambda: bench_fixed_lag(rows)),
    ]:
        try:
            call()
        except Exception as exc:  # pragma: no cover - defensive
            out[f"suite_error_{label}"] = str(exc)[:160]
    out["suite"] = [
        {k: v for k, v in r.items() if k != "device"} for r in rows
    ]
    return out


def _revived_tpu_rerun():
    """After a CPU-fallback run, re-probe once: if the tunnel revived,
    re-exec the bench in a fresh process (the platform can't be switched
    after backend init) and forward its JSON line."""
    import subprocess

    if os.environ.get("RUSTROBOTICS_BENCH_NO_RERUN"):
        return None  # we ARE the re-exec: never nest under a flapping tunnel
    if not _tpu_alive_once():
        return None
    env = dict(os.environ, RUSTROBOTICS_BENCH_SINGLE_PROBE="1",
               RUSTROBOTICS_BENCH_NO_RERUN="1")
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, timeout=3600, env=env,
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
    this floor is ~20-30 ms, so single-call numbers (e.g.
    ekf_update_latency) measure the tunnel, not the device — the
    throughput rows and the one-jitted-program headline are the
    device-side truth."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(9):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 3)


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
    extra.update(_scaling_extra())
    extra.update(_suite_extra(_TPU_OK))
    print(
        f"[bench] {name}: device {device_s*1e3:.1f} ms /10 GN iters "
        f"({iters_per_sec:.1f} it/s) on {jax.devices()[0].platform}; "
        f"host-direct pipeline {host_s*1e3:.1f} ms; "
        f"chi2 trace head {errors[:4].tolist()}",
        file=sys.stderr,
    )
    if not _TPU_OK:
        revived = _revived_tpu_rerun()
        if revived is not None:
            print("[bench] tpu tunnel revived after CPU fallback; "
                  "reporting the fresh TPU run", file=sys.stderr)
            print(revived)
            return
        extra["platform_fallback"] = (
            "tpu tunnel unreachable at bench time; CPU numbers")
    print(
        json.dumps(
            {
                "metric": f"pgo_{name}_gn_iters_per_sec",
                "value": round(iters_per_sec, 3),
                "unit": "iters/s",
                "vs_baseline": round(host_s / device_s, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
