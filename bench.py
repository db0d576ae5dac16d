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

import jax
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


def _time_device_path(graph, iters=10, repeats=5):
    from rustrobotics_tpu.mapping.pgo import make_optimize_jit

    g32 = graph.astype(jnp.float32)
    run = make_optimize_jit(
        g32, num_iterations=iters, backend="banded-direct", tolerance=0.0
    )
    out = run(g32)  # compile + warmup
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(g32)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    _, errors, _ = out
    return best, np.asarray(errors)


def _time_host_path(graph, iters=10):
    from rustrobotics_tpu.mapping.pgo import optimize

    t0 = time.perf_counter()
    optimize(graph, num_iterations=iters, backend="host", tolerance=0.0)
    return time.perf_counter() - t0


def main():
    graph, name = _load_graph()
    iters = 10
    device_s, errors = _time_device_path(graph, iters=iters)
    host_s = _time_host_path(graph, iters=iters)
    iters_per_sec = iters / device_s
    print(
        f"[bench] {name}: device {device_s*1e3:.1f} ms /10 GN iters "
        f"({iters_per_sec:.1f} it/s) on {jax.devices()[0].platform}; "
        f"host-direct pipeline {host_s*1e3:.1f} ms; "
        f"chi2 trace head {errors[:4].tolist()}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"pgo_{name}_gn_iters_per_sec",
                "value": round(iters_per_sec, 3),
                "unit": "iters/s",
                "vs_baseline": round(host_s / device_s, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
