"""Distributed-path tests on the virtual 8-device CPU mesh.

Oracle: the sharded kernels must reproduce single-device numerics — the
distributed GN step equals the host direct solve, the distributed optimize
reaches the reference's converged χ² (SURVEY §6), and the sharded PF matches
the statistics of the single-device PF.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.localization.pf import ParticleFilter, gaussian_estimate
from rustrobotics_tpu.mapping import load_g2o, global_error
from rustrobotics_tpu.mapping.pgo import linearize_and_solve, optimize
from rustrobotics_tpu.models import (
    SimpleProblemMeasurementModel,
    SimpleProblemMotionModel,
)
from rustrobotics_tpu.parallel import (
    distributed_gn_step,
    distributed_global_error,
    distributed_optimize,
    make_mesh,
)
from rustrobotics_tpu.parallel.pf_sharded import make_sharded_pf_step


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8, axis="shard")


def test_distributed_error_matches_local(dataset_dir, mesh8):
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    want = float(global_error(g))
    got = float(distributed_global_error(mesh8, g))
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.slow
def test_distributed_gn_step_matches_direct_solve(dataset_dir, mesh8):
    """Edge-sharded psum-CG dx == host sparse direct dx (same system)."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    dx_direct = np.asarray(linearize_and_solve(g, backend="host"))
    dx_dist, chi2 = distributed_gn_step(mesh8, g, lam=0.0, cg_tol=1e-13)
    np.testing.assert_allclose(float(chi2), float(global_error(g)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(dx_dist), dx_direct, atol=1e-5)


@pytest.mark.slow
def test_distributed_optimize_reaches_reference_chi2(dataset_dir, mesh8):
    """Full distributed GN on intel converges to the reference's golden
    χ² = 360 ± 1 (rs:616-621) — the multi-device accuracy contract."""
    g = load_g2o(dataset_dir / "g2o" / "intel.g2o")
    _, errors, _ = distributed_optimize(
        mesh8, g, num_iterations=50, cg_tol=1e-12
    )
    assert abs(errors[-1] - 360.0) <= 1.0, errors[-1]


@pytest.mark.slow
def test_distributed_matches_single_device_trajectory(dataset_dir, mesh8):
    """Per-iteration χ² trace of distributed GN ≈ host-loop GN."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-pose.g2o")
    res = optimize(g, num_iterations=5, backend="host")
    _, errors, _ = distributed_optimize(mesh8, g, num_iterations=5, cg_tol=1e-13)
    np.testing.assert_allclose(errors[:3], res.errors[:3], rtol=1e-5)


@pytest.mark.slow
def test_sharded_pf_matches_single_device_stats(mesh8):
    pf = ParticleFilter(
        r=jnp.eye(4) * 0.01,
        q=jnp.eye(2) * 0.1,
        motion_model=SimpleProblemMotionModel.create(),
        measurement_model=SimpleProblemMeasurementModel.create(),
        resampling="systematic",
    )
    n = 4096
    key = jax.random.key(0)
    particles = jax.random.normal(key, (n, 4)) * 0.5
    u = jnp.array([1.0, 0.1])
    z = jnp.array([0.12, 0.03])

    step = make_sharded_pf_step(mesh8, pf, n)
    out_sharded = step(jax.random.key(1), particles, u, z, 0.1)
    out_single = pf.step(jax.random.key(1), particles, u, z, 0.1)

    est_sh = gaussian_estimate(out_sharded)
    est_si = gaussian_estimate(out_single)
    np.testing.assert_allclose(
        np.asarray(est_sh.x), np.asarray(est_si.x), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(est_sh.cov), np.asarray(est_si.cov), atol=0.05
    )
    # posterior concentrates near the observation
    np.testing.assert_allclose(np.asarray(est_sh.x[:2]), np.asarray(z), atol=0.15)


@pytest.mark.slow
def test_bounded_exchange_resampling_matches_gather(mesh8):
    """Ring-bounded redistribution == full-gather sharded resampling in
    distribution, with comm rounds << D for balanced weights."""
    from rustrobotics_tpu.parallel.pf_sharded import (
        make_sharded_pf_step_bounded,
    )

    pf = ParticleFilter(
        r=jnp.eye(4) * 0.01,
        q=jnp.eye(2) * 0.1,
        motion_model=SimpleProblemMotionModel.create(),
        measurement_model=SimpleProblemMeasurementModel.create(),
        resampling="systematic",
    )
    n = 4096
    particles = jax.random.normal(jax.random.key(0), (n, 4)) * 0.5
    u = jnp.array([1.0, 0.1])
    z = jnp.array([0.12, 0.03])

    step_b = make_sharded_pf_step_bounded(mesh8, pf, n)
    out_b, rounds = step_b(jax.random.key(1), particles, u, z, 0.1)
    step_g = make_sharded_pf_step(mesh8, pf, n)
    out_g = step_g(jax.random.key(1), particles, u, z, 0.1)

    est_b = gaussian_estimate(out_b)
    est_g = gaussian_estimate(out_g)
    np.testing.assert_allclose(np.asarray(est_b.x), np.asarray(est_g.x),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(est_b.cov),
                               np.asarray(est_g.cov), atol=0.05)
    # balanced weights: the exchange stays bounded (not a hidden gather)
    assert int(rounds) <= 2, int(rounds)


def test_bounded_exchange_resampling_skewed_weights(mesh8):
    """All posterior mass on one shard: more ring hops, still correct —
    every resampled particle must come from the heavy region."""
    from rustrobotics_tpu.parallel.pf_sharded import (
        make_sharded_pf_step_bounded,
    )

    pf = ParticleFilter(
        r=jnp.eye(4) * 1e-6,  # negligible motion noise
        q=jnp.eye(2) * 0.01,
        motion_model=SimpleProblemMotionModel.create(),
        measurement_model=SimpleProblemMeasurementModel.create(),
        resampling="systematic",
    )
    n = 1024
    # shard 7 holds the only particles near the observation
    particles = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray([50.0, 50.0, 0.0, 0.0]),
                         (n - n // 8, 4)),
        jnp.broadcast_to(jnp.asarray([0.1, 0.0, 0.0, 0.0]), (n // 8, 4)),
    ])
    z = jnp.array([0.1, 0.0])
    step_b = make_sharded_pf_step_bounded(mesh8, pf, n)
    out, rounds = step_b(jax.random.key(3), particles,
                         jnp.zeros(2), z, 1e-3)
    out = np.asarray(out)
    assert np.all(np.abs(out[:, 0] - 0.1) < 1.0), out[:, 0].max()
    assert int(rounds) >= 1  # mass lived off-shard for most devices


@pytest.mark.slow
def test_multiprocess_distributed_matches_single_process(tmp_path):
    """True multi-host stand-in (SURVEY §4): two OS processes, each with 4
    CPU devices, form one 8-device mesh via jax.distributed; the
    edge-sharded GN step's collectives cross the process boundary (Gloo).
    Numerics must match the single-process 8-device mesh run."""
    import json
    import os
    import subprocess
    import sys

    import jax.numpy as jnp

    from rustrobotics_tpu.mapping.assemble import apply_update_jit
    from rustrobotics_tpu.mapping.synthetic import synthetic_pose_graph_2d
    from rustrobotics_tpu.parallel.mesh import make_mesh
    from rustrobotics_tpu.parallel.pgo_sharded import (
        make_distributed_step_fns,
        pad_edges_for_sharding,
    )

    # single-process reference on the (conftest) 8-device mesh
    mesh = make_mesh(8, axis="edges")
    graph = synthetic_pose_graph_2d(num_poses=32, num_landmarks=4,
                                    dtype=jnp.float32)
    graph = pad_edges_for_sharding(graph, 8)
    solve, error = make_distributed_step_fns(mesh, graph, cg_tol=1e-10)
    dx, chi2_before = solve(graph, jnp.asarray(0.0, jnp.float32))
    chi2_after = float(error(apply_update_jit(graph, dx)))

    worker = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", "29431"],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    line = next(l for l in outs[0].splitlines() if l.startswith("RESULT "))
    got = json.loads(line[len("RESULT "):])
    assert got["devices"] == 8
    assert abs(got["chi2_before"] - float(chi2_before)) < 1e-2 * (
        1 + float(chi2_before))
    assert abs(got["chi2_after"] - chi2_after) < 1e-2 * (1 + chi2_after)

    # full distributed optimize across the process boundary matches the
    # single-process block path on the same graph
    from rustrobotics_tpu.mapping.synthetic import (
        synthetic_corridor_graph_2d,
    )
    from rustrobotics_tpu.parallel.pgo_blocks import block_optimize

    gb = synthetic_corridor_graph_2d(num_poses=256, num_landmarks=8,
                                     dtype=jnp.float32)
    mesh_b = make_mesh(8, axis="blocks")
    _, errs, _ = block_optimize(mesh_b, gb, num_iterations=8,
                                tolerance=0.0, cg_tol=1e-6)
    assert got["block_iters"] == 8
    assert abs(got["block_chi2_final"] - errs[-1]) < 1e-2 * (1 + errs[-1]), (
        got, errs[-1])

    # 2-D (replica x blocks) cross-host mesh: both replica rows (whose
    # halo ppermutes crossed the Gloo process boundary) must land on the
    # single-process 4-block result
    mesh_b4 = make_mesh(4, axis="blocks")
    _, errs4, _ = block_optimize(mesh_b4, gb, num_iterations=8,
                                 tolerance=0.0, cg_tol=1e-6)
    assert got["block2d_iters"] == [8, 8]
    for final in got["block2d_chi2_final"]:
        assert abs(final - errs4[-1]) < 1e-2 * (1 + errs4[-1]), (
            got, errs4[-1])
