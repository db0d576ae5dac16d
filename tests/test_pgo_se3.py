"""SE(3) pose-graph optimization — capability beyond the reference.

The reference bundles sphere2500/torus3D/parking-garage but cannot run them
(SE3 edges hit todo!(), pose_graph_optimization.rs:357). These baselines are
ours to establish (BASELINE.md); thresholds pin the converged χ² of the
log-map residual formulation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rustrobotics_tpu.geometry import se3
from rustrobotics_tpu.mapping import load_g2o
from rustrobotics_tpu.mapping.linearize import linearize_qq, residual_qq
from rustrobotics_tpu.mapping.pgo import optimize


@pytest.mark.slow
def test_parking_garage_converges(dataset_dir):
    g = load_g2o(dataset_dir / "g2o" / "parking-garage.g2o")
    res = optimize(g, num_iterations=50, solver="levenberg_marquardt",
                   backend="host")
    assert res.errors[0] > 16000.0
    assert res.errors[-1] < 2.0, res.errors[-1]


@pytest.mark.slow
@pytest.mark.slow
def test_sphere2500_converges(dataset_dir):
    g = load_g2o(dataset_dir / "g2o" / "sphere2500.g2o")
    res = optimize(g, num_iterations=20, solver="levenberg_marquardt",
                   backend="host")
    assert res.errors[-1] < 1500.0, res.errors[-1]


def test_se3_residual_zero_on_consistent_edge():
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(np.concatenate([rng.normal(size=3), [1.0, 0, 0, 0]]))
    delta = jnp.asarray(rng.normal(size=6) * 0.3)
    x2 = se3.retract(x1, delta)
    z = se3.relative(x1, x2)
    e = residual_qq(x1, x2, z)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-12)


@pytest.mark.slow
def test_se3_jacobians_match_finite_differences():
    rng = np.random.default_rng(1)
    q1 = rng.normal(size=4); q1 /= np.linalg.norm(q1)
    q2 = rng.normal(size=4); q2 /= np.linalg.norm(q2)
    x1 = jnp.asarray(np.concatenate([rng.normal(size=3), q1]))
    x2 = jnp.asarray(np.concatenate([rng.normal(size=3), q2]))
    z = se3.relative(x1, x2)  # near-zero residual point
    a, b = linearize_qq(x1, x2, z)
    eps = 1e-6
    for k in range(6):
        d = np.zeros(6); d[k] = eps
        d = jnp.asarray(d)
        fd_a = (residual_qq(se3.retract(x1, d), x2, z)
                - residual_qq(se3.retract(x1, -d), x2, z)) / (2 * eps)
        fd_b = (residual_qq(x1, se3.retract(x2, d), z)
                - residual_qq(x1, se3.retract(x2, -d), z)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(a[:, k]), np.asarray(fd_a), atol=1e-6)
        np.testing.assert_allclose(np.asarray(b[:, k]), np.asarray(fd_b), atol=1e-6)


@pytest.mark.slow
def test_parking_garage_f32_lm_nan_safe(dataset_dir):
    """The f32 normal equations of parking-garage are too ill-conditioned
    for a plain Cholesky (scaled cond ~4e9): early solves produce NaN dx.
    The LM accept test must treat a NaN trial error as a REJECT (and keep
    the pre-step graph) so lambda grows until the damped system becomes
    f32-factorizable; convergence then matches the f64 host anchor."""
    import jax.numpy as jnp

    from rustrobotics_tpu.mapping.pgo import global_error, make_optimize_jit

    g = load_g2o(dataset_dir / "g2o" / "parking-garage.g2o").astype(jnp.float32)
    # 30 iterations: enough for the lambda ramp (~14 rejects) plus real
    # progress; full convergence to the f64 anchor (<2.0 after 100 iters)
    # is exercised on TPU via the verify drive to keep CPU CI time down.
    run = make_optimize_jit(g, num_iterations=30, backend="banded-direct",
                            tolerance=1e-4, solver="lm")
    out, errors, _ = run(g)
    final = float(global_error(out))
    assert np.isfinite(final)
    assert final < float(errors[0]) / 10.0, final


def test_host_lm_rejects_nan_trial(dataset_dir):
    """Host-loop LM: a solver returning NaN must roll back to the pre-step
    graph (not apply -dx, which would poison the poses with NaN)."""
    import jax.numpy as jnp

    from rustrobotics_tpu.mapping import solvers
    from rustrobotics_tpu.mapping.pgo import optimize

    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    calls = {"n": 0}
    orig = solvers.solve_host

    def nan_first(layout, vals, b):
        calls["n"] += 1
        out = orig(layout, vals, b)
        if calls["n"] == 1:
            return np.full_like(np.asarray(out), np.nan)
        return out

    solvers.SOLVERS["host"] = nan_first
    try:
        res = optimize(g, num_iterations=10, solver="lm", backend="host")
    finally:
        solvers.SOLVERS["host"] = orig
    assert np.isfinite(res.errors[-1])
    assert res.errors[-1] < res.errors[0]


@pytest.mark.slow
def test_torus3D_converges(dataset_dir):
    """torus3D (n=30000, 3D) — beyond the reference's todo!(). Plain LM
    from the file init stalls in a 59930 local minimum after 50
    iterations; chordal initialization + LM converges to the global
    optimum 24233 in ~11 iterations. Anchor: 24233 +- 5."""
    from rustrobotics_tpu.mapping.initialization import chordal_init_se3
    from rustrobotics_tpu.mapping.pgo import optimize

    g = load_g2o(dataset_dir / "g2o" / "torus3D.g2o")
    gc = chordal_init_se3(g)
    res = optimize(gc, num_iterations=15, solver="levenberg_marquardt",
                   backend="banded-direct", tolerance=1e-5)
    assert abs(res.errors[-1] - 24233.0) < 5.0, res.errors[-1]


@pytest.mark.slow
def test_chordal_init_se3_rescues_wrecked_sphere(dataset_dir):
    """SE3 chordal initialization (row-decoupled rotation averaging + SVD
    projection + linear translation recovery): from identity-initialized
    sphere2500 poses, init + LM reaches the same optimum as from the file
    initialization (1351)."""
    import jax.numpy as jnp

    from rustrobotics_tpu.mapping.initialization import chordal_init_se3
    from rustrobotics_tpu.mapping.pgo import global_error, optimize

    g = load_g2o(dataset_dir / "g2o" / "sphere2500.g2o")
    n = g.poses3.shape[0]
    g0 = g.replace(poses3=jnp.concatenate(
        [jnp.zeros((n, 3)),
         jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (n, 4))], axis=1))
    gc = chordal_init_se3(g0)
    assert float(global_error(gc)) < 5000.0  # init alone is near-optimal
    res = optimize(gc, num_iterations=30, solver="levenberg_marquardt",
                   backend="banded-direct")
    assert abs(res.errors[-1] - 1351.36) < 5.0, res.errors[-1]
