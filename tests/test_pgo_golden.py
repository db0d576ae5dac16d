"""Pose-graph optimization oracle tests.

Every number here is a deterministic golden value from the reference's
test-suite (SURVEY.md §6): initial/final χ² for the four bundled 2D graphs
(pose_graph_optimization.rs:580-631), per-edge Jacobians (rs:633-722), and
the one-GN-step dx (rs:724-739). These are RNG-free cross-implementation
anchors — the de-facto ATE contract.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.mapping import load_g2o, global_error
from rustrobotics_tpu.mapping.g2o import load_g2o_with_meta
from rustrobotics_tpu.mapping.linearize import (
    linearize_pl,
    linearize_pp,
    residual_pl,
    residual_pp,
)
from rustrobotics_tpu.mapping.pgo import (
    linearize_and_solve,
    make_optimize_jit,
    optimize,
)


INITIAL = [
    ("simulation-pose-pose.g2o", 138862234.0, 10.0),
    ("simulation-pose-landmark.g2o", 3030.0, 1.0),
    ("intel.g2o", 1795139.0, 1e-2),
    ("dlr.g2o", 369655336.0, 10.0),
]

FINAL = [
    ("simulation-pose-pose.g2o", 8269.0, 1.0),
    ("simulation-pose-landmark.g2o", 474.0, 1.0),
    ("intel.g2o", 360.0, 1.0),
    # dlr is the slowest golden; the anchor stays in the full suite
    pytest.param("dlr.g2o", 56860.0, 1.0, marks=pytest.mark.slow),
]


@pytest.mark.parametrize("name,want,eps", INITIAL)
def test_initial_global_error(dataset_dir, name, want, eps):
    g = load_g2o(dataset_dir / "g2o" / name)
    assert abs(float(global_error(g)) - want) <= eps + 10.0  # reference ε
    # (the +10 slack only matters for the two huge-χ² graphs where the
    # reference itself rounds to integers; intel matches to 1e-2)
    if eps <= 1e-2:
        assert abs(float(global_error(g)) - want) <= eps


@pytest.mark.parametrize("name,want,eps", FINAL)
def test_final_global_error_gauss_newton(dataset_dir, name, want, eps):
    """End-to-end regression: GN to convergence reproduces the reference's
    converged χ² (rs:600-631) — the accuracy contract."""
    g = load_g2o(dataset_dir / "g2o" / name)
    res = optimize(g, num_iterations=100, solver="gauss_newton", backend="host")
    assert abs(res.errors[-1] - want) <= eps, res.errors[-1]


def test_linearize_pose_pose_golden(dataset_dir):
    """A/B/e for edges 0 and 10 of simulation-pose-landmark (rs:633-690)."""
    g, meta = load_g2o_with_meta(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")

    def pp_edge(file_idx):
        row = int(np.where(meta.pp_file_index == file_idx)[0][0])
        x1 = g.poses2[g.pp_from[row]]
        x2 = g.poses2[g.pp_to[row]]
        z = g.pp_z[row]
        return x1, x2, z

    x1, x2, z = pp_edge(0)
    a, b = linearize_pp(x1, x2, z)
    e = residual_pp(x1, x2, z)
    np.testing.assert_allclose(
        np.asarray(a),
        [[0.0, 1.0, 0.113], [-1.0, 0.0, 0.024], [0.0, 0.0, -1.0]],
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(b),
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
        atol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-3)

    x1, x2, z = pp_edge(10)
    a, b = linearize_pp(x1, x2, z)
    e = residual_pp(x1, x2, z)
    np.testing.assert_allclose(
        np.asarray(a),
        [[0.037, 0.999, 0.138], [-0.999, 0.037, -0.982], [0.0, 0.0, -1.0]],
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(b),
        [[-0.037, -0.999, 0.0], [0.999, -0.037, 0.0], [0.0, 0.0, 1.0]],
        atol=1e-3,
    )
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-3)


def test_linearize_pose_landmark_golden(dataset_dir):
    """A/B/e for (file-order) edge 1 of simulation-pose-landmark
    (rs:692-722)."""
    g, meta = load_g2o_with_meta(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    row = int(np.where(meta.pl_file_index == 1)[0][0])
    x = g.poses2[g.pl_pose[row]]
    lm = g.landmarks2[g.pl_lm[row]]
    z = g.pl_z[row]
    a, b = linearize_pl(x, lm)
    e = residual_pl(x, lm, z)
    np.testing.assert_allclose(
        np.asarray(a), [[0.0, 1.0, 0.358], [-1.0, 0.0, -0.051]], atol=1e-3
    )
    np.testing.assert_allclose(np.asarray(b), [[0.0, -1.0], [1.0, 0.0]], atol=1e-3)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-3)


def test_linearize_and_solve_golden(dataset_dir):
    """First 5 dx entries of one GN step (rs:724-739), through assembly +
    the host sparse direct solver (the UMFPACK-path oracle)."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    dx = np.asarray(linearize_and_solve(g, backend="host"))
    want = [0.16851890, 0.57431108, -0.05088051, -0.03674821, 0.88945808]
    np.testing.assert_allclose(dx[:5], want, atol=1e-3)


@pytest.mark.slow
def test_solver_backends_agree(dataset_dir):
    """dense Cholesky (device), CG (device), and host direct solves of the
    same system agree."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    dx_host = np.asarray(linearize_and_solve(g, backend="host"))
    dx_dense = np.asarray(linearize_and_solve(g, backend="dense"))
    dx_cg = np.asarray(linearize_and_solve(g, backend="cg"))
    dx_schur = np.asarray(linearize_and_solve(g, backend="schur"))
    np.testing.assert_allclose(dx_dense, dx_host, atol=1e-6)
    np.testing.assert_allclose(dx_cg, dx_host, atol=1e-4)
    np.testing.assert_allclose(dx_schur, dx_host, atol=1e-8)


def test_levenberg_marquardt_converges(dataset_dir):
    """LM (λ accept/reject, rs:275-282) reaches the same basin as GN on
    intel. The reference pins no LM numbers; we require χ² close to the GN
    optimum."""
    g = load_g2o(dataset_dir / "g2o" / "intel.g2o")
    res = optimize(g, num_iterations=100, solver="levenberg_marquardt",
                   backend="host")
    assert res.errors[-1] < 400.0, res.errors[-1]


@pytest.mark.slow
def test_fully_jitted_optimizer_matches_host(dataset_dir):
    """The lax.while_loop production path (dense Cholesky on device)
    reproduces the host-loop result."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    run = make_optimize_jit(g, num_iterations=100, backend="dense")
    _, errors, it = run(g)
    errors = np.asarray(errors)
    final = errors[int(it)]
    assert abs(final - 474.0) <= 1.0, final


def test_optimize_improves_and_converges(dataset_dir):
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-pose.g2o")
    res = optimize(g, num_iterations=100, backend="host")
    assert res.errors[-1] < res.errors[0] * 1e-4
    assert res.norms[-1] < 1e-4  # hit the convergence criterion (rs:298)


@pytest.mark.slow
def test_schur_backend_reaches_golden_chi2(dataset_dir):
    """Schur-complement landmark elimination (solvers.solve_schur) drives
    GN to the reference's converged chi2 on the landmark graph."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    res = optimize(g, num_iterations=100, backend="schur")
    assert abs(res.errors[-1] - 474.0) <= 1.0, res.errors[-1]


@pytest.mark.slow
def test_banded_direct_matches_host_direct(dataset_dir):
    """ops/band_chol: RCM block-row banded Cholesky reproduces the f64
    sparse-direct dx on real graphs (role of UMFPACK, rs:124-144)."""
    import jax.numpy as jnp

    from rustrobotics_tpu.mapping import solvers
    from rustrobotics_tpu.mapping.assemble import build_layout, system_values
    from rustrobotics_tpu.ops.band_chol import build_band_chol, solve_band_chol

    for name in ["simulation-pose-landmark", "intel"]:
        g = load_g2o(dataset_dir / "g2o" / f"{name}.g2o")
        lay = build_layout(g)
        vals, b, _ = system_values(g, jnp.float64(0.0))
        bl = build_band_chol(lay)
        assert bl is not None
        x = np.asarray(solve_band_chol(bl, vals, b))
        ref = np.asarray(solvers.solve_host(lay, vals, b))
        assert np.abs(x - ref).max() / np.abs(ref).max() < 1e-8, name


def test_banded_direct_golden_chi2(dataset_dir):
    """Full jitted GN with the banded-direct backend reaches the
    reference's converged chi2 on intel (rs:616-621)."""
    import jax.numpy as jnp

    from rustrobotics_tpu.mapping.pgo import global_error, make_optimize_jit

    g = load_g2o(dataset_dir / "g2o" / "intel.g2o")
    run = make_optimize_jit(g, num_iterations=100, backend="banded-direct",
                            tolerance=1e-4)
    out, errors, it = run(g)
    assert abs(float(global_error(out)) - 360.0) <= 1.0


@pytest.mark.slow
def test_m3500_converges(dataset_dir):
    """input_M3500_g2o is bundled but untested by the reference; our
    anchor (f64 banded-direct GN): 2566668 -> 137.91 in 7 iterations."""
    from rustrobotics_tpu.mapping.pgo import optimize

    g = load_g2o(dataset_dir / "g2o" / "input_M3500_g2o.g2o")
    res = optimize(g, num_iterations=10, backend="banded-direct")
    assert res.errors[0] > 2.5e6
    assert res.errors[-1] < 138.5, res.errors[-1]


@pytest.mark.slow
def test_vmapped_batch_optimization():
    """Batched PGO: the jitted optimizer is a pure function of the graph
    pytree, so jax.vmap optimizes a BATCH of same-topology graphs (e.g.
    Monte-Carlo noise studies) in one program — no reference counterpart.
    Each lane must match its own single-graph optimization."""
    import jax
    import jax.numpy as jnp

    from rustrobotics_tpu.mapping.pgo import make_optimize_jit
    from rustrobotics_tpu.mapping.synthetic import synthetic_pose_graph_2d

    graph = synthetic_pose_graph_2d(num_poses=48, num_landmarks=6,
                                    dtype=jnp.float32)

    def perturb(k):
        k1, k2 = jax.random.split(k)
        return graph.replace(
            pp_z=graph.pp_z + jax.random.normal(
                k1, graph.pp_z.shape, jnp.float32) * 0.01,
            pl_z=graph.pl_z + jax.random.normal(
                k2, graph.pl_z.shape, jnp.float32) * 0.01,
        )

    graphs = jax.vmap(perturb)(jax.random.split(jax.random.key(0), 4))
    run = make_optimize_jit(graph, num_iterations=8, backend="dense",
                            tolerance=0.0)
    _, batch_errors, _ = jax.vmap(run)(graphs)
    for i in range(4):
        g_i = jax.tree.map(lambda a: a[i], graphs)
        _, errors_i, _ = run(g_i)
        np.testing.assert_allclose(
            np.asarray(batch_errors[i]), np.asarray(errors_i), rtol=1e-4
        )
    assert (np.asarray(batch_errors[:, -1])
            < np.asarray(batch_errors[:, 0])).all()


@pytest.mark.slow
def test_marginal_variances(dataset_dir):
    """Selected inversion of the banded factorization reproduces
    diag(H^-1), and uncertainty grows along the chain away from the
    gauge-anchored first pose."""
    import jax.numpy as jnp

    from rustrobotics_tpu.mapping.pgo import marginal_variances, optimize

    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    res = optimize(g, num_iterations=10, backend="banded-direct")
    var = np.asarray(marginal_variances(res.graph))
    assert var.shape == (res.graph.total_dof,)
    assert (var > 0).all()

    # parity with the dense inverse
    import scipy.sparse as sp

    from rustrobotics_tpu.mapping.assemble import build_layout, system_values

    lay = build_layout(res.graph)
    vals, _, _ = system_values(res.graph, jnp.float64(0.0))
    h = sp.coo_matrix(
        (np.asarray(vals), (lay.rows, lay.cols)), shape=(lay.n, lay.n)
    ).toarray()
    ref = np.diag(np.linalg.inv(h))
    assert np.abs(var - ref).max() / np.abs(ref).max() < 1e-8
    # the gauge-anchored pose (prior2's dof block) is the most certain
    off = int(np.asarray(res.graph.pose2_offsets)[res.graph.prior2])
    assert var[off:off + 3].max() < np.median(var)


@pytest.mark.slow
def test_chordal_initialization_rescues_bad_init(dataset_dir):
    """Zeroed poses trap GN in a local minimum (chi2 stalls at ~15k on
    intel); chordal rotation averaging + linear translation recovery
    restart it to the global optimum. No reference counterpart."""
    import jax.numpy as jnp

    from rustrobotics_tpu.mapping.initialization import chordal_init_se2
    from rustrobotics_tpu.mapping.pgo import global_error, optimize

    g = load_g2o(dataset_dir / "g2o" / "intel.g2o")
    g0 = g.replace(poses2=jnp.zeros_like(g.poses2))
    stuck = optimize(g0, num_iterations=30, backend="banded-direct")
    assert stuck.errors[-1] > 5000.0  # local minimum without init

    gc = chordal_init_se2(g0)
    assert float(global_error(gc)) < 1000.0  # init alone is near-optimal
    res = optimize(gc, num_iterations=30, backend="banded-direct")
    assert abs(res.errors[-1] - 360.0) <= 1.0, res.errors[-1]


@pytest.mark.slow
def test_robust_kernel_rejects_outlier_closures(dataset_dir):
    """30 gross outlier loop closures (high-information random edges)
    destroy plain LM on intel (inlier chi2 explodes past 1e7); Cauchy
    IRLS reweighting recovers the clean-graph optimum within ~2. The
    reference has no robust kernels at all."""
    import jax.numpy as jnp

    from rustrobotics_tpu.mapping.pgo import global_error, optimize

    g = load_g2o(dataset_dir / "g2o" / "intel.g2o")
    rng = np.random.default_rng(0)
    n_out = 30
    frm = rng.integers(0, g.poses2.shape[0], n_out)
    to = rng.integers(0, g.poses2.shape[0], n_out)
    z_out = np.stack([rng.uniform(-20, 20, n_out),
                      rng.uniform(-20, 20, n_out),
                      rng.uniform(-3, 3, n_out)], -1)
    om_out = np.broadcast_to(np.diag([100.0] * 3), (n_out, 3, 3))
    gb = g.replace(
        pp_from=jnp.concatenate([g.pp_from, jnp.asarray(frm, jnp.int32)]),
        pp_to=jnp.concatenate([g.pp_to, jnp.asarray(to, jnp.int32)]),
        pp_z=jnp.concatenate([g.pp_z, jnp.asarray(z_out, g.pp_z.dtype)]),
        pp_omega=jnp.concatenate(
            [g.pp_omega, jnp.asarray(om_out, g.pp_omega.dtype)]),
    )

    def inlier_chi2(res):
        return float(global_error(g.replace(poses2=res.graph.poses2)))

    plain = optimize(gb, num_iterations=30, solver="lm",
                     backend="banded-direct")
    robust = optimize(gb, num_iterations=40, solver="lm",
                      backend="banded-direct", robust="cauchy",
                      robust_delta=1.0)
    assert inlier_chi2(plain) > 1e6  # destroyed without robustness
    assert abs(inlier_chi2(robust) - 360.0) < 10.0, inlier_chi2(robust)


@pytest.mark.slow
def test_pose_covariance_blocks(dataset_dir):
    """Per-pose 3x3 marginal covariance blocks from the banded selected
    inverse match the dense H^-1 blocks."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from rustrobotics_tpu.mapping.assemble import build_layout, system_values
    from rustrobotics_tpu.mapping.pgo import optimize, pose_covariances

    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    res = optimize(g, num_iterations=10, backend="banded-direct")
    blocks = np.asarray(pose_covariances(res.graph))
    lay = build_layout(res.graph)
    vals, _, _ = system_values(res.graph, jnp.float64(0.0))
    h = sp.coo_matrix(
        (np.asarray(vals), (lay.rows, lay.cols)), shape=(lay.n, lay.n)
    ).toarray()
    c_ref = np.linalg.inv(h)
    offs = np.asarray(res.graph.pose2_offsets)
    for i in [0, 10, len(offs) - 1]:
        o = offs[i]
        ref = c_ref[o:o + 3, o:o + 3]
        assert np.abs(blocks[i] - ref).max() / np.abs(ref).max() < 1e-8
    # symmetric PSD
    assert np.allclose(blocks, np.swapaxes(blocks, -1, -2), atol=1e-12)
    assert (np.linalg.eigvalsh(blocks) > -1e-12).all()
