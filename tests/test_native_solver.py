"""Native C++ LDL^T solver tests (the UMFPACK-role tier,
pose_graph_optimization.rs:124-144)."""

import numpy as np
import pytest

from rustrobotics_tpu.ops import native_available, solve_coo_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_native_random_spd():
    rng = np.random.default_rng(0)
    n = 200
    # random sparse SPD: A = M^T M + n*I from a sparse M
    m = rng.normal(size=(n, n)) * (rng.random((n, n)) < 0.05)
    a = m.T @ m + n * np.eye(n)
    rows, cols = np.nonzero(a)
    vals = a[rows, cols]
    b = rng.normal(size=n)
    x = solve_coo_native(n, rows.astype(np.int32), cols.astype(np.int32),
                         vals, b)
    np.testing.assert_allclose(a @ x, b, atol=1e-8)


def test_native_sums_duplicate_triplets():
    """Duplicate COO entries must accumulate (put() semantics,
    rs:194-212). Input contract: the FULL symmetric pattern (both
    triangles), as the PGO assembly emits."""
    n = 2
    rows = np.asarray([0, 0, 1, 0, 1], np.int32)
    cols = np.asarray([0, 0, 1, 1, 0], np.int32)
    vals = np.asarray([1.0, 1.0, 3.0, 0.5, 0.5])
    b = np.asarray([1.0, 2.0])
    x = solve_coo_native(n, rows, cols, vals, b)
    a = np.asarray([[2.0, 0.5], [0.5, 3.0]])
    np.testing.assert_allclose(a @ x, b, atol=1e-12)


@pytest.mark.slow
def test_native_matches_scipy_on_pgo_system(dataset_dir):
    from rustrobotics_tpu.mapping import load_g2o
    from rustrobotics_tpu.mapping.pgo import linearize_and_solve

    g = load_g2o(dataset_dir / "g2o" / "intel.g2o")
    dx_native = np.asarray(linearize_and_solve(g, backend="native"))
    dx_scipy = np.asarray(linearize_and_solve(g, backend="host"))
    np.testing.assert_allclose(dx_native, dx_scipy, atol=1e-8)


def test_native_backend_reaches_golden_chi2(dataset_dir):
    from rustrobotics_tpu.mapping import load_g2o
    from rustrobotics_tpu.mapping.pgo import optimize

    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    res = optimize(g, num_iterations=100, backend="native")
    assert abs(res.errors[-1] - 474.0) <= 1.0


def test_native_rejects_singular():
    n = 2
    rows = np.asarray([0], np.int32)
    cols = np.asarray([0], np.int32)
    vals = np.asarray([1.0])
    b = np.zeros(2)
    with pytest.raises(RuntimeError):
        solve_coo_native(n, rows, cols, vals, b)  # row/col 1 empty
