"""Mixed-precision banded backend (solvers.make_banded_mixed):
bf16-truncated cyclic-reduction factor used as the preconditioner of
full-precision CG on the exact scaled block-tridiagonal operator
(HPL-AI-style iterative refinement), entirely in band space.

Contract: the SOLVE is exact to the CG tolerance — the low-precision
factor only shapes the preconditioned spectrum, never the answer — so
dx must match the f64 sparse-direct host solve (the UMFPACK role,
pose_graph_optimization.rs:124-144) and the full GN must hit the same
golden chi2 as every exact backend.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.mapping import solvers
from rustrobotics_tpu.mapping.assemble import build_layout, system_values
from rustrobotics_tpu.mapping.g2o import load_g2o
from rustrobotics_tpu.mapping.synthetic import synthetic_corridor_graph_2d


pytestmark = pytest.mark.slow  # CR+CG compile costs ~7-10s per test


def test_mixed_matches_host_direct_corridor():
    g = synthetic_corridor_graph_2d(num_poses=96, closure_span=16,
                                    dtype=jnp.float64)
    lay = build_layout(g)
    vals, b, _ = system_values(g, jnp.float64(0.0))
    solve = solvers.make_banded_mixed(lay)
    assert solve is not None
    x = np.asarray(solve(vals, b))
    ref = np.asarray(solvers.solve_host(lay, vals, b))
    assert np.abs(x - ref).max() / (np.abs(ref).max() + 1e-30) < 1e-7


def test_mixed_matches_host_direct(dataset_dir):
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    lay = build_layout(g)
    vals, b, _ = system_values(g, jnp.float64(0.0))
    solve = solvers.make_banded_mixed(lay)
    assert solve is not None
    x = np.asarray(solve(vals, b))
    ref = np.asarray(solvers.solve_host(lay, vals, b))
    assert np.abs(x - ref).max() / np.abs(ref).max() < 1e-7


def test_mixed_backend_golden_chi2(dataset_dir):
    """Full jitted GN with backend="banded-mixed" reaches the reference's
    converged chi2 on simulation-pose-pose (rs:602-607)."""
    from rustrobotics_tpu.mapping.pgo import global_error, make_optimize_jit

    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-pose.g2o")
    run = make_optimize_jit(g, num_iterations=100, backend="banded-mixed",
                            tolerance=1e-4)
    out, errors, it = run(g)
    assert abs(float(global_error(out)) - 8269.0) <= 1.0
