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


def test_cr_invert_substitution_parity():
    """cr_substitute_inv on precomputed inverse factors must reproduce
    the trsm-based cr_substitute (same factor, GEMM-only apply)."""
    from rustrobotics_tpu.ops.band_chol import (
        _prepare_blocks,
        build_band_chol,
        cr_factorize,
        cr_invert,
        cr_substitute,
        cr_substitute_inv,
    )

    g = synthetic_corridor_graph_2d(num_poses=96, closure_span=16,
                                    dtype=jnp.float64)
    lay = build_layout(g)
    vals, b, _ = system_values(g, jnp.float64(0.0))
    bl = build_band_chol(lay)
    r_blocks, dinv_p = _prepare_blocks(bl, vals)
    levels, f_root = cr_factorize(r_blocks)
    inv_levels, root_inv = cr_invert(levels, f_root)
    npad = bl.nb * bl.kb
    bp = (jnp.concatenate([b[jnp.asarray(bl.perm)],
                           jnp.zeros(npad - bl.n, b.dtype)])
          * dinv_p).reshape(bl.nb, bl.kb)
    x_trsm = np.asarray(cr_substitute(levels, f_root, bp))
    x_gemm = np.asarray(cr_substitute_inv(inv_levels, root_inv, bp))
    np.testing.assert_allclose(x_gemm, x_trsm, rtol=1e-9, atol=1e-12)


def test_mixed_bf16_mode_matches_host_direct():
    """The lp="bf16" variant (truncated storage + 2^-8 lift) must still
    solve EXACTLY to the CG tolerance — only its round count differs."""
    g = synthetic_corridor_graph_2d(num_poses=96, closure_span=16,
                                    dtype=jnp.float64)
    lay = build_layout(g)
    vals, b, _ = system_values(g, jnp.float64(0.0))
    solve = solvers.make_banded_mixed(lay, lp="bf16")
    x = np.asarray(solve(vals, b))
    ref = np.asarray(solvers.solve_host(lay, vals, b))
    assert np.abs(x - ref).max() / (np.abs(ref).max() + 1e-30) < 1e-7


def test_mixed_backend_golden_chi2(dataset_dir):
    """Full jitted GN with backend="banded-mixed" reaches the reference's
    converged chi2 on simulation-pose-pose (rs:602-607)."""
    from rustrobotics_tpu.mapping.pgo import global_error, make_optimize_jit

    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-pose.g2o")
    run = make_optimize_jit(g, num_iterations=100, backend="banded-mixed",
                            tolerance=1e-4)
    out, errors, it = run(g)
    assert abs(float(global_error(out)) - 8269.0) <= 1.0


def test_mixed_tpu_lowering(dataset_dir):
    """The full jitted GN program with backend="banded-mixed" (bf16
    truncation, HIGH-precision batched CR, cr_invert GEMM substitution,
    CG) must LOWER for TPU — jax.export exercises the XLA TPU pipeline
    without a chip, so lowering regressions are caught before bench
    time."""
    import jax

    from rustrobotics_tpu.mapping.pgo import make_optimize_jit

    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-pose.g2o")
    g32 = g.astype(jnp.float32)
    with jax.enable_x64(False):
        for backend in ("banded-mixed", "banded-cr"):
            run = make_optimize_jit(g32, num_iterations=3, backend=backend,
                                    tolerance=0.0)
            jax.export.export(run, platforms=["tpu"])(g32)
