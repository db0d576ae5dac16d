"""Cyclic-reduction banded factorization (ops/band_chol.cr_factorize):
the log-depth batched-MXU replacement for the sequential block chain.

Parity contract: CR solves the exact same Jacobi-scaled banded system as
``solve_band_chol`` — same layout, same triplets — so its dx must match
the sequential factorization AND the f64 sparse-direct host solve (the
UMFPACK role, pose_graph_optimization.rs:124-144) to roundoff.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.mapping import solvers
from rustrobotics_tpu.mapping.assemble import build_layout, system_values
from rustrobotics_tpu.mapping.g2o import load_g2o
from rustrobotics_tpu.mapping.synthetic import synthetic_corridor_graph_2d
from rustrobotics_tpu.ops.band_chol import (
    build_band_chol,
    solve_band_chol,
    solve_band_cr,
)


def _system(graph):
    lay = build_layout(graph)
    vals, b, _ = system_values(graph, jnp.float64(0.0))
    bl = build_band_chol(lay)
    assert bl is not None
    return lay, bl, vals, b


@pytest.mark.parametrize(
    "num_poses",
    [pytest.param(7, marks=pytest.mark.slow),
     pytest.param(64, marks=pytest.mark.slow),
     pytest.param(523, marks=pytest.mark.slow)])
def test_cr_matches_sequential_banded(num_poses):
    """CR == scan-chain banded Cholesky on corridor graphs spanning
    1 block row (no levels) through many non-power-of-two block rows."""
    g = synthetic_corridor_graph_2d(num_poses=num_poses, closure_span=16,
                                    dtype=jnp.float64)
    _, bl, vals, b = _system(g)
    x_cr = np.asarray(solve_band_cr(bl, vals, b))
    x_seq = np.asarray(solve_band_chol(bl, vals, b))
    scale = np.abs(x_seq).max() + 1e-30
    assert np.abs(x_cr - x_seq).max() / scale < 1e-9, num_poses


@pytest.mark.slow
def test_cr_matches_host_direct(dataset_dir):
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    lay, bl, vals, b = _system(g)
    x = np.asarray(solve_band_cr(bl, vals, b))
    ref = np.asarray(solvers.solve_host(lay, vals, b))
    assert np.abs(x - ref).max() / np.abs(ref).max() < 1e-8


@pytest.mark.slow
def test_cr_matches_host_direct_intel(dataset_dir):
    g = load_g2o(dataset_dir / "g2o" / "intel.g2o")
    lay, bl, vals, b = _system(g)
    x = np.asarray(solve_band_cr(bl, vals, b))
    ref = np.asarray(solvers.solve_host(lay, vals, b))
    assert np.abs(x - ref).max() / np.abs(ref).max() < 1e-8


def test_cr_backend_golden_chi2(dataset_dir):
    """Full jitted GN with backend="banded-cr" reaches the reference's
    converged chi2 on simulation-pose-pose (rs:602-607)."""
    from rustrobotics_tpu.mapping.pgo import global_error, make_optimize_jit

    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-pose.g2o")
    run = make_optimize_jit(g, num_iterations=100, backend="banded-cr",
                            tolerance=1e-4)
    out, errors, it = run(g)
    assert abs(float(global_error(out)) - 8269.0) <= 1.0


@pytest.mark.parametrize(
    "nb",
    [1, 2, 3, 5] + [pytest.param(v, marks=pytest.mark.slow)
                    for v in (4, 6, 7, 9, 11, 13)])
def test_cr_every_chain_length(nb):
    """Native-length CR (no power-of-two padding): exact solve for every
    small block-chain length, odd and even, against numpy. Covers the
    m -> ceil(m/2) level bookkeeping's edge cases directly."""
    from rustrobotics_tpu.ops.band_chol import (
        cr_factorize,
        cr_invert,
        cr_substitute,
        cr_substitute_inv,
    )

    kb = 8
    rng = np.random.default_rng(nb)
    n = nb * kb
    # SPD block-tridiagonal matrix
    m = rng.standard_normal((n, n))
    a = m @ m.T + n * np.eye(n)
    for i in range(nb):
        for j in range(nb):
            if abs(i - j) > 1:
                a[i * kb:(i + 1) * kb, j * kb:(j + 1) * kb] = 0.0
    # pack block rows (kb, 2kb): [subdiagonal | diagonal(lower only)]
    r = np.zeros((nb, kb, 2 * kb))
    for j in range(nb):
        if j > 0:
            r[j, :, :kb] = a[j * kb:(j + 1) * kb, (j - 1) * kb:j * kb]
        r[j, :, kb:] = np.tril(a[j * kb:(j + 1) * kb, j * kb:(j + 1) * kb])
    b = rng.standard_normal(n)
    x_ref = np.linalg.solve(a, b)

    levels, f_root = cr_factorize(jnp.asarray(r))
    x = np.asarray(cr_substitute(levels, f_root,
                                 jnp.asarray(b.reshape(nb, kb)))).reshape(-1)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)

    inv_levels, root_inv = cr_invert(levels, f_root)
    x2 = np.asarray(cr_substitute_inv(
        inv_levels, root_inv, jnp.asarray(b.reshape(nb, kb)))).reshape(-1)
    np.testing.assert_allclose(x2, x_ref, rtol=1e-8, atol=1e-10)


@pytest.mark.slow  # ~5 s: bitwise parity of the alternate scatter plan
def test_band_scatter_modes_identical():
    """Every band-assembly plan (sorted segment-sum + unique-set, and the
    node-block row-strip pipeline) must produce the exact block-row
    buffer of the plain scatter-add (the flippable BAND_SCATTER_MODE
    TPU optimization)."""
    from rustrobotics_tpu.ops import band_chol as bc

    g = synthetic_corridor_graph_2d(num_poses=96, closure_span=16,
                                    dtype=jnp.float64)
    _, bl, vals, b = _system(g)
    old = bc.BAND_SCATTER_MODE
    try:
        bc.BAND_SCATTER_MODE = "add"
        r_add, d_add = bc._prepare_blocks(bl, vals)
        for mode in ("sorted", "strips"):
            bc.BAND_SCATTER_MODE = mode
            r_m, d_m = bc._prepare_blocks(bl, vals)
            np.testing.assert_array_equal(np.asarray(r_m), np.asarray(r_add))
            np.testing.assert_array_equal(np.asarray(d_m), np.asarray(d_add))
    finally:
        bc.BAND_SCATTER_MODE = old
