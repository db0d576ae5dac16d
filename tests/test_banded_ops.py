"""Block-banded SpMV tests (the Pallas TPU kernel's structure + the jnp
reference), validated against the dense Hessian."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.mapping import load_g2o
from rustrobotics_tpu.mapping.assemble import (
    build_layout,
    dense_hessian,
    system_values,
)
from rustrobotics_tpu.mapping import solvers
from rustrobotics_tpu.ops.banded import (
    build_banded,
    make_banded_matvec,
)


@pytest.fixture(scope="module")
def system(dataset_dir):
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    layout = build_layout(g)
    vals, b, _ = system_values(g, jnp.asarray(0.0))
    return g, layout, vals, b


def test_banded_matvec_matches_dense(system):
    _, layout, vals, _ = system
    bl = build_banded(layout)
    h = np.asarray(dense_hessian(layout, vals))
    mv = make_banded_matvec(bl, layout, vals, use_pallas=False)
    rng = np.random.default_rng(0)
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=layout.n))
        np.testing.assert_allclose(
            np.asarray(mv(x)), h @ np.asarray(x), rtol=1e-9, atol=1e-9
        )


def test_banded_pallas_kernel_interpret_matches_jnp(system):
    """The Pallas kernel logic (grid accumulation, aligned windows) in
    interpreter mode against the jnp reference."""
    _, layout, vals, _ = system
    bl = build_banded(layout)
    mv_p = make_banded_matvec(bl, layout, vals, use_pallas=True,
                              interpret=True)
    mv_j = make_banded_matvec(bl, layout, vals, use_pallas=False)
    x = jnp.asarray(np.random.default_rng(1).normal(size=layout.n))
    np.testing.assert_allclose(
        np.asarray(mv_p(x)), np.asarray(mv_j(x)), rtol=1e-9, atol=1e-9
    )


def test_banded_cg_matches_direct(system):
    _, layout, vals, b = system
    bl = build_banded(layout)
    dx_direct = np.asarray(solvers.solve_host(layout, vals, b))
    dx_banded = np.asarray(
        solvers.solve_cg_banded(layout, bl, vals, b, tol=1e-12,
                                maxiter=2000, use_pallas=False)
    )
    np.testing.assert_allclose(dx_banded, dx_direct, atol=1e-6)


def test_ell_matvec_matches_dense(system):
    _, layout, vals, _ = system
    h = np.asarray(dense_hessian(layout, vals))
    mv = solvers.make_ell_matvec(layout, vals)
    x = jnp.asarray(np.random.default_rng(2).normal(size=layout.n))
    np.testing.assert_allclose(np.asarray(mv(x)), h @ np.asarray(x),
                               rtol=1e-9, atol=1e-9)


def test_block_jacobi_is_block_inverse(system):
    _, layout, vals, _ = system
    h = np.asarray(dense_hessian(layout, vals))
    precond = solvers.make_block_jacobi(layout, vals)
    # applying M to H's own block-diagonal columns reproduces identity per block
    r = jnp.asarray(np.random.default_rng(3).normal(size=layout.n))
    y = np.asarray(precond(r))
    # block-diag of H
    dof_block = layout.dof_block
    m = np.zeros_like(h)
    for blk in range(layout.n_blocks):
        sel = np.where(dof_block == blk)[0]
        m[np.ix_(sel, sel)] = h[np.ix_(sel, sel)]
    want = np.linalg.solve(m, np.asarray(r))
    np.testing.assert_allclose(y, want, rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_band_chol_scan_path_long_chain():
    """The lax.scan factorization path (nb > UNROLL_MAX_NB) — which no
    bundled graph reaches (intel nb=11, dlr 18, torus ~40) — pinned on a
    12k-pose corridor (nb=141): the fused matmul-only factorize+invert
    chain must solve the normal equations to near-roundoff RESIDUAL.
    (Solution-vector comparison against another solver is meaningless
    here: the long chain plus the 1e7 gauge prior put the condition
    number near 1/eps(f64), so two exact solvers legitimately differ by
    ~1e-4 in the solution while both have ~1e-13 residuals.)"""
    import scipy.sparse as sp

    from rustrobotics_tpu.mapping.assemble import build_layout, system_values
    from rustrobotics_tpu.mapping.synthetic import (
        synthetic_corridor_graph_2d,
    )
    from rustrobotics_tpu.ops import band_chol as bc

    g = synthetic_corridor_graph_2d(num_poses=12000, closure_span=16,
                                    dtype=jnp.float64)
    lay = build_layout(g)
    bl = bc.build_band_chol(lay)
    assert bl.nb > bc.UNROLL_MAX_NB, bl.nb  # really the scan path
    vals, b, _ = system_values(g, jnp.float64(0.0))
    x = np.asarray(bc.solve_band_chol(bl, vals, b))
    h = sp.coo_matrix(
        (np.asarray(vals), (lay.rows, lay.cols)), shape=(lay.n, lay.n)
    ).tocsr()
    res = np.linalg.norm(h @ x - np.asarray(b)) / np.linalg.norm(
        np.asarray(b))
    assert res < 1e-10, res
