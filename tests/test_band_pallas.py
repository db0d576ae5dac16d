"""Parity tests for the fused Pallas banded-Cholesky solver
(ops/band_chol_pallas) against the XLA scan chain (ops/band_chol) and
the f64 host direct solve — the same numerical contract the reference
pins through UMFPACK (pose_graph_optimization.rs:124-144).

Pallas runs in interpreter mode here (CPU test mesh); the compiled
Mosaic path shares the exact same kernel trace.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.mapping import load_g2o
from rustrobotics_tpu.mapping.assemble import build_layout, system_values
from rustrobotics_tpu.ops.band_chol import (
    _factorize,
    _prepare_blocks,
    build_band_chol,
    build_band_chol as _bbc,  # noqa: F401 (re-export guard)
)
from rustrobotics_tpu.ops.band_chol_pallas import (
    factorize_pallas,
    pallas_band_supported,
    solve_band_pallas,
    substitute_pallas,
)


@pytest.fixture(scope="module")
def sim_pp(dataset_dir):
    g = load_g2o(str(dataset_dir / "g2o" / "simulation-pose-pose.g2o"))
    layout = build_layout(g)
    bl = build_band_chol(layout)
    vals, b, _ = system_values(g, jnp.asarray(0.0, jnp.float64))
    return g, layout, bl, vals, b


def test_supported_gate():
    class FakeBl:
        kb = 640
        nb = 4

    assert not pallas_band_supported(FakeBl())
    assert not pallas_band_supported(None)


@pytest.mark.slow
def test_factor_matches_chain(sim_pp):
    """ldinv must be the exact inverse of the chain's Cholesky factors,
    and the coupling panels must agree block-for-block."""
    _, _, bl, vals, _ = sim_pp
    assert pallas_band_supported(bl)
    r_blocks, _ = _prepare_blocks(bl, vals.astype(jnp.float32))
    lds, lps = _factorize(r_blocks)
    ldinv, lp = factorize_pallas(r_blocks, interpret=True)
    assert ldinv.shape == (bl.nb, bl.kb, bl.kb)
    eye = jnp.eye(bl.kb)
    for j in range(bl.nb):
        prod = ldinv[j] @ lds[j].astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(prod), np.asarray(eye),
                                   atol=5e-3)
    np.testing.assert_allclose(np.asarray(lp[0]), 0.0)
    np.testing.assert_allclose(
        np.asarray(lp[1:]), np.asarray(lps, np.float32), atol=5e-3
    )


@pytest.mark.slow
def test_solve_matches_host_direct(sim_pp):
    """Full solve contract vs the f64 sparse direct solve — accuracy in
    the same class as the f32 XLA chain on this gauge-prior-conditioned
    system (both sit at ~3e-3 relative; the tolerance bounds the Pallas
    path at 4x that)."""
    from rustrobotics_tpu.mapping.solvers import solve_host
    from rustrobotics_tpu.ops.band_chol import solve_band_chol

    _, layout, bl, vals, b = sim_pp
    x_true = np.asarray(solve_host(layout, vals, b))
    scale = np.max(np.abs(x_true))
    x_chain = np.asarray(
        solve_band_chol(bl, vals.astype(jnp.float32), b.astype(jnp.float32))
    )
    x_pal = np.asarray(solve_band_pallas(bl, vals, b, interpret=True))
    rel_chain = np.max(np.abs(x_chain - x_true)) / scale
    rel_pal = np.max(np.abs(x_pal - x_true)) / scale
    assert rel_pal < max(4.0 * rel_chain, 1e-4)


def test_substitute_identity_factor():
    """With ldinv = I and lp = 0 the two sweeps are the identity."""
    nb, kb = 3, 256
    ldinv = jnp.broadcast_to(jnp.eye(kb, dtype=jnp.float32), (nb, kb, kb))
    lp = jnp.zeros((nb, kb, kb), jnp.float32)
    bp = jnp.asarray(np.random.default_rng(0).normal(size=(nb, kb)),
                     jnp.float32)
    x = substitute_pallas(ldinv, lp, bp, interpret=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(bp), atol=1e-6)


def test_tpu_lowering():
    """The kernels must lower through the Mosaic TPU pipeline (caught a
    real failure once: value-level dynamic_slice is unimplemented in
    the TC lowering). jax.export exercises the Mosaic frontend without
    needing a chip."""
    import functools

    nb, kb = 3, 512
    # x64 mode trips an unbounded recursion inside jax.export's arg
    # canonicalization (jax 0.9 util.weakrefs_to_sentinel); the kernels
    # are f32-only anyway
    with jax.enable_x64(False):
        r = jax.ShapeDtypeStruct((nb, kb, 2 * kb), jnp.float32)
        f = jax.jit(functools.partial(factorize_pallas, interpret=False))
        jax.export.export(f, platforms=["tpu"])(r)
        ld = jax.ShapeDtypeStruct((nb, kb, kb), jnp.float32)
        bp = jax.ShapeDtypeStruct((nb, kb), jnp.float32)
        g = jax.jit(functools.partial(substitute_pallas, interpret=False))
        jax.export.export(g, platforms=["tpu"])(ld, ld, bp)


@pytest.mark.slow
def test_e2e_golden_trace(sim_pp):
    """10 jitted GN iterations through the Pallas backend track the
    chain backend's chi2 trace on simulation-pose-pose (golden anchor
    chain: 138862234 -> 8269, pgo.rs:602-607)."""
    from rustrobotics_tpu.mapping.pgo import make_optimize_jit

    g, *_ = sim_pp
    g32 = g.astype(jnp.float32)
    run_pal = make_optimize_jit(g32, num_iterations=10,
                                backend="banded-pallas", tolerance=0.0)
    run_chain = make_optimize_jit(g32, num_iterations=10,
                                  backend="banded-direct", tolerance=0.0)
    _, err_pal, _ = jax.block_until_ready(run_pal(g32))
    _, err_chain, _ = jax.block_until_ready(run_chain(g32))
    err_pal = np.asarray(err_pal)
    err_chain = np.asarray(err_chain)
    # same convergence basin, same final plateau
    np.testing.assert_allclose(err_pal[-1], err_chain[-1], rtol=5e-2)
    assert err_pal[-1] < 1.05 * 8269.0
