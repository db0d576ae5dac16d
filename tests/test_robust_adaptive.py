"""Adaptive robust kernels (reference Todo README.md:50-51 "Robust
Kernels / Adaptive Kernels").

Outlier-ramp contract: with gross outlier loop closures injected into a
graph, graduated non-convexity (gnc-gm) must recover a better inlier
configuration than the fixed Huber/Cauchy kernels, which must in turn
beat no robustification at all. Quality metric = chi2 over the INLIER
edges only at the final estimate (the outlier edges are excluded from
scoring; a kernel that "pleases" them is fitting garbage).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.mapping.assemble import robust_weight
from rustrobotics_tpu.mapping.g2o import load_g2o
from rustrobotics_tpu.mapping.pgo import global_error, make_optimize_jit
from rustrobotics_tpu.mapping.synthetic import synthetic_corridor_graph_2d


def inject_pp_outliers(graph, num, seed=0, scale=15.0):
    """Append ``num`` gross outlier SE2-SE2 edges: random far-apart pose
    pairs with garbage relative measurements at typical edge information.
    Returns (corrupted graph, inlier edge count E0)."""
    rng = np.random.default_rng(seed)
    n2 = graph.poses2.shape[0]
    e0 = graph.pp_from.shape[0]
    i = rng.integers(0, n2, num)
    j = (i + rng.integers(n2 // 4, n2 // 2, num)) % n2
    z = np.stack(
        [rng.uniform(-scale, scale, num), rng.uniform(-scale, scale, num),
         rng.uniform(-np.pi, np.pi, num)], axis=1)
    omega_med = np.median(np.asarray(graph.pp_omega), axis=0)
    omega = np.broadcast_to(omega_med, (num, 3, 3))
    dtype = graph.pp_z.dtype
    return graph.replace(
        pp_from=jnp.concatenate(
            [graph.pp_from, jnp.asarray(i, graph.pp_from.dtype)]),
        pp_to=jnp.concatenate(
            [graph.pp_to, jnp.asarray(j, graph.pp_to.dtype)]),
        pp_z=jnp.concatenate([graph.pp_z, jnp.asarray(z, dtype)]),
        pp_omega=jnp.concatenate(
            [graph.pp_omega, jnp.asarray(omega, dtype)]),
    ), e0


def inlier_chi2(clean_template, corrupted_result):
    """chi2 of the ORIGINAL (inlier) edges at the corrupted-run estimate."""
    g = clean_template.replace(
        poses2=corrupted_result.poses2,
        landmarks2=corrupted_result.landmarks2,
        poses3=corrupted_result.poses3,
    )
    return float(global_error(g))


def _run(graph, robust, iters=40, backend="dense", **kw):
    # robust runs drive LM: its accept/reject on the robust surrogate
    # keeps the GNC continuation from diverging during the convex phase
    run = make_optimize_jit(graph, num_iterations=iters, backend=backend,
                            solver="lm", tolerance=0.0, robust=robust, **kw)
    out, errors, _ = run(graph)
    assert np.isfinite(float(errors[~jnp.isnan(errors)][-1]))
    return out


def test_robust_weight_families():
    c2 = jnp.asarray([0.0, 1.0, 100.0, 1e6])
    # barron alpha=0 ~ Cauchy shape; alpha=-2 = Geman-McClure
    w_b0 = robust_weight("barron", c2, 1.0, alpha=0.0)
    np.testing.assert_allclose(w_b0, 1.0 / (1.0 + c2 / 2.0), rtol=1e-6)
    w_gm = robust_weight("barron", c2, 1.0, alpha=-2.0)
    np.testing.assert_allclose(w_gm, (1.0 + c2 / 4.0) ** -2, rtol=1e-6)
    # alpha=2 is exactly L2
    np.testing.assert_allclose(
        robust_weight("barron", c2, 1.0, alpha=2.0), 1.0)
    # gnc-gm at huge mu -> L2; at mu=1 -> Geman-McClure-style weight
    np.testing.assert_allclose(
        robust_weight("gnc-gm", c2, 1.0, mu=1e12), 1.0, atol=1e-4)
    w1 = robust_weight("gnc-gm", c2, 1.0, mu=1.0)
    np.testing.assert_allclose(w1, (1.0 / (c2 + 1.0)) ** 2, rtol=1e-6)
    # weights monotonically non-increasing in c2 for every robust family
    for name, kw in [("huber", {}), ("cauchy", {}),
                     ("barron", {"alpha": -2.0}), ("gnc-gm", {"mu": 5.0})]:
        w = np.asarray(robust_weight(name, c2, 1.0, **kw))
        assert np.all(np.diff(w) <= 1e-12), (name, w)


@pytest.mark.slow
def test_gnc_beats_fixed_kernels_corridor():
    """Outlier-ramp smoke at the HIGH-corruption point (64 gross
    outliers vs ~5 true closures): fixed Huber fails catastrophically,
    gnc-gm recovers the clean solution and edges out Cauchy."""
    clean = synthetic_corridor_graph_2d(num_poses=96, closure_span=16,
                                        dtype=jnp.float64)
    graph, _ = inject_pp_outliers(clean, num=64, seed=3)
    scores = {}
    # None and cauchy comparators live in the slow intel ramp
    for robust in ("huber", "gnc-gm"):
        out = _run(graph, robust, iters=30)
        scores[robust] = inlier_chi2(clean, out)
    assert scores["gnc-gm"] < 1.0, scores            # near-exact recovery
    assert scores["gnc-gm"] < scores["huber"] / 1e3, scores


@pytest.mark.slow
def test_barron_low_alpha_downweights_harder():
    """Barron alpha=-4 rejects the corrupted closures at least as well
    as fixed Huber on the corridor graph."""
    clean = synthetic_corridor_graph_2d(num_poses=96, closure_span=16,
                                        dtype=jnp.float64)
    graph, _ = inject_pp_outliers(clean, num=12, seed=11)
    huber = inlier_chi2(clean, _run(graph, "huber", iters=25))
    barron = inlier_chi2(
        clean, _run(graph, "barron", iters=25, robust_alpha=-4.0))
    assert barron <= huber * 1.05, (barron, huber)


@pytest.mark.slow
def test_gnc_beats_fixed_kernels_intel(dataset_dir):
    """The VERDICT-specified ramp: intel.g2o + 50 gross outlier
    closures; gnc-gm's inlier chi2 beats fixed Huber and Cauchy."""
    clean = load_g2o(str(dataset_dir / "g2o" / "intel.g2o"))
    graph, _ = inject_pp_outliers(clean, num=50, seed=7)
    scores = {}
    for robust in (None, "huber", "cauchy", "gnc-gm"):
        out = _run(graph, robust, iters=40, backend="banded-direct")
        scores[robust] = inlier_chi2(clean, out)
    assert scores["gnc-gm"] < scores[None] / 50.0, scores
    assert scores["gnc-gm"] < scores["huber"], scores
    # cauchy also converges on this graph — gnc must tie it (<=5%)
    assert scores["gnc-gm"] <= scores["cauchy"] * 1.05, scores
    # and the adaptive run lands essentially at the clean-graph optimum
    # (chi2 360 on intel, pose_graph_optimization.rs:616-621)
    assert scores["gnc-gm"] < 1.1 * 360.0, scores
