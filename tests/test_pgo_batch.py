"""Batched fleet PGO (pgo.make_optimize_batch): one XLA program
optimizing B same-structure graphs at once — the vmap capability the
reference's one-graph-one-UMFPACK architecture cannot express
(pose_graph_optimization.rs:215-303).

Contracts:
- row i of the batched run is BIT-IDENTICAL to the unbatched jit run on
  graph i;
- a batch of identical copies of a golden dataset reaches the
  reference's converged chi2 in every row.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.mapping.g2o import load_g2o
from rustrobotics_tpu.mapping.pgo import (
    global_error,
    make_optimize_batch,
    make_optimize_jit,
    stack_graphs,
)
from rustrobotics_tpu.mapping.synthetic import synthetic_corridor_graph_2d


def _jitter(g, key, scale=0.05):
    noise = scale * jax.random.normal(key, g.poses2.shape,
                                      dtype=g.poses2.dtype)
    return dataclasses.replace(g, poses2=g.poses2 + noise)


def test_batch_rows_match_unbatched():
    # fast smoke: dense backend, tiny graph; the banded batched path is
    # pinned by the slow golden test below
    g = synthetic_corridor_graph_2d(num_poses=32, closure_span=8,
                                    dtype=jnp.float32)
    graphs = [g, _jitter(g, jax.random.key(1))]
    run_b = make_optimize_batch(g, num_iterations=4, tolerance=0.0,
                                backend="dense")
    out_b, errs_b, it_b = run_b(stack_graphs(graphs))
    run_1 = make_optimize_jit(g, num_iterations=4, tolerance=0.0,
                              backend="dense")
    for i, gi in enumerate(graphs):
        out_1, errs_1, _ = run_1(gi)
        np.testing.assert_array_equal(np.asarray(errs_b)[i],
                                      np.asarray(errs_1))
        np.testing.assert_array_equal(np.asarray(out_b.poses2)[i],
                                      np.asarray(out_1.poses2))


@pytest.mark.slow
def test_batch_golden_chi2_every_row(dataset_dir):
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-pose.g2o")
    graphs = [g, _jitter(g, jax.random.key(7), scale=0.01), g]
    run_b = make_optimize_batch(g, num_iterations=100, tolerance=1e-4)
    out_b, errs_b, _ = run_b(stack_graphs(graphs))
    for i in range(len(graphs)):
        gi = jax.tree.map(lambda a: a[i], out_b)
        assert abs(float(global_error(gi)) - 8269.0) <= 1.0


@pytest.mark.slow  # compiles three solver candidates at build time
def test_auto_measure_backend_golden(dataset_dir):
    """backend="auto-measure" self-tunes (times each banded candidate
    once at build time, validity-gated) and still reaches the golden
    chi2 — the product API for the platform-dependent backend choice
    bench.py makes for the headline."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-pose.g2o")
    run = make_optimize_jit(g, num_iterations=100, backend="auto-measure",
                            tolerance=1e-4)
    out, _, _ = run(g)
    assert abs(float(global_error(out)) - 8269.0) <= 1.0
