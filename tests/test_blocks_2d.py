"""2-D (replica x blocks) mesh: SURVEY §5's "explicit mesh (graph-block
axis x replica axis)".

Contracts:
- every replica row of the 2-D run reproduces the 1-D blocks-mesh run
  bit-for-bit when given the same initialization (the replica axis adds
  no collectives to the solve path);
- multi-start jitters replicas independently (replica 0 unperturbed) and
  returns the best-final-chi2 replica.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.mapping.synthetic import synthetic_corridor_graph_2d
from rustrobotics_tpu.parallel.mesh import make_mesh, make_mesh_2d
from rustrobotics_tpu.parallel.pgo_blocks import (
    block_optimize,
    block_optimize_multistart,
    build_block_layout,
    layout_device_arrays,
    make_block_optimize,
)


def test_mesh_2d_layout():
    mesh = make_mesh_2d(blocks=4, replicas=2)
    assert mesh.axis_names == ("replica", "blocks")
    assert mesh.devices.shape == (2, 4)


@pytest.mark.slow
def test_replicated_smoke_matches_1d():
    """Fast 2-D smoke: a tiny 2-iteration run on a (2, 4) mesh must
    reproduce the 1-D blocks run in every replica row."""
    g = synthetic_corridor_graph_2d(num_poses=32, dtype=jnp.float64)
    layout = build_block_layout(g, 4)
    state, edges, maps = layout_device_arrays(layout, jnp.float64)
    mesh1 = make_mesh(4, axis="blocks")
    run1 = make_block_optimize(mesh1, layout, num_iterations=1,
                               tolerance=0.0, cg_tol=1e-10,
                               dtype=jnp.float64)
    _, errs1, _, _ = run1(state, edges, maps)
    mesh2 = make_mesh_2d(blocks=4, replicas=2)
    state_r = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (2,) + a.shape), state)
    run2 = make_block_optimize(mesh2, layout, num_iterations=1,
                               tolerance=0.0, cg_tol=1e-10,
                               dtype=jnp.float64)
    _, errs2, _, _ = run2(state_r, edges, maps)
    for r in range(2):
        np.testing.assert_allclose(np.asarray(errs2)[r],
                                   np.asarray(errs1), rtol=1e-12)


@pytest.mark.slow
def test_replicated_matches_1d_blocks_run():
    g = synthetic_corridor_graph_2d(num_poses=96, num_landmarks=4,
                                    dtype=jnp.float64)
    blocks, replicas = 4, 2
    layout = build_block_layout(g, blocks)
    state, edges, maps = layout_device_arrays(layout, jnp.float64)

    mesh1 = make_mesh(blocks, axis="blocks")
    run1 = make_block_optimize(mesh1, layout, num_iterations=4,
                               tolerance=0.0, cg_tol=1e-10,
                               dtype=jnp.float64)
    st1, errs1, it1, cg1 = run1(state, edges, maps)

    mesh2 = make_mesh_2d(blocks=blocks, replicas=replicas)
    state_r = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (replicas,) + a.shape), state)
    run2 = make_block_optimize(mesh2, layout, num_iterations=4,
                               tolerance=0.0, cg_tol=1e-10,
                               dtype=jnp.float64)
    st2, errs2, it2, cg2 = run2(state_r, edges, maps)

    errs1 = np.asarray(errs1)
    errs2 = np.asarray(errs2)
    assert errs2.shape == (replicas,) + errs1.shape
    for r in range(replicas):
        np.testing.assert_allclose(errs2[r], errs1, rtol=1e-12)
        assert int(np.asarray(it2)[r]) == int(it1)
    for a1, a2 in zip(st1, st2):
        for r in range(replicas):
            np.testing.assert_allclose(np.asarray(a2)[r], np.asarray(a1),
                                       rtol=1e-12)


@pytest.mark.slow
def test_multistart_returns_best_replica():
    g = synthetic_corridor_graph_2d(num_poses=64, num_landmarks=4,
                                    dtype=jnp.float64)
    mesh2 = make_mesh_2d(blocks=4, replicas=2)
    out, traces, best = block_optimize_multistart(
        mesh2, g, num_iterations=6, jitter=0.05, tolerance=0.0,
        cg_tol=1e-10)
    assert len(traces) == 2
    finals = [t[-1] for t in traces]
    assert finals[best] == min(finals)
    # replica 0 is the unperturbed init: its trace must match the plain
    # 1-D block run
    mesh1 = make_mesh(4, axis="blocks")
    _, errs1, _ = block_optimize(mesh1, g, num_iterations=6,
                                 tolerance=0.0, cg_tol=1e-10)
    np.testing.assert_allclose(traces[0], errs1, rtol=1e-10)
    # all replicas converge to (numerically) the same optimum
    assert max(finals) - min(finals) < 1e-3 * max(1.0, min(finals))


def test_replica_axis_carries_no_cg_traffic():
    """SURVEY §5's comm contract, checked against the program itself:
    on the 2-D (replica x blocks) mesh every DATA-moving collective
    (ppermute halo exchange, psum reduction) names ONLY the blocks
    axis — the replica axis (the would-be DCN axis across hosts) sees
    no per-CG-round traffic, just the scalar pmax that keeps loop trip
    counts replica-uniform."""
    import collections

    g = synthetic_corridor_graph_2d(num_poses=32, dtype=jnp.float64)
    layout = build_block_layout(g, 4)
    state, edges, maps = layout_device_arrays(layout, jnp.float64)
    mesh2 = make_mesh_2d(blocks=4, replicas=2)
    state_r = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (2,) + a.shape), state)
    run = make_block_optimize(mesh2, layout, num_iterations=1,
                              tolerance=0.0, cg_tol=1e-10,
                              dtype=jnp.float64)
    jaxpr = jax.make_jaxpr(run)(state_r, edges, maps)

    counts = collections.Counter()

    def subjaxprs(eqn):
        for v in eqn.params.values():
            for w in (v if isinstance(v, (list, tuple)) else (v,)):
                if hasattr(w, "jaxpr"):
                    yield w.jaxpr
                elif hasattr(w, "eqns"):
                    yield w

    def walk(jx):
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in ("ppermute", "psum", "pmax", "pmin", "all_gather",
                        "reduce_scatter", "all_to_all"):
                axes = eqn.params.get(
                    "axes", eqn.params.get("axis_name", ()))
                if not isinstance(axes, (tuple, list)):
                    axes = (axes,)
                counts[(name, tuple(axes))] += 1
            for sub in subjaxprs(eqn):
                walk(sub)

    walk(jaxpr.jaxpr)
    assert counts, "no collectives found — inspection broke"
    for (name, axes), n in counts.items():
        if "replica" in axes:
            # only the scalar loop-uniformity pmax may touch the
            # replica axis
            assert name == "pmax", (name, axes, n)
        if name in ("ppermute", "psum", "all_gather", "reduce_scatter",
                    "all_to_all"):
            assert axes == ("blocks",), (name, axes, n)
    assert sum(n for (nm, ax), n in counts.items()
               if nm == "ppermute") > 0  # halo exchange present
