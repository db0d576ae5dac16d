"""Map-block distributed PGO tests (virtual 8-device CPU mesh).

Oracle: the block-partitioned path must reproduce single-device numerics —
the distributed GN step equals the host sparse direct solve, and the
fully-jitted distributed optimize reaches the reference's golden χ²
(SURVEY §6) on the bundled graphs, including the landmark-heavy dlr
(pose_graph_optimization.rs:623-628). Communication in this path is
proportional to the RCM band (the separator), never to total dof — see
parallel/block_layout.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.mapping import load_g2o, global_error
from rustrobotics_tpu.mapping.pgo import linearize_and_solve, optimize
from rustrobotics_tpu.mapping.synthetic import (
    synthetic_corridor_graph_2d,
    synthetic_pose_graph_2d,
)
from rustrobotics_tpu.parallel.block_layout import build_block_layout
from rustrobotics_tpu.parallel.mesh import make_mesh
from rustrobotics_tpu.parallel.pgo_blocks import (
    block_optimize,
    dx_to_reference,
    layout_device_arrays,
    make_block_step,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8, axis="blocks")


@pytest.mark.slow
def test_block_gn_step_matches_host_direct(dataset_dir, mesh8):
    """Distributed (halo-exchange CG) dx == host sparse direct dx."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    layout = build_block_layout(g, 8)
    state, edges, maps = layout_device_arrays(layout, jnp.float64)
    solve = make_block_step(mesh8, layout, cg_tol=1e-13)
    dx, chi2 = solve(state, edges, maps, jnp.asarray(0.0))
    np.testing.assert_allclose(float(chi2), float(global_error(g)),
                               rtol=1e-10)
    dx_ref = dx_to_reference(layout, dx)
    dx_host = np.asarray(linearize_and_solve(g, backend="host"))
    np.testing.assert_allclose(dx_ref, dx_host, atol=1e-6)


@pytest.mark.slow
def test_block_gn_step_synthetic_all_device_counts():
    """D in {1, 2, 3, 5, 8} all reproduce the host dx — including odd
    counts with uneven chunk padding (halo hop arithmetic exercised)."""
    g = synthetic_pose_graph_2d(num_poses=60, num_landmarks=8,
                                dtype=jnp.float64)
    dx_host = np.asarray(linearize_and_solve(g, backend="host"))
    for d in (1, 2, 3, 5, 8):
        if len(jax.devices()) < d:
            continue
        mesh = make_mesh(d, axis="blocks")
        layout = build_block_layout(g, d)
        state, edges, maps = layout_device_arrays(layout, jnp.float64)
        solve = make_block_step(mesh, layout, cg_tol=1e-13)
        dx, _ = solve(state, edges, maps, jnp.asarray(0.0))
        np.testing.assert_allclose(dx_to_reference(layout, dx), dx_host,
                                   atol=1e-7, err_msg=f"D={d}")


@pytest.mark.slow
def test_block_schwarz_precond_matches_host():
    """Additive-Schwarz preconditioner (local banded Cholesky per device)
    reproduces the same dx; at D=1 it's an exact solve, so CG converges
    in one iteration."""
    g = synthetic_pose_graph_2d(num_poses=60, num_landmarks=8,
                                dtype=jnp.float64)
    dx_host = np.asarray(linearize_and_solve(g, backend="host"))
    for d in (1, 8):
        if len(jax.devices()) < d:
            continue
        mesh = make_mesh(d, axis="blocks")
        layout = build_block_layout(g, d)
        state, edges, maps = layout_device_arrays(layout, jnp.float64)
        solve = make_block_step(mesh, layout, cg_tol=1e-13,
                                precond="schwarz")
        dx, _ = solve(state, edges, maps, jnp.asarray(0.0))
        np.testing.assert_allclose(dx_to_reference(layout, dx), dx_host,
                                   atol=1e-7, err_msg=f"D={d}")


@pytest.mark.slow
def test_block_optimize_matches_host_trace(dataset_dir, mesh8):
    """Per-iteration χ² of the one-program distributed GN == host loop."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-pose.g2o")
    res = optimize(g, num_iterations=5, backend="host", tolerance=0.0)
    _, errs, _ = block_optimize(mesh8, g, num_iterations=5, tolerance=0.0,
                                cg_tol=1e-13)
    np.testing.assert_allclose(errs[:4], res.errors[:4], rtol=1e-6)


@pytest.mark.slow
def test_block_lm_converges(mesh8):
    """Distributed Levenberg-Marquardt (accept/reject inside the jitted
    while_loop) matches the host LM trace on a synthetic graph."""
    g = synthetic_pose_graph_2d(num_poses=48, num_landmarks=6,
                                dtype=jnp.float64)
    res = optimize(g, num_iterations=15, solver="lm", backend="host")
    _, errs, _ = block_optimize(mesh8, g, num_iterations=15, solver="lm",
                                cg_tol=1e-13)
    assert errs[-1] <= res.errors[-1] * 1.01 + 1e-9
    np.testing.assert_allclose(errs[:6], res.errors[:6], rtol=1e-5)


@pytest.mark.slow
def test_block_schur_step_matches_host(mesh8):
    """Distributed Schur elimination (landmark blocks eliminated
    per-device, clique fill over observation pairs, two-sided halo
    reduce, local back-substitution) reproduces the host direct dx."""
    g = synthetic_pose_graph_2d(num_poses=60, num_landmarks=8,
                                dtype=jnp.float64)
    dx_host = np.asarray(linearize_and_solve(g, backend="host"))
    for d in (1, 8):
        if len(jax.devices()) < d:
            continue
        mesh = make_mesh(d, axis="blocks")
        layout = build_block_layout(g, d, schur=True)
        state, edges, maps = layout_device_arrays(layout, jnp.float64)
        solve = make_block_step(mesh, layout, cg_tol=1e-13)
        dx, chi2 = solve(state, edges, maps, jnp.asarray(0.0))
        np.testing.assert_allclose(float(chi2), float(global_error(g)),
                                   rtol=1e-10)
        np.testing.assert_allclose(dx_to_reference(layout, dx), dx_host,
                                   atol=1e-7, err_msg=f"D={d}")


@pytest.mark.slow
def test_block_schur_landmark_golden(dataset_dir, mesh8):
    """simulation-pose-landmark via distributed Schur (GN + LM — the
    damping must enter the eliminated Hll) reaches χ² = 474 ± 1."""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    _, errs, _ = block_optimize(mesh8, g, num_iterations=60,
                                cg_tol=1e-12, schur=True)
    assert abs(errs[-1] - 474.0) <= 1.0, errs[-1]
    _, errs_lm, _ = block_optimize(mesh8, g, num_iterations=60,
                                   solver="lm", cg_tol=1e-12, schur=True)
    assert errs_lm[-1] <= 475.0, errs_lm[-1]


@pytest.mark.slow
def test_block_elastic_resume_after_fault(mesh8, tmp_path):
    """Fault injection for the distributed path: run one checkpointed
    segment, 'crash', resume from the snapshot — the stitched trajectory
    must reach the same optimum as an uninterrupted run."""
    from rustrobotics_tpu.parallel.pgo_blocks import block_optimize_elastic

    g = synthetic_pose_graph_2d(num_poses=48, num_landmarks=6,
                                dtype=jnp.float64)
    _, errs_ref, _ = block_optimize(mesh8, g, num_iterations=12,
                                    tolerance=0.0, cg_tol=1e-12)

    ck = tmp_path / "ckpt"
    # segment 1 then simulated preemption (we simply stop)
    _, errs_a, it_a = block_optimize_elastic(
        mesh8, g, num_iterations=4, segment=4, checkpoint_dir=ck,
        tolerance=0.0, cg_tol=1e-12)
    assert it_a == 4 and (ck / "block_000004.npz").exists()
    # resume to completion
    g2, errs_b, it_b = block_optimize_elastic(
        mesh8, g, num_iterations=12, segment=4, checkpoint_dir=ck,
        tolerance=0.0, cg_tol=1e-12)
    assert it_b == 12
    # this graph's optimum is chi2 = 0; values at machine-zero
    # (~1e-27) differ only in roundoff noise
    np.testing.assert_allclose(errs_b[-1], errs_ref[-1],
                               rtol=1e-6, atol=1e-20)
    np.testing.assert_allclose(errs_b[:len(errs_ref)], errs_ref,
                               rtol=1e-6, atol=1e-20)


@pytest.mark.slow
def test_block_3d_step_matches_host(dataset_dir, mesh8):
    """SE3 graphs ride the same block partition: one distributed GN step
    on parking-garage (1661 SE3 poses, 9966 dof, band h=222) equals the
    host sparse direct solve. The reference cannot run 3D at all
    (pose_graph_optimization.rs:357 todo!())."""
    g = load_g2o(dataset_dir / "g2o" / "parking-garage.g2o")
    layout = build_block_layout(g, 8)
    state, edges, maps = layout_device_arrays(layout, jnp.float64)
    solve = make_block_step(mesh8, layout, cg_tol=1e-12)
    dx, chi2 = solve(state, edges, maps, jnp.asarray(0.0))
    np.testing.assert_allclose(float(chi2), float(global_error(g)),
                               rtol=1e-10)
    dx_host = np.asarray(linearize_and_solve(g, backend="host"))
    err = np.abs(dx_to_reference(layout, dx) - dx_host).max()
    assert err < 1e-5 * max(1.0, np.abs(dx_host).max()), err


@pytest.mark.slow
def test_block_optimize_intel_golden(dataset_dir, mesh8):
    """Full distributed GN on intel reaches χ² = 360 ± 1 (rs:616-621)."""
    g = load_g2o(dataset_dir / "g2o" / "intel.g2o")
    _, errs, _ = block_optimize(mesh8, g, num_iterations=50, cg_tol=1e-12)
    assert abs(errs[-1] - 360.0) <= 1.0, errs[-1]


@pytest.mark.slow
def test_block_optimize_landmark_golden(dataset_dir, mesh8):
    """simulation-pose-landmark distributed GN reaches χ² = 474 ± 1
    (rs:609-614) — landmark blocks ride the band partition. (The
    distributed LM accept/reject machinery is covered by
    test_block_lm_converges.)"""
    g = load_g2o(dataset_dir / "g2o" / "simulation-pose-landmark.g2o")
    _, errs, _ = block_optimize(mesh8, g, num_iterations=60, cg_tol=1e-12)
    assert abs(errs[-1] - 474.0) <= 1.0, errs[-1]


@pytest.mark.slow
def test_block_optimize_dlr_golden(dataset_dir, mesh8):
    """dlr (3873 nodes, 17.6k edges, landmarks, ill-conditioned) — the
    distributed conditioning stress test (rs:623-628): χ² = 56860 ± 1.
    The ill-conditioning makes this the suite's slowest test (~10 min on
    the serialized CPU mesh): block-Jacobi CG genuinely needs thousands
    of iterations per GN step here, and capping them (inexact Newton)
    stalls above the golden optimum (cap 600 -> 61638, cap 2000 ->
    56878) — the accuracy contract requires the full solves."""
    g = load_g2o(dataset_dir / "g2o" / "dlr.g2o")
    # precond pinned to jacobi for the CPU proxy: the auto policy's
    # Schwarz default is sized for real meshes (comm-free log-depth
    # apply vs per-round collectives) but its per-round f64 CR
    # substitutions serialize on this 1-core host (measured ~300 s
    # jacobi vs 1878 s schwarz for this test); Schwarz parity has its
    # own test above
    _, errs, _ = block_optimize(mesh8, g, num_iterations=20,
                                cg_tol=1e-10, precond="jacobi")
    assert abs(errs[-1] - 56860.0) <= 1.0, errs[-1]


@pytest.mark.slow
def test_block_optimize_corridor_100k(mesh8):
    """>=100k-dof synthetic corridor graph converges distributed with
    bounded halo (h << n, here 195 vs 102k) — the scaling regime the
    partition targets. Inexact Newton: CG capped at 150 iterations per
    GN step (uncapped block-Jacobi CG on a 100k chain needs O(n)
    iterations; the capped solve still drops chi2 ~800x in the first
    step, ~1 s/GN iteration on the CPU mesh)."""
    g = synthetic_corridor_graph_2d(num_poses=34000, num_landmarks=0,
                                    dtype=jnp.float64)
    assert g.total_dof >= 100_000
    layout = build_block_layout(g, 8)
    assert layout.h < layout.n_pad // 16, (layout.h, layout.n_pad)
    g2, errs, it = block_optimize(mesh8, g, num_iterations=8,
                                  tolerance=0.0, cg_tol=1e-8,
                                  cg_maxiter=150)
    assert errs[-1] < errs[0] * 1e-3, (errs[0], errs[-1])
    assert np.isfinite(errs[-1])


@pytest.mark.slow  # ~12 s: branch-pinning parity; fast CR/golden tests keep coverage
def test_overlapped_matvec_parity_small_halo():
    """Shapes where the overlap policy ENGAGES (8h <= ndof: interior
    product concurrent with the halo ppermutes, 2h-row corrections
    after) must match the host direct solve exactly — and the wide-halo
    corridor above exercises the plain exchange path, so both matvec
    variants stay pinned."""
    import numpy as np

    from rustrobotics_tpu.mapping import solvers
    from rustrobotics_tpu.mapping.assemble import build_layout, system_values
    from rustrobotics_tpu.parallel.mesh import make_mesh
    from rustrobotics_tpu.parallel.pgo_blocks import (
        block_optimize,
        build_block_layout,
    )

    g = synthetic_corridor_graph_2d(num_poses=1024, closure_span=8,
                                    dtype=jnp.float64)
    lay = build_block_layout(g, 4)
    assert 8 * lay.h <= lay.ndof  # the overlap branch is actually on
    mesh = make_mesh(4, axis="blocks")
    _, errs, _ = block_optimize(mesh, g, num_iterations=3, tolerance=0.0,
                                cg_tol=1e-12, precond="jacobi")
    # single-device oracle trace
    from rustrobotics_tpu.mapping.pgo import make_optimize_jit

    run = make_optimize_jit(g, num_iterations=3, backend="banded-direct",
                            tolerance=0.0)
    _, errs1, _ = run(g)
    # final entries sit at machine-zero chi2 where relative comparison
    # is meaningless — pin the descent trace and require both to vanish
    np.testing.assert_allclose(np.asarray(errs)[:3],
                               np.asarray(errs1)[:3], rtol=1e-6, atol=1e-9)
    assert np.asarray(errs)[3] < 1e-12 and np.asarray(errs1)[3] < 1e-12


def _psums_in_cg_body(jaxpr):
    """Count psum equations inside the (unique) while-loop body that
    performs the halo-exchange matvec — i.e. the CG loop."""
    def has_ppermute(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "ppermute":
                return True
            for v in eqn.params.values():
                for w in (v if isinstance(v, (list, tuple)) else (v,)):
                    inner = getattr(w, "jaxpr", w)
                    if hasattr(inner, "eqns") and has_ppermute(inner):
                        return True
        return False

    def count_psums(jx):
        n = 0
        for eqn in jx.eqns:
            if eqn.primitive.name == "psum":
                n += 1
            for v in eqn.params.values():
                for w in (v if isinstance(v, (list, tuple)) else (v,)):
                    inner = getattr(w, "jaxpr", w)
                    if hasattr(inner, "eqns"):
                        n += count_psums(inner)
        return n

    found = []

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "while":
                body = eqn.params["body_jaxpr"].jaxpr
                if has_ppermute(body):
                    found.append(count_psums(body))
                walk(body)
                continue
            for v in eqn.params.values():
                for w in (v if isinstance(v, (list, tuple)) else (v,)):
                    inner = getattr(w, "jaxpr", w)
                    if hasattr(inner, "eqns"):
                        walk(inner)

    walk(jaxpr)
    assert len(found) == 1, f"expected one CG loop, found {found}"
    return found[0]


@pytest.mark.slow
def test_cg_single_reduction_variant():
    """Chronopoulos-Gear single-reduction CG (cg_variant="single" — the
    "auto" default): (a) the distributed GN dx matches the classic
    two-reduction loop and the host direct solve, and (b) the CG
    while-loop BODY carries exactly ONE psum where classic carries two —
    the per-round collective-chain cut pinned against the program's own
    jaxpr, the structural analog of the comm_budget accounting."""
    g = synthetic_pose_graph_2d(num_poses=48, num_landmarks=6,
                                dtype=jnp.float64)
    layout = build_block_layout(g, 4)
    state, edges, maps = layout_device_arrays(layout, jnp.float64)
    mesh = make_mesh(4, axis="blocks")
    dxs, psums = {}, {}
    for variant in ("classic", "single"):
        solve = make_block_step(mesh, layout, cg_tol=1e-13,
                                precond="jacobi", cg_variant=variant)
        dx, _ = solve(state, edges, maps, jnp.asarray(0.0))
        dxs[variant] = dx_to_reference(layout, dx)
        jaxpr = jax.make_jaxpr(solve)(state, edges, maps,
                                      jnp.asarray(0.0))
        psums[variant] = _psums_in_cg_body(jaxpr.jaxpr)
    np.testing.assert_allclose(dxs["single"], dxs["classic"], atol=1e-8)
    dx_host = np.asarray(linearize_and_solve(g, backend="host"))
    np.testing.assert_allclose(dxs["single"], dx_host, atol=1e-7)
    assert psums == {"classic": 2, "single": 1}, psums


@pytest.mark.slow
def test_block_schwarz2_precond_matches_host():
    """Two-level Schwarz (local banded solve + rigid-mode Galerkin
    coarse correction, precond="schwarz2") is still an exact CG solve:
    same dx as the host direct solve. Landmarks exercise the basis
    masking (landmark dofs share the translation columns and have no
    theta row)."""
    g = synthetic_corridor_graph_2d(num_poses=192, num_landmarks=24,
                                    closure_span=8, dtype=jnp.float64)
    dx_host = np.asarray(linearize_and_solve(g, backend="host"))
    for d in (2, 8):
        if len(jax.devices()) < d:
            continue
        mesh = make_mesh(d, axis="blocks")
        layout = build_block_layout(g, d)
        assert layout.h <= layout.ndof  # the coarse space is engaged
        state, edges, maps = layout_device_arrays(layout, jnp.float64)
        solve = make_block_step(mesh, layout, cg_tol=1e-13,
                                precond="schwarz2")
        dx, _ = solve(state, edges, maps, jnp.asarray(0.0))
        np.testing.assert_allclose(dx_to_reference(layout, dx), dx_host,
                                   atol=1e-7, err_msg=f"D={d}")


@pytest.mark.slow
def test_block_ew_forcing_matches_fixed(dataset_dir, mesh8):
    """Eisenstat-Walker adaptive CG forcing on the odometry-initialized
    intel graph (the forcing's regime — a trustworthy linearization):
    "ew" reaches the SAME optimum as the fixed-tolerance solve with
    strictly fewer CG rounds; "ew-fast" lands inside the reference's
    ±1 golden band with far fewer. Round counts are deterministic on
    the f64 CPU mesh."""
    g = load_g2o(dataset_dir / "g2o" / "intel.g2o")
    runs = {}
    for forcing in ("fixed", "ew", "ew-fast"):
        _, errs, _, stats = block_optimize(
            mesh8, g, num_iterations=12, tolerance=0.0, cg_tol=1e-10,
            precond="schwarz", cg_forcing=forcing, return_stats=True)
        runs[forcing] = (errs[-1], stats["cg_rounds_total"])
    chi2_fixed, rounds_fixed = runs["fixed"]
    chi2_ew, rounds_ew = runs["ew"]
    chi2_fast, rounds_fast = runs["ew-fast"]
    assert abs(chi2_fixed - 360.0) <= 1.0, chi2_fixed
    # exact mode: same optimum, fewer rounds (measured 2545 vs 6408)
    np.testing.assert_allclose(chi2_ew, chi2_fixed, rtol=1e-6)
    assert rounds_ew < 0.6 * rounds_fixed, (rounds_ew, rounds_fixed)
    # fast mode: golden-band optimum, much fewer rounds (measured 475)
    assert abs(chi2_fast - 360.0) <= 1.0, chi2_fast
    assert rounds_fast < 0.5 * rounds_ew, (rounds_fast, rounds_ew)


def test_comm_budget_multislice_dcn():
    """Multi-slice DCN accounting (SURVEY §5: ICI within a pod slice,
    DCN across slices): with contiguous block ranks per slice, only the
    slices-1 chain boundaries carry halo bytes over DCN, while every
    scalar dot psum pays one DCN traversal per CG round — so the
    critical-path DCN count scales with the ROUND count, and the
    single-reduction variant's fused psum shows up as strictly fewer
    traversals than classic at identical round counts."""
    from rustrobotics_tpu.parallel.pgo_blocks import comm_budget

    g = synthetic_pose_graph_2d(num_poses=48, num_landmarks=6,
                                dtype=jnp.float64)
    layout = build_block_layout(g, 8)
    budgets = {
        v: comm_budget(layout, jnp.float64, gn_iters=4, cg_total=400,
                       cg_variant=v, slice_size=4)
        for v in ("single", "classic")
    }
    for v, b in budgets.items():
        d = b["dcn"]
        assert d["slices"] == 2 and d["dcn_boundaries"] == 1, d
        assert d["ici_boundaries"] == 6, d
        # 100 rounds/GN x 2 x h x 8B + assembly reduce + dx exchange
        h = b["halo_dofs_h"]
        assert d["dcn_bytes_per_boundary_per_gn"] >= 100 * 2 * h * 8, d
    t_single = budgets["single"]["dcn"]["dcn_traversals_per_gn"]
    t_classic = budgets["classic"]["dcn"]["dcn_traversals_per_gn"]
    # classic pays one extra sequential psum traversal per round
    assert t_classic - t_single == pytest.approx(100.0), (
        t_single, t_classic)
    # one slice => no DCN section boundaries, traversals drop to psums
    b1 = comm_budget(layout, jnp.float64, gn_iters=4, cg_total=400,
                     cg_variant="single", slice_size=8)
    assert b1["dcn"]["dcn_boundaries"] == 0
    assert b1["dcn"]["dcn_bytes_per_boundary_per_gn"] == 0
    # end-to-end plumbing: block_optimize(return_stats, slice_size)
    mesh = make_mesh(2, axis="blocks")
    _, _, _, stats = block_optimize(
        mesh, g, num_iterations=2, tolerance=0.0, cg_tol=1e-8,
        precond="jacobi", return_stats=True, slice_size=1)
    assert stats["dcn"]["slices"] == 2
    assert stats["dcn"]["dcn_bytes_per_boundary_per_gn"] > 0
