"""Pose-graph optimizer: Gauss-Newton and Levenberg-Marquardt.

Role of the reference's PoseGraph::optimize loop
(pose_graph_optimization.rs:247-303): per iteration build the linear
system, solve, retract all nodes; LM accepts/rejects the step with
λ /= 2 or rollback + λ *= 2 (rs:275-282); convergence at ‖dx‖ < 1e-4
(rs:253,298-300). The returned error history matches the reference's
(including its quirk of recording the *rejected* χ² on an LM reject,
rs:284-286 — kept deliberately for trace parity).

Two drivers:
- ``optimize``     : host loop, pluggable solver backend ("host" sparse
                     direct = UMFPACK role; "dense"/"cg" = device paths);
- ``optimize_jit`` : fully-jitted lax.while_loop (dense Cholesky or CG on
                     device), the TPU production path — one XLA program for
                     the entire optimization.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.mapping import solvers
from rustrobotics_tpu.mapping.assemble import (
    GNC_MU0_CAP,
    PRIOR_WEIGHT,
    apply_update_jit,
    build_layout,
    system_values,
)
from rustrobotics_tpu.mapping.g2o import PoseGraphData, load_g2o
from rustrobotics_tpu.mapping.linearize import (
    edge_terms_pl,
    edge_terms_pp,
    edge_terms_qq,
)


@jax.jit
def global_error(graph: PoseGraphData):
    """Σ e^T Ω e over all edges (rs:537-574)."""
    *_, c_pp = edge_terms_pp(
        graph.poses2, graph.pp_from, graph.pp_to, graph.pp_z, graph.pp_omega
    )
    *_, c_pl = edge_terms_pl(
        graph.poses2, graph.landmarks2,
        graph.pl_pose, graph.pl_lm, graph.pl_z, graph.pl_omega,
    )
    *_, c_qq = edge_terms_qq(
        graph.poses3, graph.qq_from, graph.qq_to, graph.qq_z, graph.qq_omega
    )
    return jnp.sum(c_pp) + jnp.sum(c_pl) + jnp.sum(c_qq)


@jax.jit
def max_edge_chi2(graph: PoseGraphData):
    """Largest per-edge squared Mahalanobis error — seeds the GNC
    continuation parameter mu0 = max(1, 2 r_max^2 / c^2) so the first
    surrogate loss is convex (Yang et al., RA-L'20)."""
    *_, c_pp = edge_terms_pp(
        graph.poses2, graph.pp_from, graph.pp_to, graph.pp_z, graph.pp_omega
    )
    *_, c_pl = edge_terms_pl(
        graph.poses2, graph.landmarks2,
        graph.pl_pose, graph.pl_lm, graph.pl_z, graph.pl_omega,
    )
    *_, c_qq = edge_terms_qq(
        graph.poses3, graph.qq_from, graph.qq_to, graph.qq_z, graph.qq_omega
    )
    dtype = c_pp.dtype
    zero = jnp.zeros((), dtype)
    mx = zero
    for c in (c_pp, c_pl, c_qq):
        if c.size:
            mx = jnp.maximum(mx, jnp.max(c))
    return mx


def robust_global_cost(graph: PoseGraphData, robust, delta, alpha=-2.0,
                       mu=None, robust_edges="closures"):
    """Sum of per-edge robust losses rho(e^T Omega e) — the objective a
    robust run actually minimizes (assemble.robust_rho; sequential
    pose-pose edges stay quadratic under robust_edges="closures",
    mirroring system_values). robust=None degenerates to the raw chi2 of
    ``global_error``."""
    from rustrobotics_tpu.mapping.assemble import robust_rho

    *_, c_pp = edge_terms_pp(
        graph.poses2, graph.pp_from, graph.pp_to, graph.pp_z, graph.pp_omega
    )
    *_, c_pl = edge_terms_pl(
        graph.poses2, graph.landmarks2,
        graph.pl_pose, graph.pl_lm, graph.pl_z, graph.pl_omega,
    )
    *_, c_qq = edge_terms_qq(
        graph.poses3, graph.qq_from, graph.qq_to, graph.qq_z, graph.qq_omega
    )
    total = jnp.zeros((), c_pp.dtype)
    for c, fr, to in ((c_pp, graph.pp_from, graph.pp_to),
                      (c_pl, None, None),
                      (c_qq, graph.qq_from, graph.qq_to)):
        if not c.size:
            continue
        rho = robust_rho(robust, c, delta, alpha=alpha, mu=mu)
        if robust and robust_edges == "closures" and fr is not None:
            rho = jnp.where(jnp.abs(to - fr) == 1, c, rho)
        total = total + jnp.sum(rho)
    return total


@dataclasses.dataclass
class OptimizeResult:
    graph: PoseGraphData
    errors: list  # χ² before each recorded step (reference-trace layout)
    norms: list  # ‖dx‖ per iteration
    iterations: int


def linearize_and_solve(graph: PoseGraphData, backend: str = "host"):
    """One GN step's dx with λ = 0 (oracle for rs:724-739)."""
    layout = build_layout(graph)
    vals, b, _ = system_values(graph, jnp.asarray(0.0, graph.poses2.dtype))
    return solvers.SOLVERS[backend](layout, vals, b)


def optimize(
    graph: PoseGraphData,
    num_iterations: int = 50,
    solver: str = "gauss_newton",
    backend: str = "host",
    tolerance: float = 1e-4,
    prior_weight: float = PRIOR_WEIGHT,
    robust: str | None = None,
    robust_delta: float = 1.0,
    robust_alpha: float = -2.0,
    log: bool = False,
    callback=None,
) -> OptimizeResult:
    """Host-driven optimization loop (reference semantics, rs:247-303).
    ``robust``/``robust_delta``: optional IRLS reweighting of outlier
    edges — fixed Huber/Cauchy/Barron(alpha) kernels, or "gnc-gm"
    graduated non-convexity with mu annealed mu0 -> 1 across iterations
    (see assemble.robust_weight)."""
    layout = build_layout(graph)
    dtype = graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype
    values_fn = jax.jit(partial(system_values, prior_weight=prior_weight,
                                robust=robust, robust_delta=robust_delta,
                                robust_alpha=robust_alpha))
    gnc = robust == "gnc-gm"
    mu = 1.0
    mu0 = 1.0
    # geometric continuation schedule reaching mu=1 at 60% of the budget
    # (a fixed /1.4 never gets there when mu0 ~ 1e6 from gross outliers)
    k_gnc = max(1, int(round(0.6 * num_iterations)))
    if gnc:
        mu0 = min(GNC_MU0_CAP,
                  max(1.0, 2.0 * float(max_edge_chi2(graph))
                      / (robust_delta * robust_delta)))
        mu = mu0
    if backend == "auto":
        backend = "banded-direct"
    if backend == "auto-measure":
        backend = _measure_backend(graph, layout)
    if backend in ("banded-direct", "banded-cr", "banded-pallas",
                   "banded-mixed"):
        make = {"banded-cr": solvers.make_banded_cr,
                "banded-pallas": solvers.make_banded_pallas,
                "banded-mixed": solvers.make_banded_mixed,
                "banded-direct": solvers.make_banded_direct}[backend]
        banded = make(layout)
        if banded is None and backend == "banded-pallas":
            # bandwidth exceeds the kernel's VMEM budget: the XLA chain
            # still beats dense
            banded = solvers.make_banded_direct(layout)
        if banded is None:
            banded = lambda vals, b: solvers.solve_dense(layout, vals, b)  # noqa: E731
        solve_fn = jax.jit(banded)
    elif backend in ("dense", "cg", "schur"):
        solve_fn = jax.jit(lambda vals, b: solvers.SOLVERS[backend](layout, vals, b))
    else:
        host_solver = solvers.SOLVERS[backend]
        solve_fn = lambda vals, b: host_solver(layout, vals, b)  # noqa: E731

    lm = solver in ("lm", "levenberg_marquardt")
    lam = 0.01  # λ0 (rs:254)
    last_error = float(global_error(graph))
    errors = [last_error]
    norms = []
    if log:
        print(
            f"Loaded graph with {graph.num_nodes} nodes and "
            f"{graph.num_edges} edges"
        )
        print(f"initial error :{last_error:.5f}")

    if robust is not None:
        cost_jit = jax.jit(lambda g, mu_: robust_global_cost(
            g, robust, robust_delta, alpha=robust_alpha, mu=mu_))
    cur_cost = None  # carried robust cost (valid while mu is constant)

    it = 0
    for it in range(1, num_iterations + 1):
        vals, b, _ = values_fn(graph, jnp.asarray(lam if lm else 0.0, dtype),
                               mu=jnp.asarray(mu, dtype))
        dx = jnp.asarray(solve_fn(vals, b), dtype=dtype)
        prev_graph = graph
        graph = apply_update_jit(graph, dx)
        norm_dx = float(jnp.linalg.norm(dx))
        error = float(global_error(graph))
        if lm:
            if robust is None:
                accept = error <= last_error
            else:
                # accept on the robust surrogate at the current mu. For
                # fixed kernels mu never changes, so the previous
                # iteration's cost is reusable; GNC re-evaluates (mu
                # moved between iterations).
                mu_j = jnp.asarray(mu, dtype)
                trial = float(cost_jit(graph, mu_j))
                if gnc or cur_cost is None:
                    cur = float(cost_jit(prev_graph, mu_j))
                else:
                    cur = cur_cost
                accept = trial <= cur
                cur_cost = trial if trial <= cur else cur
            if not accept:  # NaN-safe reject
                graph = prev_graph  # rollback (role of rs:277's -dx update)
                lam *= 2.0
            else:
                lam /= 2.0
        if not np.isnan(error):
            last_error = error  # reference records this unconditionally (rs:284)
        norms.append(norm_dx)
        errors.append(error)
        if log:
            print(f"step {it:3} : |dx| = {norm_dx:3.5f}, error = {error:3.5f}")
        if callback is not None:
            callback(it, graph, error, norm_dx, lam)
        if gnc:
            mu = mu0 ** max(0.0, 1.0 - it / k_gnc)
        # a GNC surrogate can converge while mu is still annealing: keep
        # iterating until the continuation has reached the target loss
        if norm_dx < tolerance and not (gnc and mu > 1.0):
            break

    return OptimizeResult(graph=graph, errors=errors, norms=norms, iterations=it)


def _measure_backend(graph_template: PoseGraphData, layout):
    """Pick the fastest banded backend for THIS platform by measuring one
    jitted solve of the template's normal equations per candidate
    (validity-gated: non-finite solves are disqualified). Falls back to
    "dense" when the RCM bandwidth rules the banded path out."""
    import time

    from rustrobotics_tpu.utils.devtime import fetch

    dtype = (graph_template.poses2.dtype if graph_template.poses2.size
             else graph_template.poses3.dtype)
    vals, b, _ = system_values(graph_template, jnp.asarray(0.0, dtype))
    candidates = {"banded-direct": solvers.make_banded_direct,
                  "banded-cr": solvers.make_banded_cr,
                  "banded-mixed": solvers.make_banded_mixed}
    if jax.devices()[0].platform == "tpu":
        # interpret-mode Pallas off-TPU takes minutes; only a real chip
        # runs the fused kernel
        candidates["banded-pallas"] = solvers.make_banded_pallas
    timed = {}
    for name, make in candidates.items():
        try:
            solve = make(layout)
            if solve is None:
                continue
            run = jax.jit(solve)
            x = run(vals, b)
            # fetch, not block_until_ready: the latter is a no-op over
            # the axon tunnel (utils/devtime) and would make this
            # self-tuning measurement pick backends at random
            if not bool(jnp.all(jnp.isfinite(x))):
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fetch(run(vals, b))
                best = min(best, time.perf_counter() - t0)
            timed[name] = best
        except Exception:  # a failing candidate must not sink the build
            continue
    if not timed:
        return "dense"
    return min(timed, key=timed.get)


def make_optimize_jit(
    graph_template: PoseGraphData,
    num_iterations: int = 50,
    solver: str = "gauss_newton",
    backend: str = "dense",
    tolerance: float = 1e-4,
    prior_weight: float = PRIOR_WEIGHT,
    robust: str | None = None,
    robust_delta: float = 1.0,
    robust_alpha: float = -2.0,
    cg_tol: float = 1e-10,
    cg_maxiter: int | None = None,
):
    """Build a fully-jitted optimizer for graphs with this template's
    shape: the whole GN/LM loop is one lax.while_loop on device — the
    production TPU path (no host round-trips between iterations)."""
    layout = build_layout(graph_template)
    lm = solver in ("lm", "levenberg_marquardt")
    gnc = robust == "gnc-gm"
    dtype = (
        graph_template.poses2.dtype
        if graph_template.poses2.size
        else graph_template.poses3.dtype
    )

    if backend == "auto":
        # banded direct when the RCM bandwidth permits (every bundled
        # dataset), dense Cholesky otherwise
        backend = "banded-direct"
    if backend == "auto-measure":
        # self-tuning: build every banded candidate, time ONE jitted
        # solve of the template system each, keep the winner. The
        # chain/CR/Pallas/mixed backends bracket the latency/throughput/
        # precision trade, and which wins is platform-dependent — the
        # measurement costs a few solves at build time and is amortized
        # over the optimization (and any batched fleet built from it).
        backend = _measure_backend(graph_template, layout)
    if backend == "dense":
        def solve(vals, b):
            return solvers.solve_dense(layout, vals, b)
    elif backend == "schur":
        def solve(vals, b):
            return solvers.solve_schur(layout, vals, b)
    elif backend == "cg":
        def solve(vals, b):
            return solvers.solve_cg(layout, vals, b, tol=cg_tol)
    elif backend in ("banded-direct", "banded-cr", "banded-pallas",
                     "banded-mixed"):
        make = {"banded-cr": solvers.make_banded_cr,
                "banded-pallas": solvers.make_banded_pallas,
                "banded-mixed": solvers.make_banded_mixed,
                "banded-direct": solvers.make_banded_direct}[backend]
        solve = make(layout)
        if solve is None and backend == "banded-pallas":
            solve = solvers.make_banded_direct(layout)
        if solve is None:  # bandwidth too large: dense is the right call
            def solve(vals, b):
                return solvers.solve_dense(layout, vals, b)
    elif backend in ("cg-banded", "cg-banded-jnp"):
        from rustrobotics_tpu.ops.banded import build_banded

        blayout = build_banded(layout)
        use_pallas = None if backend == "cg-banded" else False

        def solve(vals, b):
            return solvers.solve_cg_banded(
                layout, blayout, vals, b, tol=cg_tol, maxiter=cg_maxiter,
                use_pallas=use_pallas,
            )
    else:
        raise ValueError(f"jit path needs a device backend, got {backend!r}")

    from rustrobotics_tpu.mapping.assemble import apply_update

    # The while_loop state carries ONLY the mutable node arrays. Edge
    # constants (measurements, information matrices, index arrays) are
    # closed over: carrying them in the loop state makes XLA stage a copy
    # of every buffer each iteration (profiled at ~2x the actual compute
    # on intel.g2o — async copy-start/dynamic-update-slice per field).
    _NODE_FIELDS = ("poses2", "landmarks2", "poses3")

    # GNC continuation: geometric schedule mu(it) = mu0^(1 - it/k),
    # clamped at 1, reaching the target (non-convex) loss at 60% of the
    # iteration budget — mu0 comes from the worst initial residual.
    k_gnc = max(1, int(round(0.6 * num_iterations)))

    def cond(state):
        _, _, _, it, norm_dx, _ = state
        converged = norm_dx < tolerance
        if gnc:
            # a GNC surrogate can converge while mu is still annealing
            converged = jnp.logical_and(converged, it >= k_gnc)
        return jnp.logical_and(it < num_iterations,
                               jnp.logical_not(converged))

    @jax.jit
    def run(graph):
        def with_nodes(nodes):
            return graph.replace(**dict(zip(_NODE_FIELDS, nodes)))

        def get_nodes(g):
            return tuple(getattr(g, f) for f in _NODE_FIELDS)

        def mu_of(it):
            if not gnc:
                return None
            return jnp.exp(
                jnp.log(mu0) * jnp.clip(1.0 - it / k_gnc, 0.0, 1.0)
            ).astype(dtype)

        def step_lm(state):
            nodes, lam, last_error, it, norm_dx, errors = state
            g = with_nodes(nodes)
            vals, b, _ = system_values(g, lam, prior_weight,
                                       robust=robust,
                                       robust_delta=robust_delta,
                                       robust_alpha=robust_alpha,
                                       mu=mu_of(it))
            dx = solve(vals, b)
            new_g = apply_update(g, dx)
            norm_dx = jnp.linalg.norm(dx)
            error = global_error(new_g)
            # NaN-safe reject: a non-finite trial error (e.g. f32 Cholesky
            # breakdown on an ill-conditioned system at small lambda) must
            # count as a rejection, not an acceptance.
            if robust is None:
                reject = jnp.logical_not(error <= last_error)
            else:
                # robust runs accept on the ROBUST surrogate objective at
                # the CURRENT mu (raw chi2 would reject any step that
                # sacrifices outlier fit); both sides evaluated at the
                # same mu so the comparison is well-defined under GNC
                mu_now = mu_of(it)
                trial = robust_global_cost(new_g, robust, robust_delta,
                                           alpha=robust_alpha, mu=mu_now)
                cur = robust_global_cost(g, robust, robust_delta,
                                         alpha=robust_alpha, mu=mu_now)
                reject = jnp.logical_not(trial <= cur)
            new_nodes = jax.tree.map(
                lambda a, b_: jnp.where(reject, a, b_),
                nodes, get_nodes(new_g),
            )
            lam = jnp.where(reject, lam * 2.0, lam / 2.0)
            errors = errors.at[it + 1].set(error)
            # the reference records the trial error unconditionally
            # (rs:284); carry the old one only when the trial was NaN so a
            # single bad solve can't poison every later accept test
            new_last = jnp.where(jnp.isnan(error), last_error, error)
            return new_nodes, lam, new_last, it + 1, norm_dx, errors

        def step_gn(state):
            # GN fast path: system_values' chi2 IS the error of the
            # current graph (== error after the previous update), so no
            # separate global_error pass per iteration — the final
            # graph's error is filled in once after the loop.
            nodes, lam, last_error, it, norm_dx, errors = state
            g = with_nodes(nodes)
            vals, b, chi2 = system_values(
                g, jnp.asarray(0.0, dtype), prior_weight,
                robust=robust, robust_delta=robust_delta,
                robust_alpha=robust_alpha, mu=mu_of(it),
            )
            errors = errors.at[it].set(chi2)
            dx = solve(vals, b)
            new_g = apply_update(g, dx)
            norm_dx = jnp.linalg.norm(dx)
            return get_nodes(new_g), lam, chi2, it + 1, norm_dx, errors

        errors = jnp.full(num_iterations + 1, jnp.nan, dtype=dtype)
        if lm:
            errors = errors.at[0].set(global_error(graph))
        if gnc:
            mu0 = jnp.minimum(GNC_MU0_CAP, jnp.maximum(
                1.0,
                2.0 * max_edge_chi2(graph) / (robust_delta * robust_delta),
            )).astype(dtype)
        state = (
            get_nodes(graph),
            jnp.asarray(0.01, dtype),
            errors[0] if lm else jnp.asarray(jnp.inf, dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(jnp.inf, dtype),
            errors,
        )
        nodes, _, last_error, it, _, errors = jax.lax.while_loop(
            cond, step_lm if lm else step_gn, state
        )
        out_graph = with_nodes(nodes)
        if not lm:
            errors = errors.at[it].set(global_error(out_graph))
        return out_graph, errors, it

    return run


def stack_graphs(graphs):
    """Stack same-structure PoseGraphData pytrees along a new leading
    batch axis (every graph must share the template's index arrays /
    sparsity — the fleet-serving scenario: one map, many robots'
    measurement sets or initializations)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *graphs)


def make_optimize_batch(
    graph_template: PoseGraphData,
    num_iterations: int = 50,
    **kwargs,
):
    """Batched fleet optimizer: ``jax.vmap`` over ``make_optimize_jit``.

    The capability the reference architecture cannot express: its
    optimizer owns one mutable graph and one UMFPACK factorization at a
    time (pose_graph_optimization.rs:215-303), so a fleet of B robots
    costs B sequential solves. Here one compiled XLA program optimizes
    B same-structure graphs simultaneously. Row i of the batched result
    is BIT-IDENTICAL to running ``make_optimize_jit`` on graph i alone
    (pinned in tests/test_pgo_batch.py).

    What the batch axis buys, measured (TPU v5e, intel.g2o, B=8 —
    docs/PERFORMANCE.md §Round 5): linearization and the factor's
    matmuls batch onto the MXU essentially free, and the
    factorization's triangular algebra is kept batch-parallel by the
    matmul-only routines in ops/batched_tri (XLA's own
    cholesky/triangular_solve serialize PER BATCH ITEM on TPU). The
    remaining per-graph cost is bounded below by XLA's per-index
    scatter charge on the band assembly (~115 ns per 8-wide vmapped
    window) — net ~1.3x throughput at B=8 on the wall convention,
    3.15 vs 4.11 ms per graph-iteration device-side.

    The while_loop termination vmaps to "run until every graph in the
    batch converges"; converged rows keep taking (numerically inert)
    GN steps, matching JAX's batched-while semantics.

    Returns run(batched_graph) -> (graphs, errors (B, iters+1), iters).
    Build the input with ``stack_graphs``.
    """
    run = make_optimize_jit(graph_template, num_iterations, **kwargs)
    return jax.jit(jax.vmap(run))


class PoseGraph:
    """User-facing wrapper (role of PoseGraph::new + optimize + plot,
    rs:214-303,375-431)."""

    def __init__(self, path_or_data, solver: str = "gauss_newton", dtype=None):
        if isinstance(path_or_data, PoseGraphData):
            self.data = path_or_data
            self.name = "graph"
        else:
            self.data = load_g2o(str(path_or_data))
            self.name = str(path_or_data).rsplit("/", 1)[-1].split(".")[0]
        if dtype is not None:
            self.data = self.data.astype(dtype)
        self.solver = solver
        self.iteration = 0

    def global_error(self) -> float:
        return float(global_error(self.data))

    def optimize(self, num_iterations=50, log=False, plot=False, backend="host",
                 out_dir="img", robust=None, robust_delta=1.0,
                 robust_alpha=-2.0):
        callback = None
        if plot:
            from rustrobotics_tpu.utils.plot import plot_pose_graph

            plot_pose_graph(self.data, f"{out_dir}/{self.name}-0-{self.solver}.png")

            def callback(it, graph, *_):
                plot_pose_graph(
                    graph, f"{out_dir}/{self.name}-{it}-{self.solver}.png"
                )

        result = optimize(
            self.data,
            num_iterations=num_iterations,
            solver=self.solver,
            backend=backend,
            robust=robust,
            robust_delta=robust_delta,
            robust_alpha=robust_alpha,
            log=log,
            callback=callback,
        )
        self.data = result.graph
        self.iteration += result.iterations
        return result.errors


def marginal_variances(graph: PoseGraphData, robust: str | None = None,
                       robust_delta: float = 1.0):
    """Per-dof marginal variances diag(H^-1) at the current estimates —
    the pose/landmark uncertainty output (no reference counterpart; its
    solver never exposes covariance). Computed by selected inversion of
    the banded factorization, O(n * bw^2); falls back to a dense inverse
    when the RCM bandwidth is too large.

    ``robust``/``robust_delta``: pass the SAME kernel the graph was
    optimized with so outlier edges keep their IRLS down-weighting in the
    reported uncertainty."""
    from rustrobotics_tpu.ops.band_chol import (
        build_band_chol,
        marginal_covariances,
    )

    layout = build_layout(graph)
    dtype = graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype
    vals, _, _ = system_values(graph, jnp.asarray(0.0, dtype),
                               robust=robust, robust_delta=robust_delta)
    bl = build_band_chol(layout)
    if bl is not None:
        return marginal_covariances(bl, vals)
    h = solvers.dense_hessian(layout, vals)
    return jnp.diagonal(jnp.linalg.inv(h))


def pose_covariances(graph: PoseGraphData, robust: str | None = None,
                     robust_delta: float = 1.0):
    """(N2, 3, 3) marginal covariance blocks of the SE2 poses at the
    current estimates — the uncertainty-ellipse output. Banded path:
    selected inversion of the banded factor (see ops/band_chol). When the
    RCM bandwidth exceeds the banded limit, falls back to extracting the
    same blocks from a dense inverse (matching marginal_variances'
    fallback — never returns None)."""
    from rustrobotics_tpu.ops.band_chol import (
        build_band_chol,
        marginal_node_blocks,
    )

    layout = build_layout(graph)
    dtype = graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype
    vals, _, _ = system_values(graph, jnp.asarray(0.0, dtype),
                               robust=robust, robust_delta=robust_delta)
    offs = np.asarray(graph.pose2_offsets)
    bl = build_band_chol(layout)
    if bl is not None:
        sizes = np.full(len(offs), 3)
        return marginal_node_blocks(bl, vals, offs, sizes, pad_size=3)
    h = solvers.dense_hessian(layout, vals)
    hinv = jnp.linalg.inv(h)
    idx = jnp.asarray(offs)[:, None] + jnp.arange(3)[None, :]  # (N2, 3)
    return hinv[idx[:, :, None], idx[:, None, :]]
