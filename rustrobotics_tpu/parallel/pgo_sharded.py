"""Distributed pose-graph optimization: edge-sharded Gauss-Newton over a
device mesh.

Design (SURVEY §2.3 / §5, scaling-book recipe): edges are partitioned
across the mesh axis; nodes (poses/landmarks) and the dx vector are
replicated. Each device linearizes its edge shard and produces local
normal-equation triplets; the RHS and every CG matrix-vector product reduce
with ``psum`` over ICI. This is the TPU-native replacement for the
reference's serial assembly + UMFPACK factorize-per-iteration
(pose_graph_optimization.rs:305-369,124-144): no global sparse factorization
exists anywhere — the solve is matrix-free PCG whose SpMV is an
edge-parallel gather/scatter.

Zero-padded edges (Ω = 0) contribute nothing, so shards can be padded to
equal size without masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from rustrobotics_tpu.mapping.assemble import PRIOR_WEIGHT, apply_update_jit
from rustrobotics_tpu.mapping.g2o import PoseGraphData
from rustrobotics_tpu.mapping.triplets import edge_triplets

_NODE_FIELDS = ("poses2", "landmarks2", "poses3",
                "pose2_offsets", "lm2_offsets", "pose3_offsets")
_EDGE_FIELDS = ("pp_from", "pp_to", "pp_z", "pp_omega",
                "pl_pose", "pl_lm", "pl_z", "pl_omega",
                "qq_from", "qq_to", "qq_z", "qq_omega")


def pad_edges_for_sharding(graph: PoseGraphData, num_shards: int) -> PoseGraphData:
    """Pad every edge family to a multiple of num_shards with zero-Ω edges
    (indices point at node 0; all contributions vanish)."""

    def pad_family(fields, count):
        out = {}
        for f in fields:
            arr = getattr(graph, f)
            if count:
                pad_width = [(0, count)] + [(0, 0)] * (arr.ndim - 1)
                arr = jnp.pad(arr, pad_width, constant_values=0)
            out[f] = arr
        return out

    updates = {}
    updates.update(pad_family(_EDGE_FIELDS[0:4], (-graph.pp_from.shape[0]) % num_shards))
    updates.update(pad_family(_EDGE_FIELDS[4:8], (-graph.pl_pose.shape[0]) % num_shards))
    updates.update(pad_family(_EDGE_FIELDS[8:12], (-graph.qq_from.shape[0]) % num_shards))
    return graph.replace(**updates)


def _block_maps(graph: PoseGraphData):
    """Host-side dof -> (node-block, within-block-position) maps and the
    identity padding for blocks narrower than 6 dof. Powers the block-Jacobi
    preconditioner (one padded 6x6 block per node, batched inversion)."""
    n = graph.total_dof
    dof_block = np.zeros(n, np.int32)
    dof_pos = np.zeros(n, np.int32)
    sizes = []
    bid = 0
    for offs, size in [
        (np.asarray(graph.pose2_offsets), 3),
        (np.asarray(graph.lm2_offsets), 2),
        (np.asarray(graph.pose3_offsets), 6),
    ]:
        for o in offs:
            dof_block[o:o + size] = bid
            dof_pos[o:o + size] = np.arange(size)
            sizes.append(size)
            bid += 1
    pad_eye = np.zeros((max(bid, 1), 6, 6))
    for k, s in enumerate(sizes):
        for i in range(s, 6):
            pad_eye[k, i, i] = 1.0
    return dof_block, dof_pos, pad_eye, max(bid, 1)


def make_distributed_step_fns(
    mesh,
    graph_template: PoseGraphData,
    prior_weight: float = PRIOR_WEIGHT,
    cg_tol: float = 1e-10,
    cg_maxiter: int | None = None,
):
    """Build jitted shard_map kernels for graphs of this (padded) shape.

    Returns (solve, error):
    - ``solve(graph, lam) -> (dx, chi2)``: psum-reduced PCG solve of
      (H + λI + prior) dx = -b plus the current χ².
    - ``error(graph) -> chi2``: psum-reduced global error.
    """
    axis = mesh.axis_names[0]
    dtype = (
        graph_template.poses2.dtype
        if graph_template.poses2.size
        else graph_template.poses3.dtype
    )
    n = graph_template.total_dof
    prior2 = graph_template.prior2
    prior3 = graph_template.prior3
    maxiter = cg_maxiter if cg_maxiter is not None else 2 * n
    dof_block_np, dof_pos_np, pad_eye_np, n_blocks = _block_maps(graph_template)
    dof_block = jnp.asarray(dof_block_np)
    dof_pos = jnp.asarray(dof_pos_np)
    pad_eye = jnp.asarray(pad_eye_np, dtype=dtype)

    node_specs = tuple(P() for _ in _NODE_FIELDS)
    edge_specs = tuple(P(axis) for _ in _EDGE_FIELDS)

    def local_triplets(nodes, edges):
        (poses2, landmarks2, poses3, p2off, l2off, p3off) = nodes
        return edge_triplets(
            poses2, landmarks2, poses3, p2off, l2off, p3off, *edges, n
        )

    def extra_diag(nodes, lam):
        """Replicated diagonal additions: λ on every dof (rs:362-366) +
        gauge prior (rs:330-336)."""
        diag = jnp.full(n, lam, dtype=dtype)
        if prior2 >= 0:
            off = nodes[3][prior2]  # pose2_offsets
            diag = diag.at[off + jnp.arange(3)].add(prior_weight)
        elif prior3 >= 0:
            off = nodes[5][prior3]  # pose3_offsets
            diag = diag.at[off + jnp.arange(6)].add(prior_weight)
        return diag

    @partial(
        shard_map, mesh=mesh,
        in_specs=(node_specs, edge_specs, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def solve_kernel(nodes, edges, lam):
        rows, cols, vals, b_local, chi2_local = local_triplets(nodes, edges)
        b = jax.lax.psum(b_local, axis)
        chi2 = jax.lax.psum(chi2_local, axis)
        extra = extra_diag(nodes, lam)

        # block-Jacobi preconditioner: per-node diagonal blocks of H,
        # psum-assembled, identity-padded to 6x6, batched-inverted
        br, bc = dof_block[rows], dof_block[cols]
        on_block = br == bc
        blocks_local = jnp.zeros((n_blocks, 6, 6), dtype=dtype).at[
            br, dof_pos[rows], dof_pos[cols]
        ].add(jnp.where(on_block, vals, 0.0))
        blocks = jax.lax.psum(blocks_local, axis) + pad_eye
        blocks = blocks.at[dof_block, dof_pos, dof_pos].add(extra)
        binv = jnp.linalg.inv(blocks)

        def precond(r):
            rb = jnp.zeros((n_blocks, 6), dtype=dtype).at[dof_block, dof_pos].set(r)
            yb = jnp.einsum("kij,kj->ki", binv, rb)
            return yb[dof_block, dof_pos]

        def matvec(x):
            y_local = jnp.zeros(n, dtype=dtype).at[rows].add(vals * x[cols])
            return jax.lax.psum(y_local, axis) + extra * x

        dx, _ = jax.scipy.sparse.linalg.cg(
            matvec, -b, tol=cg_tol, maxiter=maxiter, M=precond
        )
        return dx, chi2

    @partial(
        shard_map, mesh=mesh,
        in_specs=(node_specs, edge_specs),
        out_specs=P(),
        check_vma=False,
    )
    def error_kernel(nodes, edges):
        *_, chi2_local = local_triplets(nodes, edges)
        return jax.lax.psum(chi2_local, axis)

    def split(graph):
        return (
            tuple(getattr(graph, f) for f in _NODE_FIELDS),
            tuple(getattr(graph, f) for f in _EDGE_FIELDS),
        )

    @jax.jit
    def solve(graph, lam):
        nodes, edges = split(graph)
        return solve_kernel(nodes, edges, lam)

    @jax.jit
    def error(graph):
        nodes, edges = split(graph)
        return error_kernel(nodes, edges)

    return solve, error


def distributed_gn_step(mesh, graph, lam=0.0, **kw):
    """One-off convenience wrapper: (dx, chi2) for one GN iteration."""
    graph = pad_edges_for_sharding(graph, mesh.devices.size)
    solve, _ = make_distributed_step_fns(mesh, graph, **kw)
    dtype = graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype
    return solve(graph, jnp.asarray(lam, dtype))


def distributed_global_error(mesh, graph):
    graph = pad_edges_for_sharding(graph, mesh.devices.size)
    _, error = make_distributed_step_fns(mesh, graph)
    return error(graph)


def distributed_optimize(
    mesh,
    graph: PoseGraphData,
    num_iterations: int = 50,
    solver: str = "gauss_newton",
    tolerance: float = 1e-4,
    prior_weight: float = PRIOR_WEIGHT,
    cg_tol: float = 1e-10,
    log: bool = False,
):
    """Host-driven distributed GN/LM loop (reference semantics, rs:247-303,
    with assembly + solve sharded over the mesh)."""
    graph = pad_edges_for_sharding(graph, mesh.devices.size)
    solve, error_fn = make_distributed_step_fns(
        mesh, graph, prior_weight=prior_weight, cg_tol=cg_tol
    )
    dtype = graph.poses2.dtype if graph.poses2.size else graph.poses3.dtype
    lm = solver in ("lm", "levenberg_marquardt")
    lam = 0.01
    last_error = float(error_fn(graph))
    errors = [last_error]
    norms = []
    it = 0
    for it in range(1, num_iterations + 1):
        dx, _ = solve(graph, jnp.asarray(lam if lm else 0.0, dtype))
        new_graph = apply_update_jit(graph, dx)
        norm_dx = float(jnp.linalg.norm(dx))
        error = float(error_fn(new_graph))
        if lm and last_error < error:
            lam *= 2.0  # reject: keep old graph (rs:275-282)
        else:
            graph = new_graph
            if lm:
                lam /= 2.0
        last_error = error
        errors.append(error)
        norms.append(norm_dx)
        if log:
            print(f"step {it:3} : |dx| = {norm_dx:3.5f}, error = {error:3.5f}")
        if norm_dx < tolerance:
            break
    return graph, errors, norms
