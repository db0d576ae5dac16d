"""Scan-matching odometry + occupancy mapping pipeline.

Ties together two reference-Todo components (ICP, occupancy grid) into
the classic lidar-SLAM front end: consecutive range scans are aligned by
point-to-point ICP to produce odometry, poses compose along SE(2), and
every scan is fused into a log-odds occupancy grid at its estimated
pose. No reference counterpart at any level.

TPU shape: each ICP alignment is one jitted fori_loop program (MXU
correspondence matrix); the mapping pass is one lax.scan. The pipeline
is deliberately modular — swap the ICP pose for fixed-lag smoother or
PGO output to close loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rustrobotics_tpu.geometry import se2
from rustrobotics_tpu.mapping.icp import icp
from rustrobotics_tpu.mapping.occupancy import (
    OccupancyGrid,
    integrate_trajectory_jit,
)


def scan_to_points(ranges, angles, max_range):
    """Robot-frame (B, 2) points of a scan's valid returns; invalid
    beams (>= max_range or non-finite) collapse onto the origin with a
    False mask."""
    ok = jnp.isfinite(ranges) & (ranges < max_range)
    r = jnp.where(ok, ranges, 0.0)
    pts = jnp.stack([r * jnp.cos(angles), r * jnp.sin(angles)], -1)
    return pts, ok


def icp_odometry(scans, angles, max_range, num_iterations: int = 15,
                 reject_quantile=0.9):
    """Chain ICP alignments of consecutive scans into SE(2) poses.

    scans (T, B) ranges with shared beam angles (B,). Returns poses
    (T, 3) with pose[0] = identity. Each alignment maps scan t's points
    onto scan t-1's frame, i.e. the relative motion, composed left.
    """
    t_total = scans.shape[0]
    pts_all, ok_all = jax.vmap(
        lambda r: scan_to_points(r, angles, max_range))(scans)

    @jax.jit
    def align(src_pts, dst_pts):
        r, t, _ = icp(src_pts, dst_pts, num_iterations=num_iterations,
                      reject_quantile=reject_quantile)
        theta = jnp.arctan2(r[1, 0], r[0, 0])
        return jnp.stack([t[0], t[1], theta])

    poses = [jnp.zeros(3, scans.dtype)]
    for t in range(1, t_total):
        # masked-out beams sit at the origin on both sides; with the
        # outlier quantile they are trimmed from the alignment
        rel = align(pts_all[t], pts_all[t - 1])
        poses.append(se2.compose(poses[-1], rel))
    return jnp.stack(poses), pts_all, ok_all


def scan_matching_slam(scans, angles, max_range, grid_size=160,
                       resolution=0.25, origin=None,
                       samples_per_beam: int = 96):
    """Full front-end: ICP odometry + occupancy fusion.

    Returns (poses (T, 3), OccupancyGrid)."""
    poses, _, _ = icp_odometry(scans, angles, max_range)
    if origin is None:
        span = grid_size * resolution
        origin = (-span / 2, -span / 2)
    grid = OccupancyGrid.create(grid_size, grid_size, resolution,
                                origin=origin, dtype=scans.dtype)
    grid = integrate_trajectory_jit(grid, poses, scans, angles,
                                    max_range=max_range,
                                    samples_per_beam=samples_per_beam)
    return poses, grid


def _build_pose_graph(poses, odo_rels, closures, odo_omega, clos_omega,
                      dtype):
    """PoseGraphData from an odometry chain + ICP loop closures."""
    import numpy as np

    from rustrobotics_tpu.mapping.g2o import PoseGraphData

    t_total = poses.shape[0]
    pp_from = list(range(t_total - 1))
    pp_to = list(range(1, t_total))
    pp_z = [np.asarray(z) for z in odo_rels]
    pp_omega = [np.asarray(odo_omega)] * (t_total - 1)
    for (i, j, rel) in closures:
        pp_from.append(i)
        pp_to.append(j)
        pp_z.append(np.asarray(rel))
        pp_omega.append(np.asarray(clos_omega))

    def arr(x, dt=None):
        return jnp.asarray(np.asarray(x, dtype=dt or dtype))

    return PoseGraphData(
        poses2=arr(poses),
        landmarks2=arr(np.zeros((0, 2))),
        poses3=arr(np.zeros((0, 7))),
        pp_from=arr(pp_from, np.int32), pp_to=arr(pp_to, np.int32),
        pp_z=arr(np.stack(pp_z)),
        pp_omega=arr(np.stack(pp_omega)),
        pl_pose=arr([], np.int32), pl_lm=arr([], np.int32),
        pl_z=arr(np.zeros((0, 2))), pl_omega=arr(np.zeros((0, 2, 2))),
        qq_from=arr([], np.int32), qq_to=arr([], np.int32),
        qq_z=arr(np.zeros((0, 7))), qq_omega=arr(np.zeros((0, 6, 6))),
        pose2_offsets=arr(np.arange(t_total) * 3, np.int32),
        lm2_offsets=arr([], np.int32),
        pose3_offsets=arr([], np.int32),
        total_dof=int(t_total * 3), prior2=0, prior3=-1,
    )


def scan_matching_slam_pgo(scans, angles, max_range,
                           closure_gap: int = 6,
                           closure_radius: float = 1.0,
                           odo_sigma=(0.03, 0.03, 0.02),
                           clos_sigma=(0.02, 0.02, 0.015),
                           grid_size=160, resolution=0.25, origin=None,
                           samples_per_beam: int = 96,
                           num_iterations: int = 30,
                           passes: int = 2):
    """Full lidar SLAM: ICP odometry + ICP loop closures + pose-graph
    optimization + occupancy fusion at the OPTIMIZED poses.

    Loop-closure candidates are pose pairs (i, j) with j - i >
    ``closure_gap`` whose odometry estimates sit within
    ``closure_radius``; each candidate is verified/refined by ICP with
    the current relative estimate as the initialization (the target
    cloud is pre-transformed, so ICP only polishes the residual).
    The corrected graph is solved by the banded Gauss-Newton backend —
    the drift that pure odometry accumulates (point-to-point ICP slides
    along featureless walls) is pulled out by the closures.

    The detect-close-optimize cycle runs ``passes`` times: the first
    optimization improves the pose estimates, which lets the second pass
    find closures the drifted odometry could not (smaller search radius,
    better ICP initializations) — the standard iterative front-end/
    back-end loop.

    Returns (poses (T, 3), OccupancyGrid, PoseGraphData)."""
    import numpy as np

    from rustrobotics_tpu.mapping.pgo import optimize

    dtype = scans.dtype
    poses_odo, pts_all, _ = icp_odometry(scans, angles, max_range)
    t_total = scans.shape[0]
    odo_rels = [np.asarray(se2.relative(poses_odo[t - 1], poses_odo[t]))
                for t in range(1, t_total)]

    yaw_seeds = jnp.linspace(-0.9, 0.9, 7, dtype=dtype)

    @jax.jit
    def refine(src_pts, dst_pts, rel0):
        """MULTISTART ICP: by revisit time the odometry's angular drift
        can exceed ICP's convergence basin, so a fan of yaw-perturbed
        initializations runs as ONE vmapped batch (each a fori_loop
        program — the robust relocalization that a serial implementation
        couldn't afford) and the best-rmse hypothesis wins."""

        def try_yaw(dy):
            rel_init = rel0.at[2].add(dy)
            moved = se2.transform(rel_init, src_pts)
            r, t, rmse = icp(moved, dst_pts, num_iterations=15,
                             reject_quantile=0.9)
            theta = jnp.arctan2(r[1, 0], r[0, 0])
            return se2.compose(jnp.stack([t[0], t[1], theta]),
                               rel_init), rmse

        rels, rmses = jax.vmap(try_yaw)(yaw_seeds)
        best = jnp.argmin(rmses)
        return rels[best], rmses[best]

    odo_omega = np.diag(1.0 / np.square(np.asarray(odo_sigma)))
    clos_omega = np.diag(1.0 / np.square(np.asarray(clos_sigma)))
    cur = jnp.asarray(poses_odo)
    closures = {}
    res = None
    for _ in range(passes):
        poses_np = np.asarray(cur)
        for j in range(closure_gap, t_total):
            d = np.linalg.norm(poses_np[:j - closure_gap + 1, :2]
                               - poses_np[j, :2], axis=1)
            i = int(np.argmin(d))
            if d[i] < closure_radius:
                rel0 = se2.relative(cur[i], cur[j])
                rel, rmse = refine(pts_all[j], pts_all[i], rel0)
                if float(rmse) < 0.3:
                    closures[(i, j)] = np.asarray(rel)
        graph = _build_pose_graph(
            poses_np, odo_rels,
            [(i, j, r) for (i, j), r in closures.items()],
            odo_omega, clos_omega, dtype)
        # a loop closure against heavy angular drift is a large-residual
        # nonlinear fold: chordal initialization (rotation averaging)
        # puts the whole loop in the closure's basin before GN refines
        if closures:
            from rustrobotics_tpu.mapping.initialization import (
                chordal_init_se2,
            )

            graph = chordal_init_se2(graph)
        res = optimize(graph, num_iterations=num_iterations,
                       backend="banded-direct"
                       if graph.poses2.shape[0] > 64 else "dense")
        cur = jnp.asarray(res.graph.poses2, dtype)
    poses = cur

    if origin is None:
        span = grid_size * resolution
        origin = (-span / 2, -span / 2)
    grid = OccupancyGrid.create(grid_size, grid_size, resolution,
                                origin=origin, dtype=dtype)
    grid = integrate_trajectory_jit(grid, poses, scans, angles,
                                    max_range=max_range,
                                    samples_per_beam=samples_per_beam)
    return poses, grid, res.graph
