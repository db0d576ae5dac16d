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
