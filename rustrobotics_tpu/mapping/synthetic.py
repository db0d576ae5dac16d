"""Synthetic pose-graph generator (no dataset dependency).

Builds Manhattan/circle-style 2D or 3D pose graphs with odometry chains,
loop closures, and optional landmark observations — used by the driver
entry points, benchmarks, and sharding tests so nothing depends on the
bundled g2o files being mounted.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rustrobotics_tpu.mapping.g2o import PoseGraphData


def _se2_np(x):
    return np.asarray(x, dtype=np.float64)


def synthetic_pose_graph_2d(
    num_poses: int = 64,
    num_landmarks: int = 8,
    noise: float = 0.05,
    seed: int = 0,
    dtype=np.float64,
) -> PoseGraphData:
    """Circle trajectory with odometry edges, k loop closures, and
    landmark range observations; initial guess perturbed by ``noise``."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 2.0 * np.pi, num_poses, endpoint=False)
    radius = 5.0
    gt = np.stack(
        [radius * np.cos(t), radius * np.sin(t), t + np.pi / 2.0], axis=-1
    )
    gt[:, 2] = (gt[:, 2] + np.pi) % (2 * np.pi) - np.pi

    def rel(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        rt = np.array([[c, s], [-s, c]])
        d = rt @ (b[:2] - a[:2])
        th = (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi
        return np.array([d[0], d[1], th])

    pp_from, pp_to, pp_z, pp_omega = [], [], [], []
    omega = np.diag([100.0, 100.0, 400.0])
    for i in range(num_poses - 1):
        pp_from.append(i)
        pp_to.append(i + 1)
        pp_z.append(rel(gt[i], gt[i + 1]))
        pp_omega.append(omega)
    # loop closures every num_poses//8 steps back to the opposite side
    stride = max(num_poses // 8, 2)
    for i in range(0, num_poses, stride):
        j = (i + num_poses // 2) % num_poses
        pp_from.append(i)
        pp_to.append(j)
        pp_z.append(rel(gt[i], gt[j]))
        pp_omega.append(omega)

    # landmarks on an inner circle with pose->landmark edges
    lm_gt = np.stack(
        [
            2.5 * np.cos(np.linspace(0, 2 * np.pi, max(num_landmarks, 1),
                                     endpoint=False)),
            2.5 * np.sin(np.linspace(0, 2 * np.pi, max(num_landmarks, 1),
                                     endpoint=False)),
        ],
        axis=-1,
    )[:num_landmarks]
    pl_pose, pl_lm, pl_z, pl_omega = [], [], [], []
    om2 = np.diag([50.0, 50.0])
    for i in range(0, num_poses, max(num_poses // 16, 1)):
        for k in range(num_landmarks):
            c, s = np.cos(gt[i, 2]), np.sin(gt[i, 2])
            rt = np.array([[c, s], [-s, c]])
            pl_pose.append(i)
            pl_lm.append(k)
            pl_z.append(rt @ (lm_gt[k] - gt[i, :2]))
            pl_omega.append(om2)

    # noisy initial guess (first pose exact: it carries the gauge prior)
    init = gt + rng.normal(scale=noise, size=gt.shape)
    init[0] = gt[0]
    lm_init = lm_gt + rng.normal(scale=noise, size=lm_gt.shape) \
        if num_landmarks else np.zeros((0, 2))

    # reference dof layout: poses first, then landmarks (file order)
    pose_offsets = np.arange(num_poses) * 3
    lm_offsets = num_poses * 3 + np.arange(num_landmarks) * 2
    total_dof = int(num_poses * 3 + num_landmarks * 2)

    def arr(x, dt=dtype):
        return jnp.asarray(np.asarray(x, dtype=dt))

    return PoseGraphData(
        poses2=arr(init),
        landmarks2=arr(lm_init.reshape(-1, 2)),
        poses3=arr(np.zeros((0, 7))),
        pp_from=arr(pp_from, np.int32),
        pp_to=arr(pp_to, np.int32),
        pp_z=arr(np.asarray(pp_z).reshape(-1, 3)),
        pp_omega=arr(np.asarray(pp_omega).reshape(-1, 3, 3)),
        pl_pose=arr(pl_pose, np.int32),
        pl_lm=arr(pl_lm, np.int32),
        pl_z=arr(np.asarray(pl_z).reshape(-1, 2) if pl_z else np.zeros((0, 2))),
        pl_omega=arr(
            np.asarray(pl_omega).reshape(-1, 2, 2) if pl_omega else np.zeros((0, 2, 2))
        ),
        qq_from=arr([], np.int32),
        qq_to=arr([], np.int32),
        qq_z=arr(np.zeros((0, 7))),
        qq_omega=arr(np.zeros((0, 6, 6))),
        pose2_offsets=arr(pose_offsets, np.int32),
        lm2_offsets=arr(lm_offsets, np.int32),
        pose3_offsets=arr([], np.int32),
        total_dof=total_dof,
        prior2=0,
        prior3=-1,
    )


def synthetic_corridor_graph_2d(
    num_poses: int = 1024,
    num_landmarks: int = 0,
    closure_stride: int = 16,
    closure_span: int = 64,
    noise: float = 0.05,
    seed: int = 0,
    dtype=np.float64,
) -> PoseGraphData:
    """Corridor-style trajectory with LOCAL loop closures only: every
    ``closure_stride`` poses, a closure to ``closure_span`` poses back.
    Landmarks (if any) sit along the corridor and are each observed by a
    bounded window of nearby poses. The resulting graph has O(span) RCM
    bandwidth regardless of length — the regime where map-block
    domain decomposition (parallel.pgo_blocks) scales with bounded
    separator communication. This is the large-n scaling benchmark graph
    (the bundled g2o files top out at 11k dof)."""
    rng = np.random.default_rng(seed)
    # wavy corridor ground truth
    s = np.arange(num_poses) * 0.5
    gt = np.stack(
        [s, 2.0 * np.sin(s * 0.05), 0.1 * np.cos(s * 0.05)], axis=-1
    )

    def rel(a, b):
        c, sn = np.cos(a[2]), np.sin(a[2])
        rt = np.array([[c, sn], [-sn, c]])
        d = rt @ (b[:2] - a[:2])
        th = (b[2] - a[2] + np.pi) % (2 * np.pi) - np.pi
        return np.array([d[0], d[1], th])

    pp_from, pp_to, pp_z, pp_omega = [], [], [], []
    omega = np.diag([100.0, 100.0, 400.0])
    for i in range(num_poses - 1):
        pp_from.append(i)
        pp_to.append(i + 1)
        pp_z.append(rel(gt[i], gt[i + 1]))
        pp_omega.append(omega)
    for i in range(closure_span, num_poses, closure_stride):
        j = i - closure_span
        pp_from.append(j)
        pp_to.append(i)
        pp_z.append(rel(gt[j], gt[i]))
        pp_omega.append(omega)

    # landmarks along the corridor, observed by a +-span/2 pose window
    pl_pose, pl_lm, pl_z, pl_omega = [], [], [], []
    om2 = np.diag([50.0, 50.0])
    if num_landmarks:
        anchor = np.linspace(0, num_poses - 1, num_landmarks).astype(int)
        lm_gt = gt[anchor, :2] + np.array([0.0, 1.5])
        for k in range(num_landmarks):
            w = closure_span // 2
            for i in range(max(0, anchor[k] - w),
                           min(num_poses, anchor[k] + w), 8):
                c, sn = np.cos(gt[i, 2]), np.sin(gt[i, 2])
                rt = np.array([[c, sn], [-sn, c]])
                pl_pose.append(i)
                pl_lm.append(k)
                pl_z.append(rt @ (lm_gt[k] - gt[i, :2]))
                pl_omega.append(om2)
    else:
        lm_gt = np.zeros((0, 2))

    init = gt + rng.normal(scale=noise, size=gt.shape)
    init[0] = gt[0]
    lm_init = (lm_gt + rng.normal(scale=noise, size=lm_gt.shape)
               if num_landmarks else np.zeros((0, 2)))

    pose_offsets = np.arange(num_poses) * 3
    lm_offsets = num_poses * 3 + np.arange(num_landmarks) * 2

    def arr(x, dt=dtype):
        return jnp.asarray(np.asarray(x, dtype=dt))

    return PoseGraphData(
        poses2=arr(init),
        landmarks2=arr(lm_init.reshape(-1, 2)),
        poses3=arr(np.zeros((0, 7))),
        pp_from=arr(pp_from, np.int32),
        pp_to=arr(pp_to, np.int32),
        pp_z=arr(np.asarray(pp_z).reshape(-1, 3)),
        pp_omega=arr(np.asarray(pp_omega).reshape(-1, 3, 3)),
        pl_pose=arr(pl_pose, np.int32),
        pl_lm=arr(pl_lm, np.int32),
        pl_z=arr(np.asarray(pl_z).reshape(-1, 2) if pl_z else np.zeros((0, 2))),
        pl_omega=arr(np.asarray(pl_omega).reshape(-1, 2, 2)
                     if pl_omega else np.zeros((0, 2, 2))),
        qq_from=arr([], np.int32),
        qq_to=arr([], np.int32),
        qq_z=arr(np.zeros((0, 7))),
        qq_omega=arr(np.zeros((0, 6, 6))),
        pose2_offsets=arr(pose_offsets, np.int32),
        lm2_offsets=arr(lm_offsets, np.int32),
        pose3_offsets=arr([], np.int32),
        total_dof=int(num_poses * 3 + num_landmarks * 2),
        prior2=0,
        prior3=-1,
    )
