"""Tests for the round-2 reference-Todo components: information filter,
FastSLAM 2.0, ICP, occupancy grid, histogram filter, LQG.

Every one of these is on the reference's README Todo list (README.md:45-68)
and absent from its implementation — the oracles here are mathematical
(duality, golden transforms, synthetic ground truth) rather than
reference-derived.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rustrobotics_tpu.utils.state import GaussianState


# ------------------------------------------------------------------ EIF

def _sim_filter_inputs(steps=100, seed=0):
    from rustrobotics_tpu.models import (
        SimpleProblemMeasurementModel,
        SimpleProblemMotionModel,
    )

    rng = np.random.default_rng(seed)
    u = jnp.asarray([1.0, 0.1])
    zs = jnp.asarray(rng.normal(size=(steps, 2)) * 0.3)
    return (SimpleProblemMotionModel.create(),
            SimpleProblemMeasurementModel.create(), u, zs)


def test_eif_matches_ekf_trajectory():
    """Information-form duality: EIF == EKF to numerical precision."""
    from rustrobotics_tpu.localization.eif import (
        ExtendedInformationFilter,
        InformationState,
    )
    from rustrobotics_tpu.localization import ExtendedKalmanFilter

    motion, meas, u, zs = _sim_filter_inputs()
    r = jnp.diag(jnp.asarray([0.1, 0.1, 0.01, 0.5])) ** 2
    q = jnp.eye(2) * 0.25
    ekf = ExtendedKalmanFilter(r=r, q=q, motion_model=motion,
                               measurement_model=meas)
    eif = ExtendedInformationFilter(r=r, q=q, motion_model=motion,
                                    measurement_model=meas)

    ks = GaussianState(x=jnp.zeros(4), cov=jnp.eye(4))
    is_ = InformationState.from_moments(ks)
    for z in zs[:40]:
        ks = ekf.step(ks, u, z, 0.1)
        is_ = eif.step(is_, u, z, 0.1)
    ms = is_.to_moments()
    np.testing.assert_allclose(np.asarray(ms.x), np.asarray(ks.x),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ms.cov), np.asarray(ks.cov),
                               rtol=1e-6, atol=1e-10)


@pytest.mark.slow
def test_eif_kc_localizes_with_landmarks():
    """EIF-KC converges on the landmark replay (batched additive
    updates), close to the sequential EKF-KC posterior."""
    from rustrobotics_tpu.localization import (
        ExtendedKalmanFilterKnownCorrespondences,
    )
    from rustrobotics_tpu.localization.eif import (
        ExtendedInformationFilterKnownCorrespondences,
        InformationState,
    )
    from rustrobotics_tpu.localization.landmark_table import LandmarkTable
    from rustrobotics_tpu.models import (
        RangeBearingMeasurementModel,
        VelocityMotionModel,
    )

    rng = np.random.default_rng(1)
    lms = np.array([[2.0, 1.0], [-1.0, 3.0], [0.5, -2.0], [3.0, -1.0]])
    table = LandmarkTable.create(
        ids=jnp.arange(4, dtype=jnp.int32),
        positions=jnp.asarray(np.concatenate([lms, np.zeros((4, 1))], 1)),
    )
    motion = VelocityMotionModel.create(
        jnp.asarray([0.05, 0.01, 0.02, 0.01]))
    meas = RangeBearingMeasurementModel()
    q = jnp.diag(jnp.asarray([0.1, 0.05])) ** 2
    kwargs = dict(q=q, landmarks=table, motion_model=motion,
                  measurement_model=meas)
    ekf = ExtendedKalmanFilterKnownCorrespondences(**kwargs)
    eif = ExtendedInformationFilterKnownCorrespondences(**kwargs)

    # simulate a short arc with range-bearing sightings
    pose = np.zeros(3)
    u = jnp.asarray([0.7, 0.25])
    dt = 0.1
    ks = GaussianState(x=jnp.zeros(3), cov=jnp.eye(3) * 0.01)
    is_ = InformationState.from_moments(ks)
    for t in range(80):
        th = pose[2]
        pose = pose + np.array([0.7 * dt * np.cos(th),
                                0.7 * dt * np.sin(th), 0.25 * dt])
        d = lms - pose[:2]
        rngs = np.linalg.norm(d, axis=1) + rng.normal(size=4) * 0.1
        bears = (np.arctan2(d[:, 1], d[:, 0]) - pose[2]
                 + rng.normal(size=4) * 0.05)
        ids = jnp.arange(4, dtype=jnp.int32)
        z = jnp.asarray(np.stack([rngs, bears], -1))
        mask = jnp.ones(4, bool)
        ks = ekf.step(ks, u, True, ids, z, mask, dt)
        is_ = eif.step(is_, u, True, ids, z, mask, dt)

    err_ekf = np.linalg.norm(np.asarray(ks.x[:2]) - pose[:2])
    err_eif = np.linalg.norm(np.asarray(is_.x[:2]) - pose[:2])
    assert err_eif < 0.3, err_eif
    # both filters track; the EIF's batched relinearization differs from
    # the EKF's sequential refinement only slightly
    assert abs(err_eif - err_ekf) < 0.15, (err_eif, err_ekf)


# ----------------------------------------------------------- FastSLAM 2

def _fastslam_sim(steps=220, num_landmarks=6, seed=0,
                  unoise=(0.2, 0.12), vis_r=9.0):
    """Measurement-rich loop with NOISY controls: landmarks sit on the
    robot's v/omega circle, so several are always visible — the regime
    where FastSLAM 2.0's measurement-driven proposal beats 1.0's
    motion-model proposal at small particle counts."""
    rng = np.random.default_rng(seed)
    lms = np.stack([
        5.6 * np.cos(np.linspace(0, 2 * np.pi, num_landmarks,
                                 endpoint=False)),
        5.6 * np.sin(np.linspace(0, 2 * np.pi, num_landmarks,
                                 endpoint=False)),
    ], -1) + np.array([0.0, 5.6])
    dt = 0.1
    pose = np.zeros(3)
    events = []
    for t in range(steps):
        u = np.array([1.0, 0.18])
        noisy_u = u + rng.normal(size=2) * unoise
        th = pose[2]
        pose = np.array([
            pose[0] + noisy_u[0] * dt * np.cos(th),
            pose[1] + noisy_u[0] * dt * np.sin(th),
            pose[2] + noisy_u[1] * dt,
        ])
        d = lms - pose[:2]
        rngs = np.linalg.norm(d, axis=1)
        vis = rngs < vis_r
        z = np.stack([
            rngs + rng.normal(size=len(lms)) * 0.08,
            np.arctan2(d[:, 1], d[:, 0]) - pose[2]
            + rng.normal(size=len(lms)) * 0.04,
        ], -1)
        events.append((u, np.arange(len(lms)), z, vis, pose.copy()))
    return lms, events, dt


@pytest.mark.slow
def test_fastslam2_tracks_with_few_particles():
    """FastSLAM 2.0's measurement-driven proposal keeps a SMALL cloud on
    track where the same-size 1.0 cloud (motion-model proposal) drifts —
    the defining property of 2.0 (Prob.Robotics ch. 13.4)."""
    from rustrobotics_tpu.mapping.fastslam import (
        FastSlam,
        fastslam2_step,
    )
    from rustrobotics_tpu.models import VelocityMotionModel

    lms, events, dt = _fastslam_sim()
    slam = FastSlam.create(
        q=jnp.diag(jnp.asarray([0.08, 0.04])) ** 2,
        # 6 alphas: the last two drive the gamma heading diffusion that
        # pose_noise_cov must reproduce in the 2.0 proposal
        motion_model=VelocityMotionModel.create(
            jnp.asarray([0.04, 0.02, 0.015, 0.008, 0.008, 0.004])),
        max_landmarks=len(lms),
    )
    n = 12  # deliberately tiny cloud

    def run(step_fn):
        step = jax.jit(step_fn)  # compile ONCE; replay the event stream
        parts = slam.init_particles(jax.random.key(0), jnp.zeros(3), n)
        errs = []
        for i, (u, ids, z, vis, pose_true) in enumerate(events):
            parts = step(
                jax.random.fold_in(jax.random.key(1), i), parts,
                jnp.asarray(u), jnp.asarray(ids, jnp.int32),
                jnp.asarray(z), jnp.asarray(vis))
            est, _, _ = slam.estimate(parts)
            errs.append(np.linalg.norm(np.asarray(est[:2])
                                       - pose_true[:2]))
        return np.asarray(errs)

    err2 = run(lambda k, p, u, ids, z, m: fastslam2_step(
        slam, k, p, u, True, ids, z, m, dt))
    err1 = run(lambda k, p, u, ids, z, m: slam.step(
        k, p, u, True, ids, z, m, dt))

    # 2.0 stays accurate with 12 particles (measured 0.18 m)...
    assert err2[-40:].mean() < 0.35, err2[-40:].mean()
    # ...and clearly beats 1.0 at this budget (measured 0.42 m)
    assert err2[-40:].mean() <= err1[-40:].mean() * 0.8, (
        err2[-40:].mean(), err1[-40:].mean())


# ------------------------------------------------------------------ ICP

def test_icp_recovers_known_transform():
    from rustrobotics_tpu.geometry import se2
    from rustrobotics_tpu.mapping.icp import icp_se2

    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, size=(400, 2))
    true = np.array([0.4, -0.25, 0.18])
    c, s = np.cos(true[2]), np.sin(true[2])
    dst = pts @ np.array([[c, -s], [s, c]]).T + true[:2] \
        + rng.normal(size=pts.shape) * 0.005
    pose, rmse = icp_se2(jnp.asarray(pts), jnp.asarray(dst),
                         num_iterations=30)
    np.testing.assert_allclose(np.asarray(pose), true, atol=0.02)
    assert float(rmse) < 0.02
    # alignment composes consistently with the SE2 helpers
    aligned = np.asarray(se2.transform(jnp.asarray(pose), jnp.asarray(pts)))
    assert np.abs(aligned - dst).max() < 0.05


def test_icp_with_outliers():
    from rustrobotics_tpu.mapping.icp import icp_se2

    rng = np.random.default_rng(1)
    pts = rng.uniform(-3, 3, size=(300, 2))
    true = np.array([0.2, 0.1, -0.12])
    c, s = np.cos(true[2]), np.sin(true[2])
    dst = pts @ np.array([[c, -s], [s, c]]).T + true[:2]
    # 10% gross outliers in the target
    dst[::10] += rng.uniform(3, 6, size=dst[::10].shape)
    pose, _ = icp_se2(jnp.asarray(pts), jnp.asarray(dst),
                      num_iterations=30, reject_quantile=0.85)
    np.testing.assert_allclose(np.asarray(pose), true, atol=0.05)


# ------------------------------------------------------- occupancy grid

def test_occupancy_grid_maps_square_room():
    from rustrobotics_tpu.mapping.occupancy import (
        OccupancyGrid,
        integrate_trajectory_jit,
    )

    # robot in the middle of a 8x8 m room, walls at +-4 m, 360deg scans
    grid = OccupancyGrid.create(100, 100, 0.1, origin=(-5.0, -5.0))
    angles = jnp.linspace(-jnp.pi, jnp.pi, 180, endpoint=False)
    poses = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.5, 0.3],
                         [-1.0, -0.5, 2.0]])

    def room_range(pose, ang):
        # distance to the square-room walls from pose along angle
        th = pose[2] + ang
        dx, dy = jnp.cos(th), jnp.sin(th)
        tx = jnp.where(dx > 0, (4.0 - pose[0]) / dx,
                       jnp.where(dx < 0, (-4.0 - pose[0]) / dx, jnp.inf))
        ty = jnp.where(dy > 0, (4.0 - pose[1]) / dy,
                       jnp.where(dy < 0, (-4.0 - pose[1]) / dy, jnp.inf))
        return jnp.minimum(tx, ty)

    ranges = jax.vmap(
        lambda p: jax.vmap(lambda a: room_range(p, a))(angles))(poses)
    grid = integrate_trajectory_jit(grid, poses, ranges, angles,
                                    max_range=12.0, samples_per_beam=128)
    prob = np.asarray(grid.probability)
    # interior free, walls occupied
    assert prob[40:60, 40:60].max() < 0.2, prob[40:60, 40:60].max()
    wall_band = prob[9:12, 20:80]  # y = -4 wall (row ~10)
    assert wall_band.max() > 0.9, wall_band.max()


# --------------------------------------------------- scan-matching SLAM

@pytest.mark.slow
def test_scan_matching_pipeline():
    """ICP odometry + occupancy fusion on a simulated square room:
    recovered trajectory tracks ground truth and the fused map shows
    free interior / occupied walls."""
    from rustrobotics_tpu.mapping.scan_matching import scan_matching_slam

    angles = jnp.linspace(-jnp.pi, jnp.pi, 240, endpoint=False)

    def room_range(pose, ang):
        th = pose[2] + ang
        dx, dy = jnp.cos(th), jnp.sin(th)
        tx = jnp.where(dx > 0, (6.0 - pose[0]) / dx,
                       jnp.where(dx < 0, (-6.0 - pose[0]) / dx, jnp.inf))
        ty = jnp.where(dy > 0, (6.0 - pose[1]) / dy,
                       jnp.where(dy < 0, (-6.0 - pose[1]) / dy, jnp.inf))
        return jnp.minimum(tx, ty)

    # ground-truth arc inside the room
    steps = 12
    gt = []
    p = np.zeros(3)
    for t in range(steps):
        gt.append(p.copy())
        p = p + np.array([0.3 * np.cos(p[2]), 0.3 * np.sin(p[2]), 0.12])
    gt = jnp.asarray(np.stack(gt))
    scans = jax.vmap(
        lambda po: jax.vmap(lambda a: room_range(po, a))(angles))(gt)

    poses, grid = scan_matching_slam(scans, angles, max_range=20.0,
                                     grid_size=120, resolution=0.2)
    err = np.linalg.norm(np.asarray(poses[:, :2]) - np.asarray(gt[:, :2]),
                         axis=1)
    # point-to-point ICP on flat walls slides tangentially (~3 cm/step
    # bias is inherent); the trajectory covers ~3.3 m, so sub-0.5 m drift
    # still demonstrates real odometry (swap in the PGO backend to close
    # the gap in a full system)
    assert err.max() < 0.5, err.max()
    assert err[1] < 0.1, err[1]  # single-step alignment is accurate
    prob = np.asarray(grid.probability)
    assert prob[55:65, 55:65].max() < 0.25       # interior free
    # y = -6 wall sits at row (-6 - (-12)) / 0.2 = 30 (pose drift smears
    # it across a couple of cells)
    assert prob[27:34, 40:80].max() > 0.7


@pytest.mark.slow
def test_scan_matching_loop_closure_pgo():
    """Closing the loop: on a trajectory that returns to its start, ICP
    loop closures + pose-graph optimization cut the accumulated
    odometry drift."""
    from rustrobotics_tpu.mapping.scan_matching import (
        icp_odometry,
        scan_matching_slam_pgo,
    )

    angles = jnp.linspace(-jnp.pi, jnp.pi, 240, endpoint=False)

    # square room + two pillars: a bare square has 4-fold rotational
    # symmetry, so scan alignment admits perfect impostor matches at
    # 90-degree offsets — the pillars break the symmetry (as real
    # environments do)
    pillars = jnp.asarray([[3.0, -2.0, 0.8], [-2.5, 3.5, 0.5]])

    def room_range(pose, ang):
        th = pose[2] + ang
        dx, dy = jnp.cos(th), jnp.sin(th)
        tx = jnp.where(dx > 0, (6.0 - pose[0]) / dx,
                       jnp.where(dx < 0, (-6.0 - pose[0]) / dx, jnp.inf))
        ty = jnp.where(dy > 0, (6.0 - pose[1]) / dy,
                       jnp.where(dy < 0, (-6.0 - pose[1]) / dy, jnp.inf))
        r_wall = jnp.minimum(tx, ty)

        def pillar_hit(p):
            cx, cy, rad = p[0], p[1], p[2]
            ox, oy = pose[0] - cx, pose[1] - cy
            b = ox * dx + oy * dy
            disc = b * b - (ox * ox + oy * oy - rad * rad)
            t_hit = -b - jnp.sqrt(jnp.clip(disc, 0.0, None))
            ok = (disc > 0) & (t_hit > 0)
            return jnp.where(ok, t_hit, jnp.inf)

        return jnp.minimum(r_wall, jnp.min(jax.vmap(pillar_hit)(pillars)))

    # full circle (returns to start): 36 steps around radius 2
    steps = 36
    ts = np.linspace(0, 2 * np.pi, steps, endpoint=False)
    gt = np.stack([2.0 * np.cos(ts), 2.0 * np.sin(ts),
                   (ts + np.pi / 2 + np.pi) % (2 * np.pi) - np.pi], -1)
    gt = jnp.asarray(gt)
    scans = jax.vmap(
        lambda po: jax.vmap(lambda a: room_range(po, a))(angles))(gt)

    from rustrobotics_tpu.geometry import se2

    poses_odo, _, _ = icp_odometry(scans, angles, max_range=20.0)
    true_rel = np.asarray(se2.relative(gt[0], gt[-1]))
    odo_rel = np.asarray(se2.relative(poses_odo[0], poses_odo[-1]))
    gap_odo = np.linalg.norm(odo_rel[:2] - true_rel[:2])
    assert gap_odo > 1.0, gap_odo  # odometry alone leaves the loop open

    # the candidate radius must exceed the accumulated odometry drift
    # at revisit time (~1 m here); the ICP-rmse gate rejects impostors
    poses, grid, graph = scan_matching_slam_pgo(
        scans, angles, max_range=20.0, closure_gap=8,
        closure_radius=2.0, grid_size=120, resolution=0.2)
    assert graph.pp_from.shape[0] > steps - 1  # closures were added

    # What loop closure CAN fix is internal consistency: the start->end
    # relative pose (3.9 m open with raw odometry) closes to centimeters.
    # Absolute drift vs ground truth is unobservable beyond the pose-0
    # gauge — the self-consistent map stays slightly warped by the
    # odometry's systematic bias, so we only require it not to worsen.
    est_rel = np.asarray(se2.relative(poses[0], poses[-1]))
    gap = np.linalg.norm(est_rel[:2] - true_rel[:2])
    assert gap < 0.1, gap
    drift_odo = np.linalg.norm(
        np.asarray(poses_odo[:, :2]) - np.asarray(gt[:, :2]), axis=1)
    drift = np.linalg.norm(
        np.asarray(poses[:, :2]) - np.asarray(gt[:, :2]), axis=1)
    assert drift.mean() <= drift_odo.mean() * 1.05


# ------------------------------------------------------ histogram filter

def test_histogram_filter_localizes_from_uniform():
    """Kidnapped-robot start (uniform belief) concentrates on the true
    pose after a few landmark sightings — the multimodal capability the
    Gaussian filters lack."""
    from rustrobotics_tpu.localization.histogram import HistogramFilter

    lms = jnp.asarray([[2.0, 2.0], [-2.0, 1.0], [0.0, -2.0]])
    hf = HistogramFilter.create(
        landmarks=lms, q=jnp.diag(jnp.asarray([0.15, 0.08])) ** 2,
        motion_sigma=(0.08, 0.08, 0.06),
    )
    g = hf.init_uniform((40, 40, 24), -4.0, -4.0, 0.2, 0.2)

    rng = np.random.default_rng(0)
    pose = np.array([0.5, -0.5, 0.4])
    u = jnp.asarray([0.6, 0.2])
    dt = 0.1
    step = jax.jit(hf.step)
    for t in range(30):
        th = pose[2]
        pose = pose + np.array([0.6 * dt * np.cos(th),
                                0.6 * dt * np.sin(th), 0.2 * dt])
        d = np.asarray(lms) - pose[:2]
        z = np.stack([
            np.linalg.norm(d, axis=1) + rng.normal(size=3) * 0.1,
            np.arctan2(d[:, 1], d[:, 0]) - pose[2]
            + rng.normal(size=3) * 0.05,
        ], -1)
        g = step(g, u, True, jnp.arange(3, dtype=jnp.int32),
                 jnp.asarray(z), jnp.ones(3, bool), dt)

    est = np.asarray(g.estimate())
    assert np.linalg.norm(est[:2] - pose[:2]) < 0.35, (est, pose)
    assert abs((est[2] - pose[2] + np.pi) % (2 * np.pi) - np.pi) < 0.35


# ------------------------------------------------------------------ LQG

def test_lqg_stabilizes_under_noise():
    """LQG holds the (discretized) inverted pendulum near upright with
    noisy partial observations; certainty-equivalence beats no control
    and the estimator tracks the state."""
    from rustrobotics_tpu.control.lqg import lqg, rollout
    from rustrobotics_tpu.control.lqr import LinearTimeInvariantModel

    dt = 0.02
    g0, lp, mc, mp = 9.8, 0.5, 1.0, 0.1
    a = jnp.asarray([
        [1.0, dt, 0.0, 0.0],
        [0.0, 1.0, -dt * mp * g0 / mc, 0.0],
        [0.0, 0.0, 1.0, dt],
        [0.0, 0.0, dt * (mc + mp) * g0 / (lp * mc), 1.0],
    ])
    b = jnp.asarray([[0.0], [dt / mc], [0.0], [-dt / (lp * mc)]])
    model = LinearTimeInvariantModel(
        a=a, b=b, q=jnp.diag(jnp.asarray([1.0, 0.1, 10.0, 0.1])),
        r=jnp.eye(1) * 0.1,
    )
    c = jnp.asarray([[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    w = jnp.eye(4) * 1e-5
    v = jnp.eye(2) * 1e-4
    ctrl = lqg(model, c, w, v)

    x0 = jnp.asarray([0.3, 0.0, 0.15, 0.0])
    xs, xhs, _ = rollout(
        ctrl, jax.random.key(0), x0, 400,
        w_chol=jnp.eye(4) * jnp.sqrt(1e-5),
        v_chol=jnp.eye(2) * jnp.sqrt(1e-4),
    )
    xs = np.asarray(xs)
    # the open-loop pendulum is exponentially unstable; under LQG the
    # angle stays within the stochastic steady-state band (process noise
    # sets a ~0.05 rad wander floor) after starting at 0.15 rad
    assert np.abs(xs[-50:, 2]).max() < 0.1, np.abs(xs[-50:, 2]).max()
    assert np.abs(xs[-50:, 0]).max() < 0.6
    # estimator tracks
    assert np.abs(np.asarray(xhs)[-50:] - xs[-50:]).max() < 0.1
