"""EKF-SLAM (known correspondences) tests.

Capability beyond the reference: src/mapping/ekf_slam_known.rs is an empty
file. Oracle: a simulated unicycle loop with noisy range-bearing sightings
of unknown-position landmarks — SLAM must recover both trajectory and map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_schmidt_ekf_consider_states():
    """Schmidt (consider-state) updates: frozen landmarks keep their
    means, the filter stays consistent (conservative vs the full EKF),
    and the active block still tracks."""
    from rustrobotics_tpu.mapping.ekf_slam import (
        EkfSlamKnownCorrespondences,
        schmidt_step,
    )
    from rustrobotics_tpu.models import VelocityMotionModel

    rng = np.random.default_rng(0)
    lms = np.array([[4.0, 0.0], [0.0, 4.0], [-4.0, 0.0], [0.0, -4.0],
                    [3.0, 3.0], [-3.0, 3.0]])
    slam = EkfSlamKnownCorrespondences.create(
        q=jnp.diag(jnp.asarray([0.1, 0.05])) ** 2,
        motion_model=VelocityMotionModel.create(
            jnp.asarray([0.02, 0.005, 0.01, 0.005])),
        max_landmarks=len(lms),
    )

    step = jax.jit(lambda st, u_, ids, zs, m, cl: schmidt_step(
        slam, st, u_, True, ids, zs, m, 0.1, cl))

    def simulate(consider):
        state = slam.init_state(jnp.zeros(3))
        pose = np.zeros(3)
        u, dt = jnp.asarray([0.8, 0.25]), 0.1
        traj_err = []
        for t in range(200):
            th = pose[2]
            pose = pose + np.array([0.8 * dt * np.cos(th),
                                    0.8 * dt * np.sin(th), 0.25 * dt])
            d = lms - pose[:2]
            zs = np.stack([
                np.linalg.norm(d, axis=1) + rng.normal(size=len(lms)) * 0.1,
                np.arctan2(d[:, 1], d[:, 0]) - pose[2]
                + rng.normal(size=len(lms)) * 0.05,
            ], -1)
            # after warmup, freeze landmarks 3-5 as consider states
            cl = jnp.asarray(
                [False, False, False, True, True, True]) if (
                    consider and t >= 60) else jnp.zeros(len(lms), bool)
            frozen_before = np.asarray(state.landmarks)[3:].copy()
            state = step(
                state, u, jnp.arange(len(lms), dtype=jnp.int32),
                jnp.asarray(zs), jnp.ones(len(lms), bool), cl)
            if consider and t >= 61:
                np.testing.assert_allclose(
                    np.asarray(state.landmarks)[3:], frozen_before,
                    atol=1e-12)
            traj_err.append(
                np.linalg.norm(np.asarray(state.x[:2]) - pose[:2]))
        return state, np.asarray(traj_err)

    full_state, full_err = simulate(consider=False)
    sch_state, sch_err = simulate(consider=True)
    # active tracking survives freezing half the map
    assert sch_err[-40:].mean() < 0.2, sch_err[-40:].mean()
    # consistency: the Schmidt covariance is conservative (never smaller
    # than the full-update filter's) and stays PSD
    cov = np.asarray(sch_state.cov)
    assert np.all(np.linalg.eigvalsh(cov) > -1e-10)
    assert np.trace(cov) >= np.trace(np.asarray(full_state.cov)) - 1e-9

from rustrobotics_tpu.mapping.ekf_slam import EkfSlamKnownCorrespondences
from rustrobotics_tpu.models import VelocityMotionModel


def _simulate(seed=0, num_steps=400, num_landmarks=6, dt=0.1):
    rng = np.random.default_rng(seed)
    lms = np.stack(
        [6.0 * np.cos(np.linspace(0, 2 * np.pi, num_landmarks, endpoint=False)),
         6.0 * np.sin(np.linspace(0, 2 * np.pi, num_landmarks, endpoint=False))],
        axis=-1,
    )
    x = np.array([3.0, 0.0, np.pi / 2])
    u = np.array([1.0, 1.0 / 3.0])  # circle of radius 3
    poses, zs, ids, masks = [], [], [], []
    m_max = num_landmarks
    for _ in range(num_steps):
        # exact unicycle step
        th = x[2]
        x = x + np.array([
            u[0] / u[1] * (-np.sin(th) + np.sin(th + u[1] * dt)),
            u[0] / u[1] * (np.cos(th) - np.cos(th + u[1] * dt)),
            u[1] * dt,
        ])
        x[2] = (x[2] + np.pi) % (2 * np.pi) - np.pi
        poses.append(x.copy())
        z_step = np.zeros((m_max, 2))
        mask = np.zeros(m_max, bool)
        for k in range(num_landmarks):
            d = lms[k] - x[:2]
            r = np.hypot(*d)
            if r < 5.0:  # sensor range
                z_step[k] = [r + rng.normal(0, 0.03),
                             np.arctan2(d[1], d[0]) - x[2] + rng.normal(0, 0.01)]
                mask[k] = True
        zs.append(z_step)
        ids.append(np.arange(m_max))
        masks.append(mask)
    return (np.asarray(poses), lms, np.asarray(zs), np.asarray(ids),
            np.asarray(masks), u, dt)


def test_ekf_slam_recovers_map_and_trajectory():
    poses, lms, zs, ids, masks, u, dt = _simulate()
    num_landmarks = lms.shape[0]
    slam = EkfSlamKnownCorrespondences.create(
        q=jnp.diag(jnp.asarray([0.03**2, 0.01**2])),
        motion_model=VelocityMotionModel.create([0.005] * 4 + [0.001] * 2),
        max_landmarks=num_landmarks,
    )
    state = slam.init_state(jnp.asarray([3.0, 0.0, np.pi / 2]))

    @jax.jit
    def run(state):
        def body(st, ev):
            z, lm_idx, mask = ev
            st = slam.step(st, jnp.asarray(u), jnp.asarray(True),
                           lm_idx, z, mask, dt)
            return st, st.x[:3]

        return jax.lax.scan(
            body, state,
            (jnp.asarray(zs), jnp.asarray(ids), jnp.asarray(masks)),
        )

    state, traj = run(state)
    traj = np.asarray(traj)
    # trajectory ATE
    ate = np.sqrt(np.mean(np.sum((traj[:, :2] - poses[:, :2]) ** 2, -1)))
    assert ate < 0.15, ate
    # map error for seen landmarks
    seen = np.asarray(state.seen)
    assert seen.sum() == num_landmarks  # circle passes near all
    est_lms = np.asarray(state.landmarks)
    lm_err = np.linalg.norm(est_lms[seen] - lms[seen], axis=-1)
    assert lm_err.max() < 0.2, lm_err
    # joint covariance stays symmetric PSD
    cov = np.asarray(state.cov)
    np.testing.assert_allclose(cov, cov.T, atol=1e-6)
    assert np.linalg.eigvalsh(cov).min() > -1e-6


@pytest.mark.slow
def test_ekf_slam_unseen_landmarks_stay_uncertain():
    poses, lms, zs, ids, masks, u, dt = _simulate(num_steps=30)
    slam = EkfSlamKnownCorrespondences.create(
        q=jnp.diag(jnp.asarray([0.03**2, 0.01**2])),
        motion_model=VelocityMotionModel.create([0.005] * 6),
        max_landmarks=lms.shape[0] + 2,  # two slots never observed
    )
    state = slam.init_state(jnp.asarray([3.0, 0.0, np.pi / 2]))
    ids_pad = np.concatenate([ids, np.zeros((len(ids), 2), int)], axis=1)
    zs_pad = np.concatenate([zs, np.zeros((len(zs), 2, 2))], axis=1)
    masks_pad = np.concatenate(
        [masks, np.zeros((len(masks), 2), bool)], axis=1
    )
    for t in range(len(zs)):
        state = slam.step(state, jnp.asarray(u), jnp.asarray(True),
                          jnp.asarray(ids_pad[t]), jnp.asarray(zs_pad[t]),
                          jnp.asarray(masks_pad[t]), dt)
    seen = np.asarray(state.seen)
    assert not seen[-2:].any()
    cov = np.asarray(state.cov)
    # unseen slots keep their huge prior variance
    assert cov[-1, -1] > 1e5 and cov[-4, -4] > 1e5


def test_ekf_slam_unknown_correspondences():
    """ML data association (PR Table 10.3): same simulated world but with
    measurement IDENTITY withheld — the filter must discover the right
    number of landmarks and still recover trajectory + map. Capability the
    reference doesn't have in any form."""
    poses, lms, zs, ids, masks, u, dt = _simulate()
    num_landmarks = lms.shape[0]
    slam = EkfSlamKnownCorrespondences.create(
        q=jnp.diag(jnp.asarray([0.03**2, 0.01**2])),
        motion_model=VelocityMotionModel.create([0.005] * 4 + [0.001] * 2),
        max_landmarks=num_landmarks + 4,  # head-room for spurious tracks
    )
    state = slam.init_state(jnp.asarray([3.0, 0.0, np.pi / 2]))

    # shuffle each step's measurement rows so slot order carries no hint
    rng = np.random.default_rng(7)
    zs_s = zs.copy()
    masks_s = masks.copy()
    for t in range(len(zs)):
        p = rng.permutation(zs.shape[1])
        zs_s[t] = zs[t][p]
        masks_s[t] = masks[t][p]

    @jax.jit
    def run(state):
        def body(st, ev):
            z, mask = ev
            st = slam.step_unknown(st, jnp.asarray(u), jnp.asarray(True),
                                   z, mask, dt)
            return st, st.x[:3]

        return jax.lax.scan(body, state,
                            (jnp.asarray(zs_s), jnp.asarray(masks_s)))

    state, traj = run(state)
    traj = np.asarray(traj)
    ate = np.sqrt(np.mean(np.sum((traj[:, :2] - poses[:, :2]) ** 2, -1)))
    assert ate < 0.2, ate
    # discovered exactly the true landmarks (greedy NN matching)
    seen = np.asarray(state.seen)
    assert seen.sum() == num_landmarks, int(seen.sum())
    est = np.asarray(state.landmarks)[seen]
    d = np.linalg.norm(est[:, None, :] - lms[None, :, :], axis=-1)
    assert (d.min(axis=1) < 0.25).all(), d.min(axis=1)
    assert len(set(d.argmin(axis=1))) == num_landmarks  # one track per lm


@pytest.mark.slow
def test_slam_course_ekf_slam():
    """Full pipeline on the bundled slam_course dataset: odometry motion
    model + range-bearing EKF-SLAM recovers the world.dat landmark map.
    The reference only parses this dataset (slam_course.rs) — its EKF-SLAM
    is an empty file and it has no odometry motion model at all."""
    from rustrobotics_tpu.data.slam_course import load_slam_course
    from rustrobotics_tpu.mapping.slam_replay import (
        landmark_map_error,
        run_slam_course,
    )

    import pathlib

    base = pathlib.Path("/root/reference/dataset/slam_course")
    if not base.exists():
        import pytest

        pytest.skip("slam_course dataset not mounted")
    ds = load_slam_course(base)
    traj, state = run_slam_course(ds)
    mx, mean, nseen = landmark_map_error(ds, state)
    assert nseen == 9
    assert mean < 0.4, (mean, mx)
    assert mx < 0.8, mx
    # covariance stays symmetric
    cov = np.asarray(state.cov)
    np.testing.assert_allclose(cov, cov.T, atol=1e-4)


@pytest.mark.slow
def test_slam_course_graph_slam_frontend():
    """Front-end: raw slam_course log -> pose graph -> LM optimization.
    The reference has no front-end at all (its PGO only reads g2o files).
    Batch graph SLAM should match or beat the online EKF-SLAM map."""
    import pathlib

    import jax.numpy as jnp

    from rustrobotics_tpu.data.slam_course import load_slam_course
    from rustrobotics_tpu.mapping.frontend import (
        build_pose_graph_from_slam_course,
    )
    from rustrobotics_tpu.mapping.pgo import optimize

    base = pathlib.Path("/root/reference/dataset/slam_course")
    if not base.exists():
        import pytest

        pytest.skip("slam_course dataset not mounted")
    ds = load_slam_course(base)
    g = build_pose_graph_from_slam_course(ds, dtype=jnp.float64)
    assert g.num_nodes == 341 and g.landmarks2.shape[0] == 9
    res = optimize(g, num_iterations=30, solver="levenberg_marquardt",
                   backend="banded-direct")
    assert res.errors[-1] < res.errors[0] / 2
    est = np.asarray(res.graph.landmarks2)
    err = np.linalg.norm(est - np.asarray(ds.landmarks), axis=-1)
    assert err.mean() < 0.3, err
    assert err.max() < 0.5, err


@pytest.mark.slow
def test_fastslam_recovers_map_and_trajectory():
    """FastSLAM 1.0 (Rao-Blackwellized PF, PR ch. 13): a third SLAM
    family beyond EKF-SLAM and graph SLAM — per-particle landmark EKFs
    fully batched over the particle axis. Same simulated world oracle."""
    import jax

    from rustrobotics_tpu.mapping.fastslam import FastSlam

    poses, lms, zs, ids, masks, u, dt = _simulate()
    slam = FastSlam.create(
        q=jnp.diag(jnp.asarray([0.03**2, 0.01**2], jnp.float32)),
        motion_model=VelocityMotionModel.create(
            jnp.asarray([0.01] * 4 + [0.002] * 2, jnp.float32)),
        max_landmarks=lms.shape[0],
    )
    key = jax.random.key(0)
    key, k0 = jax.random.split(key)
    parts = slam.init_particles(
        k0, jnp.asarray([3.0, 0.0, np.pi / 2], jnp.float32), 256)

    @jax.jit
    def run(parts, keys, zs, ids, masks):
        def body(p, ev):
            k, z, lm_idx, mask = ev
            p = slam.step(k, p, jnp.asarray(u, jnp.float32),
                          jnp.asarray(True), lm_idx, z, mask, dt)
            return p, p.poses.mean(0)
        return jax.lax.scan(body, parts, (keys, zs, ids, masks))

    keys = jax.random.split(key, len(zs))
    parts, traj = run(parts, keys, jnp.asarray(zs, jnp.float32),
                      jnp.asarray(ids), jnp.asarray(masks))
    traj = np.asarray(traj)
    ate = np.sqrt(np.mean(np.sum((traj[:, :2] - poses[:, :2]) ** 2, -1)))
    assert ate < 0.2, ate
    est_pose, est_lm, seen = slam.estimate(parts)
    assert int(np.asarray(seen).sum()) == lms.shape[0]
    lm_err = np.linalg.norm(np.asarray(est_lm) - lms, axis=-1)
    assert lm_err.max() < 0.3, lm_err


@pytest.mark.slow
def test_fastslam_slam_course():
    """FastSLAM on the real slam_course log: with motion noise calibrated
    to its near-noise-free odometry, the particle map beats the
    first-sighting dead-reckoning baseline (0.207 mean)."""
    import pathlib

    from rustrobotics_tpu.data.slam_course import load_slam_course
    from rustrobotics_tpu.mapping.slam_replay import run_slam_course_fastslam

    base = pathlib.Path("/root/reference/dataset/slam_course")
    if not base.exists():
        import pytest

        pytest.skip("slam_course dataset not mounted")
    ds = load_slam_course(base)
    _, est_lm, seen = run_slam_course_fastslam(ds)
    assert seen.sum() == 9
    err = np.linalg.norm(est_lm - np.asarray(ds.landmarks), axis=-1)
    assert err.mean() < 0.2, err.mean()


@pytest.mark.slow
def test_fastslam_unknown_correspondences():
    """Per-particle ML data association (every particle associates each
    identity-withheld measurement against its OWN map, two-threshold
    gated): the best particle discovers exactly the true landmark count
    with an accurate map."""
    import jax

    from rustrobotics_tpu.mapping.fastslam import (
        FastSlam,
        fastslam_step_unknown,
    )

    poses, lms, zs, ids, masks, u, dt = _simulate()
    rng = np.random.default_rng(7)
    zs_s, masks_s = zs.copy(), masks.copy()
    for t in range(len(zs)):
        p = rng.permutation(zs.shape[1])
        zs_s[t] = zs[t][p]
        masks_s[t] = masks[t][p]
    slam = FastSlam.create(
        q=jnp.diag(jnp.asarray([0.03**2, 0.01**2], jnp.float32)),
        motion_model=VelocityMotionModel.create(
            jnp.asarray([0.01] * 4 + [0.002] * 2, jnp.float32)),
        max_landmarks=10,
    )
    key = jax.random.key(0)
    key, k0 = jax.random.split(key)
    parts = slam.init_particles(
        k0, jnp.asarray([3.0, 0.0, np.pi / 2], jnp.float32), 256)

    @jax.jit
    def run(parts, keys, zs_, masks_):
        def body(p, ev):
            k, z, mask = ev
            return fastslam_step_unknown(
                slam, k, p, jnp.asarray(u, jnp.float32),
                jnp.asarray(True), z, mask, dt), None
        return jax.lax.scan(body, parts, (keys, zs_, masks_))[0]

    keys = jax.random.split(key, len(zs))
    parts = run(parts, keys, jnp.asarray(zs_s, jnp.float32),
                jnp.asarray(masks_s))
    best = int(jnp.argmax(parts.logw))
    seen_b = np.asarray(parts.seen[best])
    assert seen_b.sum() == lms.shape[0], int(seen_b.sum())
    lm_b = np.asarray(parts.lm_mu[best])[seen_b]
    d = np.linalg.norm(lm_b[:, None, :] - lms[None], axis=-1)
    assert (d.min(axis=1) < 0.3).all(), d.min(axis=1)
    assert len(set(d.argmin(axis=1))) == lms.shape[0]
