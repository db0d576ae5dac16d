"""EKF-SLAM replay on the slam_course dataset.

The reference loads this dataset (src/data/slam_course.rs) but has no
consumer for it — its EKF-SLAM file is empty. Here the ODOMETRY records
drive the odometry motion model and the SENSOR records feed the
known-correspondence EKF-SLAM; the whole session is one jitted
``lax.scan``. ``world.dat`` provides the landmark ground truth used as the
accuracy anchor (the dataset has no pose groundtruth).

Landmark positions are recovered up to the unobservable global gauge fixed
by anchoring the start pose at the origin, matching the dataset's
convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.data.slam_course import SlamCourseDataset
from rustrobotics_tpu.mapping.ekf_slam import (
    EkfSlamKnownCorrespondences,
    EkfSlamState,
)
from rustrobotics_tpu.models.motion import OdometryMotionModel


@jax.jit
def _replay(slam, state0, odometry, slots, z, mask):
    def step(st, ev):
        u, slot, zi, ok = ev
        st = slam.step(st, u, jnp.asarray(True), slot, zi, ok,
                       jnp.asarray(0.0, u.dtype))
        return st, st.x[:3]

    return jax.lax.scan(step, state0, (odometry, slots, z, mask))


def run_slam_course(
    dataset: SlamCourseDataset,
    alphas=(0.05, 0.01, 0.02, 0.01),
    sensor_noise=(0.2, 0.1),
    dtype=jnp.float32,
):
    """Returns (trajectory (T, 3), EkfSlamState). Landmark slots follow
    ``dataset.landmark_ids`` order."""
    arr = dataset.arrays(dtype=np.dtype(dtype))
    slam = EkfSlamKnownCorrespondences.create(
        q=jnp.diag(jnp.asarray(sensor_noise, dtype) ** 2),
        motion_model=OdometryMotionModel.create(
            jnp.asarray(alphas, dtype)
        ),
        max_landmarks=len(dataset.landmark_ids),
    )
    # raw landmark ids -> slot indices (host-side, static). searchsorted
    # requires ascending world.dat ids — assert instead of silently
    # mis-associating (frontend.py's dict mapping is the general path).
    lids = np.asarray(dataset.landmark_ids)
    assert np.all(np.diff(lids) > 0), \
        "world.dat landmark ids must be strictly ascending"
    slots = np.searchsorted(lids, np.asarray(arr.meas_ids))
    slots = jnp.asarray(np.clip(slots, 0, len(lids) - 1), jnp.int32)
    state0 = slam.init_state(jnp.zeros(3, dtype))
    state, traj = _replay(
        slam, state0, arr.odometry, slots, arr.meas_z, arr.meas_mask
    )
    return np.asarray(traj), state


def landmark_map_error(dataset: SlamCourseDataset, state: EkfSlamState):
    """Max / mean distance between estimated and true landmark positions
    for every seen landmark."""
    seen = np.asarray(state.seen)
    est = np.asarray(state.landmarks)[seen]
    true = np.asarray(dataset.landmarks)[seen]
    err = np.linalg.norm(est - true, axis=-1)
    return float(err.max()), float(err.mean()), int(seen.sum())


def run_slam_course_fastslam(
    dataset: SlamCourseDataset,
    num_particles: int = 256,
    alphas=(1e-4, 2e-5, 5e-5, 2e-5),
    sensor_noise=(0.2, 0.1),
    seed: int = 0,
    dtype=jnp.float32,
    version: int = 1,
):
    """FastSLAM replay of the slam_course log (this log's odometry is
    nearly noise-free, hence the small default alphas). ``version=2``
    uses the measurement-driven proposal (fastslam2_step), which holds
    accuracy at much smaller clouds. Returns (FastSlamParticles,
    estimated landmark map (L, 2), seen mask)."""
    from rustrobotics_tpu.mapping.fastslam import FastSlam, fastslam2_step
    from rustrobotics_tpu.models.motion import OdometryMotionModel

    arr = dataset.arrays(dtype=np.dtype(dtype))
    slots = np.searchsorted(dataset.landmark_ids, np.asarray(arr.meas_ids))
    slots = jnp.asarray(
        np.clip(slots, 0, len(dataset.landmark_ids) - 1), jnp.int32)
    slam = FastSlam.create(
        q=jnp.diag(jnp.asarray(sensor_noise, dtype) ** 2),
        motion_model=OdometryMotionModel.create(jnp.asarray(alphas, dtype)),
        max_landmarks=len(dataset.landmark_ids),
    )
    key = jax.random.key(seed)
    key, k0 = jax.random.split(key)
    parts = slam.init_particles(k0, jnp.zeros(3, dtype), num_particles)

    @jax.jit
    def run(parts, keys, odom, slots_, z, mask):
        def body(p, ev):
            k, u, si, zi, mi = ev
            if version == 2:
                p = fastslam2_step(slam, k, p, u, jnp.asarray(True),
                                   si, zi, mi, jnp.asarray(0.0, dtype))
            else:
                p = slam.step(k, p, u, jnp.asarray(True), si, zi, mi,
                              jnp.asarray(0.0, dtype))
            return p, None

        return jax.lax.scan(body, parts, (keys, odom, slots_, z, mask))[0]

    keys = jax.random.split(key, arr.odometry.shape[0])
    parts = run(parts, keys, arr.odometry, slots, arr.meas_z, arr.meas_mask)
    _, est_lm, seen = slam.estimate(parts)
    return parts, np.asarray(est_lm), np.asarray(seen)
