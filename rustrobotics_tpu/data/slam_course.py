"""Freiburg SLAM-course dataset loader (sensor_data.dat + world.dat).

Capability parity with the reference (src/data/slam_course.rs:36-125):
ODOMETRY lines [rot1, trans, rot2] each start a timestep; SENSOR lines
[id, range, bearing] attach to the current timestep; world.dat provides
landmarks. Unlike the reference (whose constructor is private and only
reachable from its own test, slam_course.rs:35), this loader is public and
produces fixed-shape scan-ready arrays.
"""

from __future__ import annotations

import dataclasses
import pathlib

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class SlamCourseArrays:
    """Per-timestep arrays: odometry (T, 3) [rot1, trans, rot2];
    padded sensor blocks ids (T, M), z (T, M, 2), mask (T, M)."""

    odometry: jnp.ndarray
    meas_ids: jnp.ndarray
    meas_z: jnp.ndarray
    meas_mask: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.odometry.shape[0]


@dataclasses.dataclass
class SlamCourseDataset:
    odometry: np.ndarray  # (T, 3)
    sensors: list  # length T of (k_i, 3) arrays [id, range, bearing]
    landmark_ids: np.ndarray  # (K,)
    landmarks: np.ndarray  # (K, 2)

    def arrays(self, max_measurements: int | None = None,
               dtype=np.float64) -> SlamCourseArrays:
        m_max = max_measurements or max((len(s) for s in self.sensors),
                                        default=1)
        t_len = len(self.odometry)
        ids = np.zeros((t_len, m_max), np.int32)
        z = np.zeros((t_len, m_max, 2))
        mask = np.zeros((t_len, m_max), bool)
        for k, s in enumerate(self.sensors):
            cnt = min(len(s), m_max)
            if cnt:
                arr = np.asarray(s)
                ids[k, :cnt] = arr[:cnt, 0].astype(np.int32)
                z[k, :cnt] = arr[:cnt, 1:3]
                mask[k, :cnt] = True
        return SlamCourseArrays(
            odometry=jnp.asarray(self.odometry, dtype=dtype),
            meas_ids=jnp.asarray(ids),
            meas_z=jnp.asarray(z, dtype=dtype),
            meas_mask=jnp.asarray(mask),
        )


def load_slam_course(base: str | pathlib.Path) -> SlamCourseDataset:
    base = pathlib.Path(base)
    odometry = []
    sensors = []
    current = None
    with open(base / "sensor_data.dat", encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "ODOMETRY":
                if current is not None:
                    sensors.append(current)
                current = []
                odometry.append([float(v) for v in parts[1:4]])
            elif parts[0] == "SENSOR":
                current.append([float(parts[1]), float(parts[2]), float(parts[3])])
            else:
                raise ValueError(f"unknown record {parts[0]!r}")
    if current is not None:
        sensors.append(current)

    lm_ids, lms = [], []
    with open(base / "world.dat", encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if parts:
                lm_ids.append(int(parts[0]))
                lms.append([float(parts[1]), float(parts[2])])

    return SlamCourseDataset(
        odometry=np.asarray(odometry, dtype=np.float64),
        sensors=sensors,
        landmark_ids=np.asarray(lm_ids, dtype=np.int32),
        landmarks=np.asarray(lms, dtype=np.float64),
    )
