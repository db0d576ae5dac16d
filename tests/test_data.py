"""Data-layer tests: UTIAS and SLAM-course loaders + the merged event
stream contract + end-to-end landmark localization ATE."""

import numpy as np
import pytest

from rustrobotics_tpu.data import load_slam_course, load_utias


@pytest.fixture(scope="module")
def utias(dataset_dir):
    return load_utias(dataset_dir / "utias0")


def test_utias_loader_contract(utias):
    """Loader clips to the groundtruth start and sorts by time
    (utias.rs:194-216); landmarks keyed by barcode (utias.rs:184-192)."""
    min_time = utias.groundtruth[0, 0]
    assert np.all(utias.measurements[:, 0] >= min_time)
    assert np.all(utias.odometry[:, 0] >= min_time)
    assert np.all(np.diff(utias.measurements[:, 0]) >= 0)
    assert np.all(np.diff(utias.odometry[:, 0]) >= 0)
    assert len(utias.landmark_ids) == 15  # 15 landmarks in dataset0
    # landmarks are keyed by barcode (utias.rs:184-192): every measurement
    # subject number that belongs to a landmark is one of these barcodes
    barcode_set = set(utias.landmark_ids.tolist())
    assert barcode_set == {7, 9, 16, 18, 25, 27, 36, 45, 54, 61, 63, 70, 72, 81, 90}


def test_utias_event_merge(utias):
    """Every odometry sample and measurement group lands in exactly one
    event, in time order, with masks marking the padding."""
    ev = utias.events(max_events=5000)
    times = np.asarray(ev.times)
    assert np.all(np.diff(times) >= 0)
    assert np.asarray(ev.dt)[1:].min() >= 0
    hc = np.asarray(ev.has_control)
    mm = np.asarray(ev.meas_mask)
    # each event has control or measurements (or both)
    assert np.all(hc | mm.any(axis=1))
    # measurement timestamps grouped: each masked row's event time appears
    # in the raw measurement stream (event times are groundtruth-relative)
    origin = utias.groundtruth[0, 0]
    meas_times = set((utias.measurements[:, 0] - origin).round(6).tolist())
    for t, has_m in zip(times.round(6).tolist(), mm.any(axis=1).tolist()):
        if has_m:
            assert t in meas_times


def test_utias_localization_ate(utias):
    """End-to-end: EKF-KC on 10k merged events stays within 0.3 m ATE of
    groundtruth (the reference has no numeric anchor here — its example
    only plots; this pins our own)."""
    from rustrobotics_tpu.localization.landmark_replay import (
        ate_vs_groundtruth,
        run_utias_localization,
    )

    times, states = run_utias_localization(utias, algo="ekf", max_events=10000)
    ate = ate_vs_groundtruth(utias, times, states)
    assert ate < 0.3, ate
    # f32 (the TPU dtype) must hold the same accuracy: guards the
    # relative-time-origin handling (absolute epoch stamps don't fit f32)
    # and the Joseph-form covariance update
    import jax.numpy as jnp

    times32, states32 = run_utias_localization(
        utias, algo="ekf", max_events=10000, dtype=jnp.float32
    )
    ate32 = ate_vs_groundtruth(utias, times32, states32)
    assert ate32 < 0.3, ate32


def test_slam_course_loader(dataset_dir):
    ds = load_slam_course(dataset_dir / "slam_course")
    assert len(ds.odometry) == len(ds.sensors)
    assert len(ds.odometry) > 300
    assert len(ds.landmark_ids) == 9
    arr = ds.arrays()
    assert arr.odometry.shape[0] == len(ds.odometry)
    mask = np.asarray(arr.meas_mask)
    counts = [len(s) for s in ds.sensors]
    np.testing.assert_array_equal(mask.sum(axis=1), counts)
