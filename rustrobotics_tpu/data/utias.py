"""UTIAS multi-robot localization dataset loader.

Capability parity with the reference (src/data/utias.rs): reads the 5 CSVs,
keys landmarks by barcode id (utias.rs:184-192), sorts streams by time and
clips everything before the first groundtruth stamp (utias.rs:194-216), and
merges odometry + measurement streams into a single time-ordered event
sequence (utias.rs:110-163).

TPU-first difference: the merge happens once at load into a fixed-shape
``EventArrays`` pytree — per event: dt, control (+valid flag), and a padded
block of (landmark-id, range, bearing) measurements with a mask. A filter
replays the whole dataset with one ``lax.scan``.

Merge semantics: events are emitted in time order; an odometry sample and a
measurement group merge into one event iff they carry the same timestamp
(the reference's by-ref iterator compares the odometry stamp against the
measurement *after* the group, utias.rs:157 — a quirk we do not reproduce;
with real UTIAS data both yield odometry-only and measurement-only events
almost always, as stamps never collide exactly).
"""

from __future__ import annotations

import csv
import dataclasses
import pathlib

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class EventArrays:
    """Fixed-shape merged event stream.

    times: (T,) stamps RELATIVE to the groundtruth start — absolute UTIAS
    stamps are ~1.24e9 epoch seconds, where f32 resolution is ~128 s, so
    shifting the origin before any dtype cast is what keeps the f32 (TPU)
    replay numerically sane; dt: (T,) since previous event;
    control: (T, 2) [v, omega]; has_control: (T,) bool;
    meas_ids: (T, M) int32; meas_z: (T, M, 2) [range, bearing];
    meas_mask: (T, M) bool.
    """

    times: jnp.ndarray
    dt: jnp.ndarray
    control: jnp.ndarray
    has_control: jnp.ndarray
    meas_ids: jnp.ndarray
    meas_z: jnp.ndarray
    meas_mask: jnp.ndarray

    @property
    def num_events(self) -> int:
        return self.times.shape[0]


@dataclasses.dataclass
class UtiasDataset:
    """Host-side container (role of UtiasDataset, utias.rs:44-49)."""

    groundtruth: np.ndarray  # (G, 4) [time, x, y, orientation]
    landmark_ids: np.ndarray  # (K,) barcode ids
    landmarks: np.ndarray  # (K, 5) [x, y, x_std, y_std, subject_nb]
    measurements: np.ndarray  # (Nm, 4) [time, barcode, range, bearing]
    odometry: np.ndarray  # (No, 3) [time, v, omega]

    def events(self, max_measurements_per_event: int | None = None,
               max_events: int | None = None, dtype=np.float64) -> EventArrays:
        """Merge odometry/measurement streams into fixed-shape events."""
        me, od = self.measurements, self.odometry
        # group measurements by identical timestamp
        groups = []
        i = 0
        while i < len(me):
            j = i + 1
            while j < len(me) and me[j, 0] == me[i, 0]:
                j += 1
            groups.append((me[i, 0], i, j))
            i = j
        events = []  # (time, od_idx or -1, group or None)
        gi, oi = 0, 0
        while gi < len(groups) or oi < len(od):
            g_t = groups[gi][0] if gi < len(groups) else np.inf
            o_t = od[oi, 0] if oi < len(od) else np.inf
            if o_t < g_t:
                events.append((o_t, oi, None))
                oi += 1
            elif g_t < o_t:
                events.append((g_t, -1, groups[gi]))
                gi += 1
            else:  # identical stamp: merged event
                events.append((o_t, oi, groups[gi]))
                gi += 1
                oi += 1
        if max_events is not None:
            events = events[:max_events]

        m_max = max_measurements_per_event
        if m_max is None:
            # default=1: a short prefix can be all-odometry (no
            # measurement groups at all) — keep one masked slot
            m_max = max(((g[2] - g[1]) for _, _, g in events if g),
                        default=1)

        t_len = len(events)
        times = np.zeros(t_len)
        control = np.zeros((t_len, 2))
        has_control = np.zeros(t_len, bool)
        meas_ids = np.zeros((t_len, m_max), np.int32)
        meas_z = np.zeros((t_len, m_max, 2))
        meas_mask = np.zeros((t_len, m_max), bool)
        for k, (t, oi_, grp) in enumerate(events):
            times[k] = t
            if oi_ >= 0:
                control[k] = od[oi_, 1:3]
                has_control[k] = True
            if grp is not None:
                _, i0, i1 = grp
                cnt = min(i1 - i0, m_max)
                meas_ids[k, :cnt] = me[i0:i0 + cnt, 1].astype(np.int32)
                meas_z[k, :cnt] = me[i0:i0 + cnt, 2:4]
                meas_mask[k, :cnt] = True
        dt = np.diff(times, prepend=times[0])
        times = times - self.groundtruth[0, 0]  # f32-safe relative stamps
        return EventArrays(
            times=jnp.asarray(times, dtype=dtype),
            dt=jnp.asarray(dt, dtype=dtype),
            control=jnp.asarray(control, dtype=dtype),
            has_control=jnp.asarray(has_control),
            meas_ids=jnp.asarray(meas_ids),
            meas_z=jnp.asarray(meas_z, dtype=dtype),
            meas_mask=jnp.asarray(meas_mask),
        )


def _read_csv(path):
    with open(path, newline="", encoding="utf-8") as fh:
        reader = csv.reader(fh)
        header = next(reader)
        rows = [[float(v) for v in row] for row in reader if row]
    return header, np.asarray(rows, dtype=np.float64)


def load_utias(base: str | pathlib.Path) -> UtiasDataset:
    """Load one UTIAS dataset directory (role of UtiasDataset::new,
    utias.rs:165-224)."""
    base = pathlib.Path(base)
    _, barcodes = _read_csv(base / "Barcodes.csv")  # subject_nb, barcode_nb
    _, lms = _read_csv(base / "Landmark_Groundtruth.csv")
    _, gt = _read_csv(base / "Groundtruth.csv")
    _, me = _read_csv(base / "Measurement.csv")
    _, od = _read_csv(base / "Odometry.csv")

    subject_to_barcode = {int(s): int(b) for s, b in barcodes}
    landmark_ids = np.asarray(
        [subject_to_barcode[int(row[0])] for row in lms], dtype=np.int32
    )
    landmarks = np.concatenate([lms[:, 1:5], lms[:, :1]], axis=1)

    gt = gt[np.argsort(gt[:, 0], kind="stable")]
    min_time = gt[0, 0]
    me = me[me[:, 0] >= min_time]
    me = me[np.argsort(me[:, 0], kind="stable")]
    od = od[od[:, 0] >= min_time]
    od = od[np.argsort(od[:, 0], kind="stable")]

    return UtiasDataset(
        groundtruth=gt,
        landmark_ids=landmark_ids,
        landmarks=landmarks,
        measurements=me,
        odometry=od,
    )
