"""Landmark-based localization on the UTIAS dataset — full replay as one
``lax.scan``.

Role of the reference's ``localization_landmarks`` example
(examples/localization/localization_landmarks.rs:17-124): EKF-KC or PF-KC
against the barcode-keyed landmark map, consuming the merged
odometry/measurement event stream. The reference iterates 10k events in
Python^W Rust one dynamic dispatch at a time; here the entire replay is a
single jitted scan over the fixed-shape EventArrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rustrobotics_tpu.data.utias import UtiasDataset
from rustrobotics_tpu.localization.ekf import (
    ExtendedKalmanFilterKnownCorrespondences,
)
from rustrobotics_tpu.localization.landmark_table import LandmarkTable
from rustrobotics_tpu.localization.pf import (
    ParticleFilterKnownCorrespondences,
    gaussian_estimate,
)
from rustrobotics_tpu.models import (
    RangeBearingMeasurementModel,
    VelocityMotionModel,
)
from rustrobotics_tpu.utils.state import GaussianState


def build_filter(dataset: UtiasDataset, algo: str = "ekf", dtype=jnp.float64):
    """Noise settings of the reference example (ll.rs:37-43)."""
    landmarks = LandmarkTable.create(
        ids=dataset.landmark_ids,
        positions=np.concatenate(
            [dataset.landmarks[:, :2], np.zeros((len(dataset.landmarks), 1))],
            axis=1,
        ).astype(np.dtype(dtype)),
    )
    motion = VelocityMotionModel.create(
        jnp.asarray([1.0, 1.0, 30.0, 30.0, 10.0, 10.0], dtype=dtype)
    )
    meas = RangeBearingMeasurementModel.create()
    q = jnp.diag(jnp.asarray([0.1, 0.2], dtype=dtype))
    if algo == "ekf":
        return ExtendedKalmanFilterKnownCorrespondences(
            q=q, landmarks=landmarks, motion_model=motion,
            measurement_model=meas,
        )
    if algo == "ukf":
        from rustrobotics_tpu.localization.ukf import (
            UnscentedKalmanFilterKnownCorrespondences,
        )

        return UnscentedKalmanFilterKnownCorrespondences.create(
            q=q, landmarks=landmarks, measurement_model=meas,
            motion_model=motion, alpha=1.0, beta=2.0, kappa=0.0,
            dtype=dtype,
        )
    if algo == "pf":
        return ParticleFilterKnownCorrespondences(
            q=q, landmarks=landmarks, motion_model=motion,
            measurement_model=meas,
        )
    raise ValueError(f"unknown algo {algo!r}")


@jax.jit
def _replay_kalman(filt, state0, control, hc, ids, z, mask, dt):
    """Whole Kalman-family replay as ONE cached jitted program (filt is a
    pytree argument, so the trace is reused across calls/datasets of the
    same shape — re-tracing the 10k-step scan per call cost 3x)."""

    def step(state, ev):
        u, hci, idsi, zi, maski, dti = ev
        new = filt.step(state, u, hci, idsi, zi, maski, dti)
        return new, new

    return jax.lax.scan(step, state0, (control, hc, ids, z, mask, dt))[1]


@jax.jit
def _replay_pf(filt, particles0, key, control, hc, ids, z, mask, dt):
    def step(carry, ev):
        particles, k = carry
        k, k_step = jax.random.split(k)
        u, hci, idsi, zi, maski, dti = ev
        particles = filt.step(k_step, particles, u, hci, idsi, zi, maski, dti)
        est = gaussian_estimate(particles)
        return (particles, k), est

    return jax.lax.scan(
        step, (particles0, key), (control, hc, ids, z, mask, dt)
    )[1]


def run_utias_localization(
    dataset: UtiasDataset,
    algo: str = "ekf",
    max_events: int = 10000,
    num_particles: int = 300,
    seed: int = 0,
    dtype=jnp.float64,
):
    """Returns (times (T,), estimates GaussianState with leading T axis)."""
    filt = build_filter(dataset, algo, dtype)
    events = dataset.events(max_events=max_events, dtype=dtype)
    gt0 = dataset.groundtruth[0]
    x0 = jnp.asarray(gt0[1:4], dtype=dtype)
    # dt of the first event is measured from the groundtruth start
    # (ll.rs:76-90); event times are already groundtruth-relative
    dt = events.dt.at[0].set(events.times[0])

    if algo in ("ekf", "ukf"):
        init_var = 1e-10 if algo == "ekf" else 1e-6  # UKF needs a
        # nondegenerate Cholesky for its sigma points
        state0 = GaussianState(
            x=x0, cov=jnp.eye(3, dtype=dtype) * init_var
        )

        states = _replay_kalman(
            filt, state0, events.control, events.has_control,
            events.meas_ids, events.meas_z, events.meas_mask, dt,
        )
        return np.asarray(events.times), states

    # particle filter: init around groundtruth with r = diag(.2,.2,.2)
    # (ll.rs:44,66-73)
    key = jax.random.key(seed)
    key, k_init = jax.random.split(key)
    r = jnp.diag(jnp.asarray([0.2, 0.2, 0.2], dtype=dtype))
    from rustrobotics_tpu.utils.mvn import MultiVariateNormal

    particles0 = MultiVariateNormal.create(x0, r).sample(k_init, (num_particles,))

    states = _replay_pf(
        filt, particles0, key, events.control, events.has_control,
        events.meas_ids, events.meas_z, events.meas_mask, dt,
    )
    return np.asarray(events.times), states


def build_banked_filter(dataset: UtiasDataset, dtype=jnp.float32):
    """Banked (lane-major) EKF-KC with the SAME noise settings as
    ``build_filter``'s EKF path (reference ll.rs:37-43) — the fleet
    entry point: B filters advance per jitted step with the bank on the
    TPU vector lanes (see localization/banked.py for why this is ~10x
    the vmapped layout's throughput)."""
    from rustrobotics_tpu.localization.banked import velocity_banked_ekf_kc

    landmarks = LandmarkTable.create(
        ids=dataset.landmark_ids,
        positions=np.concatenate(
            [dataset.landmarks[:, :2], np.zeros((len(dataset.landmarks), 1))],
            axis=1,
        ).astype(np.dtype(dtype)),
    )
    alpha = jnp.asarray([1.0, 1.0, 30.0, 30.0, 10.0, 10.0], dtype=dtype)
    q = jnp.diag(jnp.asarray([0.1, 0.2], dtype=dtype))
    return velocity_banked_ekf_kc(alpha, q, landmarks)


def _replay_banked(filt, x0, cov0, control, hc, ids, z, mask, dt):
    """Whole fleet replay as ONE jitted scan: every event advances all B
    filters; estimates come back as (T, 3, B). ``filt`` (plain dataclass
    of callbacks, not a pytree) is closed over — jit caches per filter
    object, which the fleet entry point constructs once."""

    @jax.jit
    def run(x0, cov0, control, hc, ids, z, mask, dt):
        def step(carry, ev):
            x, cov = carry
            u, hci, idsi, zi, maski, dti = ev
            ub = jnp.broadcast_to(u[:, None], (u.shape[0], x.shape[-1]))
            x, cov = filt.step(x, cov, ub, hci, idsi, zi, maski, dti)
            return (x, cov), x

        return jax.lax.scan(step, (x0, cov0),
                            (control, hc, ids, z, mask, dt))[1]

    return run(x0, cov0, control, hc, ids, z, mask, dt)


def run_utias_localization_fleet(
    dataset: UtiasDataset,
    bank: int = 1024,
    max_events: int = 10000,
    seed: int = 0,
    spread: float = 0.1,
    dtype=jnp.float32,
):
    """Fleet replay: B banked EKF-KC filters consume the same UTIAS event
    stream from perturbed initial states (Monte-Carlo over
    initialization — the fleet-serving scenario). Returns
    (times (T,), xs (T, 3, B)). The per-event cost is ONE lane-parallel
    banked step for the whole fleet — the capability the reference's
    one-filter-object architecture (ekf.rs:81-165) runs B times."""
    filt = build_banked_filter(dataset, dtype)
    events = dataset.events(max_events=max_events, dtype=dtype)
    gt0 = dataset.groundtruth[0]
    x0 = jnp.asarray(gt0[1:4], dtype=dtype)
    dt = events.dt.at[0].set(events.times[0])

    key = jax.random.key(seed)
    x0b = x0[:, None] + spread * jax.random.normal(key, (3, bank), dtype)
    cov0 = jnp.broadcast_to(
        (jnp.eye(3, dtype=dtype) * 1e-10)[:, :, None], (3, 3, bank))
    xs = _replay_banked(
        filt, x0b, cov0, events.control, events.has_control,
        events.meas_ids, events.meas_z, events.meas_mask, dt,
    )
    return np.asarray(events.times), xs


def ate_vs_groundtruth(dataset: UtiasDataset, times, states) -> float:
    """RMSE of estimated xy against time-interpolated groundtruth."""
    gt = dataset.groundtruth
    gt_times = gt[:, 0] - gt[0, 0]  # event times are groundtruth-relative
    gx = np.interp(times, gt_times, gt[:, 1])
    gy = np.interp(times, gt_times, gt[:, 2])
    est = np.asarray(states.x[:, :2])
    return float(np.sqrt(np.mean((est[:, 0] - gx) ** 2 + (est[:, 1] - gy) ** 2)))
