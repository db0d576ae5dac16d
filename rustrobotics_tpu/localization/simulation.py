"""Synthetic 2D localization problem — the minimum end-to-end slice.

Role of the reference's ``localization`` example
(examples/localization/bayesian_filter.rs:22-135): a unicycle driven with
constant control, noisy GPS observations and noisy control inputs, filtered
by EKF / UKF / PF. Here the entire run — truth propagation, noise
injection, filtering — is a single ``lax.scan`` under ``jit``, so a 500-step
episode is one XLA program, and a *bank* of episodes is one extra vmap axis.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from rustrobotics_tpu.localization.ekf import ExtendedKalmanFilter
from rustrobotics_tpu.localization.pf import (
    ParticleFilter,
    gaussian_estimate,
    init_particles,
)
from rustrobotics_tpu.localization.ukf import UnscentedKalmanFilter
from rustrobotics_tpu.models import (
    SimpleProblemMeasurementModel,
    SimpleProblemMotionModel,
)
from rustrobotics_tpu.utils.angles import deg2rad
from rustrobotics_tpu.utils.state import GaussianState


@flax.struct.dataclass
class SimpleProblem:
    """Noisy truth/observation generator
    (reference: bayesian_filter.rs:22-55)."""

    gps_noise: jnp.ndarray  # (2, 2)
    input_noise: jnp.ndarray  # (2, 2)
    motion_model: Any
    measurement_model: Any

    def observation(self, key, x_true, x_dr, u, dt):
        k_gps, k_u = jax.random.split(key)
        x_true_next = self.motion_model.prediction(x_true, u, dt)
        z = self.measurement_model.prediction(x_true_next) + self.gps_noise @ (
            jax.random.normal(k_gps, (2,), dtype=x_true.dtype)
        )
        ud = u + self.input_noise @ jax.random.normal(k_u, (2,), dtype=x_true.dtype)
        x_dr_next = self.motion_model.prediction(x_dr, ud, dt)
        return x_true_next, z, x_dr_next, ud


def default_problem(dtype=jnp.float32):
    """Noise settings of the reference example (bayesian_filter.rs:104-108)."""
    return SimpleProblem(
        gps_noise=jnp.asarray([[0.25, 0.0], [0.0, 0.25]], dtype=dtype),
        input_noise=jnp.asarray(
            [[1.0, 0.0], [0.0, deg2rad(30.0) ** 2]], dtype=dtype
        ),
        motion_model=SimpleProblemMotionModel.create(),
        measurement_model=SimpleProblemMeasurementModel.create(),
    )


def default_noise_covs(dtype=jnp.float32):
    """Q, R of the reference example (bayesian_filter.rs:64-68)."""
    q = jnp.diag(jnp.asarray([0.1, 0.1, deg2rad(1.0), 1.0], dtype=dtype))
    q = q @ q
    r = jnp.eye(2, dtype=dtype)
    return q, r


def make_filter(algo: str, dtype=jnp.float32, num_particles: int = 300):
    q, r = default_noise_covs(dtype)
    mot = SimpleProblemMotionModel.create()
    meas = SimpleProblemMeasurementModel.create()
    if algo == "ekf":
        return ExtendedKalmanFilter(
            r=q, q=r, motion_model=mot, measurement_model=meas
        )
    if algo == "ukf":
        return UnscentedKalmanFilter.create(
            q=q, r=r, measurement_model=meas, motion_model=mot,
            alpha=0.1, beta=2.0, kappa=0.0,
        )
    if algo == "pf":
        return ParticleFilter(
            r=q, q=r, motion_model=mot, measurement_model=meas,
            resampling="stratified",
        )
    raise ValueError(f"unknown algo {algo!r}")


def run_simulation(
    key,
    algo: str = "ekf",
    sim_time: float = 50.0,
    dt: float = 0.1,
    num_particles: int = 300,
    dtype=jnp.float32,
):
    """Run the full episode under jit. Returns a history dict of stacked
    arrays (role of the reference's ``History``, utils/plot.rs:40-48)."""
    num_steps = int(sim_time / dt)
    problem = default_problem(dtype)
    filt = make_filter(algo, dtype, num_particles)
    u = jnp.asarray([1.0, 0.1], dtype=dtype)
    x0 = jnp.zeros(4, dtype=dtype)
    init = GaussianState(x=x0, cov=jnp.eye(4, dtype=dtype))

    is_pf = algo == "pf"
    if is_pf:
        key, k_init = jax.random.split(key)
        particles0 = init_particles(k_init, init, filt.r, num_particles)

    def step(carry, k):
        x_true, x_dr, fstate = carry
        k_obs, k_filt = jax.random.split(k)
        x_true, z, x_dr, ud = problem.observation(k_obs, x_true, x_dr, u, dt)
        if is_pf:
            fstate = filt.step(k_filt, fstate, ud, z, dt)
            est = gaussian_estimate(fstate)
        else:
            fstate = filt.step(fstate, ud, z, dt)
            est = fstate
        return (x_true, x_dr, fstate), {
            "z": z,
            "x_true": x_true,
            "x_dr": x_dr,
            "x_est": est.x,
            "cov_est": est.cov,
        }

    keys = jax.random.split(key, num_steps)
    f0 = particles0 if is_pf else init
    (_, _, _), history = jax.lax.scan(step, (x0, x0, f0), keys)
    return history


run_simulation_jit = jax.jit(
    run_simulation, static_argnames=("algo", "sim_time", "dt", "num_particles", "dtype")
)
