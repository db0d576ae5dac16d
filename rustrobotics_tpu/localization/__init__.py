"""Bayesian state estimators (reference layer L2, src/localization/).

Functional filters: each is a pytree of parameters whose ``step`` maps
(state, control, measurement, dt) -> state. Trajectories are replayed with
``jax.lax.scan``; particle/sigma-point batches are vmapped array axes — the
TPU-native replacement for the reference's per-particle Rust loops
(src/localization/particle_filter.rs:90-106).
"""

from rustrobotics_tpu.localization.ekf import (  # noqa: F401
    ExtendedKalmanFilter,
    ExtendedKalmanFilterKnownCorrespondences,
)
from rustrobotics_tpu.localization.ukf import (  # noqa: F401
    UnscentedKalmanFilter,
    UnscentedKalmanFilterKnownCorrespondences,
)
from rustrobotics_tpu.localization.pf import (  # noqa: F401
    AdaptiveParticleFilter,
    ParticleFilter,
    ParticleFilterKnownCorrespondences,
    effective_sample_size,
    gaussian_estimate,
    weighted_gaussian_estimate,
    resample_multinomial,
    resample_stratified,
    resample_systematic,
)
from rustrobotics_tpu.localization.landmark_table import LandmarkTable  # noqa: F401
from rustrobotics_tpu.localization.kalman_scan import (  # noqa: F401
    parallel_linear_kalman_filter,
)
from rustrobotics_tpu.localization.banked import (  # noqa: F401
    BankedEKF,
    BankedEKFKC,
    BankedUKF,
    BankedUKFKC,
    velocity_banked_ekf_kc,
    velocity_banked_ukf_kc,
)
