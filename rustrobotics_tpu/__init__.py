"""rustrobotics_tpu — a TPU-native probabilistic-robotics framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
jgsimard/RustRobotics (Bayesian filters, landmark localization, graph-based
SLAM via Gauss-Newton / Levenberg-Marquardt pose-graph optimization, LQR
control), built TPU-first:

- all state is pytrees of arrays; batch dims come from ``jax.vmap``
- trajectories are scanned with ``jax.lax.scan`` (plus an associative-scan
  parallel Kalman filter for long sequences)
- the pose-graph backend assembles block-sparse normal equations with
  vectorized per-edge linearization and solves them with dense Cholesky,
  preconditioned CG (TPU path), or a host-side direct sparse solver
- multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives (``psum``) over edge/particle shards

Nothing in here is a translation of the reference's Rust code; the reference
defines *what* to build (see file:line citations in docstrings), not *how*.
"""

__version__ = "0.1.0"

from rustrobotics_tpu.utils.state import GaussianState  # noqa: F401
