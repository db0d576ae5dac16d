"""Measurement models.

Capability parity with the reference's MeasurementModel trait
(src/models/measurement.rs:6-12): ``prediction(x, landmark) -> z`` and the
measurement Jacobian. Landmarks are explicit array arguments (no Option /
panic — see measurement.rs:31-33); batching over particles or landmarks is a
``vmap`` at the call site.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class RangeBearingMeasurementModel:
    """Landmark range-bearing model, Probabilistic Robotics p. 177
    (reference: src/models/measurement.rs:16-66).

    State [x, y, theta]; landmark [lx, ly, ...] (extra dims ignored);
    z = [sqrt(q), atan2(dy, dx) - theta].
    """

    @classmethod
    def create(cls):
        return cls()

    def prediction(self, x, landmark):
        dx = landmark[..., 0] - x[..., 0]
        dy = landmark[..., 1] - x[..., 1]
        q = dx * dx + dy * dy
        rng = jnp.sqrt(q)
        bearing = jnp.arctan2(dy, dx) - x[..., 2]
        return jnp.stack([rng, bearing], axis=-1)

    def jacobian(self, x, landmark):
        """(..., 2, 3) analytic Jacobian (role of measurement.rs:45-65).

        NOTE: the reference writes the (bearing, y) entry as ``+dx/q``
        (measurement.rs:62); the correct derivative of
        ``atan2(dy, dx) - theta`` w.r.t. the robot y is ``-dx/q``
        (Probabilistic Robotics p. 177). We use the correct sign — verified
        against ``jax.jacfwd`` in tests.
        """
        dx = landmark[..., 0] - x[..., 0]
        dy = landmark[..., 1] - x[..., 1]
        q = dx * dx + dy * dy
        qs = jnp.sqrt(q)
        z = jnp.zeros_like(dx)
        mone = -jnp.ones_like(dx)
        return jnp.stack(
            [
                jnp.stack([-dx / qs, -dy / qs, z], axis=-1),
                jnp.stack([dy / q, -dx / q, mone], axis=-1),
            ],
            axis=-2,
        )


@flax.struct.dataclass
class SimpleProblemMeasurementModel:
    """GPS-like direct (x, y) observation of a 4-dim state
    (reference: src/models/measurement.rs:68-89)."""

    @classmethod
    def create(cls):
        return cls()

    def prediction(self, x, landmark=None):
        del landmark
        return x[..., :2]

    def jacobian(self, x, landmark=None):
        del landmark
        j = jnp.zeros(x.shape[:-1] + (2, x.shape[-1]), dtype=x.dtype)
        return j.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
