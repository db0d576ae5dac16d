"""Angle utilities (reference: src/utils/mod.rs:5-13 and the per-model
angle clamps, e.g. src/models/motion.rs:57-63).

``wrap_angle`` is a total wrap to [-pi, pi) via modular arithmetic — the
reference clamps with a single +-2*pi correction which is only correct for
|theta| < 3*pi; a modular wrap is equivalent on that domain and total
everywhere, and is branch-free (jit/vmap friendly).
"""

import jax.numpy as jnp
import numpy as np

_DEG2RAD = np.pi / 180.0
_RAD2DEG = 180.0 / np.pi


def deg2rad(x):
    return x * _DEG2RAD


def rad2deg(x):
    return x * _RAD2DEG


def wrap_angle(theta):
    """Wrap angle(s) to [-pi, pi). Branch-free, works under jit/vmap."""
    return (theta + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
