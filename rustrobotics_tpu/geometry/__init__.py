"""Array-backed Lie-group helpers for SE(2)/SE(3).

Plays the role of the reference's nalgebra Isometry2/Isometry3 usage and its
hand-ported g2o SO(3) helpers (src/mapping/se2_se3.rs:36-89). Everything is a
plain array op over trailing dims so vmap supplies batching.
"""

from rustrobotics_tpu.geometry import se2, se3  # noqa: F401
