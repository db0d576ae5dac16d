"""Math/state primitives: Gaussian state containers, MVN, angle helpers.

Plays the role of the reference's L0 layer (src/utils/): GaussianState
(src/utils/state.rs:4-12), MultiVariateNormal (src/utils/mvn.rs:30-84),
deg2rad/rad2deg (src/utils/mod.rs:5-13).
"""

from rustrobotics_tpu.utils.angles import deg2rad, rad2deg, wrap_angle  # noqa: F401
from rustrobotics_tpu.utils.state import GaussianState  # noqa: F401
from rustrobotics_tpu.utils.mvn import MultiVariateNormal  # noqa: F401
