"""Motion and measurement models (reference layer L1, src/models/).

Models are pytree dataclasses of parameters with pure-function methods, so a
model slots directly into jit/vmap/scan. Analytic Jacobians mirror the
reference's closed forms (for golden-value parity); ``jax.jacfwd`` serves as
an autodiff cross-check in tests.
"""

from rustrobotics_tpu.models.motion import (  # noqa: F401
    SimpleProblemMotionModel,
    VelocityMotionModel,
)
from rustrobotics_tpu.models.measurement import (  # noqa: F401
    RangeBearingMeasurementModel,
    SimpleProblemMeasurementModel,
)
