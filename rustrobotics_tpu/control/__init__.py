"""Optimal control (reference layer L5, src/control/)."""

from rustrobotics_tpu.control.lqr import (  # noqa: F401
    LinearTimeInvariantModel,
    lqr,
    solve_dare,
)
from rustrobotics_tpu.control.inverted_pendulum import (  # noqa: F401
    InvertedPendulumModel,
    simulate_inverted_pendulum,
)
