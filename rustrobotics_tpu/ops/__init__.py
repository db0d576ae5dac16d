"""Low-level compute tier: native C++ kernels and Pallas TPU kernels."""

from rustrobotics_tpu.ops.native_solver import (  # noqa: F401
    native_available,
    solve_coo_native,
)
