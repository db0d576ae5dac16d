"""Camera geometry: calibration, triangulation, pose, bundle adjustment.

The reference's README Todo names Camera Calibration (DLT, Zhang's
method, P3P), Triangulation, and Bundle Adjustment as unbuilt
(README.md:59-64). This package supplies them TPU-first: every solver is
batched linear algebra (SVD/eigh/closed forms) under vmap — no RANSAC
loops with data-dependent shapes; robustness comes from vectorized
hypothesis scoring over fixed-size batches.
"""

from rustrobotics_tpu.vision.cameras import (  # noqa: F401
    decompose_projection,
    project,
    projection_matrix,
)
from rustrobotics_tpu.vision.calibrate import (  # noqa: F401
    dlt_camera,
    distort_points,
    estimate_radial_distortion,
    homography,
    zhang_calibrate,
)
from rustrobotics_tpu.vision.triangulate import (  # noqa: F401
    triangulate,
    triangulate_pair,
)
from rustrobotics_tpu.vision.p3p import (  # noqa: F401
    p3p,
    p3p_best,
    pnp_ransac,
)
