"""Dataset loaders (reference layer L4, src/data/).

The reference's loaders produce lazy per-event iterators over irregular
streams (utias.rs:54-163) which the filters consume one dynamic dispatch at
a time. The TPU design moves ALL irregularity to load time: loaders emit
fixed-shape, time-sorted event arrays with masks (odometry-valid, padded
measurement blocks), so trajectory replay is a single ``lax.scan`` over
static shapes (SURVEY §3.2's jit-ification challenge solved at the data
layer).
"""

from rustrobotics_tpu.data.utias import UtiasDataset, load_utias  # noqa: F401
from rustrobotics_tpu.data.slam_course import (  # noqa: F401
    SlamCourseDataset,
    load_slam_course,
)
