"""Graph-based SLAM backend (reference layer L3, src/mapping/).

Pose-graph optimization re-designed TPU-first:

- the g2o parser produces *struct-of-arrays grouped by edge type* (dense
  regular compute for XLA) instead of hash maps of enum nodes/edges
  (reference: src/mapping/g2o.rs:35-143, pose_graph_optimization.rs:20-163)
- per-edge residuals/Jacobians are closed-form and vmapped
  (pose_graph_optimization.rs:441-535 is the math contract)
- normal equations are assembled with vectorized scatter-adds and solved by
  dense Cholesky (small graphs, MXU-friendly), preconditioned CG on
  block-sparse operators (large graphs / TPU), or a host-side direct sparse
  solver (the UMFPACK role, pose_graph_optimization.rs:124-144)
- Gauss-Newton and Levenberg-Marquardt drive the outer loop
  (pose_graph_optimization.rs:247-303)
- SE(3) graphs are fully supported (the reference leaves 3D as todo!(),
  pose_graph_optimization.rs:357)
"""

from rustrobotics_tpu.mapping.ekf_slam import (  # noqa: F401
    EkfSlamKnownCorrespondences,
    EkfSlamState,
)
from rustrobotics_tpu.mapping.fastslam import (  # noqa: F401
    FastSlam,
    FastSlamParticles,
)
from rustrobotics_tpu.mapping.fixed_lag import (  # noqa: F401
    FixedLagSmoother,
    FixedLagState,
)
from rustrobotics_tpu.mapping.frontend import (  # noqa: F401
    build_pose_graph_from_slam_course,
)
from rustrobotics_tpu.mapping.g2o import load_g2o, PoseGraphData  # noqa: F401
from rustrobotics_tpu.mapping.initialization import (  # noqa: F401
    chordal_init_se2,
    chordal_init_se3,
)
from rustrobotics_tpu.mapping.pgo import (  # noqa: F401
    PoseGraph,
    global_error,
    make_optimize_batch,
    optimize,
    stack_graphs,
)
