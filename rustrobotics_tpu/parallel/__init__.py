"""Distributed execution over TPU device meshes.

The reference has no distributed runtime at all (SURVEY §2.3) — its only
parallelism is one rayon par_iter_mut (pose_graph_optimization.rs:230).
This package is the comm layer the TPU build adds as a first-class
component: explicit ``jax.sharding.Mesh``es, ``shard_map``-ed kernels, and
XLA collectives over ICI (psum for normal-equation and CG reductions,
weight normalization for sharded particle clouds).
"""

from rustrobotics_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
)
from rustrobotics_tpu.parallel.pgo_sharded import (  # noqa: F401
    distributed_gn_step,
    distributed_global_error,
    distributed_optimize,
    pad_edges_for_sharding,
)
from rustrobotics_tpu.parallel.pf_sharded import (  # noqa: F401
    sharded_pf_step,
)
from rustrobotics_tpu.parallel.block_layout import (  # noqa: F401
    build_block_layout,
)
from rustrobotics_tpu.parallel.pgo_blocks import (  # noqa: F401
    block_optimize,
    block_optimize_multistart,
    comm_budget,
    make_block_optimize,
    make_block_step,
)
