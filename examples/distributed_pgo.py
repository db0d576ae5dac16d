#!/usr/bin/env python
"""Map-block distributed pose-graph optimization over a device mesh.

No reference counterpart (the reference is single-process, SURVEY §2.3);
this is the pod-slice path: nodes+edges partitioned by node-RCM chunks,
ppermute halo exchange, psum-CG, whole GN/LM loop as one XLA program.

    python examples/distributed_pgo.py --file intel --distributed 8

On a machine without 8 devices, start with
``JAX_PLATFORMS=cpu`` + ``jax.config.update("jax_num_cpu_devices", 8)``
(see tests/conftest.py) or pass a smaller --distributed.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustrobotics_tpu.cli import main

if __name__ == "__main__":
    args = sys.argv[1:] or ["--file", "intel", "--distributed", "1"]
    sys.exit(main(["pgo", *args]))
