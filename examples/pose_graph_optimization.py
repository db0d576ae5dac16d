#!/usr/bin/env python
"""Pose-graph optimization on a bundled g2o file — role of the reference's
``pose_graph_optimization`` example (examples/mapping/
pose_graph_optimization.rs). All 8 bundled graphs work here, including the
3D ones the reference's todo!() rejects.

    python examples/pose_graph_optimization.py --file intel --solver gn \
        --backend banded-direct
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustrobotics_tpu.cli import main

if __name__ == "__main__":
    args = sys.argv[1:] or ["--file", "intel"]
    sys.exit(main(["pgo", *args]))
