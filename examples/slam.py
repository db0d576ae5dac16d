#!/usr/bin/env python
"""SLAM on the slam_course dataset: online EKF-SLAM (--method ekf) or the
graph-SLAM front-end + pose-graph optimization (--method pgo). No
counterpart in the reference (its EKF-SLAM file is empty and its PGO has no
front-end)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustrobotics_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["slam", *sys.argv[1:]]))
