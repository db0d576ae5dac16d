#!/usr/bin/env python
"""Simulated unicycle localization (EKF/UKF/PF) — role of the reference's
``localization`` example (examples/localization/bayesian_filter.rs), minus
the interactive menu: pass --algo instead. Produces the same trajectory
chart and animated GIF."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustrobotics_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["localization", *sys.argv[1:]]))
