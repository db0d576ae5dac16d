#!/usr/bin/env python
"""LQR inverted pendulum — role of the reference's ``inverted_pendulum``
example (examples/control/inverted_pendulum.rs)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustrobotics_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["pendulum", *sys.argv[1:]]))
