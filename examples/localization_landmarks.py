#!/usr/bin/env python
"""UTIAS landmark localization — role of the reference's
``localization_landmarks`` example
(examples/localization/localization_landmarks.rs)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustrobotics_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["landmarks", *sys.argv[1:]]))
