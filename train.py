#!/usr/bin/env python3
"""Thin wrapper: same CLI entry point name as the reference (train.py)."""
import sys

from ssd_tensorflow_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
