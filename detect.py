#!/usr/bin/env python3
"""Thin wrapper: same CLI entry point name as the reference (detect.py)."""
import sys

from ssd_tensorflow_tpu.cli.detect import main

if __name__ == "__main__":
    sys.exit(main())
