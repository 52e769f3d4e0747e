#!/usr/bin/env python3
"""Thin wrapper: same CLI entry point name as the reference (export_model.py)."""
import sys

from ssd_tensorflow_tpu.cli.export_model import main

if __name__ == "__main__":
    sys.exit(main())
