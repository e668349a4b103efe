#!/usr/bin/env python
"""CLI: per-band tile-image statistics (native replacement for the external
object-detector's calculate_statistics.py; same YAML schema)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import assess
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Computes per-band mean/std over each split's tile "
                    "images (input normalization constants).")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "calculate_statistics.py")
    assess.run_statistics(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
