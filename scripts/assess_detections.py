#!/usr/bin/env python
"""CLI: object-level detection assessment (native replacement for the
external object-detector's assess_detections.py; same YAML schema)."""

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
        description="Tags detections TP/FP vs clipped labels and writes "
                    "precision-recall sweeps.")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "assess_detections.py")
    assess.run_assessment(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
