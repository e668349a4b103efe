#!/usr/bin/env python
"""CLI: final metrics, threshold sweeps, baselines, calibration and HTML
graphs (reference entry point scripts/road_segmentation/final_metrics.py;
config defaults to config/config_obj_detec.yaml like the reference, which
hard-codes it)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import evaluate
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Evaluates the per-road classification: balanced and "
                    "weighted P/R/F1, sweeps, baselines, plots.")
    parser.add_argument("config_file", type=str, nargs="?",
                        default="config/config_obj_detec.yaml")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "final_metrics.py")
    evaluate.run(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
