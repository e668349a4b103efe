#!/usr/bin/env python
"""CLI: statistical analysis of road-surface pixels (reference entry point
scripts/statistical_analysis/statistical_analysis.py; same YAML schema:
``python scripts/statistical_analysis.py config/config_stats.yaml``)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import stats_analysis
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Analyzes road pixel statistics: stats tables, band "
                    "ratios, boxplots, KS tests, PCAs.")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "statistical_analysis.py")
    stats_analysis.run(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
