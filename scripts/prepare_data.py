#!/usr/bin/env python
"""CLI: statistical-branch data preparation (reference entry point
scripts/statistical_analysis/prepare_data.py; same YAML schema:
``python scripts/prepare_data.py config/config_stats.yaml``)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import stats_prep
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Prepares overlap-free road polygons and the "
                    "restricted AOI for the statistical analysis.")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "prepare_data.py")
    stats_prep.run(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
