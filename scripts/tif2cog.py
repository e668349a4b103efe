#!/usr/bin/env python
"""CLI: 16-bit TIFF → 8-bit COG conversion (reference entry point
scripts/preprocessing/tif2cog.py; same YAML schema:
``python scripts/tif2cog.py config/config_preprocessing.yaml``)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import cog_pipeline
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Reprojects 16-bit imagery to EPSG:3857 and converts "
                    "it to 8-bit Cloud-Optimized GeoTIFFs.")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "tif2cog.py")
    cog_pipeline.run(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
