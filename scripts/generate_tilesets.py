#!/usr/bin/env python
"""CLI: AOI tiles → dataset split, tile imagery, COCO files (native
replacement for the external object-detector's generate_tilesets.py;
same YAML schema: ``python scripts/generate_tilesets.py
config/config_obj_detec.yaml``)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import tilesets
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Generates the tilesets (images + COCO annotations) "
                    "for the road-surface detector.")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "generate_tilesets.py")
    tilesets.run(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
