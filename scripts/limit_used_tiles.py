#!/usr/bin/env python
"""CLI: restrict the tileset to tiles of the considered label set
(reference entry point scripts/sandbox/limit_used_tiles.py; same YAML
block in config_obj_detec.yaml)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import sandbox
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Keeps only tiles intersecting the considered labels, "
                    "excluding tiles touching the other label set.")
    parser.add_argument("config_file", type=str, nargs="?",
                        default="config/config_obj_detec.yaml")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "limit_used_tiles.py")
    sandbox.run_limit_used_tiles(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
