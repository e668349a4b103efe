#!/usr/bin/env python
"""CLI: batched Mask R-CNN tile inference → detection polygons (native
replacement for the external object-detector's make_detections.py; same
YAML schema: ``python scripts/make_detections.py
config/config_obj_detec.yaml``)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import detections
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Runs Mask R-CNN inference over the generated tilesets "
                    "and writes georeferenced detection polygons.")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    parser.add_argument("--batch-size", type=int,
                        default=int(os.environ.get("RS_BATCH", "16")))
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "make_detections.py")
    detections.run(cfg, batch_size=args.batch_size)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
