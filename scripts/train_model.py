#!/usr/bin/env python
"""CLI: Mask R-CNN training over the generated COCO tilesets (native
replacement for the external object-detector's train_model.py; same YAML
schema: ``python scripts/train_model.py config/config_obj_detec.yaml``)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import training
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Trains the Mask R-CNN road-surface detector.")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    parser.add_argument("--max-iter", type=int, default=None,
                        help="override SOLVER.MAX_ITER")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="override SOLVER.IMS_PER_BATCH")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "train_model.py")
    training.run(cfg, max_iter=args.max_iter, batch_size=args.batch_size)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
