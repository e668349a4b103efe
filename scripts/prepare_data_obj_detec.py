#!/usr/bin/env python
"""CLI: swissTLM3D road lines → polygon labels + z18 tile grid + GT/OTH
label split (reference entry point
scripts/road_segmentation/prepare_data_obj_detec.py, same YAML schema:
``python scripts/prepare_data_obj_detec.py config/config_obj_detec.yaml``).
"""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import label_prep
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Generates COCO-ready datasets for road-surface "
                    "object detection.")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "prepare_data_obj_detec.py")
    label_prep.run(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
