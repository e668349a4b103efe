#!/usr/bin/env python
"""CLI: merge field-verified surface corrections into the road ground truth
(reference entry point scripts/sandbox/correct_gt.py; same YAML block in
config_preprocessing.yaml)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.io import read_file, write_file
from roadsurf_tpu.pipeline.sandbox import correct_gt
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Overrides BELAGSART with field-verified Belag_veri "
                    "values where present.")
    parser.add_argument("config_file", type=str, nargs="?",
                        default="config/config_preprocessing.yaml")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "correct_gt.py")
    inp = cfg["input"]
    input_dir = inp["input_folder"]
    roads = read_file(os.path.join(input_dir,
                                   inp["input_files"]["initial_roads"]))
    corrections = read_file(os.path.join(input_dir,
                                         inp["input_files"]["corrections"]))
    corrected = correct_gt(roads, corrections)
    out = os.path.join(input_dir, "corrected_roads_inside_AOI.shp")
    write_file(corrected, out)
    logger.info(f"Written: {out}")
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
