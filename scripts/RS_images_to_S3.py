#!/usr/bin/env python
"""CLI: bulk imagery upload to an object store (reference entry point
scripts/preprocessing/RS_images_to_S3.py; same YAML schema:
``python scripts/RS_images_to_S3.py config/config_preprocessing.yaml``)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.pipeline import upload
from roadsurf_tpu.utils.config import load_script_config
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Uploads SWISSIMAGE-RS imagery to the object store "
                    "with skip-if-exists resume.")
    parser.add_argument("config_file", type=str, help="a YAML config file")
    args = parser.parse_args()

    logger.info(f"Using {args.config_file} as config file.")
    cfg = load_script_config(args.config_file, "RS_images_to_S3.py")
    upload.run(cfg)
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
