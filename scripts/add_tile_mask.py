#!/usr/bin/env python
"""CLI: append a rasterized road-mask band to every tile image (reference
entry point scripts/sandbox/add_tile_mask.py)."""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from roadsurf_tpu.io import read_file
from roadsurf_tpu.pipeline.sandbox import add_tile_mask
from roadsurf_tpu.utils.logging import logger


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="Rasterizes the non-road area per tile and appends a "
                    "255-road-mask band (or writes separate mask files).")
    parser.add_argument("--roads",
                        default="outputs/shapefiles_gpkg/roads_for_OD.shp")
    parser.add_argument("--tiles",
                        default="outputs/obj_detector/split_aoi_tiles.geojson")
    parser.add_argument("--images-root", default="outputs/obj_detector")
    parser.add_argument("--separate-files", action="store_true",
                        help="write masks as standalone single-band tifs "
                             "instead of appending a band")
    parser.add_argument("--mask-dir", default="outputs/obj_detector/masks")
    args = parser.parse_args()

    roads = read_file(args.roads).to_crs(epsg=3857)
    tiles = read_file(args.tiles).to_crs(epsg=3857)
    stats = add_tile_mask(roads, tiles, args.images_root,
                          mask_as_band=not args.separate_files,
                          mask_dir=args.mask_dir)
    logger.info(f"{len(stats)} tiles processed.")
    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
