#!/usr/bin/env python
"""CLI: swissALTI3D DEM mosaic + per-road elevation zonal statistics
(reference entry point: the __main__ of scripts/functions/fct_rasters.py —
download DEM tiles from a URL list, mosaic them, compute per-road
min/max/mean/median/std elevation over the classified road polygons).
"""

import argparse
import os
import sys
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from roadsurf_tpu.io import read_file, write_file
from roadsurf_tpu.tiles.rasters import dem_zonal_stats, download_tiles, \
    make_mosaic
from roadsurf_tpu.utils.logging import logger
from roadsurf_tpu.utils.misc import ensure_dir_exists


def main():
    tic = time()
    parser = argparse.ArgumentParser(
        description="DEM mosaic + per-road elevation zonal statistics.")
    parser.add_argument("--initial-folder", default="data/DEM")
    parser.add_argument("--processed-folder", default="outputs")
    parser.add_argument("--final-folder", default="outputs/final")
    parser.add_argument("--url-file",
                        default="ch.swisstopo.swissalti3d_res2m.csv",
                        help="CSV of DEM tile URLs (one per line)")
    parser.add_argument("--roads",
                        default="shp_gpkg/types_from_detections.shp",
                        help="classified road polygons, relative to "
                             "--final-folder")
    parser.add_argument("--generate-mosaic", action="store_true")
    parser.add_argument("--skip-zonal-stats", action="store_true")
    args = parser.parse_args()

    dem_dir = ensure_dir_exists(os.path.join(args.processed_folder, "DEM"))
    mosaic_path = os.path.join(dem_dir, "DEM_aoi.tif")

    if args.generate_mosaic:
        urls = pd.read_csv(os.path.join(args.initial_folder, args.url_file),
                           header=None)
        names = download_tiles(urls[0].unique().tolist(),
                               args.initial_folder)
        logger.info("Generating the mosaic from tiles...")
        make_mosaic(args.initial_folder, names, mosaic_path)
        logger.info(f"DEM mosaic written: {mosaic_path}")

    if not args.skip_zonal_stats:
        logger.info("Calculating zonal stats...")
        roads = read_file(os.path.join(args.final_folder, args.roads))
        zs = dem_zonal_stats(mosaic_path, roads, nodata=-9999)
        out = os.path.join(args.processed_folder,
                           "shapefiles_gpkg", "roads_dem_zs.shp")
        ensure_dir_exists(os.path.dirname(out))
        write_file(zs, out)
        logger.info(f"Zonal stats written: {out}")

    logger.success(f"Done. Elapsed time: {time() - tic:.2f} seconds")


if __name__ == "__main__":
    main()
