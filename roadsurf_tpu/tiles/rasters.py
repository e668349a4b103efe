"""Raster utilities: tile-list download, mosaic, DEM zonal statistics.

Capability parity with reference scripts/functions/fct_rasters.py:
``download_tiles`` (:19-65, a lighter clone of the object-detector's
XYZ.py — skip-if-exists, hard-exit on any failure), ``make_mosaic``
(:68-115, rasterio.merge equivalent) and the swissALTI3D DEM zonal-stats
main (:118-169).
"""

from __future__ import annotations

import os
import sys
import urllib.request

import numpy as np
from ..io.geotiff import Raster, read_geotiff, write_geotiff
from ..utils.logging import logger


def download_tiles(tiles_list: list[str], directory: str = "",
                   crs: str = "2056", save_metadata: bool = False,
                   overwrite: bool = False, opener=None) -> list[str]:
    """Download .tif tiles from a URL list; skip files already on disk;
    exit(1) if any download fails (reference fct_rasters.py:19-65)."""
    successful, written = [], []
    get = opener or (lambda url: urllib.request.urlopen(url).read())
    for url in tiles_list:
        if not url.endswith(".tif"):
            raise Exception("Filename must end with .tif")
        name = url.split("/")[-1]
        path = os.path.join(directory, name)
        if os.path.exists(path) and not overwrite:
            successful.append(url)
            written.append(name)
            continue
        try:
            blob = get(url)
        except Exception as e:
            logger.error(f"download failed for {url}: {e}")
            continue
        with open(path, "wb") as f:
            f.write(blob)
        successful.append(url)
        written.append(name)

    if set(tiles_list) != set(successful):
        logger.error("Some files were not successfully downloaded:")
        for url in tiles_list:
            if url not in successful:
                logger.error(url)
        sys.exit(1)
    return written


def make_mosaic(directory: str, filenames: list[str],
                out_path: str) -> str:
    """Merge georeferenced tiles into one raster (rasterio.merge
    equivalent; first-wins on overlap, reference fct_rasters.py:68-115)."""
    rasters = [read_geotiff(os.path.join(directory, f)) for f in filenames]
    if not rasters:
        raise ValueError("no tiles to mosaic")
    sx, sy = rasters[0].pixel_size
    epsg = rasters[0].epsg
    west = min(r.bounds[0] for r in rasters)
    south = min(r.bounds[1] for r in rasters)
    east = max(r.bounds[2] for r in rasters)
    north = max(r.bounds[3] for r in rasters)
    W = int(round((east - west) / sx))
    H = int(round((north - south) / sy))
    C = rasters[0].data.shape[2]
    nodata = rasters[0].nodata if rasters[0].nodata is not None else 0
    mosaic = np.full((H, W, C), nodata, rasters[0].data.dtype)
    for r in rasters:
        col = int(round((r.bounds[0] - west) / sx))
        row = int(round((north - r.bounds[3]) / sy))
        h, w = r.data.shape[:2]
        region = mosaic[row:row + h, col:col + w]
        fill = region == nodata if nodata is not None else \
            np.ones_like(region, bool)
        region[fill] = r.data[fill]
    write_geotiff(out_path, mosaic, (west, south, east, north), epsg=epsg,
                  nodata=float(nodata))
    return out_path


def dem_zonal_stats(mosaic_path: str, roads_gdf, nodata: float = -9999,
                    stats=("min", "max", "mean", "median", "std")):
    """Per-road elevation statistics over a DEM mosaic (reference
    fct_rasters.py:140-169). Returns the roads GeoDataFrame with the stat
    columns appended."""
    from ..stats.pixels import _geometry_mask

    r = read_geotiff(mosaic_path)
    rows = []
    for geom in roads_gdf.geometry.values:
        mask = _geometry_mask(geom, r).astype(bool)
        vals = r.data[:, :, 0][mask].astype(np.float64)
        vals = vals[vals != nodata]
        if len(vals):
            rows.append({s: float(getattr(np, s)(vals)) if s != "median"
                         else float(np.median(vals)) for s in stats})
        else:
            rows.append({s: None for s in stats})
    out = roads_gdf.reset_index(drop=True).copy()
    for s in stats:
        out[s] = [row[s] for row in rows]
    return out
