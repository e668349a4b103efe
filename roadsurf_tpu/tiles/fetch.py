"""XYZ/WMTS tile fetching: download web tiles, decode, georeference.

Replaces the external object-detector's XYZ.py (a lighter clone of which the
reference keeps at scripts/functions/fct_rasters.py:19-65): URL templating
``{z}/{x}/{y}``, concurrent download with an on-disk skip-if-exists cache,
fail-fast on errors. Decoding uses PIL (jpeg/png); fetched tiles become
georeferenced GeoTIFFs in EPSG:3857 via the first-party codec.

``TileFetcher`` accepts http(s):// and file:// templates plus a pluggable
``opener`` so tests can serve synthetic tiles without network egress.
"""

from __future__ import annotations

import concurrent.futures as cf
import io as _io
import os
import urllib.request
from typing import Callable

import numpy as np

from ..io.geotiff import write_geotiff
from ..utils.logging import logger
from .grid import Tile, WebMercatorQuad


def decode_image(blob: bytes) -> np.ndarray:
    """Decode jpeg/png/tif bytes to (H, W, C) uint8."""
    from PIL import Image
    img = Image.open(_io.BytesIO(blob))
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


class TileFetcher:
    """Fetch XYZ tiles and materialize them as georeferenced GeoTIFFs.

    url_template: e.g. ``https://.../{z}/{x}/{y}.jpeg`` (reference
    config_obj_detec.yaml:42) or ``file:///cache/{z}/{x}/{y}.png``.
    opener: ``bytes = opener(url)`` override for tests / custom auth.
    """

    def __init__(self, url_template: str,
                 opener: Callable[[str], bytes] | None = None,
                 n_jobs: int = 10, timeout: float = 30.0):
        self.url_template = url_template
        self.opener = opener or self._default_opener
        self.n_jobs = max(1, n_jobs)
        self.timeout = timeout

    def _default_opener(self, url: str) -> bytes:
        with urllib.request.urlopen(url, timeout=self.timeout) as r:
            return r.read()

    def url_for(self, tile: Tile) -> str:
        return (self.url_template
                .replace("{z}", str(tile.z))
                .replace("{x}", str(tile.x))
                .replace("{y}", str(tile.y)))

    def fetch_array(self, tile: Tile) -> np.ndarray:
        return decode_image(self.opener(self.url_for(tile)))

    def fetch_to_geotiff(self, tile: Tile, path: str,
                         overwrite: bool = False) -> str:
        """Fetch one tile and write it as a 3857-georeferenced GeoTIFF
        (skip-if-exists resume, like the reference's download cache
        fct_rasters.py:42-45 / overwrite flag config_obj_detec.yaml:46)."""
        if os.path.exists(path) and not overwrite:
            return path
        arr = self.fetch_array(tile)
        bounds = WebMercatorQuad.xy_bounds(tile)
        write_geotiff(path, arr, bounds, epsg=3857)
        return path

    def fetch_many(self, tiles: list[Tile], out_dir: str,
                   overwrite: bool = False,
                   filename: Callable[[Tile], str] | None = None) -> list[str]:
        """Concurrently fetch ``tiles`` into ``out_dir`` as ``z_x_y.tif``.
        Hard-fails on the first download error (reference
        fct_rasters.py:57-63 exits on any failure)."""
        os.makedirs(out_dir, exist_ok=True)
        name = filename or WebMercatorQuad.tile_filename
        paths = [os.path.join(out_dir, name(t)) for t in tiles]
        with cf.ThreadPoolExecutor(max_workers=self.n_jobs) as ex:
            futs = {ex.submit(self.fetch_to_geotiff, t, p, overwrite): (t, p)
                    for t, p in zip(tiles, paths)}
            for fut in cf.as_completed(futs):
                t, p = futs[fut]
                try:
                    fut.result()
                except Exception as e:
                    logger.error(f"failed to fetch tile {t}: {e}")
                    raise
        return paths
