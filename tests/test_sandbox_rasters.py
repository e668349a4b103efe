"""Sandbox tools + raster utility tests."""

import os

import numpy as np
import pandas as pd
import pytest

from roadsurf_tpu.geom.core import LineString, Polygon
from roadsurf_tpu.geom.table import GeoDataFrame
from roadsurf_tpu.io.geotiff import read_geotiff, write_geotiff
from roadsurf_tpu.pipeline.sandbox import (add_tile_mask, correct_gt,
                                           limit_used_tiles)
from roadsurf_tpu.tiles.grid import Tile, WebMercatorQuad
from roadsurf_tpu.tiles.rasters import dem_zonal_stats, download_tiles, \
    make_mosaic


def _rect(x0, y0, x1, y1):
    return Polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


def test_correct_gt():
    roads = GeoDataFrame({
        "OBJECTID": [1, 2, 3],
        "BELAGSART": [100, 100, 200],
        "geometry": [_rect(0, 0, 1, 1)] * 3,
    }, crs="EPSG:2056")
    corr = GeoDataFrame({
        "OBJECTID": [2, 3],
        "Belag_veri": [200, 12345],    # 12345 invalid -> keep original
        "geometry": [_rect(0, 0, 1, 1)] * 2,
    }, crs="EPSG:2056")
    out = correct_gt(roads, corr)
    assert list(out["BELAGSART"]) == [100, 200, 200]
    assert "Belag_veri" not in out.columns


def test_limit_used_tiles():
    tiles = GeoDataFrame({
        "id": ["a", "b", "c"],
        "geometry": [_rect(0, 0, 10, 10), _rect(20, 0, 30, 10),
                     _rect(40, 0, 50, 10)],
    }, crs="EPSG:4326")
    gt = GeoDataFrame({"geometry": [_rect(2, 2, 4, 4)]}, crs="EPSG:4326")
    oth = GeoDataFrame({"geometry": [_rect(22, 2, 24, 4)]}, crs="EPSG:4326")
    out = limit_used_tiles(tiles, gt, oth, "trn, tst, val")
    assert list(out["id"]) == ["a", "c"]
    out_oth = limit_used_tiles(tiles, gt, oth, "oth")
    assert list(out_oth["id"]) == ["b", "c"]
    with pytest.raises(ValueError):
        limit_used_tiles(tiles, gt, oth, "trn, oth")


def test_add_tile_mask(tmp_path):
    t = Tile(137150, 92343, 18)
    w, s, e, n = WebMercatorQuad.xy_bounds(t)
    img_dir = tmp_path / "trn-images"
    img_dir.mkdir()
    path = str(img_dir / WebMercatorQuad.tile_filename(t))
    write_geotiff(path, np.full((256, 256, 3), 50, np.uint8), (w, s, e, n))

    # road crossing the middle of the tile (in 3857)
    road = GeoDataFrame({"geometry": [
        _rect(w, (s + n) / 2 - 20, e, (s + n) / 2 + 20)]}, crs="EPSG:3857")
    tiles = GeoDataFrame({
        "id": [WebMercatorQuad.formatted_id(t)],
        "dataset": ["trn"],
        "geometry": [_rect(w, s, e, n)],
    }, crs="EPSG:3857")

    stats = add_tile_mask(road, tiles, str(tmp_path), mask_as_band=True)
    assert len(stats) == 1
    r = read_geotiff(path)
    assert r.data.shape[2] == 4           # mask appended as 4th band
    mask = r.data[:, :, 3]
    assert mask.max() == 255 and mask.min() == 0
    # road rows are masked 255
    mid = mask[128, :]
    assert (mid == 255).all()
    assert (mask[5, :] == 0).all()


def test_download_tiles_and_mosaic(tmp_path):
    # fake opener serving two georeferenced tiles side by side
    tiles = {}
    for i in range(2):
        d = np.full((16, 16, 1), 10 * (i + 1), np.uint8)
        p = str(tmp_path / f"src{i}.tif")
        write_geotiff(p, d, (i * 16, 0, (i + 1) * 16, 16), epsg=2056)
        tiles[f"http://x/{i}.tif"] = open(p, "rb").read()

    out_dir = tmp_path / "dl"
    out_dir.mkdir()
    names = download_tiles(list(tiles), str(out_dir),
                           opener=lambda u: tiles[u])
    assert sorted(names) == ["0.tif", "1.tif"]

    mosaic_path = make_mosaic(str(out_dir), names,
                              str(tmp_path / "mosaic.tif"))
    m = read_geotiff(mosaic_path)
    assert m.data.shape[:2] == (16, 32)
    assert m.data[8, 4, 0] == 10 and m.data[8, 20, 0] == 20

    roads = GeoDataFrame({"geometry": [_rect(2, 2, 14, 14)]},
                         crs="EPSG:2056")
    zs = dem_zonal_stats(mosaic_path, roads, nodata=-9999)
    assert zs["mean"].iloc[0] == pytest.approx(10)
