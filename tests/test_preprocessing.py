"""Preprocessing branch tests: COG writer/reader round-trip with overviews,
jnp nearest reprojection accuracy vs the CRS transforms, stats summary math,
byte scaling, and the 3-step tif2cog pipeline on a local object store."""

import json
import os

import numpy as np
import pytest

from roadsurf_tpu.crs.transform import transform_xy
from roadsurf_tpu.io.cog import average_downsample, write_cog
from roadsurf_tpu.io.geotiff import Raster, read_geotiff, write_geotiff
from roadsurf_tpu.io.objstore import LocalStore
from roadsurf_tpu.pipeline.cog_pipeline import (Tif2Cog, band_stats,
                                                reproject_nearest,
                                                scale_to_byte,
                                                summarize_stats)


def test_cog_roundtrip_with_overviews(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 65535, (300, 520, 4), dtype=np.uint16)
    p = str(tmp_path / "c.tif")
    write_cog(p, data, (0, 0, 520, 300), epsg=3857, nodata=0)
    r = read_geotiff(p)           # reads the full-resolution IFD
    np.testing.assert_array_equal(r.data, data)
    assert r.epsg == 3857
    assert r.bounds == pytest.approx((0, 0, 520, 300))
    assert r.nodata == 0


def test_average_downsample():
    d = np.arange(16, dtype=np.uint16).reshape(4, 4, 1)
    out = average_downsample(d, 2)
    assert out.shape == (2, 2, 1)
    assert out[0, 0, 0] == round((0 + 1 + 4 + 5) / 4)


def test_reproject_nearest_preserves_location(tmp_path):
    # constant image with a bright cross at a known 2056 coordinate
    h = w = 200
    x0, y0 = 2600000.0, 1200000.0  # top-left
    sx = sy = 1.0
    data = np.full((h, w, 3), 100, np.uint16)
    data[90:110, 95:105] = 60000   # block centered at (2600100, 1199900)
    r = Raster(data=data, origin=(x0, y0), pixel_size=(sx, sy), epsg=2056)
    out = reproject_nearest(r, 3857)
    assert out.epsg == 3857
    # locate the block center in the warped image
    ys, xs = np.nonzero(out.data[:, :, 0] > 30000)
    cy, cx = ys.mean(), xs.mean()
    wx, wy = out.px_to_xy(cx + 0.5, cy + 0.5)
    ex, ey = transform_xy(2056, 3857, np.array([2600100.0]),
                          np.array([1199900.0]))
    # within a couple of destination pixels
    assert abs(wx - ex[0]) < 3 * out.pixel_size[0]
    assert abs(wy - ey[0]) < 3 * out.pixel_size[1]
    # nodata fill outside the rotated footprint stays 0
    assert out.nodata == 0


def test_band_stats_ignores_nodata():
    data = np.zeros((10, 10, 2), np.uint16)
    data[:5, :, 0] = 1000
    data[:5, :, 1] = 500
    stats = band_stats(data, nodata=0.0)
    assert stats["1"]["mean"] == pytest.approx(1000)
    assert stats["2"]["min"] == pytest.approx(500)


def test_summarize_and_scale():
    stats = {
        "a.tif": {str(i): {"min": 0, "max": 60000, "mean": 20000,
                           "stddev": 5000} for i in range(1, 5)},
        "b.tif": {str(i): {"min": 0, "max": 60000, "mean": 22000,
                           "stddev": 5000} for i in range(1, 5)},
    }
    s = summarize_stats(stats, r_idx=2, g_idx=3, b_idx=4, nir_idx=1)
    assert 0 <= s["rgb_min"] < s["rgb_max"] <= 65535
    data = np.full((4, 4, 2), 31000, np.uint16)
    out = scale_to_byte(data, [(s["rgb_min"], s["rgb_max"])] * 2)
    assert out.dtype == np.uint8
    assert 0 < out[0, 0, 0] < 255


def test_tif2cog_pipeline_local_store(tmp_path):
    store = LocalStore(str(tmp_path / "store"))
    rng = np.random.default_rng(1)
    # two 4-band 16-bit source images in EPSG:2056
    for i in range(2):
        data = rng.integers(500, 50000, (64, 64, 4), dtype=np.uint16)
        p = str(tmp_path / f"img{i}.tif")
        x0 = 2600000.0 + i * 64
        write_geotiff(p, data, (x0, 1200000.0 - 64, x0 + 64, 1200000.0),
                      epsg=2056)
        store.upload(p, f"in/img{i}.tif")

    pipe = Tif2Cog(store, "in", "tif3857", "cog3857",
                   workdir=str(tmp_path / "wd"))
    res = pipe.run()
    assert len(res["workload"]) == 2
    for i in range(2):
        assert store.exists(f"tif3857/img{i}.tif")
        assert store.exists(f"cog3857/img{i}.tif")
        cog = read_geotiff(store.open_path(f"cog3857/img{i}.tif"))
        assert cog.data.dtype == np.uint8
        assert cog.epsg == 3857
    assert store.exists("tif3857/stats.json")

    # idempotent resume: second run skips everything
    res2 = pipe.run()
    assert res2["summary"]  # summary still computed from cached stats
