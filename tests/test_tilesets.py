"""Tileset generation tests: GeoTIFF codec round-trip, XYZ fetch with a
synthetic opener (zero-egress), dataset split, clipping, COCO output."""

import io
import json
import os

import numpy as np
import pandas as pd
import pytest

from fixtures import synthetic_aoi, synthetic_forests, synthetic_roads, \
    roads_parameters_df
from roadsurf_tpu.io.geotiff import Raster, read_geotiff, write_geotiff
from roadsurf_tpu.pipeline.label_prep import (determine_road_surfaces,
                                              generate_labels,
                                              generate_tiles_info)
from roadsurf_tpu.pipeline.tilesets import clip_labels, run, split_tiles
from roadsurf_tpu.tiles.fetch import TileFetcher
from roadsurf_tpu.tiles.grid import Tile, WebMercatorQuad


def _png_bytes(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _fake_opener(url):
    # derive a deterministic pattern from the url
    h = abs(hash(url)) % 200
    arr = np.full((256, 256, 3), h, np.uint8)
    arr[::16, :, 0] = 255
    return _png_bytes(arr)


def test_geotiff_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    bounds = (100.0, 200.0, 228.0, 328.0)
    p = str(tmp_path / "t.tif")
    write_geotiff(p, data, bounds, epsg=3857)
    r = read_geotiff(p)
    np.testing.assert_array_equal(r.data, data)
    assert r.epsg == 3857
    assert r.bounds == pytest.approx(bounds)
    assert r.pixel_size == (pytest.approx(2.0), pytest.approx(2.0))


def test_geotiff_uint16_uncompressed(tmp_path):
    data = (np.arange(32 * 32 * 4, dtype=np.uint16)
            .reshape(32, 32, 4) % 65535)
    p = str(tmp_path / "t16.tif")
    write_geotiff(p, data, (0, 0, 32, 32), epsg=2056, compress=False,
                  nodata=0)
    r = read_geotiff(p)
    np.testing.assert_array_equal(r.data, data)
    assert r.epsg == 2056
    assert r.nodata == 0


def test_fetcher_writes_georeferenced_tiles(tmp_path):
    f = TileFetcher("https://fake/{z}/{x}/{y}.png", opener=_fake_opener,
                    n_jobs=4)
    tiles = [Tile(137150, 92343, 18), Tile(137151, 92343, 18)]
    paths = f.fetch_many(tiles, str(tmp_path))
    assert sorted(os.path.basename(p) for p in paths) == \
        ["18_137150_92343.tif", "18_137151_92343.tif"]
    r = read_geotiff(paths[0])
    assert r.data.shape == (256, 256, 3)
    assert r.bounds == pytest.approx(WebMercatorQuad.xy_bounds(tiles[0]))
    # skip-if-exists: second fetch must not rewrite
    m0 = os.path.getmtime(paths[0])
    f.fetch_many(tiles, str(tmp_path))
    assert os.path.getmtime(paths[0]) == m0


@pytest.fixture(scope="module")
def prepared():
    nfr = determine_road_surfaces(synthetic_roads(), synthetic_forests(),
                                  roads_parameters_df())
    tiles = generate_tiles_info(nfr, synthetic_aoi(), roads_parameters_df(),
                                zoom_level=18)
    gt, oth = generate_labels(nfr, tiles.to_crs(epsg=4326))
    return nfr, tiles, gt, oth


def test_split_tiles_deterministic(prepared):
    _, tiles, gt, _ = prepared
    s1 = split_tiles(tiles.to_crs(epsg=4326), gt)
    s2 = split_tiles(tiles.to_crs(epsg=4326), gt)
    assert list(s1["dataset"]) == list(s2["dataset"])
    assert set(s1["dataset"]) <= {"trn", "val", "tst", "oth"}
    # every GT-label-covered tile is in a training split
    assert (s1["dataset"] != "oth").any()


def test_clip_labels_stays_within_tiles(prepared):
    _, tiles, gt, _ = prepared
    tiles_3857 = tiles
    gt_3857 = gt.to_crs(epsg=3857)
    clipped = clip_labels(gt_3857, tiles_3857[["id", "geometry"]])
    assert "tile_id" in clipped.columns
    by_id = {t["id"]: t["geometry"]
             for _, t in tiles_3857[["id", "geometry"]].iterrows()}
    for _, row in clipped.iterrows():
        g = row["geometry"]
        if g.is_empty:
            continue
        tile_geom = by_id[row["tile_id"]]
        assert g.intersection(tile_geom).area == pytest.approx(g.area,
                                                               rel=1e-6)


def test_run_end_to_end(tmp_path, prepared):
    from roadsurf_tpu.io import write_file
    _, tiles, gt, oth = prepared
    wd = str(tmp_path)
    os.makedirs(os.path.join(wd, "json_inputs"))
    write_file(tiles.to_crs(epsg=4326),
               os.path.join(wd, "json_inputs", "tiles_aoi.geojson"),
               driver="GeoJSON")
    write_file(gt, os.path.join(wd, "json_inputs",
                                "ground_truth_labels.geojson"),
               driver="GeoJSON")
    cfg = {
        "working_directory": wd,
        "debug_mode": {"enable": False},
        "datasets": {
            "aoi_tiles_geojson": "json_inputs/tiles_aoi.geojson",
            "ground_truth_labels_geojson":
                "json_inputs/ground_truth_labels.geojson",
            "orthophotos_web_service": {
                "type": "XYZ",
                "url": "https://fake/{z}/{x}/{y}.png",
                "srs": "EPSG:3857",
            },
        },
        "output_folder": "obj_detector",
        "tile_size": 256,
        "overwrite": False,
        "n_jobs": 4,
        "COCO_metadata": {"year": 2022, "version": 1.0,
                          "description": "test", "contributor": "t",
                          "url": "x", "license": {"name": "n", "url": "u"}},
    }
    run(cfg, opener=_fake_opener)
    od = os.path.join(wd, "obj_detector")

    split = json.load(open(os.path.join(od, "split_aoi_tiles.geojson")))
    assert {f["properties"]["dataset"] for f in split["features"]} <= \
        {"trn", "val", "tst", "oth"}

    # labels_id readable the way the reference reads it
    labels_id = pd.read_json(os.path.join(od, "labels_id.json"),
                             orient="index")
    assert list(labels_id["id"]) == [1, 2]
    assert set(labels_id["name"]) == {"artificial", "natural"}

    total_imgs = 0
    for ds in ("trn", "val", "tst", "oth"):
        coco = json.load(open(os.path.join(od, f"COCO_{ds}.json")))
        n_imgs = len(coco["images"])
        total_imgs += n_imgs
        img_dir = os.path.join(od, f"{ds}-images")
        for im in coco["images"]:
            assert os.path.exists(os.path.join(img_dir, im["file_name"]))
        for ann in coco["annotations"]:
            for ring in ann["segmentation"]:
                assert len(ring) >= 6 and len(ring) % 2 == 0
                assert all(0 <= v <= 256 for v in ring)
    assert total_imgs == len(split["features"])

    meta = json.load(open(os.path.join(od, "img_metadata.json")))
    assert len(meta) == total_imgs
    some = next(iter(meta.values()))
    assert some["crs"] == "EPSG:3857" and len(some["bounds_3857"]) == 4
    assert len(os.listdir(os.path.join(od, "all-images"))) == total_imgs
