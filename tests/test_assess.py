"""Object-level assessment + band-statistics stage tests."""

import json
import os

import numpy as np
import pytest

from roadsurf_tpu.geom.core import Polygon
from roadsurf_tpu.geom.table import GeoDataFrame
from roadsurf_tpu.pipeline.assess import pr_sweep, run_statistics, \
    tag_detections


def _rect(x0, y0, x1, y1):
    return Polygon([(x0, y0), (x1, y0), (x1, y1), (x0, y1)])


def test_tag_detections():
    labels = GeoDataFrame({
        "CATEGORY": ["artificial", "natural"],
        "geometry": [_rect(0, 0, 10, 10), _rect(20, 0, 30, 10)],
    }, crs="EPSG:3857")
    dets = GeoDataFrame({
        "det_class_name": ["artificial", "artificial", "natural"],
        "score": [0.9, 0.8, 0.7],
        "geometry": [_rect(0, 0, 10, 10),      # TP on label 1
                     _rect(19, 0, 31, 10),     # wrong class on label 2
                     _rect(50, 50, 60, 60)],   # FP, intersects nothing
    }, crs="EPSG:3857")
    tagged, labs = tag_detections(dets, labels)
    assert list(tagged["tag"]) == ["TP", "wrong class", "FP"]
    assert list(labs["detected"]) == [True, False]
    sweep = pr_sweep(tagged, labs)
    row = sweep[sweep["threshold"] == 0.85].iloc[0]
    assert row["TP"] == 1 and row["FP"] == 0


def test_run_statistics(tmp_path):
    from roadsurf_tpu.io.geotiff import write_geotiff
    from roadsurf_tpu.io import write_file

    wf = str(tmp_path)
    d = os.path.join(wf, "trn-images")
    os.makedirs(d)
    write_geotiff(os.path.join(d, "18_1_1.tif"),
                  np.full((8, 8, 3), 100, np.uint8), (0, 0, 8, 8))
    write_geotiff(os.path.join(d, "18_1_2.tif"),
                  np.full((8, 8, 3), 200, np.uint8), (0, 0, 8, 8))
    tiles = GeoDataFrame({
        "id": ["(1, 1, 18)", "(1, 2, 18)"],
        "dataset": ["trn", "trn"],
        "geometry": [_rect(0, 0, 8, 8), _rect(8, 0, 16, 8)],
    }, crs="EPSG:4326")
    write_file(tiles, os.path.join(wf, "split_aoi_tiles.geojson"),
               driver="GeoJSON")

    run_statistics({"working_folder": wf,
                    "tiles": "split_aoi_tiles.geojson"})
    stats = json.load(open(os.path.join(wf, "img_statistics.json")))
    assert stats["trn"]["mean"] == [150.0, 150.0, 150.0]
    assert stats["trn"]["std"] == [50.0, 50.0, 50.0]
