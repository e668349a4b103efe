"""End-to-end pipeline integration test (host stages, no model):

label engineering → tileset generation → fabricated perfect detections →
determine_class → final_metrics. A detector that returns exactly the
clipped GT labels with score 0.95 must score balanced F1 = 1.0; this pins
the whole aggregation + evaluation stack.
"""

import io
import json
import os

import numpy as np
import pandas as pd
import pytest
import yaml

# the workspace fixture runs the full label->tileset->metrics chain
pytestmark = pytest.mark.slow

from fixtures import (roads_parameters_df, synthetic_aoi, synthetic_forests,
                      synthetic_roads, write_data_dir)
from roadsurf_tpu.geom.core import Polygon
from roadsurf_tpu.geom.table import GeoDataFrame
from roadsurf_tpu.io import read_file, write_file
from roadsurf_tpu.io.xlsx import write_xlsx
from roadsurf_tpu.pipeline import classify, evaluate, label_prep, tilesets


def _png_opener(url):
    from PIL import Image
    arr = np.full((256, 256, 3), 128, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    write_data_dir(root)
    # quarries far away from the synthetic scene
    qdir = os.path.join(root, "data", "quarries")
    os.makedirs(qdir, exist_ok=True)
    write_file(GeoDataFrame(
        {"geometry": [Polygon([(2500000, 1100000), (2500100, 1100000),
                               (2500100, 1100100), (2500000, 1100100)])]},
        crs="EPSG:2056"), os.path.join(qdir, "quarries.shp"))

    cwd = os.getcwd()
    os.chdir(root)
    try:
        cfg = yaml.safe_load(open(os.path.join(cwd, "config",
                                               "config_obj_detec.yaml")))
        label_prep.run(cfg["prepare_data_obj_detec.py"])
        tilesets.run(cfg["generate_tilesets.py"], opener=_png_opener)

        # fabricate a perfect detector: clipped GT labels as detections
        od = "outputs/obj_detector"
        split = read_file(os.path.join(od, "split_aoi_tiles.geojson"))
        gt = read_file("outputs/json_inputs/ground_truth_labels.geojson")
        split_3857 = split.to_crs(epsg=3857)
        gt_3857 = gt.to_crs(epsg=3857)
        clipped = tilesets.clip_labels(gt_3857,
                                       split_3857[["id", "geometry"]])
        ds_of_tile = dict(zip(split["id"], split["dataset"]))
        clipped["dataset"] = [ds_of_tile[t] for t in clipped["tile_id"]]
        for ds in ("trn", "val", "tst", "oth"):
            sel = clipped[clipped["dataset"] == ds]
            det = GeoDataFrame({
                "geometry": list(sel["geometry"].values),
                "score": [0.95] * len(sel),
                "det_class": [0 if c == "artificial" else 1
                              for c in sel["CATEGORY"]],
            }, crs="EPSG:3857")
            det = det.to_crs(epsg=4326) if len(det) else det
            write_file(det, os.path.join(
                od, f"{ds}_detections_at_0dot05_threshold.gpkg"),
                layer=f"{ds}_detections")
        yield root, cfg
    finally:
        os.chdir(cwd)


def test_determine_class_runs(workspace):
    root, cfg = workspace
    os.chdir(root)
    # the synthetic scene has no inference-only (oth) labels; aggregate the
    # ground-truth zone instead (same code path)
    dc = dict(cfg["determine_class.py"])
    dc["inputs"] = dict(dc["inputs"],
                        roads="json_inputs/ground_truth_labels.geojson",
                        detections="obj_detector/"
                                   "val_detections_at_0dot05_threshold.gpkg")
    files = classify.run(dc)
    assert any("types_from_detections" in f for f in files)
    out = read_file("outputs/final/shp_gpkg/types_from_detections.shp")
    assert set(out["cover_type"]) <= {"artificial", "natural",
                                      "undetermined", "undetected"}


def test_final_metrics_perfect_detector(workspace):
    root, cfg = workspace
    os.chdir(root)
    files = evaluate.run(cfg["final_metrics.py"])

    gm = pd.read_csv("outputs/final/tables/global metrics.csv")
    val = gm[gm["dataset"] == "val"]
    assert val["f1b"].iloc[0] == pytest.approx(1.0), gm
    alld = gm[gm["dataset"] == "all datasets"]
    assert alld["f1b"].iloc[0] == pytest.approx(1.0), gm
    # baseline must be clearly worse than the perfect detector
    bl = gm[gm["dataset"] == "baseline"]
    assert bl["f1b"].iloc[0] < 1.0

    comp = read_file("outputs/final/shp_gpkg/types_from_detections.shp")
    assert (comp["cover_type"] == comp["CATEGORY"]).all()

    # six HTML graphs
    imgs = os.listdir("outputs/final/images")
    assert len([f for f in imgs if f.endswith(".html")]) == 6
