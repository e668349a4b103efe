"""Reference-verbatim config compatibility (§2.3 contract).

Loads the reference's own four YAML files BYTE-FOR-BYTE from
``/root/reference/config`` (skipped when the reference tree is absent) and
drives every pipeline ``run()`` off their blocks on the synthetic
workspace. Only path VALUES are rewritten where the verbatim path points
at data this environment cannot have (the stripped SWISSIMAGE store, S3
endpoints); every schema key and behavior knob stays the reference's —
including the keys earlier example configs dropped
(``restricted_aoi_training`` reference config_obj_detec.yaml:15,
``# ok_tiles`` :19) and the scalar ``debug_mode: true`` spelling
(config_stats.yaml:34).
"""

import io
import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
import yaml

pytestmark = pytest.mark.slow

from fixtures import write_data_dir, X0, Y0
from roadsurf_tpu.geom.core import LineString, Polygon
from roadsurf_tpu.geom.table import GeoDataFrame
from roadsurf_tpu.io import read_file, write_file
from roadsurf_tpu.pipeline import (assess, classify, evaluate, label_prep,
                                   sandbox, tilesets)
from roadsurf_tpu.utils.config import load_config, load_script_config

REF_CFG = "/root/reference/config"

if not os.path.isdir(REF_CFG):
    pytest.skip("reference config tree not available", allow_module_level=True)


def _png_opener(url):
    from PIL import Image
    # honor the service's band request: the stats chain's titiler URL
    # asks for 4 bands (config_stats.yaml:39, bidx=2&3&4&1 — RGB+NIR),
    # the detection chain's WMTS serves RGB
    nbands = max(url.count("bidx="), 3)
    arr = np.full((256, 256, nbands), 128, np.uint8)
    if nbands == 4:
        arr[..., 3] = 180       # NIR differs from RGB (VgNIR-BI non-flat)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def ref_ws(tmp_path_factory):
    """Synthetic workspace laid out exactly like the reference's data/
    tree, plus the two sandbox inputs the verbatim configs reference."""
    root = str(tmp_path_factory.mktemp("refcfg"))
    write_data_dir(root)
    data = os.path.join(root, "data")

    # quarries (final_metrics/determine_class input), far from the scene
    os.makedirs(os.path.join(data, "quarries"), exist_ok=True)
    write_file(GeoDataFrame(
        {"geometry": [Polygon([(2500000, 1100000), (2500100, 1100000),
                               (2500100, 1100100), (2500000, 1100100)])]},
        crs="EPSG:2056"), os.path.join(data, "quarries", "quarries.shp"))

    # restricted training AOI (config_obj_detec.yaml:15) covering only the
    # southern part of the scene, so the GT/OTH label split is non-trivial
    # (the reference's 2_tiles_AOI is likewise a sub-area)
    write_file(GeoDataFrame(
        {"geometry": [Polygon([(X0 - 800, Y0 - 800), (X0 + 7000, Y0 - 800),
                               (X0 + 7000, Y0 + 450),
                               (X0 - 800, Y0 + 450)])]},
        crs="EPSG:2056"), os.path.join(data, "AOI", "2_tiles_AOI.shp"))

    # field-verified corrections (config_preprocessing.yaml correct_gt.py)
    write_file(GeoDataFrame(
        {"OBJECTID": [1, 2], "Belag_veri": [200, 999999],
         "geometry": [LineString([(X0, Y0), (X0 + 10, Y0)]),
                      LineString([(X0, Y0 + 300), (X0 + 10, Y0 + 300)])]},
        crs="EPSG:2056"),
        os.path.join(data, "swissTLM3D", "test_natural_roads_feedback.shp"))

    # the reference's model YAML at the path the workflow blocks point to
    os.makedirs(os.path.join(root, "config"), exist_ok=True)
    shutil.copy(os.path.join(REF_CFG, "detectron2_config_3bands.yaml"),
                os.path.join(root, "config", "detectron2_config_3bands.yaml"))

    cwd = os.getcwd()
    os.chdir(root)
    try:
        obj = load_config(os.path.join(REF_CFG, "config_obj_detec.yaml"))
        # verbatim label engineering + tileset generation (the fake opener
        # replaces only the network: the URL template stays the reference's)
        label_prep.run(obj["prepare_data_obj_detec.py"])
        tilesets.run(obj["generate_tilesets.py"], opener=_png_opener)

        # fabricate a perfect detector so the aggregation/metrics blocks
        # have detections to chew on (same recipe as test_e2e_pipeline)
        od = "outputs/obj_detector"
        split = read_file(os.path.join(od, "split_aoi_tiles.geojson"))
        gt = read_file("outputs/json_inputs/ground_truth_labels.geojson")
        oth = read_file("outputs/json_inputs/other_labels.geojson")
        both = GeoDataFrame(pd.concat([gt, oth], ignore_index=True),
                            crs=gt.crs)
        clipped = tilesets.clip_labels(
            both.to_crs(epsg=3857),
            split.to_crs(epsg=3857)[["id", "geometry"]])
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
        yield root, obj
    finally:
        os.chdir(cwd)


def test_label_prep_outputs_exist(ref_ws):
    root, _ = ref_ws
    os.chdir(root)
    for rel in ("outputs/shapefiles_gpkg/roads_for_OD.shp",
                "outputs/json_inputs/tiles_aoi.geojson",
                "outputs/json_inputs/ground_truth_labels.geojson",
                "outputs/json_inputs/other_labels.geojson",
                "outputs/obj_detector/COCO_trn.json",
                "outputs/obj_detector/split_aoi_tiles.geojson",
                "outputs/obj_detector/img_metadata.json",
                "outputs/obj_detector/category_ids.json"):
        assert os.path.exists(rel), rel


def test_calculate_statistics_verbatim(ref_ws):
    root, obj = ref_ws
    os.chdir(root)
    files = assess.run_statistics(obj["calculate_statistics.py"])
    assert files


def test_assess_detections_verbatim(ref_ws):
    root, obj = ref_ws
    os.chdir(root)
    files = assess.run_assessment(obj["assess_detections.py"])
    assert files


def test_final_metrics_verbatim(ref_ws):
    root, obj = ref_ws
    os.chdir(root)
    files = evaluate.run(obj["final_metrics.py"])
    gm = pd.read_csv("outputs/final/tables/global metrics.csv")
    val = gm[gm["dataset"] == "val"]
    assert val["f1b"].iloc[0] == pytest.approx(1.0), gm


def test_determine_class_verbatim(ref_ws):
    """Fully verbatim: the restricted training AOI makes the OTH label set
    (and hence the oth dataset + its detections) non-empty, so the block's
    own paths resolve."""
    root, obj = ref_ws
    os.chdir(root)
    files = classify.run(obj["determine_class.py"])
    assert any("types_from_detections" in f for f in files)


def test_train_model_verbatim_block(ref_ws):
    root, obj = ref_ws
    os.chdir(root)
    from roadsurf_tpu.pipeline import training
    # the verbatim block: same COCO files, same d2 YAML reference (so the
    # step runs at the reference's 768px multiscale train geometry), same
    # model-zoo warm-start key; iteration budget shrunk for CI wall clock
    training.run(obj["train_model.py"], max_iter=1, batch_size=1,
                 n_devices=1)
    assert os.path.isdir("outputs/obj_detector/logs")


def test_make_detections_verbatim_block(ref_ws):
    root, obj = ref_ws
    os.chdir(root)
    from dataclasses import replace

    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.pipeline import detections

    # verbatim workflow block (COCO files, pth_file, RDP eps, score floor);
    # the model geometry is shrunk to 64px for CPU-CI speed — the block's
    # own detectron2_config_file stays in place and is what production uses
    cfg = replace(fast_profile(post_nms_topk=32), min_size_test=64,
                  max_size_test=64, pallas_pooler=False)
    files = detections.run(obj["make_detections.py"], model_cfg=cfg,
                           batch_size=8)
    assert any("_detections_at_0dot05_threshold.gpkg" in f for f in files)


def test_limit_used_tiles_verbatim(ref_ws):
    root, obj = ref_ws
    os.chdir(root)
    files = sandbox.run_limit_used_tiles(obj["limit_used_tiles.py"])
    assert files and os.path.exists(files[0])


def test_config_stats_verbatim(tmp_path):
    """config_stats.yaml drives the statistical branch verbatim — including
    the scalar ``debug_mode: true`` under generate_tilesets.py (:34).

    Runs in its OWN workspace (the reference ran the stats and detection
    chains from separate checkouts: both write outputs/obj_detector, but
    the stats tiles are 4-band titiler tifs, the detection tiles 3-band
    WMTS jpegs — sharing a tile cache would serve the wrong bands)."""
    root = str(tmp_path / "stats_ws")
    write_data_dir(root)
    os.chdir(root)
    from roadsurf_tpu.pipeline import stats_analysis, stats_prep

    stats = load_config(os.path.join(REF_CFG, "config_stats.yaml"))
    stats_prep.run(stats["prepare_data.py"])
    label_prep.run(stats["prepare_data_obj_detec.py"])
    tilesets.run(stats["generate_tilesets.py"], opener=_png_opener)
    files = stats_analysis.run(stats["statistical_analysis.py"])
    assert files


def test_config_preprocessing_verbatim(ref_ws, tmp_path):
    """config_preprocessing.yaml blocks: correct_gt verbatim; the S3 blocks
    run against an injected local store (endpoint/datapath are the only
    rewrites — this environment has no egress)."""
    root, _ = ref_ws
    os.chdir(root)
    from roadsurf_tpu.io.geotiff import write_geotiff
    from roadsurf_tpu.io.objstore import LocalStore
    from roadsurf_tpu.pipeline import cog_pipeline, upload
    from roadsurf_tpu.pipeline.sandbox import correct_gt

    pre = load_config(os.path.join(REF_CFG, "config_preprocessing.yaml"))

    # correct_gt.py block, verbatim paths (fixture ships the corrections)
    cg = pre["correct_gt.py"]["input"]
    roads = read_file(os.path.join(cg["input_folder"],
                                   cg["input_files"]["initial_roads"]))
    corr = read_file(os.path.join(cg["input_folder"],
                                  cg["input_files"]["corrections"]))
    fixed = correct_gt(roads, corr)
    assert int(fixed.loc[fixed["OBJECTID"] == 1, "BELAGSART"].iloc[0]) == 200
    # invalid verification codes must NOT override
    assert int(fixed.loc[fixed["OBJECTID"] == 2, "BELAGSART"].iloc[0]) != 999999

    # RS_images_to_S3.py: datapath rewritten to local 16-bit tiffs, store
    # injected; bucket/outpath keys stay the reference's
    src = tmp_path / "rs_src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = rng.integers(0, 65535, (32, 32, 4), dtype=np.uint16)
        write_geotiff(str(src / f"img_{i}.tif"), arr,
                      (2600000.0, 1200000.0, 2600032.0, 1200032.0),
                      epsg=2056)
    up_cfg = dict(pre["RS_images_to_S3.py"],
                  datapath=str(src / "*.tif"))
    store = LocalStore(str(tmp_path / "store"))
    uploaded = upload.run(up_cfg, store=store)
    assert len(uploaded) == 2
    # skip-if-exists resume: second run uploads nothing
    assert upload.run(up_cfg, store=store) == []

    # tif2cog.py: S3 prefixes stay verbatim; workdir + store injected.
    # the uploaded keys live under outpath, so mirror them to the block's
    # S3_PREFIX_IN (a path rewrite inside the store, not a schema change)
    t2c = dict(pre["tif2cog.py"], WORKDIR=str(tmp_path / "workdir"))
    mirror = tmp_path / "mirror"
    mirror.mkdir()
    for key in list(store.list(pre["RS_images_to_S3.py"]["outpath"])):
        local = str(mirror / os.path.basename(key))
        store.download(key, local)
        store.upload(local, f"{t2c['S3_PREFIX_IN']}/{os.path.basename(key)}")
    res = cog_pipeline.run(t2c, store=store)
    assert res and any(store.list(t2c["S3_PREFIX_COG"]))
