#!/usr/bin/env python
"""Full-chain quality run on synthetic imagery (ON-TPU, ~10 min).

Builds a synthetic AOI whose orthophoto tiles are rendered from the road
polygons themselves (artificial roads asphalt-gray, natural roads dirt-brown,
vegetation-noise background), then exercises the ENTIRE framework with
learned weights:

  label engineering → tileset generation (synthetic XYZ opener) →
  from-scratch training → make_detections with the trained checkpoint →
  determine_class → final_metrics

and prints the resulting balanced F1. This is the closest possible stand-in
for the reference's quality benchmark in a zero-egress environment (no real
SWISSIMAGE tiles or pretrained weights can be fetched); the geometry, file
contracts, scoring and sweeps are exactly the production path.

    python scripts/e2e_synthetic_quality.py [--iters 600] [--workdir DIR]
"""

import argparse
import io
import json
import os
import sys
from dataclasses import replace
from time import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np
import yaml

from roadsurf_tpu.geom import _native as N
from roadsurf_tpu.io import read_file
from roadsurf_tpu.pipeline import (detections, evaluate, label_prep,
                                   tilesets, training)
from roadsurf_tpu.tiles.grid import WebMercatorQuad
from roadsurf_tpu.utils.logging import logger


def make_opener(roads_3857):
    """Synthetic orthophoto service: renders the road polygons into each
    requested tile (asphalt vs dirt over green noise)."""
    from PIL import Image

    by_cat = {}
    for cat, color in (("artificial", (90, 90, 95)),
                       ("natural", (150, 110, 60))):
        sel = roads_3857[roads_3857["CATEGORY"] == cat]
        by_cat[cat] = (list(sel.geometry.values), color)

    def opener(url):
        import re
        parts = url.split("/")
        z, x, y = (int(re.match(r"\d+", p).group(0))
                   for p in parts[-3:])
        from roadsurf_tpu.tiles.grid import Tile
        w, s, e, n = WebMercatorQuad.xy_bounds(Tile(x, y, z))
        sx = (e - w) / 256
        rng = np.random.default_rng((x * 73856093) ^ (y * 19349663))
        img = np.stack([rng.integers(40, 80, (256, 256)),
                        rng.integers(90, 140, (256, 256)),
                        rng.integers(40, 80, (256, 256))],
                       axis=2).astype(np.uint8)
        for cat, (geoms, color) in by_cat.items():
            for g in geoms:
                gw, gs, ge, gn = g.bounds
                if ge < w or gw > e or gn < s or gs > n:
                    continue
                mask = N.rasterize(g._flat(), w, sx, n, -sx, 256, 256)
                tex = rng.integers(-10, 10, (256, 256, 1))
                img = np.where(mask[:, :, None].astype(bool),
                               np.clip(np.asarray(color) + tex, 0,
                                       255).astype(np.uint8), img)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return buf.getvalue()

    return opener


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=600)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--workdir", default="/tmp/rs_e2e_quality")
    args = parser.parse_args()
    tic = time()

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)
    from fixtures import write_data_dir
    from roadsurf_tpu.geom.core import Polygon
    from roadsurf_tpu.geom.table import GeoDataFrame
    from roadsurf_tpu.io import write_file
    write_data_dir(".")
    qdir = os.path.join("data", "quarries")
    os.makedirs(qdir, exist_ok=True)
    write_file(GeoDataFrame(
        {"geometry": [Polygon([(2500000, 1100000), (2500100, 1100000),
                               (2500100, 1100100), (2500000, 1100100)])]},
        crs="EPSG:2056"), os.path.join(qdir, "quarries.shp"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = yaml.safe_load(open(os.path.join(repo, "config",
                                           "config_obj_detec.yaml")))

    logger.info("=== 1/5 label engineering ===")
    label_prep.run(cfg["prepare_data_obj_detec.py"])

    logger.info("=== 2/5 tileset generation (synthetic orthophotos) ===")
    gt = read_file("outputs/json_inputs/ground_truth_labels.geojson")
    gt_3857 = gt.to_crs(epsg=3857)
    tilesets.run(cfg["generate_tilesets.py"], opener=make_opener(gt_3857))

    logger.info("=== 3/5 from-scratch training ===")
    from roadsurf_tpu.models.config import fast_profile
    model_cfg = replace(
        fast_profile(post_nms_topk=128, detections_per_image=8),
        pixel_std=(57.375, 57.12, 58.395),   # from-scratch normalization
        freeze_at=0, base_lr=0.005, warmup_iters=100,
        roi_batch_per_image=128, rpn_batch_per_image=64,
        checkpoint_period=max(args.iters // 2, 1), eval_period=10 ** 9)
    training.train(model_cfg, "outputs/obj_detector/COCO_trn.json",
                   "outputs/obj_detector/trn-images",
                   "outputs/obj_detector/logs",
                   max_iter=args.iters, batch_size=args.batch,
                   image_size=256, max_instances=16, log_every=50)

    logger.info("=== 4/5 detection inference with the trained model ===")
    from roadsurf_tpu.utils.checkpoint import latest_checkpoint
    det_cfg = dict(cfg["make_detections.py"])
    ckpt = latest_checkpoint("outputs/obj_detector/logs")
    det_cfg["model_weights"] = {
        "pth_file": os.path.relpath(ckpt, "outputs/obj_detector")}
    detections.run(det_cfg, model_cfg=model_cfg, batch_size=16)

    logger.info("=== 5/5 determine_class + final_metrics ===")
    evaluate.run(cfg["final_metrics.py"])

    import pandas as pd
    gm = pd.read_csv("outputs/final/tables/global metrics.csv")
    line = gm[gm["dataset"] == "all datasets"].iloc[0]
    print(json.dumps({
        "balanced_f1_all": float(line["f1b"]),
        "balanced_precision": float(line["Pb"]),
        "balanced_recall": float(line["Rb"]),
        "baseline_f1": float(gm[gm["dataset"] == "baseline"].iloc[0]["f1b"]),
        "elapsed_s": round(time() - tic, 1),
    }))


if __name__ == "__main__":
    main()
