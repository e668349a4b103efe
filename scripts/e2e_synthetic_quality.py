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


def make_opener(roads_3857, hard: bool = True):
    """Synthetic orthophoto service: renders the road polygons into each
    requested tile.

    ``hard`` mode is deliberately adversarial so the chain produces a
    NON-saturated F1 that regressions can move (a pure color classifier
    scores ~1.0 on the easy palette):

    * overlapping color distributions — 30% of artificial roads are
      "weathered" into the natural browns and 30% of natural roads are
      "compacted" into the artificial grays; texture carries the signal
      (asphalt: smooth low-sigma noise; gravel/dirt: coarse blotchy
      speckle rendered at 4px granularity);
    * background confusers — gray building slabs and brown field patches
      sharing the road palettes;
    * occlusion — dark-green tree blobs cover ~10% of road pixels.

    Per-road appearance is seeded by the road's OBJECTID and per-tile
    noise by (x, y), so tiles are deterministic across runs.
    """
    from PIL import Image

    by_cat = {}
    for cat in ("artificial", "natural"):
        sel = roads_3857[roads_3857["CATEGORY"] == cat]
        by_cat[cat] = list(zip(sel["OBJECTID"].values,
                               sel.geometry.values))

    def road_color(cat, objectid):
        r = np.random.default_rng(int(objectid) * 2654435761 % (2 ** 31))
        if not hard:
            return (np.asarray((90, 90, 95)) if cat == "artificial"
                    else np.asarray((150, 110, 60))), 8, r
        crossed = r.random() < 0.40
        asphalt = (cat == "artificial") != crossed
        if asphalt:
            g = r.uniform(85, 130)
            base = np.asarray([g, g * r.uniform(0.96, 1.0),
                               g * r.uniform(0.92, 1.02)])
        else:
            b = r.uniform(95, 150)
            base = np.asarray([b, b * r.uniform(0.78, 0.9),
                               b * r.uniform(0.5, 0.68)])
        # texture follows the TRUE class but the sigma distributions
        # OVERLAP (weathered asphalt vs compacted gravel): a slice of
        # each class is genuinely ambiguous, keeping the chain's F1 off
        # the ceiling so regressions are visible
        sigma = r.uniform(5, 20) if cat == "artificial" \
            else r.uniform(10, 26)
        return base, sigma, r

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
        if hard:
            # background confusers: gray slabs + brown patches
            for _ in range(rng.integers(2, 6)):
                cx, cy = rng.integers(0, 256, 2)
                hw, hh = rng.integers(8, 40, 2)
                gray = rng.random() < 0.5
                tone = rng.uniform(90, 130)
                col = (np.asarray([tone, tone, tone * 1.02]) if gray
                       else np.asarray([tone * 1.1, tone * 0.85,
                                        tone * 0.55]))
                sl = (slice(max(cy - hh, 0), min(cy + hh, 256)),
                      slice(max(cx - hw, 0), min(cx + hw, 256)))
                img[sl] = np.clip(
                    col + rng.integers(-6, 6, (1, 1, 3)), 0,
                    255).astype(np.uint8)
        for cat, entries in by_cat.items():
            for objectid, g in entries:
                gw, gs, ge, gn = g.bounds
                if ge < w or gw > e or gn < s or gs > n:
                    continue
                mask = N.rasterize(g._flat(), w, sx, n, -sx, 256, 256)
                base, sigma, r = road_color(cat, objectid)
                if hard and cat == "natural":
                    # coarse blotchy speckle at 4px granularity
                    coarse = r.normal(0, sigma, (64, 64, 1))
                    tex = np.repeat(np.repeat(coarse, 4, 0), 4, 1)
                    tex = tex + r.normal(0, 6, (256, 256, 1))
                else:
                    tex = r.normal(0, sigma, (256, 256, 1))
                paint = np.clip(base + tex, 0, 255).astype(np.uint8)
                img = np.where(mask[:, :, None].astype(bool), paint, img)
        if hard:
            # tree occluders over everything
            yy, xx = np.mgrid[0:256, 0:256]
            for _ in range(rng.integers(6, 14)):
                cx, cy = rng.integers(0, 256, 2)
                rad = rng.integers(4, 12)
                blob = (xx - cx) ** 2 + (yy - cy) ** 2 <= rad ** 2
                col = np.asarray([rng.integers(25, 45),
                                  rng.integers(60, 95),
                                  rng.integers(25, 45)])
                img = np.where(blob[:, :, None], col[None, None, :],
                               img).astype(np.uint8)
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
    # dense grid: ~33 roads / ~200 tiles, so balanced F1 has ~0.03
    # resolution per misclassified road
    write_data_dir(".", n_grid=16, spacing=120.0)
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
        fast_profile(),
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

    # profile ablation (same weights, same 256px tiles): the deployment
    # fast profile (approx top-k, sweep NMS, 64 proposals, 8 det/tile)
    # vs exact inference (exact greedy NMS, full proposal/detection
    # budget of the reference: 1000 proposals, 100 det/tile)
    import pandas as pd
    exact_cfg = replace(model_cfg, fast_nms=False,
                        rpn_pre_nms_topk_test=1000,
                        rpn_post_nms_topk_test=1000,
                        detections_per_image=100)

    def run_profile(tag, mcfg):
        logger.info(f"=== detections + metrics [{tag}] ===")
        detections.run(det_cfg, model_cfg=mcfg, batch_size=16)
        evaluate.run(cfg["final_metrics.py"])
        gm = pd.read_csv("outputs/final/tables/global metrics.csv")
        line = gm[gm["dataset"] == "all datasets"].iloc[0]
        return {
            "balanced_f1_all": float(line["f1b"]),
            "balanced_precision": float(line["Pb"]),
            "balanced_recall": float(line["Rb"]),
            "baseline_f1": float(
                gm[gm["dataset"] == "baseline"].iloc[0]["f1b"]),
        }

    fast_metrics = run_profile("fast profile", model_cfg)
    exact_metrics = run_profile("exact profile", exact_cfg)
    print(json.dumps({
        "fast": fast_metrics,
        "exact": exact_metrics,
        "f1_delta_fast_vs_exact": round(
            fast_metrics["balanced_f1_all"]
            - exact_metrics["balanced_f1_all"], 4),
        "elapsed_s": round(time() - tic, 1),
    }))


if __name__ == "__main__":
    main()
