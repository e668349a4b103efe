#!/usr/bin/env python
"""Statistically grounded fast-vs-exact quality ablation (ON-TPU).

Round 2's single-run ablation produced a non-monotone table (fast-R64
0.775 < fast-R32 0.830) — within-noise artifacts read as signal. This
harness runs N independently-seeded trainings on the SAME adversarial
synthetic scene and scores each inference variant on every seed, so
BASELINE.md can report mean±σ and the deployment default is chosen on
evidence (stand-in for the reference's published F1,
/root/reference/README.md:19).

Compile cost is paid once per shape thanks to process-wide jit caches
(engine/train.jitted_train_step keyed by config — the sampling seed rides
in the train state; models/mask_rcnn.jitted_inference_fn per variant).

    python scripts/ablate_seeded.py [--seeds 5] [--iters 600] \
        [--workdir /tmp/rs_ablate_seeded] [--out results.json]
"""

import argparse
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


def build_scene(workdir: str, cfg: dict):
    """Labels + synthetic tilesets, once (the scene is deterministic)."""
    from e2e_synthetic_quality import make_opener
    from fixtures import write_data_dir
    from roadsurf_tpu.geom.core import Polygon
    from roadsurf_tpu.geom.table import GeoDataFrame
    from roadsurf_tpu.io import read_file, write_file
    from roadsurf_tpu.pipeline import label_prep, tilesets
    from roadsurf_tpu.utils.logging import logger

    if os.path.exists("outputs/obj_detector/COCO_trn.json"):
        logger.info("scene already built, reusing")
        return
    write_data_dir(".", n_grid=16, spacing=120.0)
    qdir = os.path.join("data", "quarries")
    os.makedirs(qdir, exist_ok=True)
    write_file(GeoDataFrame(
        {"geometry": [Polygon([(2500000, 1100000), (2500100, 1100000),
                               (2500100, 1100100), (2500000, 1100100)])]},
        crs="EPSG:2056"), os.path.join(qdir, "quarries.shp"))
    label_prep.run(cfg["prepare_data_obj_detec.py"])
    gt = read_file("outputs/json_inputs/ground_truth_labels.geojson")
    tilesets.run(cfg["generate_tilesets.py"],
                 opener=make_opener(gt.to_crs(epsg=3857)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/rs_ablate_seeded")
    ap.add_argument("--out", default="ablate_seeded.json")
    ap.add_argument("--variants", default="")
    args = ap.parse_args()
    tic = time()

    import pandas as pd

    from roadsurf_tpu.models.config import (ModelConfig, dense_profile,
                                            fast_profile)
    from roadsurf_tpu.pipeline import detections, evaluate, training
    from roadsurf_tpu.utils.checkpoint import latest_checkpoint
    from roadsurf_tpu.utils.logging import logger

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = yaml.safe_load(open(os.path.join(repo, "config",
                                           "config_obj_detec.yaml")))
    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)
    build_scene(args.workdir, cfg)

    # ---- N seeded trainings (one compiled step reused across seeds) ----
    train_cfg = replace(
        fast_profile(),
        pixel_std=(57.375, 57.12, 58.395), freeze_at=0,
        base_lr=0.005, warmup_iters=100,
        roi_batch_per_image=128, rpn_batch_per_image=64,
        checkpoint_period=max(args.iters // 2, 1), eval_period=10 ** 9)
    ckpts = {}
    for s in range(args.seeds):
        log_dir = f"outputs/obj_detector/logs_seed{s}"
        logger.info(f"=== training seed {s} ===")
        training.train(train_cfg, "outputs/obj_detector/COCO_trn.json",
                       "outputs/obj_detector/trn-images", log_dir,
                       max_iter=args.iters, batch_size=args.batch,
                       image_size=256, max_instances=16, log_every=100,
                       seed=1000 + s)
        ckpts[s] = latest_checkpoint(log_dir)

    # ---- variants × seeds -------------------------------------------------
    base = replace(fast_profile(),
                   pixel_std=(57.375, 57.12, 58.395), freeze_at=0)
    dense = replace(dense_profile(),
                    pixel_std=(57.375, 57.12, 58.395), freeze_at=0)
    variants = {
        "exact(R1000,D100)": replace(base, fast_nms=False,
                                     rpn_pre_nms_topk_test=1000,
                                     rpn_post_nms_topk_test=1000,
                                     detections_per_image=100),
        "dense(pre1024,R256,D16)": dense,
        "fast-R64": base,
        "fast-R32": replace(base, rpn_post_nms_topk_test=32),
        "fast-R32+int8": replace(base, rpn_post_nms_topk_test=32,
                                 int8_scope="backbone"),
        "fast-R32+int8full": replace(base, rpn_post_nms_topk_test=32,
                                     int8_scope="full"),
        "fast-R32+int8pyr": replace(base, rpn_post_nms_topk_test=32,
                                    int8_scope="full", int8_pyramid=True),
        # deployment-budget candidates below the current fast-R32 default:
        # 16 post-NMS proposals / 4 detections halve the box/mask stages —
        # adopted only if the seeded mean stays within 1 sigma of exact
        "fast-R16+int8pyr": replace(base, rpn_post_nms_topk_test=16,
                                    int8_scope="full", int8_pyramid=True),
        "fast-R32D4+int8pyr": replace(base, rpn_post_nms_topk_test=32,
                                      detections_per_image=4,
                                      int8_scope="full", int8_pyramid=True),
        # the REAL parity geometry (800px resize, adaptive sampling, exact
        # NMS, R1000/D100 — reference detectron2_config_3bands.yaml:30,222)
        # paired bf16-vs-int8: the per-seed F1 delta isolates the int8
        # quality cost on the path that carries parity semantics
        "parity800": replace(ModelConfig(),
                             pixel_std=(57.375, 57.12, 58.395),
                             freeze_at=0),
        "parity800+int8pyr": replace(ModelConfig(),
                                     pixel_std=(57.375, 57.12, 58.395),
                                     freeze_at=0, int8_scope="full",
                                     int8_pyramid=True),
    }
    if args.variants:
        keep = args.variants.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    det_cfg = dict(cfg["make_detections.py"])
    rows = []
    for name, mcfg in variants.items():
        for s, ckpt in ckpts.items():
            logger.info(f"=== variant {name} seed {s} ===")
            det_cfg["model_weights"] = {
                "pth_file": os.path.relpath(ckpt, "outputs/obj_detector")}
            detections.run(det_cfg, model_cfg=mcfg, batch_size=16)
            evaluate.run(cfg["final_metrics.py"])
            gm = pd.read_csv("outputs/final/tables/global metrics.csv")
            line = gm[gm["dataset"] == "all datasets"].iloc[0]
            rows.append({"variant": name, "seed": s,
                         "f1b": round(float(line["f1b"]), 4)})
            print(json.dumps(rows[-1]), flush=True)

    df = pd.DataFrame(rows)
    summary = {
        name: {
            "mean": round(float(g["f1b"].mean()), 4),
            "std": round(float(g["f1b"].std(ddof=1)), 4),
            "runs": [float(v) for v in g["f1b"]],
        }
        for name, g in df.groupby("variant")
    }
    out = {"summary": summary, "seeds": args.seeds, "iters": args.iters,
           "elapsed_s": round(time() - tic, 1)}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
