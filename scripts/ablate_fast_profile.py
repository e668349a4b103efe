#!/usr/bin/env python
"""Ablate the fast profile's approximations against the exact profile on
an existing e2e workdir (trained weights + tiles already there).

    python scripts/ablate_fast_profile.py --workdir /tmp/rs_e2e_q6
"""

import argparse
import json
import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    import pandas as pd

    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.pipeline import detections, evaluate
    from roadsurf_tpu.utils.checkpoint import latest_checkpoint
    from roadsurf_tpu.utils.logging import logger

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = yaml.safe_load(open(os.path.join(repo, "config",
                                           "config_obj_detec.yaml")))
    os.chdir(args.workdir)
    det_cfg = dict(cfg["make_detections.py"])
    ckpt = latest_checkpoint("outputs/obj_detector/logs")
    det_cfg["model_weights"] = {
        "pth_file": os.path.relpath(ckpt, "outputs/obj_detector")}

    base = replace(fast_profile(),
                   pixel_std=(57.375, 57.12, 58.395), freeze_at=0)

    variants = {
        "fast(R64,D8,sweep)": base,
        "D16": replace(base, detections_per_image=16),
        "D16+exactnms": replace(base, detections_per_image=16,
                                fast_nms=False),
        "R128+D16": replace(fast_profile(post_nms_topk=128,
                                         detections_per_image=16),
                            pixel_std=(57.375, 57.12, 58.395), freeze_at=0),
        "exactnms": replace(base, fast_nms=False),
        "exact(R1000,D100)": replace(base, fast_nms=False,
                                     rpn_pre_nms_topk_test=1000,
                                     rpn_post_nms_topk_test=1000,
                                     detections_per_image=100),
        "pre512": replace(base, rpn_pre_nms_topk_test=512),
        "pre1024": replace(base, rpn_pre_nms_topk_test=1024),
        "pre1024+R128": replace(base, rpn_pre_nms_topk_test=1024,
                                rpn_post_nms_topk_test=128),
        "pre1024+R256+D16": replace(base, rpn_pre_nms_topk_test=1024,
                                    rpn_post_nms_topk_test=256,
                                    detections_per_image=16),
        "pre1024+R512+D32": replace(base, rpn_pre_nms_topk_test=1024,
                                    rpn_post_nms_topk_test=512,
                                    detections_per_image=32),
        "pre1024+R512+D32+exactnms": replace(
            base, fast_nms=False, rpn_pre_nms_topk_test=1024,
            rpn_post_nms_topk_test=512, detections_per_image=32),
        "pre1024+R256+D16+exactnms": replace(
            base, fast_nms=False, rpn_pre_nms_topk_test=1024,
            rpn_post_nms_topk_test=256, detections_per_image=16),
    }
    if args.variants:
        keep = args.variants.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    variants["R32"] = replace(base, rpn_post_nms_topk_test=32)
    variants["int8"] = replace(base, int8_backbone=True)
    variants["R32+int8"] = replace(base, rpn_post_nms_topk_test=32,
                                   int8_backbone=True)
    if args.variants:
        keep = args.variants.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    results = {}
    for name, mcfg in variants.items():
        logger.info(f"=== variant {name} ===")
        detections.run(det_cfg, model_cfg=mcfg, batch_size=16)
        evaluate.run(cfg["final_metrics.py"])
        gm = pd.read_csv("outputs/final/tables/global metrics.csv")
        line = gm[gm["dataset"] == "all datasets"].iloc[0]
        results[name] = round(float(line["f1b"]), 4)
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
