#!/usr/bin/env python
"""Paired quality check of the bit-packed mask downlink (mask_format=
"bits" — device-side 0.5 threshold + bit-pack, 8x less d2h than u8).

Unlike the seeded training ablation, this comparison is PAIRED: the same
trained checkpoint is scored twice, once per downlink format, so the only
difference is thresholding before vs after the bilinear mask paste. The
per-seed F1 delta is therefore deterministic signal, not training noise.

Reuses the seeded-ablation workdir (scripts/ablate_seeded.py):

    python scripts/ablate_mask_bits.py [--workdir /tmp/rs_ablate_seeded] \
        [--seeds 5] [--cpu]
"""

import argparse
import json
import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/rs_ablate_seeded")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (paired deltas are "
                         "backend-independent)")
    ap.add_argument("--out", default="ablate_mask_bits.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import pandas as pd
    import yaml

    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.pipeline import detections, evaluate
    from roadsurf_tpu.utils.checkpoint import latest_checkpoint
    from roadsurf_tpu.utils.logging import logger

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = yaml.safe_load(open(os.path.join(repo, "config",
                                           "config_obj_detec.yaml")))
    os.chdir(args.workdir)

    mcfg = replace(fast_profile(), pixel_std=(57.375, 57.12, 58.395),
                   freeze_at=0, rpn_post_nms_topk_test=32)
    det_cfg = dict(cfg["make_detections.py"])

    rows = []
    for s in range(args.seeds):
        ckpt = latest_checkpoint(f"outputs/obj_detector/logs_seed{s}")
        if ckpt is None:
            logger.warning(f"seed {s}: no checkpoint, skipping")
            continue
        det_cfg["model_weights"] = {
            "pth_file": os.path.relpath(ckpt, "outputs/obj_detector")}
        for fmt in ("u8", "bits"):
            logger.info(f"=== seed {s} mask_format={fmt} ===")
            detections.run(det_cfg, model_cfg=mcfg, batch_size=args.batch,
                           mask_format=fmt)
            evaluate.run(cfg["final_metrics.py"])
            gm = pd.read_csv("outputs/final/tables/global metrics.csv")
            line = gm[gm["dataset"] == "all datasets"].iloc[0]
            rows.append({"seed": s, "fmt": fmt,
                         "f1b": round(float(line["f1b"]), 4)})
            print(json.dumps(rows[-1]), flush=True)

    df = pd.DataFrame(rows)
    pivot = df.pivot(index="seed", columns="fmt", values="f1b")
    deltas = (pivot["bits"] - pivot["u8"]).tolist()
    out = {
        "per_seed": rows,
        "delta_bits_minus_u8": [round(d, 4) for d in deltas],
        "max_abs_delta": round(max(abs(d) for d in deltas), 4),
    }
    with open(out_path := os.path.join(args.workdir, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    logger.info(f"wrote {out_path}")


if __name__ == "__main__":
    main()
