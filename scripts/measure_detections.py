#!/usr/bin/env python
"""Steady-state measurement of the end-to-end make_detections path
(VERDICT round-1 item 9): tile files on disk -> decode -> device ->
detections -> mask vectorization -> gpkg-ready records, with the
per-stage wall-clock breakdown logged by pipeline.detections.

Replicates an existing tile directory (e.g. the e2e workdir's trn-images)
up to --n-tiles files so the run is long enough to amortize compile and
spin-up, then runs detect_tiles with trained or random weights.

    python scripts/measure_detections.py --images /tmp/rs_e2e_q5/outputs/\
obj_detector/trn-images --ckpt /tmp/rs_e2e_q5/outputs/obj_detector/logs \
--n-tiles 2048
"""

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
from time import perf_counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint file or log dir (default: random init)")
    ap.add_argument("--n-tiles", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--scan-k", type=int, default=1,
                    help="batches folded into one dispatch (lax.map)")
    ap.add_argument("--mask-format", default="bits",
                    choices=("u8", "bits"),
                    help="mask downlink: packed device-thresholded bits "
                         "(deployment default, 8x less d2h; quality-free "
                         "on 5 paired seeds — BASELINE.md) or u8 probs "
                         "(reference paste semantics)")
    args = ap.parse_args()

    import jax

    from roadsurf_tpu.models import fast_profile, init_params
    from roadsurf_tpu.pipeline.detections import detect_tiles
    from roadsurf_tpu.utils.logging import logger

    srcs = sorted(glob.glob(os.path.join(args.images, "*.tif")))
    if not srcs:
        raise SystemExit(f"no tiles under {args.images}")
    work = tempfile.mkdtemp(prefix="det_bench_")
    paths, bounds = [], []
    for i in range(args.n_tiles):
        src = srcs[i % len(srcs)]
        dst = os.path.join(work, f"{i:05d}.tif")
        os.link(src, dst) if hasattr(os, "link") else shutil.copy(src, dst)
        paths.append(dst)
        bounds.append((0.0, 0.0, 256.0, 256.0))

    cfg = fast_profile()
    params = init_params(jax.random.PRNGKey(0), cfg)
    if args.ckpt:
        from roadsurf_tpu.utils.checkpoint import (latest_checkpoint,
                                                   load_params)
        from roadsurf_tpu.utils.d2_convert import merge_params
        ckpt = args.ckpt
        if os.path.isdir(ckpt):
            ckpt = latest_checkpoint(ckpt)
        loaded, _ = load_params(ckpt)
        params, _ = merge_params(jax.device_get(params), loaded)
        logger.info(f"weights: {ckpt}")
    if args.int8:
        from dataclasses import replace
        from roadsurf_tpu.io.geotiff import read_geotiff
        from roadsurf_tpu.models.quant import prepare_quantized
        # full scope INCLUDING the int8 feature pyramid — without it the
        # poolers/RPN head consume bf16 P-levels and the int8 path loses
        # to bf16 (the round-3/4 "int8 inversion": this flag was missing
        # here while bench.py set it, so the e2e int8 rows measured a
        # crippled config)
        cfg = replace(cfg, int8_scope="full", int8_pyramid=True)
        # calibrate ONCE up front on strided real tiles: calibration is a
        # deployment-setup cost, not a steady-state per-AOI cost
        idx = np.unique(np.linspace(0, len(paths) - 1, 8, dtype=int))
        cal = np.stack([read_geotiff(paths[i]).data[:, :, :3] for i in idx])
        params["quant"] = prepare_quantized(params, cal, cfg)

    # warm (compile) on a small slice, then measure steady state
    detect_tiles(params, cfg, paths[:args.batch], bounds[:args.batch],
                 batch_size=args.batch, scan_k=args.scan_k,
                 mask_format=args.mask_format)
    t0 = perf_counter()
    recs = detect_tiles(params, cfg, paths, bounds, batch_size=args.batch,
                        scan_k=args.scan_k, mask_format=args.mask_format)
    dt = perf_counter() - t0
    print(json.dumps({
        "metric": "make_detections_e2e",
        "tiles": args.n_tiles,
        "tiles_per_sec": round(args.n_tiles / dt, 1),
        "records": len(recs),
        "elapsed_s": round(dt, 1),
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
