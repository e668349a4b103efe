"""make_detections: batched Mask R-CNN tile inference → georeferenced
detection polygons.

Native replacement for the external object-detector's make_detections.py
stage (pinned by reference config_obj_detec.yaml:74-90): for each dataset's
COCO tile list, run the jitted detector over fixed-size tile batches on the
TPU mesh, stream detections back, vectorize instance masks into polygons in
the tile's EPSG:3857 frame, RDP-simplify (ε=0.75), and write
``{ds}_detections_at_0dot05_threshold.gpkg`` with ``score`` + ``det_class``
(schema recovered at reference determine_class.py:112-116,22-25).

The device loop is throughput-critical (BASELINE.md north star): one jit
compile, fixed (B, 256, 256, 3) batches, padding the tail batch; the
mask→vector stage is a streaming host consumer.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..geom.table import GeoDataFrame
from ..geom.vectorize import mask_to_polygons
from ..io import write_file
from ..io.geotiff import read_geotiff
from ..models import from_detectron2_yaml, init_params
from ..models.config import ModelConfig, fast_profile
from ..utils.checkpoint import load_params
from ..utils.d2_convert import merge_params
from ..utils.logging import logger
from ..utils.misc import Manifest


def paste_masks(mask_probs: np.ndarray, boxes: np.ndarray, size: int,
                thresh: float = 0.5) -> np.ndarray:
    """Paste per-detection mask probabilities into full-tile binary masks.

    mask_probs (D, M, M) in [0,1], boxes (D, 4) XYXY in tile pixels.
    detectron2 paste_masks_in_image semantics: bilinear grid-sample of the
    M×M mask over the box extent, align_corners=False, threshold 0.5.
    """
    D, M, _ = mask_probs.shape
    out = np.zeros((D, size, size), np.uint8)
    for d in range(D):
        x0, y0, x1, y1 = boxes[d]
        ix0, iy0 = max(int(np.floor(x0)), 0), max(int(np.floor(y0)), 0)
        ix1, iy1 = min(int(np.ceil(x1)), size), min(int(np.ceil(y1)), size)
        if ix1 <= ix0 or iy1 <= iy0 or x1 <= x0 or y1 <= y0:
            continue
        xs = (np.arange(ix0, ix1) + 0.5 - x0) / (x1 - x0) * M - 0.5
        ys = (np.arange(iy0, iy1) + 0.5 - y0) / (y1 - y0) * M - 0.5
        xi = np.clip(xs, 0, M - 1)
        yi = np.clip(ys, 0, M - 1)
        xf = np.floor(xi).astype(int)
        yf = np.floor(yi).astype(int)
        xc = np.minimum(xf + 1, M - 1)
        yc = np.minimum(yf + 1, M - 1)
        wx = xi - xf
        wy = yi - yf
        m = mask_probs[d]
        top = m[yf][:, xf] * (1 - wx) + m[yf][:, xc] * wx
        bot = m[yc][:, xf] * (1 - wx) + m[yc][:, xc] * wx
        patch = top * (1 - wy)[:, None] + bot * wy[:, None]
        out[d, iy0:iy1, ix0:ix1] = (patch >= thresh).astype(np.uint8)
    return out


def detect_tiles(params, cfg: ModelConfig, image_paths: list[str],
                 tile_bounds: list, batch_size: int = 16,
                 score_thresh: float = 0.05, rdp_eps: float = 0.75,
                 tile_size: int = 256, progress_every: int = 50,
                 scan_k: int = 1, mask_format: str = "bits"):
    """Run inference over tile images; yields per-detection records
    (geometry in EPSG:3857 of the tile bounds, score, det_class).

    tile_bounds[i] = (west, south, east, north) in 3857 for image i.

    The device loop runs through the sharded, lag-pipelined
    :class:`~roadsurf_tpu.engine.infer.TileInferenceEngine`, so host-side
    mask vectorization overlaps device compute and multi-chip meshes shard
    the tile batch automatically.
    """
    from ..engine.infer import TileInferenceEngine, prefetch_iter

    want_int8 = getattr(cfg, "int8_scope", "") \
        or ("backbone" if getattr(cfg, "int8_backbone", False) else "")
    if want_int8 and "quant" not in params and "backbone_q" not in params \
            and image_paths:
        # calibrate the static-int8 stack on real tiles sampled evenly
        # across the AOI (the first N paths can be all border/nodata tiles,
        # which would give unrepresentatively small activation scales)
        from ..models.quant import prepare_quantized
        idx = np.unique(np.linspace(0, len(image_paths) - 1,
                                    min(8, len(image_paths)), dtype=int))
        cal = np.stack([read_geotiff(image_paths[i]).data[:, :, :3]
                        for i in idx])
        params = dict(params)
        params["quant"] = prepare_quantized(params, cal, cfg)
        logger.info(f"int8 ({want_int8}): calibrated on {len(cal)} tiles")

    engine = TileInferenceEngine(params, cfg, batch_size=batch_size,
                                 with_masks=True, mask_format=mask_format,
                                 scan_k=scan_k)
    records = []
    n = len(image_paths)

    import concurrent.futures as cf

    stage_s = {"decode": 0.0, "vectorize": 0.0}

    def batches():
        # threaded tile decode (zlib/PIL release the GIL) so the read stage
        # keeps pace with the device
        from time import perf_counter
        with cf.ThreadPoolExecutor(max_workers=8) as readers:
            for start in range(0, n, batch_size):
                t0 = perf_counter()
                chunk = image_paths[start:start + batch_size]
                imgs = list(readers.map(
                    lambda p: read_geotiff(p).data[:, :, :3], chunk))
                stage_s["decode"] += perf_counter() - t0
                yield np.stack(imgs)

    def vectorize_one(dets, bi, bounds):
        """Per-image host stage: paste masks, trace, simplify, georeference.
        numpy and the C++ tracer release the GIL, so these parallelize."""
        from time import perf_counter
        _t0 = perf_counter()
        try:
            return _vectorize_one(dets, bi, bounds)
        finally:
            stage_s["vectorize"] += perf_counter() - _t0

    def _vectorize_one(dets, bi, bounds):
        west, south, east, north = bounds
        sx = (east - west) / tile_size
        sy = (north - south) / tile_size
        valid = dets["valid"][bi] & (dets["scores"][bi] >= score_thresh)
        if not valid.any():
            return []
        boxes = dets["boxes"][bi][valid]
        scores = dets["scores"][bi][valid]
        classes = dets["classes"][bi][valid]
        if "mask_bits" in dets:
            # packed device-thresholded bits -> 0/1 "probabilities"; the
            # 0.5 paste threshold then reduces to bilinear majority
            bits = dets["mask_bits"][bi][valid]
            probs = np.unpackbits(bits, axis=-1, bitorder="little") \
                .reshape(bits.shape[0], 28, 28).astype(np.float32)
        else:
            probs = dets["mask_probs_u8"][bi][valid].astype(np.float32) / 255.0
        bin_masks = paste_masks(probs, boxes, tile_size)

        def to_world(ring):
            out = np.empty_like(ring)
            out[:, 0] = west + ring[:, 0] * sx
            out[:, 1] = north - ring[:, 1] * sy
            return out

        recs = []
        for d in range(len(boxes)):
            for poly in mask_to_polygons(bin_masks[d], transform=to_world,
                                         simplify_eps=rdp_eps):
                recs.append({"geometry": poly, "score": float(scores[d]),
                             "det_class": int(classes[d])})
        return recs

    idx = 0
    all_futs = []
    with cf.ThreadPoolExecutor(max_workers=4) as pool:
        # decode prefetch: the reader generator runs in its own thread so
        # disk/zlib work overlaps result drains instead of serializing
        # between dispatches
        for dets in engine.run(prefetch_iter(batches(), depth=2)):
            n_im = len(dets["scores"])
            start = idx
            # don't block on the host stage here: blocking would stall the
            # device feed; futures resolve in order at the end
            all_futs.extend(
                pool.submit(vectorize_one, dets, bi, tile_bounds[idx + bi])
                for bi in range(n_im))
            idx += n_im
            if progress_every and (start // batch_size) % progress_every == 0:
                logger.info(f"inference: {min(start + batch_size, n)}/{n} "
                            "tiles dispatched")
        for fut in all_futs:                 # in-order: deterministic output
            records.extend(fut.result())
    eng_stats = getattr(engine, "stats", {})
    logger.info(
        "make_detections stage breakdown: decode %.1fs, h2d %.1fs, "
        "d2h %.1fs, vectorize %.1fs (thread-seconds)" % (
            stage_s["decode"], eng_stats.get("h2d_s", 0.0),
            eng_stats.get("d2h_s", 0.0), stage_s["vectorize"]))
    return records


def detect_dataset(params, cfg: ModelConfig, coco: dict, images_dir: str,
                   img_metadata: dict, **kw) -> GeoDataFrame:
    """Detect over one dataset's COCO images; returns detections in 3857."""
    paths, bounds = [], []
    for im in coco["images"]:
        meta = img_metadata[im["file_name"]]
        paths.append(os.path.join(images_dir, im["file_name"]))
        bounds.append(meta["bounds_3857"])
    records = detect_tiles(params, cfg, paths, bounds, **kw)
    if not records:
        return GeoDataFrame({"geometry": [], "score": [], "det_class": []},
                            crs="EPSG:3857")
    return GeoDataFrame(
        {"geometry": [r["geometry"] for r in records],
         "score": [r["score"] for r in records],
         "det_class": [r["det_class"] for r in records]},
        crs="EPSG:3857")


def run(cfg: dict, model_cfg: ModelConfig | None = None,
        batch_size: int = 16, mask_format: str = "bits") -> list[str]:
    """Execute the ``make_detections.py`` YAML block."""
    import jax

    wd = cfg["working_directory"]
    manifest = Manifest()

    if model_cfg is None:
        d2_yaml = os.path.join(wd, cfg["detectron2_config_file"])
        model_cfg = (from_detectron2_yaml(d2_yaml)
                     if os.path.exists(d2_yaml) else fast_profile())

    ckpt = os.path.join(wd, cfg["model_weights"]["pth_file"])
    init = init_params(jax.random.PRNGKey(0), model_cfg)
    if os.path.exists(ckpt):
        loaded, _ = load_params(ckpt)
        params, _ = merge_params(init, loaded)
        logger.info(f"loaded weights from {ckpt}")
    else:
        # also accept a native .npz next to the pinned .pth name
        alt = os.path.splitext(ckpt)[0] + ".npz"
        if os.path.exists(alt):
            loaded, _ = load_params(alt)
            params, _ = merge_params(init, loaded)
            logger.info(f"loaded weights from {alt}")
        else:
            logger.warning(f"checkpoint {ckpt} not found; random weights")
            params = init

    score_thresh = float(cfg.get("score_lower_threshold", 0.05))
    rdp = cfg.get("rdp_simplification", {}) or {}
    rdp_eps = float(rdp.get("epsilon", 0.75)) if rdp.get("enabled", True) \
        else 0.0

    with open(os.path.join(wd, cfg["image_metadata_json"])) as f:
        img_meta = json.load(f)

    thr_tag = str(score_thresh).replace(".", "dot")
    for ds, coco_rel in cfg["COCO_files"].items():
        coco_path = os.path.join(wd, coco_rel)
        if not os.path.exists(coco_path):
            logger.warning(f"{coco_path} absent; skipping {ds}")
            continue
        with open(coco_path) as f:
            coco = json.load(f)
        images_dir = os.path.join(wd, f"{ds}-images")
        gdf = detect_dataset(params, model_cfg, coco, images_dir, img_meta,
                             batch_size=batch_size,
                             score_thresh=score_thresh, rdp_eps=rdp_eps,
                             mask_format=mask_format)
        gdf_4326 = gdf.to_crs(epsg=4326) if len(gdf) else gdf
        p = os.path.join(wd, f"{ds}_detections_at_{thr_tag}_threshold.gpkg")
        write_file(gdf_4326, p, layer=f"{ds}_detections")
        manifest.add(p)
        logger.info(f"{ds}: {len(gdf)} detections")

    manifest.log()
    return manifest.files
