"""Sandbox tools (reference scripts/sandbox/): tile-selection limiter,
ground-truth corrector, and road-mask band augmentation. Standalone helpers
outside the final procedure but part of the capability surface."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..geom.table import GeoDataFrame, overlay, sjoin
from ..io import read_file, write_file
from ..io.geotiff import read_geotiff, write_geotiff
from ..stats.pixels import _geometry_mask
from ..tiles.grid import parse_tile_id
from ..utils.logging import logger
from ..utils.misc import Manifest, ensure_dir_exists, test_crs


def limit_used_tiles(tiles: GeoDataFrame, ground_truth: GeoDataFrame,
                     other_labels: GeoDataFrame,
                     considered_datasets: str) -> GeoDataFrame:
    """Keep only tiles touching the considered label set and not touching
    the other one (reference sandbox/limit_used_tiles.py)."""
    training_words = ["trn", "tst", "val", "gt", "ground truth"]
    has_training = any(w in considered_datasets for w in training_words)
    has_oth = "oth" in considered_datasets
    if has_training and not has_oth:
        considered, extra = ground_truth, other_labels
    elif has_oth and not has_training:
        considered, extra = other_labels, ground_truth
    else:
        raise ValueError("Unclear indications regarding the datasets to "
                         f"consider: {considered_datasets!r}")

    potential = sjoin(tiles, considered, how="left")
    potential = potential.drop_duplicates(subset=["id"])
    excluded = sjoin(tiles, extra, how="inner")
    excluded_ids = set(excluded["id"].unique()) if len(excluded) else set()
    keep = potential[~potential["id"].isin(excluded_ids)]
    out = GeoDataFrame(keep[list(tiles.columns)].reset_index(drop=True),
                       crs=tiles.crs)
    logger.info(f"{len(out)}/{len(tiles)} tiles kept.")
    return out


def correct_gt(roads: GeoDataFrame,
               corrections: GeoDataFrame) -> GeoDataFrame:
    """Merge field-verified ``Belag_veri`` corrections into BELAGSART
    (reference sandbox/correct_gt.py)."""
    merged = roads.merge(corrections[["OBJECTID", "Belag_veri"]],
                         on="OBJECTID", how="left")
    fixed = [int(v) if v in (100, 200, 999997, 999998) else b
             for v, b in zip(merged["Belag_veri"], merged["BELAGSART"])]
    merged["BELAGSART"] = fixed
    merged = merged.drop(columns=["Belag_veri"])
    return GeoDataFrame(merged, crs=roads.crs)


def add_tile_mask(roads: GeoDataFrame, tiles: GeoDataFrame,
                  images_root: str, mask_as_band: bool = True,
                  mask_dir: str | None = None) -> pd.DataFrame:
    """Rasterize the non-road area of each tile and append a 255-road mask
    as an extra band (or write it as a separate single-band file)
    (reference sandbox/add_tile_mask.py).

    tiles must carry ``id`` + ``dataset``; images live under
    ``{images_root}/{dataset}-images/z_x_y.tif``. Returns per-tile
    mean/std of the mask band.
    """
    union = roads.geometry.unary_union
    parts = list(getattr(union, "geoms", [union]))
    roads_union = GeoDataFrame(
        {"id_roadset": list(range(len(parts))), "geometry": parts},
        crs=roads.crs)
    test_crs(tiles.crs, roads_union.crs)
    inv = overlay(tiles, roads_union, how="difference")
    inv_3857 = inv.to_crs(epsg=3857)

    means, stds = [], []
    if mask_dir:
        ensure_dir_exists(mask_dir)
    for row in inv_3857.itertuples():
        t = parse_tile_id(row.id)
        filename = f"{t.z}_{t.x}_{t.y}.tif"
        path = os.path.join(images_root, f"{row.dataset}-images", filename)
        if not os.path.exists(path):
            continue
        r = read_geotiff(path)
        inv_mask = _geometry_mask(row.geometry, r)
        tile_mask = ((1 - inv_mask) * 255).astype(np.uint8)
        means.append(float(tile_mask.mean()))
        stds.append(float(tile_mask.std()))
        if mask_as_band:
            augmented = np.concatenate([r.data, tile_mask[:, :, None]],
                                       axis=2)
            write_geotiff(path, augmented, r.bounds, epsg=r.epsg)
        else:
            write_geotiff(os.path.join(mask_dir or images_root, filename),
                          tile_mask, r.bounds, epsg=r.epsg)
    if means:
        logger.info(f"mask means: median {np.median(means):.3f}, "
                    f"median std {np.median(stds):.3f}")
    return pd.DataFrame({"mean": means, "std": stds})


def run_limit_used_tiles(cfg: dict) -> list[str]:
    """``limit_used_tiles.py`` YAML block (reference config_obj_detec.yaml:
    22-29)."""
    wd = cfg["working_directory"]
    manifest = Manifest()
    gt = read_file(os.path.join(wd, cfg["input_directory"],
                                cfg["ground_truth_labels"]))
    oth = read_file(os.path.join(wd, cfg["input_directory"],
                                 cfg["other_labels"]))
    tiles = read_file(os.path.join(wd, cfg["input_directory"],
                                   cfg["tiles"]))
    out = limit_used_tiles(tiles, gt, oth, cfg["considered_datasets"])
    p = os.path.join(wd, cfg["output_directory"], "tiles_aoi.geojson")
    write_file(out, p, driver="GeoJSON")
    manifest.add(p)
    manifest.log()
    return manifest.files
