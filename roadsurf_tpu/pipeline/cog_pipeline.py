"""tif2cog: 16-bit SWISSIMAGE-RS TIFFs → 8-bit Cloud-Optimized GeoTIFFs.

Capability parity with reference scripts/preprocessing/tif2cog.py (class
TIF2COG, 3 idempotent steps against an object store), re-designed so the
per-pixel math runs on the device:

* STEP 1 — reproject EPSG:2056 → EPSG:3857 (nearest, nodata 0). The GDAL
  Warp of the reference becomes a jnp gather: the target 3857 grid is
  inverse-projected to source pixel indices once on host (the projection is
  smooth, evaluated exactly per pixel), and the gather itself is jitted —
  batched-friendly and XLA-fused with the later scaling. Overviews [2..256]
  are built with AVERAGE resampling.
* STEP 2 — per-band min/max/mean/std ignoring nodata (GDAL GetStatistics
  equivalent), jnp reductions; results cached to a stats JSON like the
  reference (:376-397).
* STEP 3 — global scaling bounds = mean±2σ aggregated ±σ across images,
  clamped to [0, 65535] (:199-238), then uint16→uint8 per-band scaling
  NIR/R/G/B → [0,255] and tiled COG writing with COPY_SRC_OVERVIEWS
  semantics (:241-293).

Every step is skip-if-object-exists (resume semantics of the reference).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..crs.transform import transform_xy
from ..io.cog import DEFAULT_OVERVIEWS, write_cog
from ..io.geotiff import Raster, read_geotiff
from ..io.objstore import ObjectStore
from ..utils.logging import logger
from ..utils.misc import ensure_dir_exists


# ---------------------------------------------------------------------------
# device stages

def reproject_nearest(raster: Raster, dst_epsg: int = 3857,
                      nodata: float = 0.0) -> Raster:
    """Nearest-neighbour reprojection via inverse-mapped gather.

    The inverse projection (dst grid → src coords) is exact per pixel and
    computed with vectorized numpy; the gather runs under jit so XLA can
    fuse it with downstream scaling.
    """
    import jax
    import jax.numpy as jnp

    h, w, c = raster.data.shape
    x0, y0 = raster.origin
    sx, sy = raster.pixel_size
    src_epsg = raster.epsg

    # destination bounds = projected source corners
    cx = np.array([x0, x0 + sx * w, x0, x0 + sx * w])
    cy = np.array([y0, y0, y0 - sy * h, y0 - sy * h])
    dx_, dy_ = transform_xy(src_epsg, dst_epsg, cx, cy)
    west, east = float(dx_.min()), float(dx_.max())
    south, north = float(dy_.min()), float(dy_.max())

    # keep roughly the source resolution: same pixel count per axis
    ow, oh = w, h
    osx = (east - west) / ow
    osy = (north - south) / oh

    # inverse map: dst pixel centers -> src pixel indices
    gx = west + (np.arange(ow) + 0.5) * osx
    gy = north - (np.arange(oh) + 0.5) * osy
    gxx, gyy = np.meshgrid(gx, gy)
    sxx, syy = transform_xy(dst_epsg, src_epsg, gxx.ravel(), gyy.ravel())
    col = np.floor((sxx - x0) / sx).astype(np.int32).reshape(oh, ow)
    row = np.floor((y0 - syy) / sy).astype(np.int32).reshape(oh, ow)
    valid = (col >= 0) & (col < w) & (row >= 0) & (row < h)
    col_c = np.clip(col, 0, w - 1)
    row_c = np.clip(row, 0, h - 1)

    @jax.jit
    def gather(data, rowi, coli, ok):
        out = data[rowi, coli]
        return jnp.where(ok[:, :, None], out,
                         jnp.asarray(nodata, data.dtype))

    out = np.asarray(gather(jnp.asarray(raster.data), jnp.asarray(row_c),
                            jnp.asarray(col_c), jnp.asarray(valid)))
    return Raster(data=out, origin=(west, north), pixel_size=(osx, osy),
                  epsg=dst_epsg, nodata=nodata)


def band_stats(data: np.ndarray, nodata: float | None = 0.0) -> dict:
    """Per-band min/max/mean/std over valid pixels (GDAL GetStatistics
    equivalent, tif2cog.py:180-197). Band keys are 1-based strings."""
    import jax.numpy as jnp

    x = jnp.asarray(data.reshape(-1, data.shape[2]), jnp.float32)
    if nodata is not None:
        ok = x != nodata
    else:
        ok = jnp.ones_like(x, bool)
    n = jnp.maximum(jnp.sum(ok, axis=0), 1)
    mean = jnp.sum(jnp.where(ok, x, 0), axis=0) / n
    var = jnp.sum(jnp.where(ok, (x - mean) ** 2, 0), axis=0) / n
    mn = jnp.min(jnp.where(ok, x, jnp.inf), axis=0)
    mx = jnp.max(jnp.where(ok, x, -jnp.inf), axis=0)
    mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    std = jnp.sqrt(var)
    out = {}
    for i in range(data.shape[2]):
        out[str(i + 1)] = {"min": float(mn[i]), "max": float(mx[i]),
                           "mean": float(mean[i]), "stddev": float(std[i])}
    return out


def summarize_stats(stats: dict, r_idx: int, g_idx: int, b_idx: int,
                    nir_idx: int, fact: float = 2.0) -> dict:
    """Global scaling bounds across all images: per-band mean±2σ envelopes
    aggregated ±σ, clamped to [0, 65535] (tif2cog.py:199-238)."""
    def bounds(band_ids):
        mins, maxs = [], []
        for img_stats in stats.values():
            for b in band_ids:
                s = img_stats[str(b)]
                mins.append(s["mean"] - fact * s["stddev"])
                maxs.append(s["mean"] + fact * s["stddev"])
        lo = max(float(np.mean(mins) - np.std(mins)), 0.0)
        hi = min(float(np.mean(maxs) + np.std(maxs)), 65535.0)
        return lo, hi

    rgb_min, rgb_max = bounds([r_idx, g_idx, b_idx])
    nir_min, nir_max = bounds([nir_idx])
    return {"rgb_min": rgb_min, "rgb_max": rgb_max,
            "nir_min": nir_min, "nir_max": nir_max}


def scale_to_byte(data: np.ndarray, band_bounds: list) -> np.ndarray:
    """uint16 → uint8 per-band linear scaling (gdal.Translate scaleParams
    equivalent, tif2cog.py:241-293). band_bounds[i] = (lo, hi) per band."""
    import jax
    import jax.numpy as jnp

    lo = jnp.asarray([b[0] for b in band_bounds], jnp.float32)
    hi = jnp.asarray([b[1] for b in band_bounds], jnp.float32)

    @jax.jit
    def scale(x):
        y = (x.astype(jnp.float32) - lo) / jnp.maximum(hi - lo, 1e-9) * 255.0
        return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)

    return np.asarray(scale(jnp.asarray(data)))


# ---------------------------------------------------------------------------
# pipeline

class Tif2Cog:
    """3-step object-store-resident conversion pipeline (reference class
    TIF2COG, tif2cog.py:16)."""

    def __init__(self, store: ObjectStore, prefix_in: str, prefix_tif: str,
                 prefix_cog: str, workdir: str = "./workdir",
                 nir_band: int = 1, r_band: int = 2, g_band: int = 3,
                 b_band: int = 4):
        self.store = store
        self.prefix_in = prefix_in.strip("/")
        self.prefix_tif = prefix_tif.strip("/")
        self.prefix_cog = prefix_cog.strip("/")
        self.workdir = ensure_dir_exists(workdir)
        self.nir, self.r, self.g, self.b = nir_band, r_band, g_band, b_band

    def get_workload(self) -> list[str]:
        keys = [k for k in self.store.list(self.prefix_in)
                if k.lower().endswith(".tif")]
        logger.info(f"{len(keys)} source images found under "
                    f"{self.prefix_in}/")
        return keys

    # ---- step 1 ----------------------------------------------------------
    def reproject_and_gen_overviews(self, key: str) -> bool:
        basename = os.path.basename(key)
        dst_key = f"{self.prefix_tif}/{basename}"
        if self.store.exists(dst_key):
            logger.info(f"{dst_key} exists => skipping")
            return False
        tmp_in = os.path.join(self.workdir, "in_" + basename)
        tmp_out = os.path.join(self.workdir, basename)
        self.store.download(key, tmp_in)
        src = read_geotiff(tmp_in)
        warped = reproject_nearest(src, 3857, nodata=0.0)
        write_cog(tmp_out, warped.data, warped.bounds, epsg=3857,
                  overview_levels=DEFAULT_OVERVIEWS, nodata=0)
        self.store.upload(tmp_out, dst_key)
        os.remove(tmp_in)
        os.remove(tmp_out)
        return True

    # ---- step 2 ----------------------------------------------------------
    def compute_stats(self, key: str) -> dict:
        basename = os.path.basename(key)
        tmp = os.path.join(self.workdir, "st_" + basename)
        self.store.download(f"{self.prefix_tif}/{basename}", tmp)
        r = read_geotiff(tmp)
        stats = band_stats(r.data, nodata=r.nodata if r.nodata is not None
                           else 0.0)
        os.remove(tmp)
        return stats

    # ---- step 3 ----------------------------------------------------------
    def generate_cogs(self, key: str, summary: dict) -> bool:
        basename = os.path.basename(key)
        dst_key = f"{self.prefix_cog}/{basename}"
        if self.store.exists(dst_key):
            logger.info(f"{dst_key} exists => skipping")
            return False
        tmp_in = os.path.join(self.workdir, "cg_" + basename)
        tmp_out = os.path.join(self.workdir, "cog_" + basename)
        self.store.download(f"{self.prefix_tif}/{basename}", tmp_in)
        r = read_geotiff(tmp_in)
        bounds_by_band = []
        for b in range(1, r.data.shape[2] + 1):
            if b == self.nir:
                bounds_by_band.append((summary["nir_min"],
                                       summary["nir_max"]))
            else:
                bounds_by_band.append((summary["rgb_min"],
                                       summary["rgb_max"]))
        byte = scale_to_byte(r.data, bounds_by_band)
        write_cog(tmp_out, byte, r.bounds, epsg=r.epsg, nodata=0)
        self.store.upload(tmp_out, dst_key)
        os.remove(tmp_in)
        os.remove(tmp_out)
        return True

    # ---- driver ----------------------------------------------------------
    def run(self, do_step1=True, do_step2=True, do_step3=True) -> dict:
        import time as _time

        workload = self.get_workload()
        if do_step1:
            t0 = _time.time()
            n = sum(self.reproject_and_gen_overviews(k) for k in workload)
            dt = max(_time.time() - t0, 1e-9)
            logger.info(f"STEP1: {n} reprojected "
                        f"({len(workload) / dt:.2f} images/s)")

        stats_key = f"{self.prefix_tif}/stats.json"
        stats_path = os.path.join(self.workdir, "stats.json")
        if do_step2:
            if self.store.exists(stats_key):
                logger.info("stats.json exists => reusing")
                self.store.download(stats_key, stats_path)
                with open(stats_path) as f:
                    stats = json.load(f)
            else:
                stats = {}
                t0 = _time.time()
                for k in workload:
                    stats[os.path.basename(k)] = self.compute_stats(k)
                dt = max(_time.time() - t0, 1e-9)
                logger.info(f"STEP2: stats over {len(workload)} images "
                            f"({len(workload) / dt:.2f} images/s)")
                with open(stats_path, "w") as f:
                    json.dump(stats, f, indent=1)
                self.store.upload(stats_path, stats_key)
        else:
            stats = {}

        summary = {}
        if do_step3:
            if not stats:
                self.store.download(stats_key, stats_path)
                with open(stats_path) as f:
                    stats = json.load(f)
            summary = summarize_stats(stats, self.r, self.g, self.b,
                                      self.nir)
            logger.info(f"scaling summary: {summary}")
            t0 = _time.time()
            n = sum(self.generate_cogs(k, summary) for k in workload)
            dt = max(_time.time() - t0, 1e-9)
            logger.info(f"STEP3: {n} COGs written "
                        f"({len(workload) / dt:.2f} images/s)")
        return {"workload": workload, "summary": summary}


def run(cfg: dict, store: ObjectStore | None = None) -> dict:
    """``tif2cog.py`` YAML block (reference config_preprocessing.yaml):
    S3_PREFIX_IN/TIF/COG, WORKDIR, band indices, DO_STEP1..3. ``store``
    defaults to an S3 store from the environment, or a LocalStore when the
    config provides ``LOCAL_STORE_ROOT`` (no-egress environments)."""
    if store is None:
        from ..io.objstore import LocalStore, S3Store
        if cfg.get("LOCAL_STORE_ROOT"):
            store = LocalStore(cfg["LOCAL_STORE_ROOT"])
        else:
            store = S3Store(cfg["BUCKET"], cfg.get("ENDPOINT_URL"))
    pipe = Tif2Cog(store,
                   cfg["S3_PREFIX_IN"], cfg["S3_PREFIX_TIF"],
                   cfg["S3_PREFIX_COG"], cfg.get("WORKDIR", "./workdir"),
                   nir_band=cfg.get("NIR_BAND_NO", 1),
                   r_band=cfg.get("R_BAND_NO", 2),
                   g_band=cfg.get("G_BAND_NO", 3),
                   b_band=cfg.get("B_BAND_NO", 4))
    return pipe.run(cfg.get("DO_STEP1", True), cfg.get("DO_STEP2", True),
                    cfg.get("DO_STEP3", True))
