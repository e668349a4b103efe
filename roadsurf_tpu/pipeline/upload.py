"""RS_images_to_S3: bulk upload of SWISSIMAGE-RS imagery to an object
store.

Capability parity with reference scripts/preprocessing/RS_images_to_S3.py:
glob the local imagery, upload each file with skip-if-exists resume and a
threaded progress callback, plus the move/copy file-management helpers.
"""

from __future__ import annotations

import glob
import os
import shutil

from ..io.objstore import ObjectStore, ProgressPercentage, make_store
from ..utils.logging import logger


def file_exists_online(store: ObjectStore, key: str) -> bool:
    return store.exists(key)


def upload_file(store: ObjectStore, local_path: str, key: str,
                progress: bool = True) -> bool:
    """Upload one file unless it already exists online
    (reference RS_images_to_S3.py:154-155 skip)."""
    cb = ProgressPercentage(local_path) if progress else None
    return store.upload_if_missing(local_path, key, callback=cb)


def move_files(paths: list[str], dst_dir: str) -> list[str]:
    os.makedirs(dst_dir, exist_ok=True)
    out = []
    for p in paths:
        d = os.path.join(dst_dir, os.path.basename(p))
        shutil.move(p, d)
        out.append(d)
    return out


def copy_files(paths: list[str], dst_dir: str) -> list[str]:
    os.makedirs(dst_dir, exist_ok=True)
    out = []
    for p in paths:
        d = os.path.join(dst_dir, os.path.basename(p))
        shutil.copy2(p, d)
        out.append(d)
    return out


def run(cfg: dict, store: ObjectStore | None = None) -> list[str]:
    """``RS_images_to_S3.py`` YAML block: datapath glob, bucket, outpath
    (reference config_preprocessing.yaml). A ``local_store_root`` key maps
    the same flow onto a directory store for no-egress environments."""
    if store is None:
        if cfg.get("local_store_root"):
            store = make_store({"type": "local",
                                "root": cfg["local_store_root"]})
        else:
            store = make_store({"type": "s3", "bucket": cfg["bucket"],
                                "endpoint_url": cfg.get("url")})
    outpath = cfg.get("outpath", "").strip("/")
    uploaded = []
    paths = sorted(glob.glob(cfg["datapath"]))
    logger.info(f"{len(paths)} files matched {cfg['datapath']}")
    for p in paths:
        if not os.path.isfile(p):
            continue
        key = f"{outpath}/{os.path.basename(p)}" if outpath \
            else os.path.basename(p)
        if upload_file(store, p, key):
            uploaded.append(key)
    logger.info(f"{len(uploaded)} files uploaded, "
                f"{len(paths) - len(uploaded)} skipped.")
    return uploaded
