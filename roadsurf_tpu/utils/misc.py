"""Shared helpers mirroring the reference's scripts/functions/fct_misc.py
surface (CRS guard, dir bootstrap, written-files manifest)."""

from __future__ import annotations

import os
import sys

from .logging import get_logger

logger = get_logger()


def ensure_dir_exists(dirpath: str) -> str:
    """mkdir-if-missing; returns the path (ref fct_misc.py:43-54)."""
    if not os.path.exists(dirpath):
        os.makedirs(dirpath, exist_ok=True)
        logger.info(f"The directory {dirpath} was created.")
    return dirpath


def test_crs(crs1, crs2="EPSG:2056", *, strict: bool = True) -> None:
    """Assert two CRS match, else exit(1) (ref fct_misc.py:28-41).

    Accepts CRS strings, ints, or objects exposing ``.crs``.
    """
    c1 = getattr(crs1, "crs", crs1)
    c2 = getattr(crs2, "crs", crs2)
    n1, n2 = _norm_crs(c1), _norm_crs(c2)
    if n1 != n2:
        msg = f"CRS mismatch between the two files ({c1} vs {c2})."
        if strict:
            print(msg)
            sys.exit(1)
        raise ValueError(msg)


def _norm_crs(c) -> str:
    if c is None:
        return "none"
    s = str(c).upper().replace(" ", "")
    if s.isdigit():
        s = f"EPSG:{s}"
    return s


class Manifest:
    """Tracks written files; printed at end of a script run, like the
    reference's ``written_files`` lists (prepare_data_obj_detec.py:400-403)."""

    def __init__(self):
        self.files: list[str] = []

    def add(self, path: str) -> str:
        self.files.append(path)
        return path

    def log(self, log=logger) -> None:
        log.info("Written files:")
        for f in self.files:
            log.info(f)
