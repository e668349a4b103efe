"""GeoPackage reader/writer on the stdlib sqlite3 (first-party, no OGR).

The detection engine writes ``{dst}_detections_at_0dot05_threshold.gpkg``
files with ``score`` and ``det_class`` attributes which the aggregation
stage reads back (reference determine_class.py:236, final_metrics.py:216;
SURVEY §2.3)."""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pandas as pd

from ..crs import CRS
from ..geom import GeoDataFrame
from . import wkb

_SRS_ROWS = [
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
    ("WGS 84 geodetic", 4326, "EPSG", 4326,
     'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
     '298.257223563]],PRIMEM["Greenwich",0],'
     'UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]', None),
    ("CH1903+ / LV95", 2056, "EPSG", 2056, "PROJCS[CH1903+ / LV95]", None),
    ("WGS 84 / Pseudo-Mercator", 3857, "EPSG", 3857,
     "PROJCS[WGS 84 / Pseudo-Mercator]", None),
]


def _gpb_header(srs_id: int, bounds) -> bytes:
    # flags: little-endian byte order (bit0), envelope indicator 1 (32..)
    flags = 0b00000011  # envelope [minx,maxx,miny,maxy] + LE
    return (b"GP" + struct.pack("<BBi", 0, flags, srs_id)
            + struct.pack("<4d", bounds[0], bounds[2], bounds[1], bounds[3]))


def _parse_gpb(blob: bytes):
    if blob is None or len(blob) < 8 or blob[:2] != b"GP":
        return None
    flags = blob[3]
    env = (flags >> 1) & 0b111
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env]
    return wkb.loads(blob[8 + env_len:])


def write_gpkg(gdf: GeoDataFrame, path: str, layer: str | None = None) -> None:
    layer = layer or os.path.splitext(os.path.basename(path))[0]
    srs_id = CRS(gdf.crs).epsg if gdf.crs is not None else 0
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
    cur.execute("PRAGMA user_version = 10300")
    cur.execute(
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, "
        "srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL, "
        "organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL,"
        " description TEXT)")
    cur.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)", _SRS_ROWS)
    cur.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, "
        "data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT "
        "DEFAULT '', last_change DATETIME, min_x DOUBLE, min_y DOUBLE, "
        "max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)")
    cur.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
        "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
        "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, "
        "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))")

    cols = [c for c in gdf.columns if c != "geometry"]
    defs = []
    for c in cols:
        s = gdf[c]
        if pd.api.types.is_integer_dtype(s):
            t = "INTEGER"
        elif pd.api.types.is_float_dtype(s):
            t = "REAL"
        else:
            t = "TEXT"
        defs.append(f'"{c}" {t}')
    cur.execute(
        f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
        f'geom BLOB{", " if defs else ""}{", ".join(defs)})')

    geoms = list(gdf["geometry"].values)
    tb = gdf.total_bounds if len(gdf) else (0, 0, 0, 0)
    gtypes = {g.geom_type.upper() for g in geoms if g is not None}
    gtype = gtypes.pop() if len(gtypes) == 1 else "GEOMETRY"

    rows = []
    for i in range(len(gdf)):
        g = geoms[i]
        blob = (_gpb_header(srs_id, g.bounds) + wkb.dumps(g)
                if g is not None and not g.is_empty else None)
        vals = []
        for c in cols:
            v = gdf.iloc[i][c]
            if pd.isna(v):
                vals.append(None)
            elif isinstance(v, (np.integer,)):
                vals.append(int(v))
            elif isinstance(v, (np.floating,)):
                vals.append(float(v))
            elif isinstance(v, (int, float, str)):
                vals.append(v)
            else:
                vals.append(str(v))
        rows.append([blob] + vals)
    ph = ",".join(["?"] * (1 + len(cols)))
    colnames = ", ".join(['geom'] + [f'"{c}"' for c in cols])
    cur.executemany(f'INSERT INTO "{layer}" ({colnames}) VALUES ({ph})', rows)
    cur.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
        "last_change, min_x, min_y, max_x, max_y, srs_id) VALUES "
        "(?, 'features', ?, datetime('now'), ?, ?, ?, ?, ?)",
        (layer, layer, float(tb[0]), float(tb[1]), float(tb[2]),
         float(tb[3]), srs_id))
    cur.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
        (layer, gtype, srs_id))
    con.commit()
    con.close()


def read_gpkg(path: str, layer: str | None = None) -> GeoDataFrame:
    con = sqlite3.connect(path)
    cur = con.cursor()
    if layer is None:
        row = cur.execute(
            "SELECT table_name, srs_id FROM gpkg_geometry_columns LIMIT 1"
        ).fetchone()
        if row is None:
            raise ValueError(f"no feature layer in {path}")
        layer, srs_id = row
    else:
        row = cur.execute(
            "SELECT srs_id FROM gpkg_geometry_columns WHERE table_name=?",
            (layer,)).fetchone()
        srs_id = row[0] if row else 0
    gcol_row = cur.execute(
        "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?",
        (layer,)).fetchone()
    gcol = gcol_row[0] if gcol_row else "geom"
    info = cur.execute(f'PRAGMA table_info("{layer}")').fetchall()
    cols = [r[1] for r in info if r[1] not in (gcol, "fid")]
    sel = ", ".join([f'"{gcol}"'] + [f'"{c}"' for c in cols])
    data = cur.execute(f'SELECT {sel} FROM "{layer}"').fetchall()
    con.close()
    geoms = [_parse_gpb(r[0]) for r in data]
    table = pd.DataFrame([r[1:] for r in data], columns=cols)
    gdf = GeoDataFrame(table)
    gdf["geometry"] = geoms
    try:
        gdf.crs = CRS(int(srs_id))
    except ValueError:
        gdf.crs = None
    return gdf
