"""Synthetic swissTLM3D-style fixtures.

The reference repo's real roads/forests shapefiles are stripped large blobs,
so tests and CLI dry-runs build a small synthetic scene with the same schema
(OBJECTID / OBJEKTART / KUNSTBAUTE / BELAGSART road lines, forest polygons,
an AOI, and a roads_parameters.xlsx width table).
"""

import os

import pandas as pd

from roadsurf_tpu.geom.core import LineString, Polygon
from roadsurf_tpu.geom.table import GeoDataFrame
from roadsurf_tpu.io import write_file
from roadsurf_tpu.io.xlsx import write_xlsx

X0, Y0 = 2600000.0, 1200000.0  # EPSG:2056, mid-Switzerland


def synthetic_roads(n_grid: int = 3, spacing: float = 300.0) -> GeoDataFrame:
    """A grid of crossing roads with mixed classes and surfaces."""
    rows = []
    oid = 1
    for i in range(n_grid):
        y = Y0 + i * spacing
        rows.append(dict(
            OBJECTID=oid, OBJEKTART=2 if i % 2 == 0 else 9,
            KUNSTBAUTE=100, BELAGSART=100 if i % 2 == 0 else 200,
            geometry=LineString([(X0, y), (X0 + n_grid * spacing, y)])))
        oid += 1
    for j in range(n_grid):
        x = X0 + j * spacing + 150
        rows.append(dict(
            OBJECTID=oid, OBJEKTART=9, KUNSTBAUTE=100,
            BELAGSART=200 if j % 2 == 0 else 100,
            geometry=LineString([(x, Y0 - 100),
                                 (x, Y0 + n_grid * spacing)])))
        oid += 1
    # one unknown-surface road off to the north (tile-exclusion path)
    rows.append(dict(
        OBJECTID=oid, OBJEKTART=9, KUNSTBAUTE=100, BELAGSART=999997,
        geometry=LineString([(X0, Y0 + 6000), (X0 + 400, Y0 + 6000)])))
    return GeoDataFrame(pd.DataFrame(rows), crs="EPSG:2056")


def synthetic_forests() -> GeoDataFrame:
    return GeoDataFrame(
        {"UUID": ["forest-1"],
         "geometry": [Polygon([(X0 + 400, Y0 + 400), (X0 + 600, Y0 + 400),
                               (X0 + 600, Y0 + 600), (X0 + 400, Y0 + 600)])]},
        crs="EPSG:2056")


def synthetic_aoi(margin: float = 800.0, span: float = 7000.0) -> GeoDataFrame:
    return GeoDataFrame(
        {"geometry": [Polygon([
            (X0 - margin, Y0 - margin), (X0 + span, Y0 - margin),
            (X0 + span, Y0 + span), (X0 - margin, Y0 + span)])]},
        crs="EPSG:2056")


def roads_parameters_df() -> pd.DataFrame:
    return pd.DataFrame({
        "GDB-Code": [2, 9, 14],
        "Type": ["Strasse", "Weg", "Faehre"],
        "to keep": ["yes", "yes", "no"],
        "Definition": ["wide road", "path", "ferry"],
        "Width": [8.0, 4.0, None],
    })


def write_data_dir(root: str, n_grid: int = 3,
                   spacing: float = 300.0) -> str:
    """Materialize a reference-layout ``data/`` directory under ``root``.

    ``n_grid``/``spacing`` scale the synthetic road network (the e2e
    quality chain uses a denser grid so the per-road balanced F1 has
    enough resolution to sit meaningfully below 1.0)."""
    data = os.path.join(root, "data")
    os.makedirs(os.path.join(data, "swissTLM3D"), exist_ok=True)
    os.makedirs(os.path.join(data, "AOI"), exist_ok=True)
    write_file(synthetic_roads(n_grid=n_grid, spacing=spacing),
               os.path.join(data, "swissTLM3D", "roads_lines.shp"))
    write_file(synthetic_forests(),
               os.path.join(data, "swissTLM3D", "forests.shp"))
    write_file(synthetic_aoi(), os.path.join(data, "AOI", "aoi.shp"))
    # restricted training AOI (reference config_obj_detec.yaml:15): covers
    # the whole scene by default so every label stays ground truth; tests
    # exercising the GT/OTH split overwrite it with a sub-area
    write_file(synthetic_aoi(),
               os.path.join(data, "AOI", "2_tiles_AOI.shp"))
    write_xlsx(roads_parameters_df(),
               os.path.join(data, "roads_parameters.xlsx"))
    return data
