"""Label-engineering pipeline tests on a synthetic swissTLM3D-like scene
(the reference's real roads/forests shapefiles are stripped large blobs)."""

import numpy as np
import pandas as pd
import pytest

from roadsurf_tpu.geom.core import LineString, Polygon
from roadsurf_tpu.geom.table import GeoDataFrame
from roadsurf_tpu.pipeline.label_prep import (determine_category,
                                              determine_road_surfaces,
                                              generate_labels,
                                              generate_tiles_info)

X0, Y0 = 2600000.0, 1200000.0  # EPSG:2056, mid-Switzerland


def _roads():
    rows = [
        # wide artificial road (class 2, width 8): horizontal
        dict(OBJECTID=1, OBJEKTART=2, KUNSTBAUTE=100, BELAGSART=100,
             geometry=LineString([(X0, Y0), (X0 + 400, Y0)])),
        # narrow natural road (class 9, width 4): vertical, crosses road 1
        dict(OBJECTID=2, OBJEKTART=9, KUNSTBAUTE=100, BELAGSART=200,
             geometry=LineString([(X0 + 200, Y0 - 200),
                                  (X0 + 200, Y0 + 200)])),
        # not-a-road OBJEKTART (ferry=14): must be filtered out
        dict(OBJECTID=3, OBJEKTART=14, KUNSTBAUTE=100, BELAGSART=100,
             geometry=LineString([(X0, Y0 + 50), (X0 + 100, Y0 + 50)])),
        # covered bridge (KUNSTBAUTE=300): must be filtered out
        dict(OBJECTID=4, OBJEKTART=2, KUNSTBAUTE=300, BELAGSART=100,
             geometry=LineString([(X0, Y0 + 90), (X0 + 100, Y0 + 90)])),
        # unknown-surface road far north: poisons its tiles
        dict(OBJECTID=5, OBJEKTART=9, KUNSTBAUTE=100, BELAGSART=999997,
             geometry=LineString([(X0, Y0 + 3000), (X0 + 300, Y0 + 3000)])),
    ]
    return GeoDataFrame(pd.DataFrame(rows), crs="EPSG:2056")


def _forests():
    # forest blob over the north end of road 2
    return GeoDataFrame(
        {"UUID": ["f1"],
         "geometry": [Polygon([(X0 + 150, Y0 + 120), (X0 + 250, Y0 + 120),
                               (X0 + 250, Y0 + 260), (X0 + 150, Y0 + 260)])]},
        crs="EPSG:2056")


def _params():
    return pd.DataFrame({
        "GDB-Code": [2, 9],
        "Type": ["Strasse", "Weg"],
        "to keep": ["yes", "yes"],
        "Width": [8.0, 4.0],
    })


def _aoi():
    return GeoDataFrame(
        {"geometry": [Polygon([(X0 - 500, Y0 - 500), (X0 + 900, Y0 - 500),
                               (X0 + 900, Y0 + 3500), (X0 - 500, Y0 + 3500)])]},
        crs="EPSG:2056")


def test_determine_category():
    assert determine_category(100) == "artificial"
    assert determine_category(200) == "natural"
    assert determine_category(999997) == "else"


def test_determine_road_surfaces_filters_buffers_deoverlaps():
    out = determine_road_surfaces(_roads(), _forests(), _params())
    ids = set(out["OBJECTID"])
    assert 3 not in ids and 4 not in ids     # filtered classes
    assert {1, 2, 5} <= ids

    wide = out[out["OBJECTID"] == 1].geometry.values[0]
    narrow = out[out["OBJECTID"] == 2].geometry.values[0]
    # buffers: road 1 area ≈ 400×8 (minus the crossing cut is on road 2)
    assert wide.area == pytest.approx(400 * 8, rel=0.01)
    # narrower road cedes the crossing overlap to the wider one
    assert wide.intersection(narrow).area < 1e-6
    # forest canopy (3 m-buffered) removed from road 2's north end
    assert narrow.bounds[3] < Y0 + 200
    assert "road_width" in out.columns and "Width" not in out.columns
    assert (out[out["OBJECTID"] == 2]["road_width"] == 4.0).all()


def test_generate_tiles_info_excludes_unknown_surface_tiles():
    nfr = determine_road_surfaces(_roads(), _forests(), _params())
    tiles = generate_tiles_info(nfr, _aoi(), _params(), zoom_level=18)
    assert len(tiles) > 0
    assert tiles.crs.to_epsg() == 3857
    # formatted id "(x, y, z)" with z = 18
    import re
    for tid in tiles["id"]:
        m = re.fullmatch(r"\((\d+), (\d+), 18\)", tid)
        assert m, tid
    # no considered tile may intersect the unknown-surface road (id 5)
    bad = nfr[nfr["OBJECTID"] == 5].to_crs(epsg=3857).geometry.values[0]
    for g in tiles.geometry.values:
        assert not g.intersects(bad)


def test_generate_labels_split_invariant():
    nfr = determine_road_surfaces(_roads(), _forests(), _params())
    tiles = generate_tiles_info(nfr, _aoi(), _params(), zoom_level=18)
    gt, oth = generate_labels(nfr, tiles.to_crs(epsg=4326))
    labels_total = len(nfr[nfr["BELAGSART"].isin([100, 200])])
    assert len(gt) + len(oth) == labels_total
    assert set(gt["CATEGORY"]) <= {"artificial", "natural"}
    assert (gt["SUPERCATEGORY"] == "road").all()
    # roads 1 and 2 sit on considered tiles -> ground truth
    assert {1, 2} <= set(gt["OBJECTID"])
