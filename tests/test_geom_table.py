import numpy as np
import pytest

from roadsurf_tpu.geom import GeoDataFrame, LineString, Polygon, overlay, sjoin


def sq(x0, y0, x1, y1):
    return Polygon([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])


def test_sjoin_inner_and_left():
    a = GeoDataFrame({"OBJECTID": [1, 2],
                      "geometry": [sq(0, 0, 2, 2), sq(8, 8, 9, 9)]}, crs=2056)
    b = GeoDataFrame({"OBJECTID": [10, 11], "tag": ["x", "y"],
                      "geometry": [sq(1, 1, 3, 3), sq(1.5, 1.5, 4, 4)]},
                     crs=2056)
    j = sjoin(a, b, how="inner", lsuffix="1", rsuffix="2")
    assert list(j.columns[:3]) == ["OBJECTID_1", "geometry", "OBJECTID_2"]
    assert len(j) == 2  # row 1 matches both b rows
    assert set(j["OBJECTID_2"]) == {10, 11}

    jl = sjoin(a, b, how="left", lsuffix="1", rsuffix="2")
    assert len(jl) == 3
    assert jl["OBJECTID_2"].isna().sum() == 1


def test_sjoin_within():
    roads = GeoDataFrame({"OBJECTID": [1, 2],
                          "geometry": [sq(1, 1, 2, 2), sq(0, 0, 9, 9)]},
                         crs=2056)
    zones = GeoDataFrame({"zid": [5], "geometry": [sq(0, 0, 4, 4)]}, crs=2056)
    j = sjoin(roads, zones, predicate="within")
    assert list(j["OBJECTID"]) == [1]


def test_overlay_difference_and_intersection():
    roads = GeoDataFrame({"OBJECTID": [1], "geometry": [sq(0, 0, 10, 2)]},
                         crs=2056)
    forest = GeoDataFrame({"UUID": ["f"], "geometry": [sq(4, 0, 6, 2)]},
                          crs=2056)
    d = overlay(roads, forest, how="difference")
    assert d.area.sum() == pytest.approx(16.0)
    assert list(d.columns) == ["OBJECTID", "geometry"]

    i = overlay(roads, forest, how="intersection")
    assert i.area.sum() == pytest.approx(4.0)
    assert set(i.columns) == {"OBJECTID", "UUID", "geometry"}


def test_geoseries_ops_and_crs_roundtrip():
    g = GeoDataFrame({"w": [4.0],
                      "geometry": [LineString([[2600000, 1200000],
                                               [2600100, 1200000]])]},
                     crs=2056)
    buf = g.buffer(g["w"] / 2, cap_style=2)
    assert buf.area.iloc[0] == pytest.approx(400.0)
    g4326 = g.to_crs(epsg=4326)
    back = g4326.to_crs(epsg=2056)
    c0 = g["geometry"].iloc[0].coords_array
    c1 = back["geometry"].iloc[0].coords_array
    np.testing.assert_allclose(c0, c1, atol=1e-4)


def test_unary_union_bounds():
    a = GeoDataFrame({"geometry": [sq(0, 0, 1, 1), sq(2, 2, 3, 3)]}, crs=2056)
    u = a.unary_union
    assert u.area == pytest.approx(2.0)
    assert u.bounds == (0, 0, 3, 3)
