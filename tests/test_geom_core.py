import numpy as np
import pytest

from roadsurf_tpu.geom import (LineString, MultiPolygon, Point, Polygon,
                               union_all, rdp_simplify)
from roadsurf_tpu.geom.affinity import scale


def sq(x0, y0, x1, y1):
    return Polygon([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])


def test_boolean_basic():
    a, b = sq(0, 0, 2, 2), sq(1, 1, 3, 3)
    assert a.intersection(b).area == pytest.approx(1.0)
    assert a.union(b).area == pytest.approx(7.0)
    assert a.difference(b).area == pytest.approx(3.0)
    assert (a - b).area == pytest.approx(3.0)


def test_difference_with_hole():
    outer, inner = sq(0, 0, 10, 10), sq(3, 3, 6, 6)
    d = outer - inner
    assert d.area == pytest.approx(91.0)
    assert d.geom_type == "Polygon"
    assert len(d.interiors_coords) == 1


def test_multipolygon_difference_splits():
    bar = sq(0, 4, 10, 6)
    base = sq(0, 0, 10, 10)
    d = base - bar
    assert d.geom_type == "MultiPolygon"
    assert sorted(p.area for p in d.geoms) == pytest.approx([40.0, 40.0])


def test_union_all_monte_carlo():
    rng = np.random.default_rng(1)
    polys = []
    for _ in range(100):
        x, y = rng.uniform(0, 40, 2)
        s = rng.uniform(1, 5)
        th = rng.uniform(0, np.pi)
        c, sn = np.cos(th), np.sin(th)
        base = np.array([[0, 0], [s, 0], [s, s], [0, s]]) - s / 2
        polys.append(Polygon(base @ np.array([[c, -sn], [sn, c]]) + [x, y]))
    u = union_all(polys)
    pts = rng.uniform(-5, 50, (100000, 2))
    from roadsurf_tpu.geom import _native as N
    mask = N.points_in_polyset(pts, u._flat())
    mc = mask.mean() * 55 * 55
    assert abs(u.area - mc) / u.area < 0.02


def test_flat_cap_buffer():
    line = LineString([[0, 0], [10, 0]])
    b = line.buffer(1.0, cap_style=2)
    assert b.area == pytest.approx(20.0)
    r = line.buffer(1.0, cap_style=1)
    assert r.area == pytest.approx(20.0 + np.pi, rel=0.01)


def test_buffer_join_round():
    line = LineString([[0, 0], [10, 0], [10, 10]])
    b = line.buffer(1.0, cap_style=2)
    # two 20-area strokes minus 2x2 overlap + ~3/4 circle at the joint
    assert 38.5 < b.area < 40.0


def test_polygon_buffer_outward():
    p = sq(0, 0, 10, 10)
    b = p.buffer(1.0)
    # 100 + perimeter*1 + pi*1^2 corners
    assert b.area == pytest.approx(100 + 40 + np.pi, rel=0.01)


def test_predicates():
    a, b, c = sq(0, 0, 4, 4), sq(1, 1, 2, 2), sq(10, 10, 11, 11)
    assert a.intersects(b) and not a.intersects(c)
    assert b.within(a) and not a.within(b)
    assert a.contains(Point(1, 1))
    assert not a.contains(Point(5, 5))


def test_centroid_and_bounds():
    p = sq(0, 0, 2, 4)
    c = p.centroid
    assert (c.x, c.y) == pytest.approx((1.0, 2.0))
    assert p.bounds == (0, 0, 2, 4)


def test_scale_about_center():
    s = scale(sq(0, 0, 2, 2), 0.99, 0.99)
    assert s.area == pytest.approx(4 * 0.99**2)
    assert s.centroid.x == pytest.approx(1.0)


def test_rdp():
    pts = np.array([[0, 0], [5, 0.1], [10, 0]])
    out = rdp_simplify(pts, 0.75)
    assert len(out) == 2
    out2 = rdp_simplify(pts, 0.05)
    assert len(out2) == 3


def test_keep_largest_part_pattern():
    """The reference keeps only the largest part of a MultiPolygon diff
    (fct_misc.polygons_diff_without_artifacts)."""
    base = sq(0, 0, 10, 10)
    bar = sq(0, 4, 10, 7)
    d = base - bar
    largest = max(d.geoms, key=lambda p: p.area)
    assert largest.area == pytest.approx(40.0)


def test_degenerate_shell_does_not_corrupt_multipolygon_ops():
    """A shell collapsing under the snap grid must not shift ring indices
    for the remaining polygons (regression: trivial boolean-op path)."""
    from roadsurf_tpu.geom.core import MultiPolygon, Polygon
    sq = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    sliver = Polygon([(20, 20), (20 + 1e-12, 20), (20, 20 + 1e-12)])
    mp = MultiPolygon([sliver, sq])
    far = Polygon([(100, 100), (101, 100), (101, 101), (100, 101)])
    assert mp.difference(far).area == pytest.approx(100.0)
    assert mp.union(far).area == pytest.approx(101.0)


def test_shape_accepts_3d_coordinates():
    from roadsurf_tpu.geom.core import shape
    p = shape({"type": "Polygon",
               "coordinates": [[[0, 0, 5], [4, 0, 5], [4, 4, 6],
                                [0, 4, 6], [0, 0, 5]]]})
    assert p.area == pytest.approx(16.0)
    pt = shape({"type": "Point", "coordinates": [1, 2, 3]})
    assert (pt.x, pt.y) == (1.0, 2.0)


def test_point_negative_buffer_is_empty():
    from roadsurf_tpu.geom.core import Point
    assert Point(0, 0).buffer(-2.0).is_empty


def test_geoseries_ops_pass_none_through():
    from roadsurf_tpu.geom.core import Polygon
    from roadsurf_tpu.geom.table import GeoDataFrame
    sq = Polygon([(2600000, 1200000), (2600010, 1200000),
                  (2600010, 1200010), (2600000, 1200010)])
    gdf = GeoDataFrame({"geometry": [sq, None]}, crs="EPSG:2056")
    assert gdf.to_crs(epsg=4326).geometry.values[1] is None
    assert gdf.buffer(1.0).values[1] is None
    assert gdf.geometry.simplify(0.5).values[1] is None


def test_sjoin_left_with_duplicate_index():
    from roadsurf_tpu.geom.core import Polygon
    from roadsurf_tpu.geom.table import GeoDataFrame, sjoin
    sq = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])
    far = Polygon([(50, 50), (51, 50), (51, 51), (50, 51)])
    left = GeoDataFrame({"geometry": [sq, sq, far]}, crs="EPSG:2056")
    left.index = [0, 0, 1]
    right = GeoDataFrame({"v": [7], "geometry": [sq]}, crs="EPSG:2056")
    out = sjoin(left, right, how="left")
    assert len(out) == 3


def test_mask_holes_attach_to_innermost_exterior():
    import numpy as np
    from roadsurf_tpu.geom.vectorize import mask_to_polygons
    m = np.zeros((20, 20), np.uint8)
    m[1:15, 1:15] = 1
    m[3:13, 3:13] = 0      # hole in the outer ring -> annulus
    m[5:11, 5:11] = 1      # island inside the hole
    m[7:9, 7:9] = 0        # hole in the island
    areas = sorted(round(p.area, 1) for p in mask_to_polygons(m))
    assert areas == [32.0, 96.0]


def test_line_areal_intersection_and_difference():
    """Line x polygon boolean ops keep the LINE family (GEOS semantics;
    the statistical branch clips road lines to the AOI — reference
    prepare_data.py:79)."""
    from roadsurf_tpu.geom.core import (LineString, MultiLineString,
                                        MultiPolygon, Polygon)
    sq = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])

    # crossing line: clipped to the inside chord
    l = LineString([(-5, 5), (15, 5)])
    inter = l.intersection(sq)
    assert inter.geom_type in ("LineString", "MultiLineString")
    assert inter.length == pytest.approx(10.0)
    diff = l.difference(sq)
    assert diff.length == pytest.approx(10.0)     # 5 on each side
    assert diff.geom_type == "MultiLineString" and len(diff.geoms) == 2

    # symmetric operand order
    assert sq.intersection(l).length == pytest.approx(10.0)
    # areal - line: lines have zero measure
    assert sq.difference(l).area == pytest.approx(sq.area)

    # fully inside / fully outside
    assert LineString([(1, 1), (9, 1)]).intersection(sq).length == \
        pytest.approx(8.0)
    assert LineString([(20, 20), (30, 20)]).intersection(sq).is_empty
    assert LineString([(20, 20), (30, 20)]).difference(sq).length == \
        pytest.approx(10.0)

    # polygon with a hole: the chord over the hole is cut out
    holed = Polygon([(0, 0), (10, 0), (10, 10), (0, 10)],
                    holes=[[(4, 4), (6, 4), (6, 6), (4, 6)]])
    got = LineString([(-5, 5), (15, 5)]).intersection(holed)
    assert got.length == pytest.approx(8.0)       # 10 minus the 2-wide hole
    assert got.geom_type == "MultiLineString" and len(got.geoms) == 2

    # MultiPolygon operand + multi-segment polyline
    mp = MultiPolygon([sq, Polygon([(20, 0), (30, 0), (30, 10), (20, 10)])])
    zig = LineString([(-5, 5), (15, 5), (15, 8), (35, 8)])
    got = zig.intersection(mp)
    assert got.length == pytest.approx(10.0 + 10.0)

    # MultiLineString input
    ml = MultiLineString([[(-5, 2), (15, 2)], [(-5, 8), (15, 8)]])
    assert ml.intersection(sq).length == pytest.approx(20.0)


def test_overlay_keeps_line_family():
    """overlay(lines, polys, 'intersection', keep_geom_type=True) keeps
    df1's geometry family (geopandas semantics) instead of dropping the
    line results."""
    from roadsurf_tpu.geom.core import LineString, Polygon
    from roadsurf_tpu.geom.table import GeoDataFrame, overlay
    roads = GeoDataFrame({
        "rid": [1, 2],
        "geometry": [LineString([(-5, 5), (15, 5)]),
                     LineString([(50, 50), (60, 50)])]}, crs="EPSG:2056")
    aoi = GeoDataFrame({
        "aid": [0],
        "geometry": [Polygon([(0, 0), (10, 0), (10, 10), (0, 10)])]},
        crs="EPSG:2056")
    out = overlay(roads, aoi, how="intersection")
    assert len(out) == 1 and out["rid"].iloc[0] == 1
    g = out.geometry.iloc[0]
    assert g.geom_type in ("LineString", "MultiLineString")
    assert g.length == pytest.approx(10.0)
