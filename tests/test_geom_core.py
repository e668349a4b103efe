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
