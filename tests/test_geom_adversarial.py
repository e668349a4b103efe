"""Adversarial geometry-engine cases (VERDICT round-1 item 6).

GEOS golden files cannot be generated in this environment (shapely/GEOS are
not installed and the container has no egress), so the boolean core is
pinned instead against (a) analytically-known results for the degenerate
configurations GEOS is notoriously careful about — shared edges, snap
collapses, donut-in-donut nesting, T-junctions — and (b) a rasterized
Monte-Carlo oracle for long overlay chains mimicking the reference's
de-overlap loop (prepare_data_obj_detec.py:139-191).
"""

import numpy as np
import pytest

from roadsurf_tpu.geom import MultiPolygon, Point, Polygon, union_all


def sq(x0, y0, x1, y1):
    return Polygon([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])


def raster_area(polys, bounds, n=800):
    """Pixel-count oracle for the area of a union of polygons."""
    x0, y0, x1, y1 = bounds
    xs = np.linspace(x0, x1, n, endpoint=False) + (x1 - x0) / n / 2
    ys = np.linspace(y0, y1, n, endpoint=False) + (y1 - y0) / n / 2
    gx, gy = np.meshgrid(xs, ys)
    hit = np.zeros(gx.shape, bool)
    for p in polys:
        if p is None or p.is_empty:
            continue
        for g in (p.geoms if p.geom_type == "MultiPolygon" else [p]):
            sh = np.asarray(g.exterior_coords)
            hit |= _pip(gx, gy, sh) & ~_holes(gx, gy, g)
    cell = (x1 - x0) / n * (y1 - y0) / n
    return hit.sum() * cell


def _pip(gx, gy, ring):
    inside = np.zeros(gx.shape, bool)
    xs, ys = ring[:, 0], ring[:, 1]
    j = len(ring) - 1
    for i in range(len(ring)):
        cond = ((ys[i] > gy) != (ys[j] > gy)) & (
            gx < (xs[j] - xs[i]) * (gy - ys[i]) / (ys[j] - ys[i] + 1e-300)
            + xs[i])
        inside ^= cond
        j = i
    return inside


def _holes(gx, gy, g):
    out = np.zeros(gx.shape, bool)
    for h in g.interiors_coords:
        out |= _pip(gx, gy, np.asarray(h))
    return out


# ---------------------------------------------------------------------------
# shared edges


def test_shared_edge_union_no_sliver():
    a, b = sq(0, 0, 2, 2), sq(2, 0, 4, 2)
    u = a.union(b)
    assert u.area == pytest.approx(8.0)
    # the shared edge must dissolve into one polygon, not a multipolygon
    assert u.geom_type == "Polygon"


def test_shared_edge_intersection_is_empty_area():
    a, b = sq(0, 0, 2, 2), sq(2, 0, 4, 2)
    inter = a.intersection(b)
    assert inter.area == pytest.approx(0.0)


def test_shared_edge_difference_identity():
    a, b = sq(0, 0, 2, 2), sq(2, 0, 4, 2)
    d = a - b
    assert d.area == pytest.approx(4.0)
    assert d.geom_type == "Polygon"


def test_contained_sharing_one_edge():
    outer = sq(0, 0, 10, 10)
    notch = sq(0, 4, 3, 6)          # flush against the left edge
    d = outer - notch
    assert d.area == pytest.approx(94.0)
    assert d.geom_type == "Polygon"
    u = outer.union(notch)
    assert u.area == pytest.approx(100.0)


def test_t_junction_vertex():
    # b's corner lies exactly on a's edge midpoint
    a = sq(0, 0, 4, 4)
    b = Polygon([[4, 2], [6, 1], [6, 3]])
    u = a.union(b)
    assert u.area == pytest.approx(16.0 + 2.0)
    assert (a.intersection(b)).area == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# snap collapses / near-degenerate


def test_union_of_nearly_identical_is_stable():
    a = sq(0, 0, 2, 2)
    eps = 1e-12
    b = Polygon([[0 + eps, 0], [2 + eps, 0], [2 + eps, 2], [0 + eps, 2]])
    u = a.union(b)
    assert u.area == pytest.approx(4.0, abs=1e-6)


def test_sliver_difference_collapses_cleanly():
    a = sq(0, 0, 10, 10)
    sliver = Polygon([[0, 0], [10, 0], [10, 1e-9], [0, 1e-9]])
    d = a - sliver
    assert d.area == pytest.approx(100.0, abs=1e-6)


def test_degenerate_spike_intersection():
    # polygon with a zero-width spike; boolean against a normal square
    spike = Polygon([[0, 0], [4, 0], [4, 4], [2, 4], [6, 4], [4, 4],
                     [4, 8], [0, 8]])
    b = sq(1, 1, 3, 3)
    inter = spike.intersection(b)
    assert inter.area == pytest.approx(4.0, abs=1e-6)


# ---------------------------------------------------------------------------
# donut-in-donut nesting


def _donut(x0, y0, x1, y1, hx0, hy0, hx1, hy1):
    return Polygon([[x0, y0], [x1, y0], [x1, y1], [x0, y1]],
                   holes=[[[hx0, hy0], [hx1, hy0], [hx1, hy1], [hx0, hy1]]])


def test_donut_in_donut_union_keeps_nesting():
    outer = _donut(0, 0, 20, 20, 4, 4, 16, 16)        # area 400-144=256
    inner = _donut(6, 6, 14, 14, 9, 9, 11, 11)        # area 64-4=60
    assert outer.area == pytest.approx(256.0)
    assert inner.area == pytest.approx(60.0)
    u = union_all([outer, inner])
    assert u.area == pytest.approx(316.0)
    # island-in-hole structure: centre of the inner hole is NOT covered
    assert not u.contains(Point(10, 10))
    assert u.contains(Point(7, 10))     # inside inner ring
    assert u.contains(Point(2, 10))     # inside outer ring
    assert not u.contains(Point(5, 10))  # in outer hole, outside inner


def test_donut_in_donut_difference():
    outer = _donut(0, 0, 20, 20, 4, 4, 16, 16)
    inner = _donut(6, 6, 14, 14, 9, 9, 11, 11)
    d = inner - outer                  # outer's ring doesn't overlap inner
    assert d.area == pytest.approx(60.0)
    big = sq(0, 0, 20, 20)
    ring_only = big - sq(4, 4, 16, 16)
    assert ring_only.area == pytest.approx(256.0)
    assert (outer - ring_only).area == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# overlay chain vs rasterized oracle (the de-overlap loop shape)


def test_deoverlap_chain_matches_raster_oracle():
    rng = np.random.default_rng(42)
    rects = []
    for _ in range(30):
        x, y = rng.uniform(0, 80, 2)
        w, h = rng.uniform(3, 25, 2)
        rects.append(sq(x, y, x + w, y + h))
    # wider-over-narrower sequential difference, as in
    # prepare_data_obj_detec.py:153-177
    order = sorted(range(30), key=lambda i: -rects[i].area)
    kept = []
    for i in order:
        g = rects[i]
        for k in kept:
            g = g - k
            if g.is_empty:
                break
        if not g.is_empty:
            kept.append(g)
    total = sum(g.area for g in kept)
    union_area = union_all(rects).area
    # de-overlapped pieces must tile the union exactly
    assert total == pytest.approx(union_area, rel=1e-9)
    oracle = raster_area(rects, (0, 0, 110, 110), n=900)
    assert total == pytest.approx(oracle, rel=0.01)
