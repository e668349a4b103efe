"""ctypes bindings for the first-party C++ geometry core (geomcore.cpp).

All polygon data crosses the boundary in a flat format:
    xy          float64[2*npts]   ring coordinates, concatenated
    ring_sizes  int32[nrings]     points per ring
    poly_rings  int32[npolys]     rings per polygon (shell first, then holes)
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_HERE, "native", "libgeomcore.so")


def _build() -> None:
    subprocess.run(["make", "-C", os.path.join(_HERE, "native")],
                   check=True, capture_output=True)


def _load() -> C.CDLL:
    if not os.path.exists(_LIB_PATH):
        _build()
    return C.CDLL(_LIB_PATH)


_lib = _load()

_f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")

_lib.geom_boolean_op.restype = C.c_void_p
_lib.geom_boolean_op.argtypes = [
    C.c_int,
    _f64p, _i32p, C.c_int, _i32p, C.c_int,
    _f64p, _i32p, C.c_int, _i32p, C.c_int,
]
_lib.geom_union_many.restype = C.c_void_p
_lib.geom_union_many.argtypes = [_f64p, _i32p, C.c_int, _i32p, C.c_int]
_lib.geom_buffer_line.restype = C.c_void_p
_lib.geom_buffer_line.argtypes = [_f64p, C.c_int, C.c_double, C.c_int, C.c_int]
_lib.geom_buffer_polygon.restype = C.c_void_p
_lib.geom_buffer_polygon.argtypes = [
    _f64p, _i32p, C.c_int, _i32p, C.c_int, C.c_double, C.c_int]
_lib.geom_result_num_coords.restype = C.c_int64
_lib.geom_result_num_coords.argtypes = [C.c_void_p]
_lib.geom_result_num_rings.restype = C.c_int32
_lib.geom_result_num_rings.argtypes = [C.c_void_p]
_lib.geom_result_num_polys.restype = C.c_int32
_lib.geom_result_num_polys.argtypes = [C.c_void_p]
_lib.geom_result_copy.restype = None
_lib.geom_result_copy.argtypes = [C.c_void_p, _f64p, _i32p, _i32p]
_lib.geom_result_free.restype = None
_lib.geom_result_free.argtypes = [C.c_void_p]
_lib.geom_points_in_polyset.restype = None
_lib.geom_points_in_polyset.argtypes = [
    _f64p, C.c_int, _f64p, _i32p, C.c_int, _i32p, C.c_int, _u8p]
_lib.geom_polyset_intersects.restype = C.c_int
_lib.geom_polyset_intersects.argtypes = [
    _f64p, _i32p, C.c_int, _i32p, C.c_int,
    _f64p, _i32p, C.c_int, _i32p, C.c_int,
]
_lib.geom_rasterize.restype = None
_lib.geom_rasterize.argtypes = [
    _f64p, _i32p, C.c_int, _i32p, C.c_int,
    C.c_double, C.c_double, C.c_double, C.c_double,
    C.c_int, C.c_int, _u8p, C.c_uint8,
]
_lib.geom_trace_mask.restype = C.c_void_p
_lib.geom_trace_mask.argtypes = [_u8p, C.c_int, C.c_int]

OP_INTERSECTION, OP_UNION, OP_DIFFERENCE, OP_XOR = 0, 1, 2, 3

FlatPolySet = tuple[np.ndarray, np.ndarray, np.ndarray]  # xy, ring_sizes, poly_rings

_EMPTY_XY = np.zeros((0,), dtype=np.float64)
_EMPTY_I32 = np.zeros((0,), dtype=np.int32)


def empty_flat() -> FlatPolySet:
    return (_EMPTY_XY, _EMPTY_I32, _EMPTY_I32)


def pack(rings_per_poly: list[list[np.ndarray]]) -> FlatPolySet:
    """Pack [[shell, hole, ...], ...] (each ring an (N,2) float64 array)."""
    xs, sizes, prs = [], [], []
    for rings in rings_per_poly:
        prs.append(len(rings))
        for r in rings:
            r = np.ascontiguousarray(r, dtype=np.float64)
            sizes.append(len(r))
            xs.append(r.reshape(-1))
    if not xs:
        return empty_flat()
    return (np.concatenate(xs),
            np.asarray(sizes, dtype=np.int32),
            np.asarray(prs, dtype=np.int32))


def _collect(handle) -> list[list[np.ndarray]]:
    try:
        ncoords = _lib.geom_result_num_coords(handle)
        nrings = _lib.geom_result_num_rings(handle)
        npolys = _lib.geom_result_num_polys(handle)
        xy = np.empty(2 * ncoords, dtype=np.float64)
        sizes = np.empty(max(nrings, 1), dtype=np.int32)
        prs = np.empty(max(npolys, 1), dtype=np.int32)
        _lib.geom_result_copy(handle, xy, sizes, prs)
    finally:
        _lib.geom_result_free(handle)
    polys: list[list[np.ndarray]] = []
    off = 0
    ri = 0
    for pi in range(npolys):
        rings = []
        for _ in range(prs[pi]):
            n = int(sizes[ri])
            rings.append(xy[off:off + 2 * n].reshape(-1, 2).copy())
            off += 2 * n
            ri += 1
        polys.append(rings)
    return polys


def boolean_op(op: int, subj: FlatPolySet, clip: FlatPolySet):
    sxy, srs, spr = subj
    cxy, crs_, cpr = clip
    h = _lib.geom_boolean_op(op, sxy, srs, len(srs), spr, len(spr),
                             cxy, crs_, len(crs_), cpr, len(cpr))
    return _collect(h)


def union_many(flat: FlatPolySet):
    xy, rs, pr = flat
    if len(pr) == 0:
        return []
    h = _lib.geom_union_many(xy, rs, len(rs), pr, len(pr))
    return _collect(h)


def buffer_line(coords: np.ndarray, dist: float, cap_style: int = 1,
                quad_segs: int = 8):
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    h = _lib.geom_buffer_line(coords.reshape(-1), len(coords), dist,
                              cap_style, quad_segs)
    return _collect(h)


def buffer_polygon(flat: FlatPolySet, dist: float, quad_segs: int = 8):
    xy, rs, pr = flat
    h = _lib.geom_buffer_polygon(xy, rs, len(rs), pr, len(pr), dist, quad_segs)
    return _collect(h)


def points_in_polyset(points: np.ndarray, flat: FlatPolySet) -> np.ndarray:
    points = np.ascontiguousarray(points, dtype=np.float64)
    n = len(points)
    out = np.zeros(n, dtype=np.uint8)
    if n:
        xy, rs, pr = flat
        _lib.geom_points_in_polyset(points.reshape(-1), n, xy, rs, len(rs),
                                    pr, len(pr), out)
    return out.astype(bool)


def polyset_intersects(a: FlatPolySet, b: FlatPolySet) -> bool:
    axy, ars, apr = a
    bxy, brs, bpr = b
    return bool(_lib.geom_polyset_intersects(
        axy, ars, len(ars), apr, len(apr),
        bxy, brs, len(brs), bpr, len(bpr)))


def rasterize(flat: FlatPolySet, x0: float, dx: float, y0: float, dy: float,
              height: int, width: int, out: np.ndarray | None = None,
              value: int = 1) -> np.ndarray:
    if out is None:
        out = np.zeros((height, width), dtype=np.uint8)
    xy, rs, pr = flat
    _lib.geom_rasterize(xy, rs, len(rs), pr, len(pr), x0, dx, y0, dy,
                        height, width, out, value)
    return out


def trace_mask(mask: np.ndarray) -> list[np.ndarray]:
    """Boundary rings of a binary mask as closed (N, 2) pixel-corner
    arrays (C++ tracer; see geom/vectorize.py for the semantics)."""
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    h = _lib.geom_trace_mask(m, m.shape[0], m.shape[1])
    polys = _collect(h)
    return [rings[0] for rings in polys]
