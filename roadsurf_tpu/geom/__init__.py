from .core import (EMPTY, BaseGeometry, GeometryCollection, LineString,
                   MultiLineString, MultiPolygon, Point, Polygon, make_valid,
                   mapping, rdp_simplify, shape, unary_union, union_all)
from .table import GeoDataFrame, GeoSeries, overlay, sjoin
from . import affinity

__all__ = [
    "BaseGeometry", "Point", "LineString", "MultiLineString", "Polygon",
    "MultiPolygon", "GeometryCollection", "EMPTY", "shape", "mapping",
    "union_all", "unary_union", "make_valid", "rdp_simplify",
    "GeoDataFrame", "GeoSeries", "sjoin", "overlay", "affinity",
]
