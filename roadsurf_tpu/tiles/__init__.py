from .grid import Tile, WebMercatorQuad, tms_get

__all__ = ["Tile", "WebMercatorQuad", "tms_get"]
