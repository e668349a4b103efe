from .transform import CRS, Transformer, transform_xy, crs_equal

__all__ = ["CRS", "Transformer", "transform_xy", "crs_equal"]
