import math

from roadsurf_tpu.tiles import Tile, WebMercatorQuad
from roadsurf_tpu.tiles.grid import parse_tile_id


def test_tile_bounds_z18():
    # world is split into 2^18 tiles; spot check the Swiss area
    t = Tile(x=137000, y=92000, z=18)
    w, s, e, n = WebMercatorQuad.xy_bounds(t)
    span = 2 * math.pi * 6378137.0 / 2**18
    assert abs((e - w) - span) < 1e-6
    assert abs((n - s) - span) < 1e-6


def test_tiles_enumeration():
    # a bbox exactly one tile wide yields exactly that tile
    t = Tile(x=137000, y=92000, z=18)
    w, s, e, n = WebMercatorQuad.bounds(t)
    tiles = list(WebMercatorQuad.tiles(w, s, e, n, 18))
    assert t in tiles
    assert len(tiles) == 1


def test_tile_point_lookup_consistency():
    t = Tile(x=137448, y=92047, z=18)
    w, s, e, n = WebMercatorQuad.bounds(t)
    cx, cy = 0.5 * (w + e), 0.5 * (s + n)
    assert WebMercatorQuad.tile_index(cx, cy, 18) == (t.x, t.y)


def test_ids_and_filenames():
    t = Tile(x=1, y=2, z=18)
    assert WebMercatorQuad.formatted_id(t) == "(1, 2, 18)"
    assert WebMercatorQuad.tile_filename(t) == "18_1_2.tif"
    assert parse_tile_id("(1, 2, 18)") == t
    feat = WebMercatorQuad.feature(t, projected=True)
    assert "title" in feat["properties"]
    # the pipeline id formatter extracts digits from comma-split title parts
    import re
    xyz = [re.sub("[^0-9]", "", p) for p in feat["properties"]["title"].split(",")]
    assert xyz == ["1", "2", "18"]
