"""Statistical branch tests: descriptive stats, PCA selection rules, pixel
extraction/zonal stats, stats data prep, and the full analysis driver on a
synthetic workspace."""

import os

import numpy as np
import pandas as pd
import pytest

from fixtures import (roads_parameters_df, synthetic_aoi, synthetic_forests,
                      synthetic_roads)
from roadsurf_tpu.geom.core import Polygon
from roadsurf_tpu.geom.table import GeoDataFrame
from roadsurf_tpu.stats import (determine_pc_num, evplot,
                                get_df_stats_groupby, get_df_stats_no_group,
                                get_pixel_values, zonal_stats)


def test_get_df_stats_groupby_margin():
    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 4,
                       "v": [1, 2, 3, 4, 10, 10, 10, 10]})
    out = get_df_stats_groupby(df, "v", ["g"], suffix="_x")
    assert out.loc["a", "mean_x"] == 2.5
    # margin = 2*std/sqrt(n)
    assert out.loc["a", "margin_x"] == pytest.approx(
        round(2 * df[df.g == "a"].v.std() / 2, 2))
    assert out.loc["b", "std_x"] == 0.0


def test_get_df_stats_no_group():
    df = pd.DataFrame({"v": [0, 100, 200, 255]})
    d = get_df_stats_no_group(df, "v")
    assert d["min"][-1] == 0 and d["max"][-1] == 255
    out = get_df_stats_no_group(df, "v", d, to_df=True)
    assert len(out) == 2


def test_broken_stick_and_kaiser():
    ev = np.array([5.0, 2.0, 0.5, 0.3, 0.2])
    bsm, fig = evplot(ev)
    assert len(bsm) == 5
    n = determine_pc_num(ev, bsm)
    assert 2 <= n <= 10


def test_pixel_extraction_and_zonal(tmp_path):
    from roadsurf_tpu.io.geotiff import write_geotiff
    data = np.zeros((32, 32, 4), np.uint8)
    data[:, :16] = 100   # west half bright
    data[:, 16:] = 200
    p = str(tmp_path / "t.tif")
    write_geotiff(p, data, (0, 0, 32, 32), epsg=3857)

    west_half = Polygon([(0, 0), (16, 0), (16, 32), (0, 32)])
    px = get_pixel_values(west_half, p, [1, 2, 3, 4], road_id=7)
    assert set(px.columns) >= {"band1", "band4", "road_id"}
    assert (px["band1"] == 100).all()
    assert len(px) == 16 * 32
    zs = zonal_stats(west_half, p, band=1, nodata=0)[0]
    assert zs["mean"] == pytest.approx(100)
    assert zs["count"] == 16 * 32


def test_stats_prep_same_class_deoverlap():
    from roadsurf_tpu.pipeline.stats_prep import \
        determine_road_surfaces_stats
    out, in_aoi = determine_road_surfaces_stats(
        synthetic_roads(), synthetic_forests(), roads_parameters_df(),
        synthetic_aoi())
    # NON-vacuous: the 6 in-AOI roads (3 horizontal x 900m, 3 vertical x
    # 1000m; the 7th has an unknown BELAGSART and is dropped) must all
    # survive the line->polygon conversion.
    assert len(out) == 6
    assert sorted(out["road_len"].tolist()) == [900.0] * 3 + [1000.0] * 3
    geoms = [g for g in out.geometry.values if g is not None]
    assert len(geoms) == 6 and all(not g.is_empty for g in geoms)
    # every road keeps positive area after de-overlap + forest exclusion
    areas = [g.area for g in geoms]
    assert all(a > 0 for a in areas)
    # gross buffered area: 2x(900x8) + 900x4 + 3x(1000x4) = 30000 m^2;
    # crossing/forest removal trims it but can't exceed ~40%
    total = sum(areas)
    assert 18000 < total < 30000, total
    # no two output polygons overlap (any class)
    for i in range(len(geoms)):
        for j in range(i + 1, len(geoms)):
            inter = geoms[i].intersection(geoms[j]).area
            assert inter < 1.0, (i, j, inter)
    assert "road_width" in out.columns


def test_stats_analysis_driver(tmp_path):
    """Full driver on a synthetic workspace with two roads + two tiles."""
    from roadsurf_tpu.io import write_file
    from roadsurf_tpu.io.geotiff import write_geotiff
    from roadsurf_tpu.pipeline import stats_analysis
    from roadsurf_tpu.tiles.grid import Tile, WebMercatorQuad

    wd = str(tmp_path)
    img_dir = os.path.join(wd, "outputs", "obj_detector", "all-images")
    os.makedirs(img_dir)
    t = Tile(137150, 92343, 18)
    w, s, e, n = WebMercatorQuad.xy_bounds(t)
    rng = np.random.default_rng(0)
    arr = rng.integers(20, 230, (256, 256, 4), dtype=np.uint8)
    write_geotiff(os.path.join(
        img_dir, WebMercatorQuad.tile_filename(t)), arr, (w, s, e, n))

    px = (e - w) / 256
    roads = GeoDataFrame({
        "OBJECTID": [1, 2],
        "BELAGSART": [100, 200],
        "road_width": [8.0, 4.0],
        "geometry": [
            Polygon([(w + 10 * px, n - 30 * px), (w + 90 * px, n - 30 * px),
                     (w + 90 * px, n - 60 * px), (w + 10 * px, n - 60 * px)]),
            Polygon([(w + 10 * px, n - 100 * px),
                     (w + 200 * px, n - 100 * px),
                     (w + 200 * px, n - 140 * px),
                     (w + 10 * px, n - 140 * px)]),
        ],
    }, crs="EPSG:3857").to_crs(epsg=2056)
    os.makedirs(os.path.join(wd, "outputs", "shapefiles_gpkg"))
    write_file(roads, os.path.join(wd, "outputs", "shapefiles_gpkg",
                                   "roads_polygons_stats.shp"))

    tiles = GeoDataFrame.from_features(
        [WebMercatorQuad.feature(t)], crs="EPSG:4326")
    tiles["id"] = [WebMercatorQuad.formatted_id(t)]
    tiles["title"] = ["tile"]
    os.makedirs(os.path.join(wd, "outputs", "json_inputs"))
    write_file(tiles, os.path.join(wd, "outputs", "json_inputs",
                                   "tiles_aoi.geojson"), driver="GeoJSON")

    cfg = {
        "debug_mode": False, "use_zonal_stats": False,
        "correct_balance": False,
        "processed": {
            "processed_folder": os.path.join(wd, "outputs"),
            "input_files": {
                "images": os.path.join("obj_detector", "all-images"),
                "roads": os.path.join("shapefiles_gpkg",
                                      "roads_polygons_stats.shp"),
                "tiles": os.path.join("json_inputs", "tiles_aoi.geojson"),
            }},
        "final_folder": os.path.join(wd, "outputs", "final"),
        "param": {"pixel_threshold": 10, "max_margin_of_interest": 12.5,
                  "make_boxplots": True, "do_ks_test": True,
                  "make_pca": True},
    }
    files = stats_analysis.run(cfg)
    names = [os.path.basename(f) for f in files]
    assert "stats_roads.csv" in names
    assert "statistics_roads_by_type.csv" in names
    assert "ks_test.csv" in names
    assert any(f.endswith("boxplot_pixel_in_bands.webp") for f in names)
    assert any("PCA_pixels_" in f and f.endswith("values.csv")
               for f in names)
    stats = pd.read_csv(os.path.join(wd, "outputs", "tables",
                                     "stats_roads.csv"))
    assert set(stats["road_id"]) == {1, 2}
