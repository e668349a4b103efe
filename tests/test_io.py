import os

import numpy as np
import pytest

from roadsurf_tpu.geom import GeoDataFrame, LineString, Polygon
from roadsurf_tpu.io import read_file, read_xlsx, write_file

REF_DATA = "/root/reference/data"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF_DATA),
                               reason="reference data not mounted")


@needs_ref
def test_read_reference_aoi():
    aoi = read_file(f"{REF_DATA}/AOI/aoi.shp")
    assert len(aoi) == 4
    assert str(aoi.crs) == "EPSG:2056"
    assert aoi.unary_union.area == pytest.approx(840000000.0)


@needs_ref
def test_read_reference_xlsx():
    df = read_xlsx(f"{REF_DATA}/roads_parameters.xlsx")
    assert list(df.columns) == ["GDB-Code", "Type", "to keep", "Definition",
                                "Width"]
    assert (df["to keep"] == "yes").any()
    assert df["Width"].notna().any()


def _sample_gdf():
    return GeoDataFrame(
        {"OBJECTID": [1, 2], "name": ["a", "b"], "score": [0.25, 0.75],
         "geometry": [Polygon([[0, 0], [2, 0], [2, 2], [0, 2]]),
                      Polygon([[5, 5], [6, 5], [6, 6], [5, 6]])]},
        crs=2056)


@pytest.mark.parametrize("ext", ["shp", "geojson", "gpkg"])
def test_roundtrip(tmp_path, ext):
    gdf = _sample_gdf()
    path = str(tmp_path / f"rt.{ext}")
    write_file(gdf, path)
    back = read_file(path)
    assert len(back) == 2
    assert list(back["OBJECTID"]) == [1, 2]
    assert list(back["name"]) == ["a", "b"]
    np.testing.assert_allclose(back["score"], [0.25, 0.75])
    np.testing.assert_allclose(back.area, gdf.area)
    assert str(back.crs) == "EPSG:2056"


def test_shapefile_polyline_roundtrip(tmp_path):
    gdf = GeoDataFrame(
        {"id": [7], "geometry": [LineString([[0, 0], [5, 5], [10, 0]])]},
        crs=2056)
    path = str(tmp_path / "lines.shp")
    write_file(gdf, path)
    back = read_file(path)
    assert back["geometry"].iloc[0].length == pytest.approx(2 * 5 * 2**0.5)


def test_polygon_with_hole_roundtrip(tmp_path):
    donut = (Polygon([[0, 0], [10, 0], [10, 10], [0, 10]])
             - Polygon([[4, 4], [6, 4], [6, 6], [4, 6]]))
    gdf = GeoDataFrame({"id": [1], "geometry": [donut]}, crs=2056)
    for ext in ("shp", "geojson", "gpkg"):
        path = str(tmp_path / f"donut.{ext}")
        write_file(gdf, path)
        back = read_file(path)
        assert back["geometry"].iloc[0].area == pytest.approx(96.0)
