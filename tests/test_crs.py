import numpy as np

from roadsurf_tpu.crs import CRS, Transformer, transform_xy


def test_lv95_roundtrip():
    lon = np.array([7.44, 8.73, 6.1, 9.5])
    lat = np.array([46.95, 46.04, 46.2, 47.4])
    x, y = transform_xy(4326, 2056, lon, lat)
    lon2, lat2 = transform_xy(2056, 4326, x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_lv95_known_point():
    # swisstopo worked example (LV03 y=700000 x=100000 -> LV95 +2/+1 Mm)
    x, y = transform_xy(4326, 2056, np.array([8.730499]), np.array([46.044121]))
    assert abs(x[0] - 2700000.0) < 1.5
    assert abs(y[0] - 1100000.0) < 1.5


def test_webmercator_exact():
    x, y = transform_xy(4326, 3857, np.array([180.0]), np.array([0.0]))
    np.testing.assert_allclose(x[0], 20037508.342789244)
    np.testing.assert_allclose(y[0], 0.0, atol=1e-9)


def test_chain_2056_3857_roundtrip():
    x = np.array([2600000.0, 2620000.0])
    y = np.array([1200000.0, 1158000.0])
    xm, ym = transform_xy(2056, 3857, x, y)
    x2, y2 = transform_xy(3857, 2056, xm, ym)
    np.testing.assert_allclose(x2, x, atol=1e-4)
    np.testing.assert_allclose(y2, y, atol=1e-4)


def test_crs_equality_and_transformer():
    assert CRS(2056) == "EPSG:2056"
    assert CRS("epsg:4326").is_geographic
    tr = Transformer.from_crs(4326, 3857, always_xy=True)
    x, y = tr.transform(np.array([0.0]), np.array([0.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
