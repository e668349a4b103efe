"""Detection-path tests: mask vectorization, mask pasting, checkpoint
round-trip, and the end-to-end make_detections stage on synthetic tiles."""

import json
import os

import numpy as np
import pytest

from roadsurf_tpu.geom.vectorize import mask_to_polygons
from roadsurf_tpu.pipeline.detections import paste_masks


def test_mask_to_polygons_square():
    m = np.zeros((16, 16), np.uint8)
    m[4:10, 3:12] = 1
    polys = mask_to_polygons(m)
    assert len(polys) == 1
    assert polys[0].area == pytest.approx(6 * 9)
    x0, y0, x1, y1 = polys[0].bounds
    assert (x0, y0, x1, y1) == (3, 4, 12, 10)


def test_mask_to_polygons_hole_and_parts():
    m = np.zeros((20, 20), np.uint8)
    m[2:12, 2:12] = 1
    m[5:8, 5:8] = 0          # hole
    m[15:18, 15:19] = 1      # separate component
    polys = mask_to_polygons(m)
    assert len(polys) == 2
    areas = sorted(p.area for p in polys)
    assert areas[0] == pytest.approx(3 * 4)
    assert areas[1] == pytest.approx(100 - 9)


def test_mask_to_polygons_transform_and_simplify():
    m = np.zeros((8, 8), np.uint8)
    m[2:6, 1:7] = 1

    def tf(ring):
        out = np.empty_like(ring)
        out[:, 0] = 100 + ring[:, 0] * 2.0
        out[:, 1] = 50 - ring[:, 1] * 2.0
        return out

    polys = mask_to_polygons(m, transform=tf, simplify_eps=0.75)
    assert len(polys) == 1
    p = polys[0]
    assert p.area == pytest.approx(4 * 6 * 4)       # scaled by 2x2
    assert p.bounds == pytest.approx((102, 38, 114, 46))
    # rectangle simplifies to 4 corners (5 pts closed)
    assert len(np.asarray(p.exterior.coords)) <= 6


def test_paste_masks_bilinear():
    probs = np.ones((1, 28, 28), np.float32)
    boxes = np.array([[10.0, 20.0, 50.0, 60.0]], np.float32)
    out = paste_masks(probs, boxes, 64)
    assert out.shape == (1, 64, 64)
    assert out[0, 25, 25] == 1 and out[0, 5, 5] == 0
    # roughly the box area is filled
    assert abs(out[0].sum() - 40 * 40) < 200


def test_checkpoint_roundtrip(tmp_path):
    from roadsurf_tpu.utils.checkpoint import (latest_checkpoint, load_params,
                                               save_params)
    tree = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "blocks": [{"w": np.ones((2,))}, {"w": np.zeros((3,))}]}
    p = str(tmp_path / "logs" / "model_0000500.npz")
    save_params(p, tree, step=500)
    loaded, step = load_params(p)
    assert step == 500
    np.testing.assert_array_equal(loaded["a"]["b"], tree["a"]["b"])
    assert isinstance(loaded["blocks"], list) and len(loaded["blocks"]) == 2
    np.testing.assert_array_equal(loaded["blocks"][1]["w"], np.zeros((3,)))
    assert latest_checkpoint(str(tmp_path / "logs")) == p


def test_merge_params_skips_mismatched():
    from roadsurf_tpu.utils.d2_convert import merge_params
    init = {"cls": {"w": np.zeros((4, 3))}, "conv": {"w": np.zeros((2, 2))}}
    loaded = {"cls": {"w": np.ones((4, 81))}, "conv": {"w": np.ones((2, 2))}}
    merged, skipped = merge_params(init, loaded)
    assert skipped == ["cls/w"]
    np.testing.assert_array_equal(merged["conv"]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["cls"]["w"], np.zeros((4, 3)))


@pytest.mark.slow
def test_detect_dataset_end_to_end(tmp_path):
    """Random-weight model over 2 synthetic tiles: shape/contract checks."""
    import jax
    from roadsurf_tpu.io.geotiff import write_geotiff
    from roadsurf_tpu.models import init_params
    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.pipeline.detections import detect_dataset
    from roadsurf_tpu.tiles.grid import Tile, WebMercatorQuad
    from dataclasses import replace

    cfg = replace(fast_profile(post_nms_topk=64), detections_per_image=10)
    params = init_params(jax.random.PRNGKey(0), cfg)

    tiles = [Tile(137150, 92343, 18), Tile(137151, 92343, 18)]
    img_dir = tmp_path / "tst-images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    coco = {"images": []}
    meta = {}
    for t in tiles:
        fn = WebMercatorQuad.tile_filename(t)
        arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
        b = WebMercatorQuad.xy_bounds(t)
        write_geotiff(str(img_dir / fn), arr, b, epsg=3857)
        coco["images"].append({"id": 1, "file_name": fn,
                               "width": 256, "height": 256})
        meta[fn] = {"bounds_3857": list(b)}

    gdf = detect_dataset(params, cfg, coco, str(img_dir), meta,
                         batch_size=2, score_thresh=0.0, rdp_eps=0.75)
    # random weights may or may not clear the sigmoid threshold; contract only
    assert set(gdf.columns) >= {"geometry", "score", "det_class"}
    for _, row in gdf.iterrows():
        assert row["det_class"] in (0, 1)
        assert 0.0 <= row["score"] <= 1.0
        x0, y0, x1, y1 = row["geometry"].bounds
        w, s, e, n = WebMercatorQuad.xy_bounds(tiles[0])
        e2 = WebMercatorQuad.xy_bounds(tiles[1])[2]
        assert w - 1 <= x0 <= e2 + 1 and s - 1 <= y0 <= n + 1


@pytest.mark.slow
def test_inference_engine_sharded_cpu_mesh():
    """The tile-inference engine shards the batch over the 8-device CPU
    mesh and returns per-batch host arrays (tail batch trimmed)."""
    import jax
    from dataclasses import replace
    from roadsurf_tpu.engine.infer import TileInferenceEngine
    from roadsurf_tpu.models import init_params
    from roadsurf_tpu.models.config import fast_profile

    cfg = replace(fast_profile(post_nms_topk=32), min_size_test=64,
                  max_size_test=64, detections_per_image=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng = TileInferenceEngine(params, cfg, batch_size=8, with_masks=False,
                              devices=jax.devices()[:8])
    assert eng.mesh is not None

    rng = np.random.default_rng(0)

    def batches():
        yield rng.integers(0, 255, (8, 64, 64, 3)).astype(np.uint8)
        yield rng.integers(0, 255, (3, 64, 64, 3)).astype(np.uint8)  # tail

    outs = list(eng.run(batches()))
    assert len(outs) == 2
    assert outs[0]["boxes"].shape == (8, 4, 4)
    assert outs[1]["boxes"].shape == (3, 4, 4)
    assert eng.tiles_seen == 11


@pytest.mark.slow
def test_engine_packed_scan_matches_direct():
    """The engine's packed single-buffer fetch and scan-k dispatch must be
    pure transport: outputs equal the jitted fn's, bit for bit (the u8
    bitcast round-trips f32/i32/bool through numpy views)."""
    import jax
    from dataclasses import replace
    from roadsurf_tpu.engine.infer import TileInferenceEngine
    from roadsurf_tpu.models import init_params
    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.models.mask_rcnn import jitted_inference_fn

    cfg = replace(fast_profile(post_nms_topk=32), min_size_test=64,
                  max_size_test=64, detections_per_image=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    tiles = rng.integers(0, 255, (11, 64, 64, 3)).astype(np.uint8)

    direct = jitted_inference_fn(cfg, with_masks=True, mask_format="u8")
    dev = jax.devices()[0]
    ref = {k: np.asarray(v)
           for k, v in direct(jax.device_put(params, dev),
                              tiles[:4]).items()}

    for scan_k in (1, 3):
        eng = TileInferenceEngine(params, cfg, batch_size=4,
                                  with_masks=True, mask_format="u8",
                                  devices=[dev], scan_k=scan_k)

        def batches():
            yield tiles[:4]
            yield tiles[4:8]
            yield tiles[8:]                  # tail (3) pads + trims

        outs = list(eng.run(batches()))
        assert eng.tiles_seen == 11
        assert [len(o["scores"]) for o in outs] == [4, 4, 3]
        for k, v in ref.items():
            got = outs[0][k]
            assert got.dtype == v.dtype and got.shape == v.shape, k
            np.testing.assert_array_equal(got, v, err_msg=f"{k} k={scan_k}")


def test_trace_mask_cpp_matches_python():
    """The C++ tracer and the Python reference emit identical ring sets
    (area/bounds/length canonical form) on adversarial random masks."""
    from roadsurf_tpu.geom.vectorize import _trace_rings, _trace_rings_py

    def canon(rings):
        out = []
        for r in rings:
            area = float(np.sum(r[:-1, 0] * r[1:, 1]
                                - r[1:, 0] * r[:-1, 1]) / 2)
            out.append((round(area, 3), tuple(np.round(r.min(0), 3)),
                        tuple(np.round(r.max(0), 3)), len(r)))
        return sorted(out)

    rng = np.random.default_rng(11)
    for _ in range(15):
        m = (rng.random((40, 56)) > 0.55).astype(np.uint8)
        assert canon(_trace_rings(m)) == canon(_trace_rings_py(m))
    # degenerate cases
    assert _trace_rings(np.zeros((8, 8), np.uint8)) == []
    full = _trace_rings(np.ones((8, 8), np.uint8))
    assert len(full) == 1 and len(full[0]) == 5 * 8 - 7 or len(full) == 1


@pytest.mark.slow           # compiles TWO full-model configs (~2 min CPU)
def test_mask_bits_roundtrip_matches_u8():
    """mask_format='bits' (device-side 0.5 threshold + bit-pack, 8x less
    d2h) unpacks on the host to exactly the u8 path's thresholded 28x28
    grid: sigmoid(x) >= 0.5 <=> x >= 0 <=> round(sigmoid*255) >= 128."""
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.models import fast_profile, init_params
    from roadsurf_tpu.models.mask_rcnn import forward_inference

    cfg = fast_profile(post_nms_topk=32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 256, 256, 3),
                                    dtype=np.uint8))
    du8 = jax.jit(lambda p, x: forward_inference(
        p, x, cfg, mask_format="u8"))(params, imgs)
    dbits = jax.jit(lambda p, x: forward_inference(
        p, x, cfg, mask_format="bits"))(params, imgs)
    u8 = np.asarray(du8["mask_probs_u8"])
    bits = np.asarray(dbits["mask_bits"])
    unpacked = np.unpackbits(bits, axis=-1, bitorder="little").reshape(
        u8.shape)
    np.testing.assert_array_equal(unpacked, (u8 >= 128).astype(np.uint8))
