import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roadsurf_tpu.models import ModelConfig, fast_profile, init_params
from roadsurf_tpu.models.anchors import (all_level_anchors, apply_deltas,
                                         box_iou, cell_anchors, get_deltas)
from roadsurf_tpu.ops import nms_fixed, roi_align_multilevel


def test_cell_anchors_detectron2_param():
    a = cell_anchors(32, (0.5, 1.0, 2.0))
    # aspect 1.0 -> square of side 32
    np.testing.assert_allclose(a[1], [-16, -16, 16, 16])
    # aspect 0.5 -> wide: w = sqrt(1024/0.5) = 45.25, h = 22.6
    w = a[0][2] - a[0][0]
    h = a[0][3] - a[0][1]
    assert w == pytest.approx(np.sqrt(1024 / 0.5), rel=1e-6)
    assert h == pytest.approx(0.5 * w, rel=1e-6)


def test_anchor_counts_256():
    anchors = all_level_anchors(256, (4, 8, 16, 32, 64),
                                (32, 64, 128, 256, 512), (0.5, 1.0, 2.0))
    counts = [len(a) for a in anchors]
    assert counts == [64 * 64 * 3, 32 * 32 * 3, 16 * 16 * 3, 8 * 8 * 3,
                      4 * 4 * 3]


def test_delta_roundtrip():
    src = jnp.asarray([[10., 10., 50., 30.], [0., 0., 100., 200.]])
    tgt = jnp.asarray([[12., 8., 60., 35.], [5., 5., 95., 190.]])
    for w in [(1., 1., 1., 1.), (10., 10., 5., 5.)]:
        d = get_deltas(src, tgt, w)
        back = apply_deltas(d, src, w)
        np.testing.assert_allclose(np.asarray(back), np.asarray(tgt),
                                   atol=1e-3)


def test_box_iou():
    a = jnp.asarray([[0., 0., 2., 2.]])
    b = jnp.asarray([[1., 1., 3., 3.], [4., 4., 5., 5.]])
    iou = np.asarray(box_iou(a, b))
    assert iou[0, 0] == pytest.approx(1.0 / 7.0)
    assert iou[0, 1] == 0.0


def _np_roi_align_single(feat, box, out, sampling, stride):
    """Independent numpy ROIAlignV2 reference (aligned=True).

    ``sampling=0`` reproduces POOLER_SAMPLING_RATIO=0 (adaptive): the
    per-axis sample count is ceil(bin size in feature cells), exactly the
    detectron2/torchvision CUDA-op rule."""
    H, W, C = feat.shape
    x0, y0, x1, y1 = box
    bw = (x1 - x0) / out
    bh = (y1 - y0) / out
    ny = sampling if sampling > 0 else max(int(np.ceil(bh / stride)), 1)
    nx = sampling if sampling > 0 else max(int(np.ceil(bw / stride)), 1)
    res = np.zeros((out, out, C))
    for p in range(out):
        for q in range(out):
            acc = np.zeros(C)
            for sy in range(ny):
                for sx in range(nx):
                    y = (y0 + (p + (sy + 0.5) / ny) * bh) / stride - 0.5
                    x = (x0 + (q + (sx + 0.5) / nx) * bw) / stride - 0.5
                    if y < -1 or y > H or x < -1 or x > W:
                        continue
                    y = min(max(y, 0), H - 1)
                    x = min(max(x, 0), W - 1)
                    y0i, x0i = int(np.floor(y)), int(np.floor(x))
                    y1i, x1i = min(y0i + 1, H - 1), min(x0i + 1, W - 1)
                    wy1, wx1 = y - y0i, x - x0i
                    acc += ((1 - wy1) * (1 - wx1) * feat[y0i, x0i]
                            + (1 - wy1) * wx1 * feat[y0i, x1i]
                            + wy1 * (1 - wx1) * feat[y1i, x0i]
                            + wy1 * wx1 * feat[y1i, x1i])
            res[p, q] = acc / (ny * nx)
    return res


def test_roi_align_matches_reference():
    rng = np.random.default_rng(0)
    feats_np = [rng.normal(size=(1, 64 // 2**i, 64 // 2**i, 4))
                .astype(np.float32) for i in range(4)]
    feats = [jnp.asarray(f) for f in feats_np]
    # small box -> P2 (stride 4); box spanning image -> higher level
    boxes = np.array([[[8., 8., 40., 56.], [4., 4., 250., 250.]]],
                     np.float32)
    out = np.asarray(roi_align_multilevel(feats, jnp.asarray(boxes), 7,
                                          sampling=2))
    # level of box 1: sqrt(32*48)=39 -> floor(4+log2(39/224)) = 1 -> clamp P2
    ref0 = _np_roi_align_single(feats_np[0][0], boxes[0, 0], 7, 2, 4)
    np.testing.assert_allclose(out[0, 0], ref0, atol=2e-3)
    # level of box 2: sqrt(246*246)=246 -> floor(4+log2(246/224)) = 4 -> P4
    ref1 = _np_roi_align_single(feats_np[2][0], boxes[0, 1], 7, 2, 16)
    np.testing.assert_allclose(out[0, 1], ref1, atol=2e-3)


def test_nms_matches_bruteforce():
    rng = np.random.default_rng(3)
    b = rng.uniform(0, 100, (60, 4)).astype(np.float32)
    b = np.stack([np.minimum(b[:, 0], b[:, 2]), np.minimum(b[:, 1], b[:, 3]),
                  np.maximum(b[:, 0], b[:, 2]) + 3,
                  np.maximum(b[:, 1], b[:, 3]) + 3], 1)
    s = rng.uniform(0, 1, 60).astype(np.float32)
    ks, ki = nms_fixed(jnp.asarray(b), jnp.asarray(s), 0.5, 30)
    mine = [int(i) for i, sc in zip(ki, ks) if sc > -1e9]

    order = np.argsort(-s)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            xx0, yy0 = max(b[i, 0], b[j, 0]), max(b[i, 1], b[j, 1])
            xx1, yy1 = min(b[i, 2], b[j, 2]), min(b[i, 3], b[j, 3])
            inter = max(xx1 - xx0, 0) * max(yy1 - yy0, 0)
            a1 = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
            a2 = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            if inter / (a1 + a2 - inter) > 0.5:
                ok = False
                break
        if ok:
            keep.append(i)
    assert mine == keep[:len(mine)]


@pytest.mark.slow
def test_full_inference_shapes():
    cfg = fast_profile(post_nms_topk=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    fn = jax.jit(lambda p, x: __import__(
        "roadsurf_tpu.models.mask_rcnn", fromlist=["forward_inference"]
    ).forward_inference(p, x, cfg))
    imgs = jnp.asarray(np.random.randint(0, 255, (2, 256, 256, 3), np.uint8))
    out = fn(params, imgs)
    D = cfg.detections_per_image
    assert out["boxes"].shape == (2, D, 4)
    assert out["mask_logits"].shape == (2, D, 28, 28)
    assert out["scores"].shape == (2, D)


def test_nms_sweep_matches_greedy_on_disjoint():
    """On chain-free data single-sweep == exact greedy; on chains it only
    over-suppresses (keep set is a subset)."""
    from roadsurf_tpu.ops.nms import nms_fixed, nms_sweep
    rng = np.random.default_rng(7)
    # disjoint clusters: no suppression chains
    centers = rng.uniform(0, 1000, (20, 2))
    boxes, scores = [], []
    for c in centers:
        for _ in range(3):
            jit = rng.uniform(-2, 2, 2)
            boxes.append([c[0] + jit[0], c[1] + jit[1],
                          c[0] + 20 + jit[0], c[1] + 20 + jit[1]])
            scores.append(rng.uniform(0.1, 1.0))
    b = jnp.asarray(np.array(boxes, np.float32))
    s = jnp.asarray(np.array(scores, np.float32))
    ks1, ki1 = nms_fixed(b, s, 0.5, 30)
    ks2, ki2 = nms_sweep(b, s, 0.5, 30)
    # compare kept slots only: padding slots (score NEG_INF) carry
    # arbitrary indices and every consumer masks them via the score
    valid = np.asarray(ks1) > -1e9 / 2
    np.testing.assert_array_equal(np.asarray(ks1)[valid],
                                  np.asarray(ks2)[valid])
    np.testing.assert_array_equal(np.asarray(ki1)[valid],
                                  np.asarray(ki2)[valid])

    # general random data: sweep keeps a subset of greedy's keeps
    b2 = rng.uniform(0, 100, (80, 4)).astype(np.float32)
    b2 = np.concatenate([np.minimum(b2[:, :2], b2[:, 2:]),
                         np.maximum(b2[:, :2], b2[:, 2:]) + 3], 1)
    s2 = rng.uniform(0, 1, 80).astype(np.float32)
    g_s, g_i = nms_fixed(jnp.asarray(b2), jnp.asarray(s2), 0.5, 80)
    w_s, w_i = nms_sweep(jnp.asarray(b2), jnp.asarray(s2), 0.5, 80)
    greedy = {int(i) for i, sc in zip(g_i, g_s) if sc > -1e9}
    sweep = {int(i) for i, sc in zip(w_i, w_s) if sc > -1e9}
    assert sweep <= greedy


def test_nms_pallas_fallback_matches():
    """Off-TPU, the batched pallas API must fall back to the exact loop."""
    from roadsurf_tpu.ops.nms import batched_nms_fixed
    from roadsurf_tpu.ops.nms_pallas import batched_nms_batch
    rng = np.random.default_rng(3)
    b = rng.uniform(0, 100, (4, 60, 4)).astype(np.float32)
    b = np.concatenate([np.minimum(b[..., :2], b[..., 2:]),
                        np.maximum(b[..., :2], b[..., 2:]) + 3], -1)
    s = rng.uniform(0, 1, (4, 60)).astype(np.float32)
    l = rng.integers(0, 2, (4, 60)).astype(np.int32)
    o = batched_nms_batch(jnp.asarray(b), jnp.asarray(s), jnp.asarray(l),
                          0.5, 30)
    ref = jax.vmap(lambda bb, ss, ll: batched_nms_fixed(bb, ss, ll, 0.5,
                                                        30))(
        jnp.asarray(b), jnp.asarray(s), jnp.asarray(l))
    np.testing.assert_array_equal(np.asarray(o[1]), np.asarray(ref[1]))


def test_roi_align_pallas_matches_xla():
    """The fused Pallas pooler (interpret mode) matches the XLA separable
    path within bf16 tolerance. Kept at small geometry: interpret-mode
    compile cost scales with the kernel's unrolled relayout copies. The
    full 256px multi-level box/mask geometries run compiled on real TPU
    via bench.py and the e2e quality chain."""
    from roadsurf_tpu.ops.roi_align_pallas import roi_align_fused

    rng = np.random.default_rng(5)
    B, R, C, S = 2, 8, 8, 64
    feats = [jnp.asarray(rng.normal(size=(B, S // st, S // st, C)),
                         jnp.bfloat16) for st in (4, 8, 16)]
    x0 = rng.uniform(0, 50, (B, R))
    y0 = rng.uniform(0, 50, (B, R))
    w = rng.uniform(4, 40, (B, R))
    h = rng.uniform(4, 40, (B, R))
    boxes = jnp.asarray(np.stack(
        [x0, y0, np.minimum(x0 + w, S), np.minimum(y0 + h, S)], -1),
        jnp.float32)

    ref = np.asarray(roi_align_multilevel(list(feats), boxes, 7,
                                          sampling=2))
    got = np.asarray(roi_align_fused(tuple(feats), boxes, 7,
                                     interpret=True))
    assert got.shape == (B, R, 7, 7, C)
    np.testing.assert_allclose(got, ref, atol=2e-2)

    # int8-pyramid mode: int8 levels + per-level scales folded into the
    # kernel's y-weights == dequantize-then-pool (cfg.int8_pyramid path)
    scales = (0.11, 0.23, 0.47)
    feats_i8 = tuple(
        jnp.clip(jnp.round(f.astype(jnp.float32) / s), -127, 127
                 ).astype(jnp.int8) for f, s in zip(feats, scales))
    ref_q = np.asarray(roi_align_multilevel(
        [f.astype(jnp.float32) * s for f, s in zip(feats_i8, scales)],
        boxes, 7, sampling=2))
    got_q = np.asarray(roi_align_fused(
        feats_i8, boxes, 7, interpret=True,
        feat_scales=jnp.asarray(scales, jnp.float32)))
    np.testing.assert_allclose(got_q, ref_q, atol=2e-2)


def test_roi_align_pallas_image_groups_match_gb1():
    """The gb>1 image-group path (one kernel program pools gb images:
    dynamic g-indexing of the feat/out blocks, g-major cols layout) is
    the production default whenever the batch divides — pin it bitwise
    to the gb=1 output in interpret mode, for the box (P=7) and mask
    (P=14) pooler shapes."""
    from roadsurf_tpu.ops.roi_align_pallas import roi_align_fused

    rng = np.random.default_rng(11)
    B, R, C, S = 4, 8, 8, 64
    feats = tuple(jnp.asarray(rng.normal(size=(B, S // st, S // st, C)),
                              jnp.bfloat16) for st in (4, 8, 16))
    x0 = rng.uniform(0, 50, (B, R))
    y0 = rng.uniform(0, 50, (B, R))
    w = rng.uniform(4, 40, (B, R))
    h = rng.uniform(4, 40, (B, R))
    boxes = jnp.asarray(np.stack(
        [x0, y0, np.minimum(x0 + w, S), np.minimum(y0 + h, S)], -1),
        jnp.float32)

    for P in (7, 14):
        base = np.asarray(roi_align_fused(feats, boxes, P, interpret=True,
                                          gb=1))
        for gb in (2, 4):
            got = np.asarray(roi_align_fused(feats, boxes, P,
                                             interpret=True, gb=gb))
            np.testing.assert_array_equal(got, base), (P, gb)


def test_pick_gb_vmem_cap():
    """gb selection respects the per-program VMEM estimate: bf16
    pyramids with the P=14 mask pooler at 256px must NOT get gb=8
    (the ~104 MB resident set exceeds vmem_limit_bytes); the int8
    deployment pyramid keeps gb=8; non-dividing batches fall to 1."""
    from roadsurf_tpu.ops.roi_align_pallas import pick_gb

    sizes = [(64, 64), (32, 32), (16, 16)]   # P2..P4 at 256px
    assert pick_gb(512, 128, 14, sizes, 256, feat_itemsize=2) < 8
    assert pick_gb(512, 128, 14, sizes, 256, feat_itemsize=1) == 8
    assert pick_gb(512, 512, 7, sizes, 256, feat_itemsize=1) == 8
    assert pick_gb(3, 512, 7, sizes, 256, feat_itemsize=1) == 1


def test_roi_align_adaptive_sampling_matches_numpy():
    """POOLER_SAMPLING_RATIO=0 (per-ROI adaptive ceil sampling — the
    reference's pinned CUDA-op config, detectron2_config_3bands.yaml:174)
    against the independent numpy oracle, on both XLA paths. Boxes hit
    n = 1, 2, 3 and 4 sample slots per axis."""
    from roadsurf_tpu.ops.roi_align import (_roi_align_gather,
                                            _roi_align_separable)

    rng = np.random.default_rng(7)
    H = W = 40
    feat = rng.normal(size=(1, H, W, 8)).astype(np.float32)
    boxes = np.array([[4.0, 6.0, 7.0, 9.1],      # ~0.45 cells -> n=1
                      [2.0, 2.0, 14.0, 12.5],    # ~1.7 cells  -> n=2
                      [1.0, 3.0, 20.0, 23.8],    # ~2.8 cells  -> n=3
                      [0.5, 0.5, 28.0, 26.0]],   # ~3.9 cells  -> n=4
                     np.float32)
    refs = np.stack([_np_roi_align_single(feat[0], b, 7, 0, 1.0)
                     for b in boxes])

    feats = [jnp.asarray(feat)] * 4
    lvl = jnp.zeros((1, 4), jnp.int32)
    out_sep = np.asarray(_roi_align_separable(
        feats, jnp.asarray(boxes[None]), lvl, 7, 0, min_level=0))[0]
    np.testing.assert_allclose(out_sep, refs, atol=2e-4)
    out_g = np.asarray(_roi_align_gather(
        feats, jnp.asarray(boxes[None]), lvl, 7, 0, min_level=0))[0]
    np.testing.assert_allclose(out_g, refs, atol=2e-4)

    # the separable closed-form series is exact for ANY n — elongated
    # boxes (n=10 x-samples), border overhang (negative x0), degenerate
    # zero-width padding rows must all match the per-sample oracle
    hard = np.array([[1.0, 2.0, 70.9, 8.0],     # n_x=10, n_y=1
                     [-3.0, -2.5, 12.0, 39.9],  # clamped at borders
                     [5.0, 5.0, 5.0, 25.0],     # zero-width
                     [0.0, 35.0, 39.5, 45.0]],  # overhang past dim
                    np.float32)
    refs_h = np.stack([_np_roi_align_single(feat[0], b, 7, 0, 1.0)
                       for b in hard])
    out_h = np.asarray(_roi_align_separable(
        feats, jnp.asarray(hard[None]), lvl, 7, 0, min_level=0))[0]
    np.testing.assert_allclose(out_h, refs_h, atol=5e-4)


@pytest.mark.slow
def test_int8_backbone_close_to_f32():
    """Static-int8 backbone (models/quant.py) tracks the f32 backbone
    within quantization tolerance on calibrated inputs."""
    from roadsurf_tpu.models.mask_rcnn import preprocess
    from roadsurf_tpu.models.quant import (calibrate_backbone,
                                           quantize_backbone,
                                           resnet_forward_int8)
    from roadsurf_tpu.models.resnet import init_resnet, resnet_forward

    rng = np.random.default_rng(11)
    params = init_resnet(jax.random.PRNGKey(0))
    # zero-gamma init leaves residual branches dead; give conv3 scales
    # realistic magnitudes so quantization error actually propagates
    for stage in ("res2", "res3", "res4", "res5"):
        for bp in params[stage]:
            bp["conv3"]["scale"] = jnp.asarray(
                rng.uniform(0.5, 1.5, bp["conv3"]["scale"].shape),
                jnp.float32)
    cfg = fast_profile()
    imgs = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    x = preprocess(jnp.asarray(imgs), cfg, 64)

    ref = resnet_forward(params, x, jnp.float32)
    scales = calibrate_backbone(params, x, cfg)
    q = quantize_backbone(jax.device_get(params), scales)
    got = resnet_forward_int8(q, x)

    for k in ("res2", "res3", "res4", "res5"):
        r = np.asarray(ref[k], np.float32)
        g = np.asarray(got[k], np.float32)
        denom = np.maximum(np.abs(r).mean(), 1e-3)
        rel = np.abs(r - g).mean() / denom
        assert rel < 0.08, (k, rel)


@pytest.mark.slow
def test_int8_full_scope_tracks_bf16_outputs():
    """int8_scope='full' (backbone+FPN+RPN+FC+mask convs, models/quant.py)
    produces detections close to the bf16 graph: same top class, box
    within a few px, scores within tolerance on calibrated inputs."""
    from dataclasses import replace

    from roadsurf_tpu.models import init_params
    from roadsurf_tpu.models.mask_rcnn import forward_inference
    from roadsurf_tpu.models.quant import prepare_quantized

    rng = np.random.default_rng(3)
    cfg = replace(fast_profile(post_nms_topk=16, detections_per_image=4),
                  min_size_test=64, max_size_test=64,
                  rpn_pre_nms_topk_test=64, pallas_pooler=False)
    params = init_params(jax.random.PRNGKey(1), cfg)
    # give residual branches live output (zero-gamma init otherwise hides
    # backbone quantization error entirely)
    for stage in ("res2", "res3", "res4", "res5"):
        for bp in params["backbone"][stage]:
            bp["conv3"]["scale"] = jnp.asarray(
                rng.uniform(0.5, 1.5, bp["conv3"]["scale"].shape),
                jnp.float32)

    imgs = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    ref = jax.device_get(forward_inference(params, jnp.asarray(imgs), cfg))

    qcfg = replace(cfg, int8_scope="full")
    qparams = dict(params)
    qparams["quant"] = prepare_quantized(params, imgs, qcfg)
    assert set(qparams["quant"]) == {"backbone", "fpn", "rpn", "box",
                                     "mask"}
    got = jax.device_get(forward_inference(qparams, jnp.asarray(imgs),
                                           qcfg))

    # random-weight detectors produce noisy scores; assert the quantized
    # graph runs end to end with same-shaped, same-ballpark outputs
    assert got["boxes"].shape == ref["boxes"].shape
    assert got["mask_logits"].shape == ref["mask_logits"].shape
    r, g = ref["scores"], got["scores"]
    assert np.all(np.isfinite(g))
    assert abs(float(r.mean()) - float(g.mean())) < 0.15


def test_u8_direct_stem_matches_float_stem():
    """quantize_stem_u8: raw-uint8 stem (preprocess folded into the conv:
    1/std in the weights, 128-mean in a positional bias map) matches the
    float conv_bn stem at least as closely as the calibrated int8 stem —
    the input quantization error disappears, the edge rows (where the 7x7
    window overhangs the zero padding) are handled by the bias map."""
    from dataclasses import replace

    from roadsurf_tpu.models import init_params
    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.models.mask_rcnn import preprocess
    from roadsurf_tpu.models.quant import (_quantize_act, prepare_int8_params,
                                           qconv_int8_in)
    from roadsurf_tpu.models.resnet import conv_bn

    rng = np.random.default_rng(0)
    cfg = replace(fast_profile(), min_size_test=64, max_size_test=64,
                  pixel_std=(57.375, 57.12, 58.395))
    params = init_params(jax.random.PRNGKey(1), cfg)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    q = prepare_int8_params(params, imgs, cfg)
    x = preprocess(jnp.asarray(imgs), cfg, 64)

    ref = np.asarray(conv_bn(x.astype(jnp.float32),
                             params["backbone"]["stem"], stride=2,
                             dtype=jnp.float32))
    qin = jax.lax.bitcast_convert_type(jnp.asarray(imgs) ^ jnp.uint8(0x80),
                                       jnp.int8)
    got = np.asarray(qconv_int8_in(qin, q["stem_u8"], stride=2, relu=True),
                     np.float32)
    xq = _quantize_act(x.astype(jnp.float32), q["stem"]["sa"])
    cal = np.asarray(qconv_int8_in(xq, q["stem"], stride=2, relu=True),
                     np.float32)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= np.abs(cal - ref).max() + 0.02 * scale
    assert np.abs(got - ref).max() < 0.02 * scale
    # edge rows (bias-map territory) no worse than the interior
    e = np.abs(got - ref)
    assert max(e[:, :2].max(), e[:, -2:].max(), e[:, :, :2].max(),
               e[:, :, -2:].max()) < 0.02 * scale

    # full int8 forward consumes raw uint8 when the stem_u8 size matches
    from roadsurf_tpu.models.quant import resnet_forward_int8
    fa = resnet_forward_int8(q, jnp.asarray(imgs))
    fb = resnet_forward_int8({k: v for k, v in q.items() if k != "stem_u8"},
                             x)
    for k in fa:
        d = np.abs(np.asarray(fa[k], np.float32)
                   - np.asarray(fb[k], np.float32))
        assert d.mean() < 0.05 * max(np.abs(np.asarray(fb[k])).max(), 1e-3)


def test_int8_pyramid_tracks_full_scope_outputs():
    """cfg.int8_pyramid (int8 P-levels consumed directly by the RPN head
    and the poolers, models/quant.py pyramid interface) produces
    detections in the same ballpark as the int8 full-scope graph — the
    pyramid adds exactly one quantization of the FPN outputs."""
    from dataclasses import replace

    from roadsurf_tpu.models import init_params
    from roadsurf_tpu.models.mask_rcnn import forward_inference
    from roadsurf_tpu.models.quant import prepare_quantized

    rng = np.random.default_rng(4)
    cfg = replace(fast_profile(post_nms_topk=16, detections_per_image=4),
                  min_size_test=64, max_size_test=64,
                  rpn_pre_nms_topk_test=64, pallas_pooler=False)
    params = init_params(jax.random.PRNGKey(1), cfg)
    for stage in ("res2", "res3", "res4", "res5"):
        for bp in params["backbone"][stage]:
            bp["conv3"]["scale"] = jnp.asarray(
                rng.uniform(0.5, 1.5, bp["conv3"]["scale"].shape),
                jnp.float32)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)

    qcfg = replace(cfg, int8_scope="full")
    qparams = dict(params)
    qparams["quant"] = prepare_quantized(params, imgs, qcfg)
    ref = jax.device_get(forward_inference(qparams, jnp.asarray(imgs),
                                           qcfg))

    pcfg = replace(cfg, int8_scope="full", int8_pyramid=True)
    pparams = dict(params)
    pparams["quant"] = prepare_quantized(params, imgs, pcfg)
    assert set(pparams["quant"]) == {"backbone", "fpn", "rpn", "box",
                                     "mask", "pyr"}
    got = jax.device_get(forward_inference(pparams, jnp.asarray(imgs),
                                           pcfg))

    assert got["boxes"].shape == ref["boxes"].shape
    assert got["mask_logits"].shape == ref["mask_logits"].shape
    assert np.all(np.isfinite(got["scores"]))
    assert abs(float(ref["scores"].mean())
               - float(got["scores"].mean())) < 0.15


@pytest.mark.slow
def test_int8_scope_levels_select_groups():
    """prepare_quantized returns exactly the groups its scope names."""
    from dataclasses import replace

    from roadsurf_tpu.models import init_params
    from roadsurf_tpu.models.quant import prepare_quantized

    cfg = replace(fast_profile(post_nms_topk=8, detections_per_image=4),
                  min_size_test=64, max_size_test=64,
                  rpn_pre_nms_topk_test=32, pallas_pooler=False)
    params = init_params(jax.random.PRNGKey(0), cfg)
    imgs = np.random.default_rng(0).integers(0, 255, (1, 64, 64, 3),
                                             dtype=np.uint8)

    assert prepare_quantized(params, imgs, cfg) == {}
    q = prepare_quantized(params, imgs, replace(cfg, int8_scope="backbone"))
    assert set(q) == {"backbone"}
    q = prepare_quantized(params, imgs, replace(cfg, int8_scope="convnet"))
    assert set(q) == {"backbone", "fpn", "rpn"}


def test_nms_jacobi_equals_scan_on_chains_and_random():
    """nms_fixed (DAG-Jacobi) must reproduce the sequential rank scan
    exactly — including deep suppression chains (A kills B, B would kill
    C => C survives), staircases, ties, and padded entries."""
    from roadsurf_tpu.ops.nms import NEG_INF, nms_fixed, nms_scan

    # staircase chain: each box overlaps only its neighbors -> greedy
    # keeps every other box; a single sweep would over-suppress
    n = 24
    b = np.stack([np.arange(n) * 6.0, np.zeros(n),
                  np.arange(n) * 6.0 + 10.0, np.full(n, 10.0)],
                 1).astype(np.float32)
    s = np.linspace(1.0, 0.5, n).astype(np.float32)
    js, ji = nms_fixed(jnp.asarray(b), jnp.asarray(s), 0.3, n)
    ss, si = nms_scan(jnp.asarray(b), jnp.asarray(s), 0.3, n)
    np.testing.assert_array_equal(np.asarray(js), np.asarray(ss))
    np.testing.assert_array_equal(np.asarray(ji)[np.asarray(js) > NEG_INF / 2],
                                  np.asarray(si)[np.asarray(ss) > NEG_INF / 2])

    # randomized clusters with ties and NEG_INF padding
    rng = np.random.default_rng(17)
    for trial in range(5):
        m = 120
        centers = rng.uniform(0, 80, (10, 2))
        c = centers[rng.integers(0, 10, m)] + rng.normal(0, 4, (m, 2))
        wh2 = rng.uniform(4, 14, (m, 2))
        b = np.concatenate([c - wh2, c + wh2], 1).astype(np.float32)
        s = np.round(rng.uniform(0, 1, m), 2).astype(np.float32)  # ties
        s[rng.uniform(size=m) < 0.2] = NEG_INF                    # padding
        js, ji = nms_fixed(jnp.asarray(b), jnp.asarray(s), 0.5, 50)
        ss, si = nms_scan(jnp.asarray(b), jnp.asarray(s), 0.5, 50)
        np.testing.assert_array_equal(np.asarray(js), np.asarray(ss),
                                      err_msg=f"trial {trial}")
        kept = np.asarray(js) > NEG_INF / 2
        np.testing.assert_array_equal(np.asarray(ji)[kept],
                                      np.asarray(si)[kept],
                                      err_msg=f"trial {trial}")


def test_roi_align_rect_gather_matches_separable():
    """The rectangle-gather path (large feature maps, 800px parity) must
    reproduce the exact separable path on adversarial road geometry:
    long-thin boxes both orientations, tiny, edge-clamped, full-image.
    Also asserts the static slot budget covers every tap rectangle (the
    level-assignment area bound of ops/roi_align._rect_slot_budget)."""
    from roadsurf_tpu.ops.roi_align import (
        _level_assignment, _rect_slot_budget, _roi_align_rect_gather,
        _roi_align_separable)

    rng = np.random.default_rng(11)
    B, R, C, S = 2, 40, 8, 352
    sizes = [(S // 2 ** l, S // 2 ** l) for l in range(2, 6)]
    feats = [jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
             for h, w in sizes]

    def batch_boxes():
        bs = [[0.0, 0.0, S, S], [0.0, 100.0, S, 106.0],     # full, h-road
              [40.0, 0.0, 43.0, S], [0.0, 0.0, 2.0, 2.0],   # v-road, corner
              [5.0, 5.0, 5.6, 6.1], [0.0, 0.0, S, 9.0]]     # tiny, wide
        for _ in range(R - len(bs)):
            x0, y0 = rng.uniform(0, S - 2, 2)
            bs.append([x0, y0, min(S, x0 + rng.uniform(0.5, S / 2)),
                       min(S, y0 + rng.uniform(0.5, S / 2))])
        return bs

    boxes = jnp.asarray(np.asarray([batch_boxes() for _ in range(B)],
                                   np.float32))
    lvl = _level_assignment(boxes, 224, 4, 2, 5)

    # budget sufficiency: tap rectangle of every box fits the static slots
    budget = _rect_slot_budget(sizes, 224, 4, 2)
    strides = np.asarray([4.0, 8.0, 16.0, 32.0])[np.asarray(lvl)]
    dims = np.asarray([h for h, _ in sizes], np.float64)[np.asarray(lvl)]
    bx = np.asarray(boxes, np.float64)

    def span(a0, a1):
        t0 = np.clip(np.floor(a0 / strides - 0.5), 0, dims - 1)
        t1 = np.clip(np.floor(a1 / strides - 0.5) + 1, 0, dims - 1)
        return t1 - t0 + 1

    prod = span(bx[..., 1], bx[..., 3]) * span(bx[..., 0], bx[..., 2])
    assert prod.max() <= budget, (prod.max(), budget)

    for sampling in (0, 2):
        ref = _roi_align_separable(feats, boxes, lvl, 7, sampling, 2)
        got = _roi_align_rect_gather(feats, boxes, lvl, 7, sampling, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)


@pytest.mark.slow
def test_roi_align_blocked_pallas_matches_separable():
    """The blocked Pallas pooler (large maps, 800px parity: HBM-resident
    levels, sorted ROIs, touch-bitmap skipping) matches the exact XLA
    separable path in interpret mode — adversarial road geometry incl.
    full-image, full-width/full-height thin roads and non-divisible
    feature widths (352px -> W=88/44/22/11 exercises the w-block tail)."""
    from roadsurf_tpu.ops.roi_align import (_level_assignment,
                                            _roi_align_separable)
    from roadsurf_tpu.ops.roi_align_pallas import roi_align_fused_blocked

    rng = np.random.default_rng(3)
    B, R, C, S = 2, 40, 16, 352
    sizes = [(S // 2 ** l, S // 2 ** l) for l in range(2, 6)]
    feats = [jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
             for h, w in sizes]

    def batch_boxes():
        bs = [[0.0, 0.0, S, S], [0.0, 100.0, S, 106.0],
              [40.0, 0.0, 43.0, S], [0.0, 0.0, 2.0, 2.0],
              [5.0, 5.0, 5.6, 6.1], [0.0, 0.0, S, 9.0]]
        for _ in range(R - len(bs)):
            x0, y0 = rng.uniform(0, S - 2, 2)
            bs.append([x0, y0, min(S, x0 + rng.uniform(0.5, S / 2)),
                       min(S, y0 + rng.uniform(0.5, S / 2))])
        return bs

    boxes = jnp.asarray(np.asarray([batch_boxes() for _ in range(B)],
                                   np.float32))
    lvl = _level_assignment(boxes, 224, 4, 2, 5)
    for sampling in (0, 2):
        ref = np.asarray(_roi_align_separable(
            [f.astype(jnp.bfloat16) for f in feats], boxes, lvl, 7,
            sampling, 2))
        got = np.asarray(roi_align_fused_blocked(
            tuple(f.astype(jnp.bfloat16) for f in feats), boxes, 7,
            sampling=sampling, interpret=True, out_dtype=jnp.float32))
        np.testing.assert_allclose(got, ref, atol=5e-3)

    # mask-pooler resolution (out_size=14 -> RB=32): one small adaptive
    # case pins the P=14 relayout/padding geometry
    small = boxes[:1, :9]
    ref14 = np.asarray(_roi_align_separable(
        [f[:1].astype(jnp.bfloat16) for f in feats], small,
        _level_assignment(small, 224, 4, 2, 5), 14, 0, 2))
    got14 = np.asarray(roi_align_fused_blocked(
        tuple(f[:1].astype(jnp.bfloat16) for f in feats), small, 14,
        sampling=0, interpret=True, out_dtype=jnp.float32))
    np.testing.assert_allclose(got14, ref14, atol=5e-3)

    # int8-pyramid inputs (cfg.int8_pyramid at 800px): levels stay int8 in
    # the kernel's DMA'd slices; the per-level scale is folded into the
    # accumulated ROI rows. Must match separable on dequantized feats.
    scl = np.asarray([0.05, 0.08, 0.11, 0.07], np.float32)
    feats_i8 = [jnp.asarray(np.clip(np.round(np.asarray(f) / s), -127, 127)
                            .astype(np.int8)) for f, s in zip(feats, scl)]
    feats_dq = [(f.astype(jnp.float32) * s).astype(jnp.bfloat16)
                for f, s in zip(feats_i8, scl)]
    for sampling in (0, 2):
        ref_q = np.asarray(_roi_align_separable(
            feats_dq, boxes, lvl, 7, sampling, 2))
        got_q = np.asarray(roi_align_fused_blocked(
            tuple(feats_i8), boxes, 7, sampling=sampling, interpret=True,
            out_dtype=jnp.float32, feat_scales=tuple(scl.tolist())))
        # the kernel is MORE exact than this reference: it keeps int8
        # values exact (lossless in bf16) and scales once in f32, while
        # the separable ref rounds each dequantized feature to bf16
        # (2^-8 relative) — tolerance is that rounding bound
        np.testing.assert_allclose(got_q, ref_q, atol=2e-2)


def test_local_max_gate_exact_under_sweep_at_anchor_geometry():
    """With zero deltas (decoded boxes == anchors) the local-max pre-gate
    must not change select_proposals' sweep-NMS output: every gated anchor
    is geometrically guaranteed to be sweep-suppressed."""
    from roadsurf_tpu.models.rpn import select_proposals

    cfg = fast_profile(post_nms_topk=32)
    S = 64   # small image => small levels: the exactness check runs the
    #          sweep over EVERY anchor (pre-NMS = level size), which is
    #          O(n^2) — 16x16x3 at P2 keeps that CPU-friendly
    anchors = all_level_anchors(S, cfg.fpn_strides, cfg.anchor_sizes,
                                cfg.anchor_aspect_ratios, cfg.anchor_offset)
    gate_geom = [(cfg.num_anchors, cfg.anchor_aspect_ratios, st, sz)
                 for st, sz in zip(cfg.fpn_strides, cfg.anchor_sizes)]
    rng = np.random.default_rng(7)
    B = 3
    logits = [jnp.asarray(rng.normal(size=(B, a.shape[0]))
                          .astype(np.float32)) for a in anchors]
    # adversarial ties: quantize scores so equal-score neighbor chains occur
    logits = [jnp.round(lg * 4) / 4 for lg in logits]
    deltas = [jnp.zeros((B, a.shape[0], 4), jnp.float32) for a in anchors]

    # pre-NMS budget >= level size so the top-k boundary cannot differ
    pre = max(a.shape[0] for a in anchors)
    base_b, base_s = select_proposals(
        logits, deltas, anchors, S, pre, 32, cfg.rpn_nms_thresh,
        fast_nms=True)
    gated_b, gated_s = select_proposals(
        logits, deltas, anchors, S, pre, 32, cfg.rpn_nms_thresh,
        fast_nms=True, local_max_gate=True, gate_geom=gate_geom)
    np.testing.assert_array_equal(np.asarray(base_s), np.asarray(gated_s))
    np.testing.assert_array_equal(np.asarray(base_b), np.asarray(gated_b))


def test_local_max_gate_directions_and_ties():
    """Gate rules per aspect ratio at the pinned geometry (size/stride=8,
    thresh 0.7): the wide AR (0.5) gates only horizontally, the tall AR
    (2.0) only vertically, the square both; ties lose to the lower flat
    index (up/left neighbors)."""
    from roadsurf_tpu.models.rpn import _local_max_gate
    from roadsurf_tpu.ops.nms import NEG_INF

    A, side, stride, size = 3, 8, 4, 32.0
    ars = (0.5, 1.0, 2.0)
    x = np.zeros((1, side, side, A), np.float32)

    # wide AR (idx 0): a higher VERTICAL neighbor must NOT gate (IoU 0.6996
    # < 0.7), a higher horizontal one must
    x[0, 3, 3, 0] = 1.0
    x[0, 2, 3, 0] = 2.0          # up neighbor higher: vertical only
    x[0, 5, 5, 0] = 1.0
    x[0, 5, 4, 0] = 2.0          # left neighbor higher: horizontal
    # tall AR (idx 2): mirror
    x[0, 3, 3, 2] = 1.0
    x[0, 3, 2, 2] = 2.0          # left neighbor higher: horizontal only
    x[0, 5, 5, 2] = 1.0
    x[0, 4, 5, 2] = 2.0          # up neighbor higher: vertical
    # square AR (idx 1): tie chain along a row — only the leftmost survives
    x[0, 1, 1, 1] = 3.0
    x[0, 1, 2, 1] = 3.0
    x[0, 1, 3, 1] = 3.0

    g = np.asarray(_local_max_gate(
        jnp.asarray(x.reshape(1, -1)), A, ars, stride, size, 0.7)
    ).reshape(1, side, side, A)

    assert g[0, 3, 3, 0] == 1.0            # wide: vertical neighbor ignored
    assert g[0, 5, 5, 0] <= NEG_INF / 2    # wide: horizontal gates
    assert g[0, 3, 3, 2] == 1.0            # tall: horizontal ignored
    assert g[0, 5, 5, 2] <= NEG_INF / 2    # tall: vertical gates
    assert g[0, 1, 1, 1] == 3.0            # tie: lowest index survives
    assert g[0, 1, 2, 1] <= NEG_INF / 2
    assert g[0, 1, 3, 1] <= NEG_INF / 2


def test_preprocess_matmul_resize_matches_einsum_and_jax_image():
    """The 256->800-style separable resize in preprocess is spelled as
    explicit (axis, batch*rest) matmuls (the NHWC einsum with C=3 in the
    lane dim ran ~6x slower on v5e). Pin the formulation: equal to the
    einsum form up to f32 reassociation (<=1e-4 on 0..255-scale pixels)
    and within the documented tolerance of jax.image.resize's bilinear."""
    from roadsurf_tpu.models import ModelConfig
    from roadsurf_tpu.models.mask_rcnn import _bilinear_weights, preprocess

    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    cfg = ModelConfig()
    S = 100
    got = np.asarray(preprocess(jnp.asarray(imgs), cfg, S), np.float32)

    w_mat = jnp.asarray(_bilinear_weights(32, S))
    x = jnp.asarray(imgs).astype(jnp.float32)
    ein = jnp.einsum("xw,bywc->byxc", w_mat,
                     jnp.einsum("yh,bhwc->bywc", w_mat, x))
    mean = np.asarray(cfg.pixel_mean, np.float32)
    std = np.asarray(cfg.pixel_std, np.float32)
    ein = (np.asarray(ein, np.float32) - mean) / std
    np.testing.assert_allclose(got, ein, atol=1e-4)

    ji = jax.image.resize(x, (2, S, S, 3), "bilinear")
    ji = (np.asarray(ji, np.float32) - mean) / std
    assert np.max(np.abs(got - ji)) <= 2e-3   # f32 vs resize-kernel rounding
