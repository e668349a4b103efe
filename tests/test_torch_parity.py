"""Parity tests against torch/torchvision reference implementations (CPU).

The reference pipeline's engine is detectron2 on CUDA; its numerically
critical custom ops are ROIAlignV2 and batched NMS. torchvision ships the
same op implementations on CPU, giving an independent oracle for the
TPU-native reimplementations, and torch lets us fabricate a detectron2-style
state dict to pin the checkpoint converter (FrozenBN folding, layout moves).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
try:
    import torchvision
except ImportError:
    torchvision = None

needs_torchvision = pytest.mark.skipif(torchvision is None,
                                       reason="torchvision not installed")

import jax
import jax.numpy as jnp

from roadsurf_tpu.ops import nms_fixed
from roadsurf_tpu.ops.roi_align import _roi_align_gather


@needs_torchvision
def test_roi_align_matches_torchvision_aligned():
    """Single-level ROIAlignV2 (aligned=True) vs torchvision.ops.roi_align."""
    rng = np.random.default_rng(0)
    H = W = 32
    feat = rng.normal(size=(1, H, W, 8)).astype(np.float32)
    boxes = np.array([[4.0, 6.0, 27.5, 30.0],
                      [0.0, 0.0, 10.0, 8.0],
                      [12.3, 4.7, 25.1, 19.9]], np.float32)

    # torchvision: NCHW, rois (idx, x0, y0, x1, y1), spatial_scale vs stride
    t_feat = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    rois = torch.from_numpy(
        np.concatenate([np.zeros((3, 1), np.float32), boxes], 1))
    ref = torchvision.ops.roi_align(t_feat, rois, output_size=7,
                                    spatial_scale=1.0, sampling_ratio=2,
                                    aligned=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)          # (R, 7, 7, C)

    # ours: stride-1 level; force single level by passing 4 copies and boxes
    # small enough to land on P2 with canonical math for stride 1
    feats = [jnp.asarray(feat)] * 4
    lvl = jnp.zeros((1, 3), jnp.int32)
    # separable path
    from roadsurf_tpu.ops.roi_align import _roi_align_separable
    out_sep = np.asarray(_roi_align_separable(
        feats, jnp.asarray(boxes[None]), lvl, 7, 2, min_level=0))[0]
    np.testing.assert_allclose(out_sep, ref, atol=2e-4)
    # gather path
    out_g = np.asarray(_roi_align_gather(
        feats, jnp.asarray(boxes[None]), lvl, 7, 2, min_level=0))[0]
    np.testing.assert_allclose(out_g, ref, atol=2e-4)


@needs_torchvision
def test_nms_matches_torchvision():
    rng = np.random.default_rng(5)
    b = rng.uniform(0, 200, (200, 4)).astype(np.float32)
    b = np.concatenate([np.minimum(b[:, :2], b[:, 2:]),
                        np.maximum(b[:, :2], b[:, 2:]) + 5], 1)
    s = rng.uniform(0, 1, 200).astype(np.float32)

    ref_keep = torchvision.ops.nms(torch.from_numpy(b),
                                   torch.from_numpy(s), 0.5).numpy()
    ks, ki = nms_fixed(jnp.asarray(b), jnp.asarray(s), 0.5, 200)
    mine = np.asarray([int(i) for i, sc in zip(ki, ks) if sc > -1e9])
    np.testing.assert_array_equal(mine, ref_keep)


def _fake_d2_state_dict(num_classes: int = 80, sane_scale: bool = False):
    """Detectron2-named state dict covering every converter rule.

    ``sane_scale=True`` He-scales conv/FC weights so a full 50-layer forward
    stays finite (needed by the full-model parity test); the default keeps
    the original unscaled randn weights the converter test pinned.
    """
    g = torch.Generator().manual_seed(0)
    sd = {}

    def _w(shape):
        w = torch.randn(*shape, generator=g)
        if sane_scale and len(shape) >= 2:
            fan_in = int(np.prod(shape[1:]))
            w = w * (2.0 / fan_in) ** 0.5
        return w

    def conv_unit(name, cin, cout, k):
        sd[f"{name}.weight"] = _w((cout, cin, k, k))
        sd[f"{name}.norm.weight"] = torch.rand(cout, generator=g) + 0.5
        sd[f"{name}.norm.bias"] = torch.randn(cout, generator=g) \
            * (0.05 if sane_scale else 1.0)
        sd[f"{name}.norm.running_mean"] = torch.randn(cout, generator=g) \
            * (0.05 if sane_scale else 1.0)
        sd[f"{name}.norm.running_var"] = torch.rand(cout, generator=g) + \
            (1.0 if sane_scale else 0.1)

    conv_unit("backbone.bottom_up.stem.conv1", 3, 64, 7)
    blocks = (3, 4, 6, 3)
    cin, out = 64, 256
    for si, stage in enumerate(["res2", "res3", "res4", "res5"]):
        mid = out // 4
        for bi in range(blocks[si]):
            base = f"backbone.bottom_up.{stage}.{bi}"
            conv_unit(f"{base}.conv1", cin, mid, 1)
            conv_unit(f"{base}.conv2", mid, mid, 3)
            conv_unit(f"{base}.conv3", mid, out, 1)
            if bi == 0:
                conv_unit(f"{base}.shortcut", cin, out, 1)
            cin = out
        out *= 2

    bias_s = 0.05 if sane_scale else 1.0
    for lvl, cin in zip(range(2, 6), (256, 512, 1024, 2048)):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = _w((256, cin, 1, 1))
        sd[f"backbone.fpn_lateral{lvl}.bias"] = torch.randn(
            256, generator=g) * bias_s
        sd[f"backbone.fpn_output{lvl}.weight"] = _w((256, 256, 3, 3))
        sd[f"backbone.fpn_output{lvl}.bias"] = torch.randn(
            256, generator=g) * bias_s

    for name, cout in (("conv", 256), ("objectness_logits", 3),
                       ("anchor_deltas", 12)):
        k = 3 if name == "conv" else 1
        sd[f"proposal_generator.rpn_head.{name}.weight"] = _w(
            (cout, 256, k, k))
        sd[f"proposal_generator.rpn_head.{name}.bias"] = torch.randn(
            cout, generator=g) * bias_s

    sd["roi_heads.box_head.fc1.weight"] = _w((1024, 12544))
    sd["roi_heads.box_head.fc1.bias"] = torch.randn(1024, generator=g) \
        * bias_s
    sd["roi_heads.box_head.fc2.weight"] = _w((1024, 1024))
    sd["roi_heads.box_head.fc2.bias"] = torch.randn(1024, generator=g) \
        * bias_s
    # class heads: COCO-80 by default so the converter must skip them on
    # shape mismatch; num_classes=2 makes them convertible
    C = num_classes
    sd["roi_heads.box_predictor.cls_score.weight"] = _w((C + 1, 1024))
    sd["roi_heads.box_predictor.cls_score.bias"] = torch.randn(
        C + 1, generator=g) * bias_s
    sd["roi_heads.box_predictor.bbox_pred.weight"] = _w((C * 4, 1024))
    sd["roi_heads.box_predictor.bbox_pred.bias"] = torch.randn(
        C * 4, generator=g) * bias_s
    for i in range(1, 5):
        sd[f"roi_heads.mask_head.mask_fcn{i}.weight"] = _w((256, 256, 3, 3))
        sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = torch.randn(
            256, generator=g) * bias_s
    sd["roi_heads.mask_head.deconv.weight"] = _w((256, 256, 2, 2))
    sd["roi_heads.mask_head.deconv.bias"] = torch.randn(
        256, generator=g) * bias_s
    sd["roi_heads.mask_head.predictor.weight"] = _w((C, 256, 1, 1))
    sd["roi_heads.mask_head.predictor.bias"] = torch.randn(
        C, generator=g) * bias_s
    if sane_scale:
        # tame the unnormalized residual stream: He-init residual branches
        # grow activation variance ~2x per block over 16 blocks, which makes
        # float32 parity tolerances meaningless. Damp each block's last conv
        # (and the shortcut projections) so activations stay O(1).
        for k in list(sd):
            if k.endswith("conv3.weight") or ".shortcut.weight" in k:
                sd[k] = sd[k] * 0.3
        # keep classification logits unsaturated: softmax scores of 1.0
        # create exact ties, and tie order under NMS is not a semantics the
        # stacks share (or that matters)
        sd["roi_heads.box_predictor.cls_score.weight"] *= 0.02
        sd["roi_heads.box_predictor.bbox_pred.weight"] *= 0.1
    return sd


@pytest.mark.slow
def test_d2_checkpoint_conversion_forward_parity(tmp_path):
    """Convert a torch-made detectron2 state dict and check the folded
    stem conv reproduces torch's conv+FrozenBN output; class-mismatched
    heads fall back to native init."""
    from roadsurf_tpu.models import fast_profile, init_params
    from roadsurf_tpu.utils.checkpoint import load_params
    from roadsurf_tpu.utils.d2_convert import merge_params

    sd = _fake_d2_state_dict()
    p = str(tmp_path / "model_final.pth")
    torch.save(sd, p)

    loaded, _ = load_params(p)
    cfg = fast_profile()
    init = init_params(jax.random.PRNGKey(0), cfg)
    params, skipped = merge_params(jax.device_get(init), loaded)
    # the 2-class heads must be skipped (shape mismatch vs COCO-80)
    assert any("cls" in s for s in skipped)
    assert any("predictor" in s for s in skipped)

    # numeric parity of the folded stem: torch conv + FrozenBN vs ours
    x = np.random.default_rng(1).normal(
        size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t = torch.nn.functional.conv2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            sd["backbone.bottom_up.stem.conv1.weight"],
            stride=2, padding=3)
        gamma = sd["backbone.bottom_up.stem.conv1.norm.weight"]
        beta = sd["backbone.bottom_up.stem.conv1.norm.bias"]
        mean = sd["backbone.bottom_up.stem.conv1.norm.running_mean"]
        var = sd["backbone.bottom_up.stem.conv1.norm.running_var"]
        scale = gamma / torch.sqrt(var + 1e-5)
        ref = torch.relu(t * scale[None, :, None, None]
                         + (beta - mean * scale)[None, :, None, None])
        ref = ref.numpy().transpose(0, 2, 3, 1)

    from roadsurf_tpu.models.resnet import conv_bn
    mine = np.asarray(conv_bn(jnp.asarray(x), params["backbone"]["stem"],
                              stride=2, dtype=jnp.float32))
    np.testing.assert_allclose(mine, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_full_model_forward_parity(tmp_path):
    """End-to-end forward parity: the composed JAX detector vs an
    independent torch/torchvision implementation of the pinned detectron2
    architecture (tests/torch_ref_model.py), both driven by one fabricated
    detectron2 state dict (2-class heads, He-scaled).

    Asserts stage-by-stage — FPN maps, RPN logits, post-NMS proposals,
    final detections, per-instance mask logits — so a deliberate bug seeded
    in any stage (layout, anchors, delta decode, NMS, RoIAlign, head
    wiring, checkpoint conversion) fails the matching assert.

    Pins the full model of reference config/detectron2_config_3bands.yaml:
    73-321 at reduced proposal counts (CPU runtime).
    """
    from dataclasses import replace

    from roadsurf_tpu.models import ModelConfig, init_params
    from roadsurf_tpu.models.anchors import all_level_anchors
    from roadsurf_tpu.models.mask_rcnn import preprocess, forward_features
    from roadsurf_tpu.models.roi_heads import (box_head_forward,
                                               inference_detections,
                                               mask_head_forward)
    from roadsurf_tpu.models.rpn import rpn_head_forward, select_proposals
    from roadsurf_tpu.ops.nms import NEG_INF
    from roadsurf_tpu.utils.d2_convert import merge_params
    import torch_ref_model as ref

    S, PRE, POST, DETS = 256, 400, 200, 20
    sd = _fake_d2_state_dict(num_classes=2, sane_scale=True)

    cfg = replace(ModelConfig(), num_classes=2, compute_dtype="float32",
                  min_size_test=S, max_size_test=S,
                  rpn_pre_nms_topk_test=PRE, rpn_post_nms_topk_test=POST,
                  detections_per_image=DETS)

    # convert the d2 weights into our model (exercises the real conversion
    # path end to end; nothing may be skipped with matching 2-class heads)
    from roadsurf_tpu.utils.d2_convert import load_detectron2_checkpoint
    ckpt = str(tmp_path / "model_final.pth")
    torch.save(sd, ckpt)
    loaded = load_detectron2_checkpoint(ckpt)
    init = init_params(jax.random.PRNGKey(0), cfg)
    params, skipped = merge_params(jax.device_get(init), loaded)
    assert not skipped, f"unexpected skipped weights: {skipped}"

    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, (S, S, 3), np.uint8)

    # ---- torch oracle
    out_t = ref.full_forward(sd, image, num_classes=2,
                             pixel_mean=cfg.pixel_mean,
                             pixel_std=cfg.pixel_std,
                             pre_nms=PRE, post_nms=POST,
                             score_thresh=cfg.score_thresh_test,
                             max_dets=DETS)

    # ---- ours, stage by stage
    dtype = jnp.float32
    x = preprocess(jnp.asarray(image[None]), cfg, S).astype(dtype)
    fpn = forward_features(params, x, cfg, dtype)
    for li, (f_j, f_t) in enumerate(zip(fpn, out_t["fpn"])):
        np.testing.assert_allclose(np.asarray(f_j)[0],
                                   f_t[0].transpose(1, 2, 0),
                                   atol=5e-3, rtol=1e-3,
                                   err_msg=f"FPN P{li + 2}")

    logits, deltas = rpn_head_forward(params["rpn"], fpn, cfg.num_anchors,
                                      dtype)
    for li, (l_j, l_t) in enumerate(zip(logits, out_t["rpn_logits"])):
        np.testing.assert_allclose(np.asarray(l_j)[0], l_t[0],
                                   atol=5e-3, rtol=1e-3,
                                   err_msg=f"RPN logits P{li + 2}")

    anchors = all_level_anchors(S, cfg.fpn_strides, cfg.anchor_sizes,
                                cfg.anchor_aspect_ratios, cfg.anchor_offset)
    props, pscores = select_proposals(logits, deltas, anchors, S, PRE, POST,
                                      cfg.rpn_nms_thresh)
    valid = np.asarray(pscores[0]) > NEG_INF / 2
    n_ref = len(out_t["prop_scores"])
    assert valid.sum() == n_ref, (valid.sum(), n_ref)
    np.testing.assert_allclose(np.asarray(pscores[0])[valid],
                               out_t["prop_scores"], atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(props[0])[valid],
                               out_t["proposals"], atol=5e-2,
                               err_msg="proposal boxes")

    cl, bd = box_head_forward(params["box_head"], fpn[:4], props, cfg, dtype)
    dets = inference_detections(cl, bd, props, pscores, cfg, S)
    dvalid = np.asarray(dets["valid"][0])
    n_ref = len(out_t["scores"])
    assert dvalid.sum() == n_ref, (dvalid.sum(), n_ref)
    np.testing.assert_allclose(np.asarray(dets["scores"][0])[dvalid],
                               out_t["scores"], atol=5e-3, rtol=1e-3)
    np.testing.assert_array_equal(np.asarray(dets["classes"][0])[dvalid],
                                  out_t["classes"])
    np.testing.assert_allclose(np.asarray(dets["boxes"][0])[dvalid],
                               out_t["boxes"], atol=5e-2,
                               err_msg="detection boxes")

    ml = mask_head_forward(params["mask_head"], fpn[:4], dets["boxes"], cfg,
                           dtype)
    cls = dets["classes"]
    masks = jnp.take_along_axis(ml, cls[:, :, None, None, None],
                                axis=-1)[..., 0]
    # mask logits reach |x|~50 through 6 conv layers; 0.1 absolute is
    # ~2e-3 of scale (f32 accumulation-order noise between XLA and torch)
    np.testing.assert_allclose(np.asarray(masks[0])[dvalid],
                               out_t["mask_logits"], atol=0.1, rtol=1e-2,
                               err_msg="mask logits")


@needs_torchvision
def test_roi_align_adaptive_sampling_matches_torchvision():
    """POOLER_SAMPLING_RATIO=0 (per-ROI adaptive ceil sampling, the
    reference's pinned CUDA-op config, detectron2_config_3bands.yaml:174)
    vs torchvision.ops.roi_align(sampling_ratio=0).

    Boxes chosen so the adaptive counts hit 1, 2, 3 and 4 sample slots
    per axis (bins of ~0.5..4 cells at stride 1)."""
    rng = np.random.default_rng(1)
    H = W = 40
    feat = rng.normal(size=(1, H, W, 8)).astype(np.float32)
    boxes = np.array([[4.0, 6.0, 7.0, 9.1],      # ~0.45 cells -> n=1
                      [2.0, 2.0, 14.0, 12.5],    # ~1.7 cells  -> n=2
                      [1.0, 3.0, 20.0, 23.8],    # ~2.8 cells  -> n=3
                      [0.5, 0.5, 28.0, 26.0]],   # ~3.9 cells  -> n=4
                     np.float32)

    t_feat = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    rois = torch.from_numpy(
        np.concatenate([np.zeros((4, 1), np.float32), boxes], 1))
    ref = torchvision.ops.roi_align(t_feat, rois, output_size=7,
                                    spatial_scale=1.0, sampling_ratio=0,
                                    aligned=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    from roadsurf_tpu.ops.roi_align import _roi_align_separable
    feats = [jnp.asarray(feat)] * 4
    lvl = jnp.zeros((1, 4), jnp.int32)
    out_sep = np.asarray(_roi_align_separable(
        feats, jnp.asarray(boxes[None]), lvl, 7, 0, min_level=0))[0]
    np.testing.assert_allclose(out_sep, ref, atol=2e-4)
    out_g = np.asarray(_roi_align_gather(
        feats, jnp.asarray(boxes[None]), lvl, 7, 0, min_level=0))[0]
    np.testing.assert_allclose(out_g, ref, atol=2e-4)


# ---------------------------------------------------------------------------
# Committed golden oracles (tests/golden/op_goldens.npz): environment-
# independent versions of the torchvision assertions above. The goldens are
# produced by tests/golden/make_golden.py — a naive scalar transcription of
# the pinned CUDA-op semantics (ROIAlignV2 aligned bilinear, greedy NMS)
# sharing no code with the production implementations, and re-certified
# against torchvision whenever that is installed (the generator asserts
# equality before writing). These always run; the @needs_torchvision tests
# above stay as the live-oracle lane.

import os as _os

_GOLDEN = np.load(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                "golden", "op_goldens.npz"))


def test_roi_align_matches_golden_fixed_sampling():
    from golden.make_golden import case_roi_align_fixed
    from roadsurf_tpu.ops.roi_align import _roi_align_separable

    feat, boxes, P, sr = case_roi_align_fixed()
    ref = _GOLDEN["roi_align_fixed"]
    feats = [jnp.asarray(feat[None])] * 4
    lvl = jnp.zeros((1, len(boxes)), jnp.int32)
    out_sep = np.asarray(_roi_align_separable(
        feats, jnp.asarray(boxes[None]), lvl, P, sr, min_level=0))[0]
    np.testing.assert_allclose(out_sep, ref, atol=2e-4)
    out_g = np.asarray(_roi_align_gather(
        feats, jnp.asarray(boxes[None]), lvl, P, sr, min_level=0))[0]
    np.testing.assert_allclose(out_g, ref, atol=2e-4)


def test_roi_align_matches_golden_adaptive_sampling():
    from golden.make_golden import case_roi_align_adaptive
    from roadsurf_tpu.ops.roi_align import _roi_align_separable

    feat, boxes, P, sr = case_roi_align_adaptive()
    ref = _GOLDEN["roi_align_adaptive"]
    feats = [jnp.asarray(feat[None])] * 4
    lvl = jnp.zeros((1, len(boxes)), jnp.int32)
    out_sep = np.asarray(_roi_align_separable(
        feats, jnp.asarray(boxes[None]), lvl, P, sr, min_level=0))[0]
    np.testing.assert_allclose(out_sep, ref, atol=2e-4)
    out_g = np.asarray(_roi_align_gather(
        feats, jnp.asarray(boxes[None]), lvl, P, sr, min_level=0))[0]
    np.testing.assert_allclose(out_g, ref, atol=2e-4)


def test_nms_matches_golden():
    from golden.make_golden import case_nms

    b, s, t = case_nms()
    ref_keep = _GOLDEN["nms_keep"]
    ks, ki = nms_fixed(jnp.asarray(b), jnp.asarray(s), t, len(b))
    mine = np.asarray([int(i) for i, sc in zip(ki, ks) if sc > -1e9])
    np.testing.assert_array_equal(mine, ref_keep)
