"""Model configuration for the Mask R-CNN R50-FPN detector.

Mirrors the knobs pinned by the reference's detectron2 YAML
(config/detectron2_config_3bands.yaml — anchor sizes :51-55, RPN topk/NMS
:222-251, ROI heads :177-221, solver :268-305, input :19-38) and can be
loaded directly from that file so existing configs work verbatim.

Two execution profiles:
* ``parity``  — reproduces the reference inference geometry (resize shorter
  side to 800, 1000 post-NMS proposals) for F1-parity runs;
* ``fast``    — TPU-native throughput profile (native 256px tiles, fewer
  proposals) used by the benchmark; same weights, same math per proposal.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import yaml


@dataclass(frozen=True)
class ModelConfig:
    # input
    num_classes: int = 2            # artificial / natural (det_class 0/1)
    pixel_mean: tuple = (103.53, 116.28, 123.675)
    pixel_std: tuple = (1.0, 1.0, 1.0)
    min_size_test: int = 800
    max_size_test: int = 1333
    min_size_train: tuple = (640, 672, 704, 736, 768, 800)
    max_size_train: int = 1333

    # backbone
    freeze_at: int = 2
    fpn_channels: int = 256

    # anchors (one size per FPN level P2..P6, 3 aspect ratios)
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    anchor_aspect_ratios: tuple = (0.5, 1.0, 2.0)
    anchor_offset: float = 0.0

    # RPN
    rpn_pre_nms_topk_train: int = 2000
    rpn_pre_nms_topk_test: int = 1000
    rpn_post_nms_topk_train: int = 1000
    rpn_post_nms_topk_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_iou_thresholds: tuple = (0.3, 0.7)
    rpn_bbox_weights: tuple = (1.0, 1.0, 1.0, 1.0)
    rpn_smooth_l1_beta: float = 0.0

    # ROI heads
    roi_batch_per_image: int = 1024
    roi_positive_fraction: float = 0.25
    roi_iou_threshold: float = 0.5
    box_pooler_resolution: int = 7
    mask_pooler_resolution: int = 14
    # 0 = POOLER_SAMPLING_RATIO 0 (per-ROI adaptive ceil, the reference's
    # pinned CUDA-op behavior, detectron2_config_3bands.yaml:174); the fast
    # profile pins the fixed 2x2 grid (adaptive ~= 2 at 256px tile scale)
    pooler_sampling_ratio: int = 0
    box_fc_dim: int = 1024
    box_bbox_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    mask_conv_dim: int = 256
    mask_num_conv: int = 4
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    canonical_box_size: int = 224
    canonical_level: int = 4

    # solver (reference detectron2_config_3bands.yaml:268-305)
    base_lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    max_iter: int = 12000
    gamma: float = 0.8
    # the 16 LR-decay milestones pinned by the reference
    # (detectron2_config_3bands.yaml:283-299)
    steps: tuple = (3000, 4000, 5000, 5500, 6000, 6500, 7000, 7500, 8000,
                    8500, 9000, 9500, 10000, 10500, 11000, 11500)
    warmup_iters: int = 200
    warmup_factor: float = 0.001
    ims_per_batch: int = 8
    checkpoint_period: int = 500
    eval_period: int = 200

    # execution
    compute_dtype: str = "bfloat16"
    # single-sweep NMS (ops/nms.nms_sweep) instead of exact greedy: used by
    # the throughput profile; the parity profile keeps exact greedy
    fast_nms: bool = False
    # spatial local-max pre-gate on RPN objectness before the pre-NMS top-k
    # (models/rpn._local_max_gate): anchors a same-level neighbor is
    # geometrically guaranteed to sweep-suppress are masked early, so the
    # pre-NMS budget shrinks ~4x without spending it on NMS-doomed
    # duplicates. Only honored with fast_nms (sweep semantics).
    rpn_local_max_gate: bool = False
    # fused Pallas RoIAlign kernel for inference pooling on real TPU
    # (ops/roi_align_pallas.py); CPU/training keep the XLA formulations
    pallas_pooler: bool = True
    # static-int8 backbone inference (models/quant.py): requires
    # calibrated params["backbone_q"] (prepare_int8_params); 2x MXU rate
    # on v5e for the ResNet convs. Off by default — opt-in deployment
    # knob, quality-guarded by the e2e synthetic chain
    int8_backbone: bool = False
    # wider static-int8 scope (models/quant.py prepare_quantized):
    #   ""         — follow int8_backbone only
    #   "backbone" — ResNet convs (same as int8_backbone=True)
    #   "convnet"  — + FPN lateral/output convs and the RPN head
    #   "full"     — + box-head FC1/FC2 and the mask-head conv stack
    # (classifier/regressor/predictor layers always stay bf16 for score
    # fidelity). Requires calibrated params["quant"].
    int8_scope: str = ""
    # store the FPN outputs (P2..P6) as int8 in calibrated per-level scales
    # and consume them DIRECTLY in the RPN head and both poolers
    # (models/quant.py pyramid interface): the ResNet stage outputs, the
    # FPN internals and the P-levels then never materialize in bf16 —
    # at 256px the feature interface is the dominant HBM traffic. Only
    # honored when int8_scope is "convnet"/"full" (needs those scales).
    int8_pyramid: bool = False
    # rematerialize the training forward per stage (jax.checkpoint around
    # backbone/FPN/box/mask heads): trades ~1/3 more FLOPs for dropping
    # each stage's activations from the backward liveness — the 1016-ROI
    # box/mask pooling otherwise OOMs HBM at large tile batches
    train_remat: bool = False
    # static cap on mask-branch ROIs per image during training. detectron2
    # runs its mask head on however many positives the ROI sampler drew
    # (dynamic, <= BATCH_SIZE_PER_IMAGE * POSITIVE_FRACTION = 256 at the
    # reference budget); the fixed-shape port must pad to a static M, and
    # padding COMPUTES — at the reference budget the padded 256-ROI mask
    # branch was 61% of the whole train step (5.8 of 7.2 TFLOP) while road
    # tiles yield a few dozen real positives. 128 keeps the math identical
    # to the exact cap whenever <=128 positives exist (the selection
    # priorities order valid entries first — pinned by test) and halves
    # the branch otherwise by subsampling positives, standard SGD noise.
    # 0 = the exact detectron2 cap.
    train_mask_rois: int = 128
    # chunk the training mask branch (pool + convs + deconv + targets +
    # loss) over the tile batch with lax.map: peak HBM for the branch drops
    # to batch/train_head_chunks images. Even rematted, the 254-ROI
    # 28x28x256 deconv activations are ~95 MB/tile in the backward — at
    # batch 64 that alone exceeds v5e HBM. 1 = no chunking; must divide
    # the batch.
    train_head_chunks: int = 1

    @property
    def fpn_strides(self) -> tuple:
        return (4, 8, 16, 32, 64)   # P2..P6

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_aspect_ratios)


def fast_profile(cfg: ModelConfig | None = None, *,
                 post_nms_topk: int = 64,
                 detections_per_image: int = 8) -> ModelConfig:
    """TPU-throughput profile: native tile resolution, trimmed proposal and
    detection counts (a 256px road tile holds a handful of instances, not
    the 1000-proposal/100-detection budget of the 800px parity profile; the
    mask head's cost is linear in the detection cap). 64 post-NMS
    proposals: the fast-vs-exact ablation in e2e_synthetic_quality.py
    guards the F1 cost of the trimmed budget."""
    cfg = cfg or ModelConfig()
    return replace(cfg,
                   min_size_test=256, max_size_test=256,
                   # the local-max gate removes the NMS-doomed neighbor
                   # duplicates that used to fill the 256 budget: 64
                   # gated candidates/level cover the same survivors
                   rpn_pre_nms_topk_test=max(64, post_nms_topk),
                   rpn_post_nms_topk_test=post_nms_topk,
                   detections_per_image=detections_per_image,
                   pooler_sampling_ratio=2,
                   fast_nms=True,
                   rpn_local_max_gate=True)


def dense_profile(cfg: ModelConfig | None = None) -> ModelConfig:
    """Crowded-scene deployment profile: restores enough proposal budget
    (pre-NMS 1024, 256 proposals, 16 detections, exact greedy NMS) to
    match the exact/full-budget profile's balanced F1 on the adversarial
    dense synthetic AOI (scripts/ablate_fast_profile.py: 0.897 == exact,
    where the fast profile measures 0.775-0.83), at ~40-45% of the fast
    profile's throughput. Use when tiles are expected to hold many
    instances; the fast profile is the sparse-scene default."""
    cfg = cfg or ModelConfig()
    return replace(cfg,
                   min_size_test=256, max_size_test=256,
                   rpn_pre_nms_topk_test=1024,
                   rpn_post_nms_topk_test=256,
                   detections_per_image=16,
                   pooler_sampling_ratio=2,
                   fast_nms=False)


def from_detectron2_yaml(path: str, num_classes: int = 2) -> ModelConfig:
    """Load a detectron2-format YAML (the reference's
    config/detectron2_config_3bands.yaml) into a ModelConfig."""
    with open(path) as f:
        d = yaml.safe_load(f)
    m = d.get("MODEL", {})
    inp = d.get("INPUT", {})
    sol = d.get("SOLVER", {})
    tst = d.get("TEST", {})
    rpn = m.get("RPN", {})
    roi = m.get("ROI_HEADS", {})
    box = m.get("ROI_BOX_HEAD", {})
    msk = m.get("ROI_MASK_HEAD", {})
    anch = m.get("ANCHOR_GENERATOR", {})

    def flat_sizes(sizes):
        return tuple(s[0] if isinstance(s, (list, tuple)) else s
                     for s in sizes)

    # detectron2 convention: ROI_HEADS.NUM_CLASSES counts "thing" classes; the
    # pipeline distinguishes det_class 0/1 (reference determine_class.py:22-25),
    # so the caller passes the actual class count.
    return ModelConfig(
        num_classes=num_classes,
        pixel_mean=tuple(m.get("PIXEL_MEAN", (103.53, 116.28, 123.675))),
        pixel_std=tuple(m.get("PIXEL_STD", (1.0, 1.0, 1.0))),
        min_size_test=inp.get("MIN_SIZE_TEST", 800),
        max_size_test=inp.get("MAX_SIZE_TEST", 1333),
        min_size_train=tuple(inp.get("MIN_SIZE_TRAIN", (800,))),
        max_size_train=inp.get("MAX_SIZE_TRAIN", 1333),
        freeze_at=m.get("BACKBONE", {}).get("FREEZE_AT", 2),
        fpn_channels=m.get("FPN", {}).get("OUT_CHANNELS", 256),
        anchor_sizes=flat_sizes(anch.get("SIZES",
                                         ((32,), (64,), (128,), (256,), (512,)))),
        anchor_aspect_ratios=tuple(
            anch.get("ASPECT_RATIOS", [[0.5, 1.0, 2.0]])[0]),
        anchor_offset=anch.get("OFFSET", 0.0),
        rpn_pre_nms_topk_train=rpn.get("PRE_NMS_TOPK_TRAIN", 2000),
        rpn_pre_nms_topk_test=rpn.get("PRE_NMS_TOPK_TEST", 1000),
        rpn_post_nms_topk_train=rpn.get("POST_NMS_TOPK_TRAIN", 1000),
        rpn_post_nms_topk_test=rpn.get("POST_NMS_TOPK_TEST", 1000),
        rpn_nms_thresh=rpn.get("NMS_THRESH", 0.7),
        rpn_batch_per_image=rpn.get("BATCH_SIZE_PER_IMAGE", 256),
        rpn_positive_fraction=rpn.get("POSITIVE_FRACTION", 0.5),
        rpn_iou_thresholds=tuple(rpn.get("IOU_THRESHOLDS", (0.3, 0.7))),
        rpn_smooth_l1_beta=rpn.get("SMOOTH_L1_BETA", 0.0),
        roi_batch_per_image=roi.get("BATCH_SIZE_PER_IMAGE", 1024),
        roi_positive_fraction=roi.get("POSITIVE_FRACTION", 0.25),
        roi_iou_threshold=tuple(roi.get("IOU_THRESHOLDS", (0.5,)))[0],
        box_pooler_resolution=box.get("POOLER_RESOLUTION", 7),
        mask_pooler_resolution=msk.get("POOLER_RESOLUTION", 14),
        pooler_sampling_ratio=box.get("POOLER_SAMPLING_RATIO", 0),
        box_fc_dim=box.get("FC_DIM", 1024),
        box_bbox_weights=tuple(box.get("BBOX_REG_WEIGHTS",
                                       (10.0, 10.0, 5.0, 5.0))),
        mask_conv_dim=msk.get("CONV_DIM", 256),
        mask_num_conv=msk.get("NUM_CONV", 4),
        score_thresh_test=roi.get("SCORE_THRESH_TEST", 0.05),
        nms_thresh_test=roi.get("NMS_THRESH_TEST", 0.5),
        detections_per_image=tst.get("DETECTIONS_PER_IMAGE", 100),
        base_lr=sol.get("BASE_LR", 0.01),
        momentum=sol.get("MOMENTUM", 0.9),
        weight_decay=sol.get("WEIGHT_DECAY", 1e-4),
        max_iter=sol.get("MAX_ITER", 12000),
        gamma=sol.get("GAMMA", 0.8),
        steps=tuple(sol.get("STEPS", ())),
        warmup_iters=sol.get("WARMUP_ITERS", 200),
        warmup_factor=sol.get("WARMUP_FACTOR", 0.001),
        ims_per_batch=sol.get("IMS_PER_BATCH", 8),
        checkpoint_period=sol.get("CHECKPOINT_PERIOD", 500),
        eval_period=tst.get("EVAL_PERIOD", 200),
    )
