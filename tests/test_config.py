"""Model-config loading fidelity: the detectron2-format YAML must map onto
ModelConfig exactly as the reference pins it."""

from roadsurf_tpu.models.config import ModelConfig, from_detectron2_yaml


def test_from_detectron2_yaml_pinned_values():
    cfg = from_detectron2_yaml("config/detectron2_config_3bands.yaml")
    assert cfg.pixel_mean == (103.53, 116.28, 123.675)
    assert cfg.pixel_std == (1.0, 1.0, 1.0)
    assert cfg.min_size_test == 800 and cfg.max_size_test == 1333
    assert cfg.min_size_train == (640, 672, 704, 736, 768, 800)
    assert cfg.freeze_at == 2
    assert cfg.anchor_sizes == (32, 64, 128, 256, 512)
    assert cfg.anchor_aspect_ratios == (0.5, 1.0, 2.0)
    assert cfg.rpn_pre_nms_topk_train == 2000
    assert cfg.rpn_post_nms_topk_test == 1000
    assert cfg.rpn_nms_thresh == 0.7
    assert cfg.roi_batch_per_image == 1024
    assert cfg.score_thresh_test == 0.05
    assert cfg.nms_thresh_test == 0.5
    assert cfg.detections_per_image == 100
    assert cfg.base_lr == 0.01 and cfg.momentum == 0.9
    assert cfg.max_iter == 12000 and cfg.gamma == 0.8
    # the 16 pinned LR milestones
    assert cfg.steps == (3000, 4000, 5000, 5500, 6000, 6500, 7000, 7500,
                         8000, 8500, 9000, 9500, 10000, 10500, 11000, 11500)
    assert cfg.warmup_iters == 200 and cfg.warmup_factor == 0.001
    assert cfg.ims_per_batch == 8
    assert cfg.checkpoint_period == 500 and cfg.eval_period == 200
    # default (non-fast) profile keeps exact NMS
    assert cfg.fast_nms is False
