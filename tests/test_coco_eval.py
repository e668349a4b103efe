"""COCO-AP evaluator unit tests (engine/coco_eval.py) — metric semantics
pinned against hand-computed cases of the standard COCO protocol
(score-ordered greedy matching, IoU grid 0.50:0.95, 101-pt interpolation),
the contract of the reference trainer's periodic COCOEvaluator pass
(reference config/detectron2_config_3bands.yaml:322)."""

import numpy as np
import pytest

from roadsurf_tpu.engine.coco_eval import (APAccumulator, box_iou_matrix,
                                           mask_iou_matrix, paste_mask)


def _sq(x0, y0, x1, y1):
    return np.asarray([x0, y0, x1, y1], np.float32)


def test_box_iou_matrix():
    a = np.stack([_sq(0, 0, 10, 10), _sq(0, 0, 5, 10)])
    b = np.stack([_sq(0, 0, 10, 10), _sq(5, 0, 10, 10)])
    iou = box_iou_matrix(a, b)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(0.5)
    assert iou[1, 1] == pytest.approx(0.0)


def test_perfect_detection_ap_is_1():
    acc = APAccumulator(num_classes=2)
    gt = np.stack([_sq(0, 0, 10, 10), _sq(20, 20, 40, 40)])
    iou = box_iou_matrix(gt, gt)
    acc.add_image(det_classes=[0, 1], det_scores=[0.9, 0.8], iou=iou,
                  gt_classes=[0, 1])
    s = acc.summarize()
    assert s["AP"] == pytest.approx(1.0)
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AP75"] == pytest.approx(1.0)


def test_high_scoring_false_positive_halves_ap():
    # FP outranks the TP: precision at full recall is 1/2 everywhere
    acc = APAccumulator(num_classes=1)
    gt = np.stack([_sq(0, 0, 10, 10)])
    dets = np.stack([_sq(50, 50, 60, 60), _sq(0, 0, 10, 10)])
    acc.add_image([0, 0], [0.9, 0.8], box_iou_matrix(dets, gt), [0])
    s = acc.summarize()
    assert s["AP"] == pytest.approx(0.5)


def test_localization_quality_graded_by_iou_grid():
    # det overlaps gt at IoU 0.6 -> counts only at t in {.5,.55,.6}
    acc = APAccumulator(num_classes=1)
    gt = np.stack([_sq(0, 0, 10, 10)])
    det = np.stack([_sq(0, 0, 10, 6.0)])      # IoU 0.6 exactly
    iou = box_iou_matrix(det, gt)
    assert iou[0, 0] == pytest.approx(0.6)
    acc.add_image([0], [0.9], iou, [0])
    s = acc.summarize()
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AP75"] == pytest.approx(0.0)
    assert s["AP"] == pytest.approx(0.3)


def test_missed_gt_lowers_recall():
    # 2 GT, 1 detected: AP uses precision up to recall 0.5 only
    acc = APAccumulator(num_classes=1)
    gt = np.stack([_sq(0, 0, 10, 10), _sq(30, 30, 50, 50)])
    det = np.stack([_sq(0, 0, 10, 10)])
    acc.add_image([0], [0.9], box_iou_matrix(det, gt), [0, 0])
    s = acc.summarize()
    # 101-pt grid: precision 1.0 on the 51 points with rc <= 0.5
    assert s["AP50"] == pytest.approx(51 / 101, abs=1e-3)


def test_greedy_matching_prefers_highest_iou():
    # one det overlapping two GTs must take the better one, leaving the
    # other unmatched (not double-counted)
    acc = APAccumulator(num_classes=1)
    gt = np.stack([_sq(0, 0, 10, 10), _sq(2, 0, 12, 10)])
    det = np.stack([_sq(2, 0, 12, 10)])
    acc.add_image([0], [0.9], box_iou_matrix(det, gt), [0, 0])
    s = acc.summarize()
    assert s["AP75"] == pytest.approx(51 / 101, abs=1e-3)


def test_classes_are_independent():
    acc = APAccumulator(num_classes=2)
    gt = np.stack([_sq(0, 0, 10, 10)])
    det = np.stack([_sq(0, 0, 10, 10)])
    # detection of the WRONG class never matches the class-0 gt
    acc.add_image([1], [0.9], box_iou_matrix(det, gt), [0])
    s = acc.summarize()
    assert s["AP"] == pytest.approx(0.0)


def test_paste_mask_fills_box():
    prob = np.ones((28, 28), np.float32)
    m = paste_mask(prob, _sq(4, 6, 12, 16), 32, 32)
    assert m[6:16, 4:12].all()
    assert m.sum() == 10 * 8


def test_paste_mask_clips_to_canvas():
    prob = np.ones((28, 28), np.float32)
    m = paste_mask(prob, _sq(-5, -5, 5, 5), 16, 16)
    assert m[0:5, 0:5].all()
    assert m.sum() == 25


def test_mask_iou_matrix():
    a = np.zeros((16, 16), bool)
    a[:8] = True
    b = np.zeros((16, 16), bool)
    b[4:12] = True
    iou = mask_iou_matrix([a], np.stack([b, a]))
    assert iou[0, 0] == pytest.approx((4 * 16) / (12 * 16))
    assert iou[0, 1] == pytest.approx(1.0)


@pytest.mark.slow
def test_evaluate_dataset_end_to_end_smoke():
    """Full evaluate_dataset drive with a stubbed dataset + tiny model."""
    import jax

    from dataclasses import replace
    from roadsurf_tpu.engine.coco_eval import evaluate_dataset
    from roadsurf_tpu.models import fast_profile, init_params

    cfg = replace(fast_profile(post_nms_topk=8, detections_per_image=4),
                  min_size_test=64, max_size_test=64,
                  rpn_pre_nms_topk_test=32, pallas_pooler=False)
    params = init_params(jax.random.PRNGKey(0), cfg)

    class StubDS:
        def __len__(self):
            return 3

        def load(self, i):
            rng = np.random.default_rng(i)
            img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
            boxes = np.asarray([[8, 8, 30, 30]], np.float32)
            classes = np.asarray([0], np.int32)
            valid = np.asarray([True])
            masks = np.zeros((1, 64, 64), np.uint8)
            masks[0, 8:30, 8:30] = 1
            return img, boxes, classes, valid, masks

    out = evaluate_dataset(params, cfg, StubDS(), 64, batch_size=2)
    for k in ("bbox/AP", "bbox/AP50", "bbox/AP75",
              "segm/AP", "segm/AP50", "segm/AP75"):
        assert k in out
        assert 0.0 <= out[k] <= 1.0
