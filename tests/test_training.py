"""Training pipeline tests: COCO loading + rasterized mask targets,
augmentation geometry, LR schedule parity, and a short smoke train run on
the virtual CPU mesh."""

import json
import os

import numpy as np
import pytest

from roadsurf_tpu.pipeline.training import (CocoTileDataset, Prefetcher,
                                            augment_sample, make_batch)


def _mini_coco(tmp_path, n_images=4, size=64):
    from roadsurf_tpu.io.geotiff import write_geotiff
    img_dir = tmp_path / "trn-images"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        fn = f"18_{1000 + i}_2000.tif"
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        write_geotiff(str(img_dir / fn), arr, (0, 0, size, size))
        images.append({"id": i + 1, "file_name": fn,
                       "width": size, "height": size})
        # one square instance per image
        x0, y0 = 8 + i, 10
        ring = [x0, y0, x0 + 20, y0, x0 + 20, y0 + 16, x0, y0 + 16]
        annotations.append({"id": aid, "image_id": i + 1,
                            "category_id": 1 + i % 2,
                            "segmentation": [ring],
                            "bbox": [x0, y0, 20, 16],
                            "area": 320, "iscrowd": 0})
        aid += 1
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "artificial",
                            "supercategory": "road"},
                           {"id": 2, "name": "natural",
                            "supercategory": "road"}]}
    p = tmp_path / "COCO_trn.json"
    p.write_text(json.dumps(coco))
    return str(p), str(img_dir)


def test_dataset_loads_masks(tmp_path):
    coco, img_dir = _mini_coco(tmp_path)
    ds = CocoTileDataset(coco, img_dir, max_instances=4)
    assert len(ds) == 4
    img, boxes, classes, valid, masks = ds.load(0)
    assert img.shape == (64, 64, 3)
    assert valid.sum() == 1
    np.testing.assert_allclose(boxes[0], [8, 10, 28, 26])
    # rasterized mask matches the bbox area
    assert masks[0].sum() == 20 * 16
    assert masks[0][10, 8] == 1 and masks[0][9, 8] == 0


def test_augment_flip_consistency(tmp_path):
    coco, img_dir = _mini_coco(tmp_path)
    ds = CocoTileDataset(coco, img_dir, max_instances=4)
    sample = ds.load(0)
    rng = np.random.default_rng(5)
    for _ in range(10):
        img, boxes, classes, valid, masks = augment_sample(rng, *sample)
        assert img.shape == sample[0].shape
        assert masks.shape == sample[4].shape
        for g in range(4):
            if not valid[g]:
                continue
            x0, y0, x1, y1 = boxes[g]
            assert 0 <= x0 < x1 <= 64 and 0 <= y0 < y1 <= 64
            # mask stays (mostly) inside the box
            ys, xs = np.nonzero(masks[g])
            if len(xs):
                assert xs.min() >= x0 - 2 and xs.max() <= x1 + 2
                assert ys.min() >= y0 - 2 and ys.max() <= y1 + 2


def test_lr_schedule_matches_reference():
    import jax.numpy as jnp
    from roadsurf_tpu.engine.train import lr_schedule
    from roadsurf_tpu.models.config import ModelConfig
    cfg = ModelConfig()
    # warmup: factor ramps 0.001 -> 1 over 200 iters
    assert float(lr_schedule(jnp.asarray(0), cfg)) == \
        pytest.approx(0.01 * 0.001)
    assert float(lr_schedule(jnp.asarray(200), cfg)) == pytest.approx(0.01)
    # after the first milestone (3000): one gamma decay
    assert float(lr_schedule(jnp.asarray(3500), cfg)) == \
        pytest.approx(0.01 * 0.8)
    # after all 16 milestones
    assert float(lr_schedule(jnp.asarray(11900), cfg)) == \
        pytest.approx(0.01 * 0.8 ** 16)


@pytest.mark.slow
def test_short_training_run(tmp_path):
    """Two optimizer steps on the 8-device CPU mesh: losses finite and
    checkpoint written."""
    import jax
    from jax.sharding import Mesh
    from dataclasses import replace
    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.pipeline.training import train

    coco, img_dir = _mini_coco(tmp_path, n_images=8, size=64)
    cfg = replace(fast_profile(post_nms_topk=32),
                  min_size_test=64, max_size_test=64,
                  roi_batch_per_image=32, rpn_batch_per_image=16,
                  detections_per_image=8, checkpoint_period=2,
                  eval_period=1000)
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    state = train(cfg, coco, img_dir, str(tmp_path / "logs"),
                  max_iter=2, batch_size=8, image_size=64,
                  max_instances=4, mesh=mesh, log_every=1)
    assert int(state["step"]) == 2
    assert os.path.exists(str(tmp_path / "logs" / "model_0000001.npz"))
    lines = [json.loads(l) for l in
             open(tmp_path / "logs" / "metrics.jsonl")]
    assert all(np.isfinite(l["total"]) for l in lines if "total" in l)


@pytest.mark.slow
def test_mask_branch_chunking_equivalent():
    """train_head_chunks=2 (lax.map over image chunks) must produce the
    same losses as the unchunked path — it only regroups the same math."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.engine.train import compute_losses, init_train_state

    cfg = replace(fast_profile(post_nms_topk=32),
                  min_size_test=64, max_size_test=64,
                  roi_batch_per_image=32, rpn_batch_per_image=16)
    rng = np.random.default_rng(3)
    B, size, G = 4, 64, 4
    boxes = np.zeros((B, G, 4), np.float32)
    masks = np.zeros((B, G, size, size), np.uint8)
    for b in range(B):
        x0, y0 = rng.uniform(4, 30, 2)
        boxes[b, 0] = (x0, y0, x0 + 20, y0 + 16)
        masks[b, 0, int(y0):int(y0) + 16, int(x0):int(x0) + 20] = 1
    batch = {
        "image": rng.integers(0, 255, (B, size, size, 3), np.uint8),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.zeros((B, G), jnp.int32),
        "gt_valid": jnp.asarray(
            np.arange(G)[None, :] < 1).repeat(B, axis=0),
        "gt_masks": jnp.asarray(masks),
    }
    params = init_train_state(jax.random.PRNGKey(0), cfg)["params"]
    key = jax.random.PRNGKey(11)
    ref = compute_losses(params, batch, key, cfg, size)
    chunked = compute_losses(
        params, batch, key, replace(cfg, train_head_chunks=2), size)
    # bf16 compute under different fusion boundaries (lax.map vs inline)
    # rounds differently at ~1e-4 relative; the math is identical
    for k in ref:
        np.testing.assert_allclose(np.float64(chunked[k]),
                                   np.float64(ref[k]), rtol=5e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_training_resume(tmp_path):
    """Restarting on the same log dir resumes from the newest checkpoint."""
    import jax
    from dataclasses import replace
    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.pipeline.training import train

    coco, img_dir = _mini_coco(tmp_path, n_images=4, size=64)
    cfg = replace(fast_profile(post_nms_topk=32),
                  min_size_test=64, max_size_test=64,
                  roi_batch_per_image=32, rpn_batch_per_image=16,
                  detections_per_image=8, checkpoint_period=1,
                  eval_period=1000)
    log_dir = str(tmp_path / "logs")
    state = train(cfg, coco, img_dir, log_dir, max_iter=1, batch_size=4,
                  image_size=64, max_instances=4, log_every=1)
    assert int(state["step"]) == 1
    state2 = train(cfg, coco, img_dir, log_dir, max_iter=3, batch_size=4,
                   image_size=64, max_instances=4, log_every=1)
    assert int(state2["step"]) == 3
    assert os.path.exists(os.path.join(log_dir, "model_0000002.npz"))


@pytest.mark.slow
def test_multiscale_derived_from_input_block(tmp_path):
    """The reference trains with MIN_SIZE_TRAIN multiscale choice 640-800
    (detectron2_config_3bands.yaml:31-38). train(multiscale=None) must
    derive the multiscale pipeline from the config's INPUT block — on when
    image_size is one of several pinned choices — and every batch must run
    at one of those static shapes (per-size jitted steps, no dynamic
    shapes)."""
    from dataclasses import replace
    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.pipeline import training as tr

    coco, img_dir = _mini_coco(tmp_path, n_images=8, size=64)
    # two tiny multiscale choices stand in for the reference's 640-800 set
    # (both divisible by stride 32 so the FPN top-down shapes line up)
    cfg = replace(fast_profile(post_nms_topk=16),
                  min_size_train=(64, 96),
                  min_size_test=64, max_size_test=64,
                  roi_batch_per_image=16, rpn_batch_per_image=8,
                  detections_per_image=4, checkpoint_period=1000,
                  eval_period=1000)

    from roadsurf_tpu.engine import train as eng_train

    seen = []
    orig = eng_train.jitted_train_step

    def spy(cfg_, size, mesh=None):
        seen.append(size)
        return orig(cfg_, size, mesh)

    eng_train.jitted_train_step = spy
    try:
        # image_size in the choice set + >1 choices => multiscale ON
        tr.train(cfg, coco, img_dir, str(tmp_path / "ms_logs"),
                 max_iter=8, batch_size=4, image_size=64,
                 max_instances=4, log_every=10)
    finally:
        eng_train.jitted_train_step = orig
    assert set(seen) <= {64, 96}, seen     # only the pinned static shapes
    assert len(set(seen)) == 2, seen       # both choices exercised

    # image_size OUTSIDE the choice set => multiscale derived off: one
    # static shape, the dataset's native tile size
    seen.clear()
    eng_train.jitted_train_step = spy
    try:
        tr.train(replace(cfg, min_size_train=(64, 96)), coco, img_dir,
                 str(tmp_path / "ss_logs"), max_iter=1, batch_size=4,
                 image_size=32, max_instances=4, log_every=10)
    finally:
        eng_train.jitted_train_step = orig
    assert len(set(seen)) == 1, seen


@pytest.mark.slow
def test_mask_roi_cap_matches_exact_when_under_cap():
    """train_mask_rois caps the padded mask-branch budget. When fewer
    positives exist than the cap, the selected ROI set and every loss are
    identical to the exact detectron2 cap (train_mask_rois=0) — the cap
    only removes padding compute."""
    import jax
    import jax.numpy as jnp
    from dataclasses import replace
    from roadsurf_tpu.models.config import fast_profile
    from roadsurf_tpu.engine.train import compute_losses, init_train_state

    cfg = replace(fast_profile(post_nms_topk=32),
                  min_size_test=64, max_size_test=64,
                  roi_batch_per_image=64, rpn_batch_per_image=16)
    rng = np.random.default_rng(3)
    B, size, G = 2, 64, 4
    boxes = np.zeros((B, G, 4), np.float32)
    masks = np.zeros((B, G, size, size), np.uint8)
    for b in range(B):
        x0, y0 = rng.uniform(4, 30, 2)
        boxes[b, 0] = (x0, y0, x0 + 20, y0 + 16)
        masks[b, 0, int(y0):int(y0) + 16, int(x0):int(x0) + 20] = 1
    batch = {
        "image": rng.integers(0, 255, (B, size, size, 3), np.uint8),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.zeros((B, G), jnp.int32),
        "gt_valid": jnp.asarray(np.arange(G)[None, :] < 1).repeat(B, axis=0),
        "gt_masks": jnp.asarray(masks),
    }
    params = init_train_state(jax.random.PRNGKey(0), cfg)["params"]
    key = jax.random.PRNGKey(11)
    exact = compute_losses(params, batch, key,
                           replace(cfg, train_mask_rois=0), size)
    capped = compute_losses(params, batch, key,
                            replace(cfg, train_mask_rois=8), size)
    for k in exact:
        np.testing.assert_allclose(np.float64(capped[k]),
                                   np.float64(exact[k]), rtol=1e-6,
                                   err_msg=k)
