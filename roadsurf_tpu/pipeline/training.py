"""train_model: Mask R-CNN training over the generated COCO tilesets.

Native replacement for the external object-detector's train_model.py stage
(reference config_obj_detec.yaml:62-72; solver pinned at
detectron2_config_3bands.yaml:268-305): SGD momentum 0.9, BASE_LR 0.01,
WarmupMultiStepLR γ=0.8 over 16 milestones, MAX_ITER 12000, batch 8,
checkpoint every 500 iters, eval every 200.

TPU-first design decisions (vs detectron2's variable-size GPU loader):
* fixed-shape batches — tiles stay at their native resolution and are
  augmented by random flip + scale-jitter-and-crop back to a constant S,
  so one jit compilation serves the whole run (no aspect-ratio grouping,
  no per-size retraces);
* ground truth is padded to a fixed number of instances per image; masks
  are full-tile bitmaps rasterized host-side by the C++ geometry core and
  cropped to boxes on device (the TF-TPU Mask R-CNN pattern);
* the tile batch shards over the ``data`` mesh axis; the gradient psum is
  inserted by jit from the mesh-averaged loss;
* a background prefetch thread keeps the host→device feed ahead of the
  step (double buffering replacing detectron2's worker processes).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time

import numpy as np

from ..geom import _native as N
from ..io.geotiff import read_geotiff
from ..models.config import ModelConfig
from ..utils.checkpoint import save_params
from ..utils.logging import logger
from ..utils.misc import ensure_dir_exists


# ---------------------------------------------------------------------------
# COCO dataset → fixed-shape samples

class CocoTileDataset:
    """Loads a COCO tileset (images + polygon annotations) into memory-light
    index form; samples are materialized on demand."""

    def __init__(self, coco_path: str, images_dir: str,
                 max_instances: int = 16):
        with open(coco_path) as f:
            coco = json.load(f)
        self.images_dir = images_dir
        self.max_instances = max_instances
        self.images = coco["images"]
        self.anns_by_image: dict[int, list] = {}
        for ann in coco["annotations"]:
            self.anns_by_image.setdefault(ann["image_id"], []).append(ann)
        # category_id is 1-based in COCO; det classes are 0-based
        self.cat_to_class = {c["id"]: i for i, c in
                             enumerate(sorted(coco["categories"],
                                              key=lambda c: c["id"]))}

    def __len__(self):
        return len(self.images)

    def load(self, idx: int):
        """Returns (image HWC uint8, boxes (G,4), classes (G,), valid (G,),
        masks (G,H,W) uint8) padded to max_instances."""
        info = self.images[idx]
        r = read_geotiff(os.path.join(self.images_dir, info["file_name"]))
        img = r.data[:, :, :3]
        H, W = img.shape[:2]
        G = self.max_instances
        boxes = np.zeros((G, 4), np.float32)
        classes = np.zeros((G,), np.int32)
        valid = np.zeros((G,), bool)
        masks = np.zeros((G, H, W), np.uint8)
        anns = self.anns_by_image.get(info["id"], [])[:G]
        for i, ann in enumerate(anns):
            x, y, w, h = ann["bbox"]
            boxes[i] = (x, y, x + w, y + h)
            classes[i] = self.cat_to_class[ann["category_id"]]
            valid[i] = True
            rings = [np.asarray(ring, np.float64).reshape(-1, 2)
                     for ring in ann["segmentation"]]
            flat = N.pack([[_close(r) for r in rings]])
            N.rasterize(flat, 0.0, 1.0, 0.0, 1.0, H, W, out=masks[i])
        return img, boxes, classes, valid, masks


def _close(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.concatenate([ring, ring[:1]])
    return ring


# ---------------------------------------------------------------------------
# augmentation (host, numpy)

def resize_sample(img, boxes, masks, target: int):
    """detectron2 ResizeShortestEdge for square tiles: bilinear image
    resize to target x target, nearest for masks, boxes scaled."""
    from PIL import Image
    H, W = img.shape[:2]
    if H == target and W == target:
        return img, boxes, masks
    sy, sx = target / H, target / W     # per-axis: tiles are square in the
    img = np.asarray(Image.fromarray(img).resize((target, target),
                                                 Image.BILINEAR))
    if masks.shape[0]:
        masks = np.stack([np.asarray(
            Image.fromarray(m * 255).resize((target, target), Image.NEAREST))
            for m in masks]) // 255
    else:
        masks = np.zeros((0, target, target), masks.dtype)
    scale = np.asarray([sx, sy, sx, sy], np.float32)  # XYXY box layout
    return img, (boxes * scale).astype(np.float32), masks


def augment_sample(rng: np.random.Generator, img, boxes, classes, valid,
                   masks, scale_range=(0.8, 1.25), target_size=None):
    """Random horizontal flip, then either the reference's multiscale
    resize (``target_size`` set — detectron2 MIN_SIZE_TRAIN choice,
    detectron2_config_3bands.yaml:31-38) or the fixed-shape equivalent
    (scale jitter with crop/pad back to the native size)."""
    H, W = img.shape[:2]
    # flip
    if rng.random() < 0.5:
        img = img[:, ::-1]
        masks = masks[:, :, ::-1]
        flipped = boxes.copy()
        flipped[:, 0] = W - boxes[:, 2]
        flipped[:, 2] = W - boxes[:, 0]
        boxes = flipped
    if target_size is not None:
        img, boxes, masks = resize_sample(img, boxes, masks, target_size)
        return img, boxes, classes, valid, masks
    # scale jitter
    s = rng.uniform(*scale_range)
    if abs(s - 1.0) > 1e-3:
        from PIL import Image
        nh, nw = max(int(round(H * s)), 1), max(int(round(W * s)), 1)
        img_r = np.asarray(Image.fromarray(img).resize((nw, nh),
                                                       Image.BILINEAR))
        masks_r = np.stack([np.asarray(
            Image.fromarray(m * 255).resize((nw, nh), Image.NEAREST))
            for m in masks]) // 255 if masks.shape[0] else masks
        boxes = boxes * s
        if s >= 1.0:   # random crop back to (H, W)
            oy = rng.integers(0, nh - H + 1)
            ox = rng.integers(0, nw - W + 1)
            img = img_r[oy:oy + H, ox:ox + W]
            masks = masks_r[:, oy:oy + H, ox:ox + W]
            boxes = boxes - [ox, oy, ox, oy]
        else:          # pad to (H, W)
            img = np.zeros((H, W, img.shape[2]), img.dtype)
            img[:nh, :nw] = img_r
            m2 = np.zeros((masks.shape[0], H, W), masks.dtype)
            m2[:, :nh, :nw] = masks_r
            masks = m2
        boxes = np.clip(boxes, 0, [W, H, W, H]).astype(np.float32)
        # drop degenerate boxes
        degel = (boxes[:, 2] - boxes[:, 0] < 1) | \
            (boxes[:, 3] - boxes[:, 1] < 1)
        valid = valid & ~degel
    return img, boxes.astype(np.float32), classes, valid, masks


# ---------------------------------------------------------------------------
# batching + prefetch

def make_batch(ds: CocoTileDataset, rng: np.random.Generator,
               indices: np.ndarray, augment: bool = True,
               target_size: int | None = None) -> dict:
    imgs, bs, cs, vs, ms = [], [], [], [], []
    for i in indices:
        sample = ds.load(int(i))
        if augment:
            sample = augment_sample(rng, *sample, target_size=target_size)
        elif target_size is not None:
            img, b, c, v, m = sample
            img, b, m = resize_sample(img, b, m, target_size)
            sample = (img, b, c, v, m)
        img, b, c, v, m = sample
        imgs.append(img)
        bs.append(b)
        cs.append(c)
        vs.append(v)
        ms.append(m)
    return {"image": np.stack(imgs), "gt_boxes": np.stack(bs),
            "gt_classes": np.stack(cs), "gt_valid": np.stack(vs),
            "gt_masks": np.stack(ms)}


class Prefetcher:
    """Background-thread batch producer (double-buffered host feed)."""

    def __init__(self, ds: CocoTileDataset, batch_size: int, seed: int = 0,
                 depth: int = 2, augment: bool = True,
                 sizes: tuple | None = None):
        self.ds = ds
        self.batch_size = batch_size
        self.augment = augment
        self.sizes = sizes        # multiscale: one random size per batch
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self.rng = np.random.default_rng(seed)
        self.stop = threading.Event()
        self.thread = threading.Thread(target=self._work, daemon=True)
        self.thread.start()

    def _work(self):
        try:
            self._produce()
        except BaseException as e:   # surface loader failures to next()
            self.q.put(e)

    def _produce(self):
        order = np.arange(len(self.ds))
        pos = len(order)
        while not self.stop.is_set():
            idx = []
            while len(idx) < self.batch_size:
                if pos >= len(order):
                    self.rng.shuffle(order)
                    pos = 0
                idx.append(order[pos])
                pos += 1
            target = (int(self.rng.choice(self.sizes))
                      if self.sizes else None)
            batch = make_batch(self.ds, self.rng, np.asarray(idx),
                               self.augment, target_size=target)
            while not self.stop.is_set():
                try:
                    self.q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next(self) -> dict:
        item = self.q.get()
        if isinstance(item, BaseException):
            raise RuntimeError("prefetcher worker failed") from item
        return item

    def close(self):
        self.stop.set()


# ---------------------------------------------------------------------------
# training loop

def train(cfg: ModelConfig, trn_coco: str, trn_images: str, log_dir: str,
          val_coco: str | None = None, val_images: str | None = None,
          max_iter: int | None = None, batch_size: int | None = None,
          image_size: int = 256, max_instances: int = 16,
          init_checkpoint: str | None = None, log_every: int = 20,
          mesh=None, seed: int = 7, multiscale: bool | None = None) -> dict:
    """Run the training loop; returns the final train state (host).

    ``multiscale=True`` reproduces the reference's MIN_SIZE_TRAIN
    multiscale-choice augmentation (detectron2_config_3bands.yaml:31-38):
    each batch is resized to one of ``cfg.min_size_train`` and runs
    through a per-size jitted step (a handful of compile shapes — the
    TPU-shaped equivalent of detectron2's variable-size loader).
    ``multiscale=None`` derives it from the model config's INPUT block:
    on iff ``image_size`` is one of the pinned MIN_SIZE_TRAIN choices and
    there is more than one — so reference-geometry runs train multiscale
    by default while explicit small-tile runs (image_size=256) keep the
    single-shape flip + scale-jitter-crop pipeline.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..engine.train import init_train_state, jitted_train_step

    ensure_dir_exists(log_dir)
    max_iter = max_iter or cfg.max_iter
    batch_size = batch_size or cfg.ims_per_batch

    ds = CocoTileDataset(trn_coco, trn_images, max_instances)
    if not len(ds):
        raise ValueError(f"empty training set: {trn_coco}")
    logger.info(f"training on {len(ds)} tiles, batch {batch_size}, "
                f"{max_iter} iters")

    state = init_train_state(jax.random.PRNGKey(seed), cfg, seed=seed)
    start_iter = 0
    from ..utils.checkpoint import latest_checkpoint, load_params
    resume = latest_checkpoint(log_dir)
    if resume:
        # file-level re-entrancy, like every other pipeline stage: a run
        # restarted on the same log dir resumes from its newest checkpoint
        loaded, step0 = load_params(resume)
        from ..utils.d2_convert import merge_params
        state["params"], _ = merge_params(
            jax.device_get(state["params"]), loaded)
        start_iter = step0 or 0
        state["step"] = jnp.asarray(start_iter, jnp.int32)
        logger.info(f"resuming from {resume} at iter {start_iter}")
    elif init_checkpoint and os.path.exists(init_checkpoint):
        from ..utils.d2_convert import merge_params
        loaded, _ = load_params(init_checkpoint)
        state["params"], _ = merge_params(
            jax.device_get(state["params"]), loaded)
        logger.info(f"warm start from {init_checkpoint}")

    if multiscale is None:
        choices = set(cfg.min_size_train)
        multiscale = len(choices) > 1 and image_size in choices
    sizes = tuple(cfg.min_size_train) if multiscale else (image_size,)

    def step_for(sz):
        # process-wide cache: seed sweeps / resumed runs reuse compiles
        return jitted_train_step(cfg, sz, mesh)

    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
        batch_sharding = NamedSharding(mesh, P("data"))
    else:
        batch_sharding = None

    feeder = Prefetcher(ds, batch_size, seed=seed,
                        sizes=sizes if multiscale else None)
    val_feeder = None
    val_ds = None
    if val_coco and os.path.exists(val_coco):
        val_ds = CocoTileDataset(val_coco, val_images, max_instances)
        if len(val_ds):
            val_feeder = Prefetcher(val_ds, batch_size, seed=99,
                                    augment=False, sizes=(image_size,))
        else:
            val_ds = None

    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    mf = open(metrics_path, "a")
    tb = None
    try:        # TensorBoard events like the reference trainer (optional)
        from torch.utils.tensorboard import SummaryWriter
        tb = SummaryWriter(log_dir)
    except ImportError:
        pass

    def emit(tag_values: dict, it: int):
        mf.write(json.dumps(dict(tag_values, iter=it)) + "\n")
        mf.flush()
        if tb is not None:
            for k, v in tag_values.items():
                if isinstance(v, (int, float)):
                    tb.add_scalar(k, v, it)

    from ..engine.train import compute_losses
    val_loss_fn = jax.jit(lambda p, b: compute_losses(
        p, b, jax.random.PRNGKey(0), cfg, image_size))

    # COCO-style AP at eval_period — the reference trainer's periodic
    # COCOEvaluator pass (detectron2_config_3bands.yaml:322). Inference
    # runs at the training tile size so the in-loop graph is one shape.
    from dataclasses import replace as _replace

    from ..engine.coco_eval import evaluate_dataset
    eval_cfg = _replace(cfg, min_size_test=image_size,
                        max_size_test=image_size)
    samples_dir = os.path.join(log_dir, "samples")

    def detection_eval(it: int) -> dict:
        ap = evaluate_dataset(state["params"], eval_cfg, val_ds,
                              image_size, batch_size=batch_size,
                              viz_dir=samples_dir, viz_count=4,
                              viz_tag=f"{it:06d}")
        return {f"val_{k}": v for k, v in ap.items()}

    t0 = time.time()
    try:
        for it in range(start_iter, max_iter):
            batch = feeder.next()
            if batch_sharding is not None:
                batch = {k: jax.device_put(v, batch_sharding)
                         for k, v in batch.items()}
            state, metrics = step_for(batch["image"].shape[1])(state, batch)

            if (it + 1) % log_every == 0 or it == 0:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                m["iter"] = it + 1
                m["imgs_per_sec"] = round(
                    batch_size * min(it + 1, log_every)
                    / max(time.time() - t0, 1e-9), 2)
                t0 = time.time()
                it_num = m.pop("iter")
                emit(m, it_num)
                logger.info(f"iter {it + 1}/{max_iter} "
                            f"total={m['total']:.3f} lr={m['lr']:.5f} "
                            f"({m['imgs_per_sec']} img/s)")

            if val_feeder is not None and (it + 1) % cfg.eval_period == 0:
                vb = val_feeder.next()
                if batch_sharding is not None:
                    vb = {k: jax.device_put(v, batch_sharding)
                          for k, v in vb.items()}
                vm = val_loss_fn(state["params"], vb)
                v = {f"val_{k}": float(x)
                     for k, x in jax.device_get(vm).items()}
                v.update(detection_eval(it + 1))
                emit(v, it + 1)
                logger.info(f"eval @{it + 1}: val_total={v['val_total']:.3f} "
                            f"bbox_AP={v.get('val_bbox/AP')} "
                            f"segm_AP={v.get('val_segm/AP')}")

            if (it + 1) % cfg.checkpoint_period == 0 or it + 1 == max_iter:
                p = os.path.join(log_dir, f"model_{it:07d}.npz")
                save_params(p, jax.device_get(state["params"]), step=it + 1)
                logger.info(f"checkpoint: {p}")
    finally:
        feeder.close()
        if val_feeder:
            val_feeder.close()
        mf.close()
        if tb is not None:
            tb.close()
    return jax.device_get(state)


# ---------------------------------------------------------------------------
# driver: ``train_model.py`` YAML block

def run(cfg: dict, max_iter: int | None = None,
        batch_size: int | None = None, n_devices: int | None = None):
    import jax
    from jax.sharding import Mesh

    from ..models.config import from_detectron2_yaml

    wd = cfg["working_directory"]
    log_dir = os.path.join(wd, cfg.get("log_subfolder", "logs"))
    d2_yaml = os.path.join(wd, cfg["detectron2_config_file"])
    model_cfg = from_detectron2_yaml(d2_yaml)

    coco = cfg["COCO_files"]
    trn = os.path.join(wd, coco["trn"])
    val = os.path.join(wd, coco.get("val", "")) if coco.get("val") else None

    init_ckpt = None
    mw = cfg.get("model_weights", {}) or {}
    url = mw.get("model_zoo_checkpoint_url", "")
    for cand in (url, os.path.join(wd, os.path.basename(str(url)))):
        if cand and os.path.exists(str(cand)):
            init_ckpt = str(cand)
            break

    devices = jax.devices()
    n = n_devices or len(devices)
    mesh = Mesh(np.asarray(devices[:n]).reshape(n), axis_names=("data",)) \
        if n > 1 else None

    # the reference's multiscale-resize augmentation is on whenever the
    # detectron2 YAML pins more than one MIN_SIZE_TRAIN choice; a
    # ``multiscale: false`` block entry opts into the single-shape
    # jitter-crop pipeline instead
    multiscale = bool(cfg.get("multiscale",
                              len(set(model_cfg.min_size_train)) > 1))
    image_size = int(cfg.get("image_size",
                             model_cfg.min_size_train[-1] if multiscale
                             else 256))
    return train(model_cfg, trn, os.path.join(wd, "trn-images"), log_dir,
                 val_coco=val, val_images=os.path.join(wd, "val-images"),
                 max_iter=max_iter, batch_size=batch_size,
                 image_size=image_size, init_checkpoint=init_ckpt,
                 mesh=mesh, seed=int(cfg.get("seed", 7)),
                 multiscale=multiscale)
