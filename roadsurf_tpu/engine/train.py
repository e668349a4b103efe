"""Training engine: losses, target assignment, SGD — all fixed-shape XLA.

Reproduces the detectron2 training recipe the reference pins
(detectron2_config_3bands.yaml:268-305 solver; :222-251 RPN sampling;
:177-194 ROI sampling) with a TPU-first design: every sampling step is a
masked top-k over random priorities (no dynamic shapes), the tile batch is
sharded over the ``data`` mesh axis, and the gradient all-reduce is the
psum jit inserts for the mesh-averaged loss.

Ground truth arrives as fixed-size padded tensors per image:
  gt_boxes (G, 4) XYXY, gt_classes (G,), gt_valid (G,),
  gt_masks (G, S, S) uint8 full-tile instance bitmaps
(the tileset generator rasterizes label polygons host-side; mask targets are
then cropped on device — the TF-TPU Mask R-CNN pattern, replacing
detectron2's on-the-fly polygon rasterization).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..models.anchors import all_level_anchors, box_iou, get_deltas
from ..models.config import ModelConfig
from ..models.fpn import fpn_forward
from ..models.mask_rcnn import init_params, preprocess
from ..models.resnet import resnet_forward, stop_gradient_frozen
from ..models.roi_heads import box_head_forward, mask_head_forward
from ..models.rpn import rpn_head_forward, select_proposals


# ---------------------------------------------------------------------------
# matching & sampling (fixed shape)

def match_to_gt(anchors, gt_boxes, gt_valid, thresholds,
                allow_low_quality=False):
    """detectron2 Matcher: returns (matched_gt_idx (N,), label (N,)) with
    label 1=fg, 0=bg, -1=ignore. thresholds=(lo, hi)."""
    iou = box_iou(anchors, gt_boxes)          # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched = jnp.argmax(iou, axis=1)
    max_iou = jnp.max(iou, axis=1)
    lo, hi = thresholds
    label = jnp.where(max_iou >= hi, 1, jnp.where(max_iou < lo, 0, -1))
    label = jnp.where(max_iou <= 0.0, 0, label)  # no valid gt -> background
    if allow_low_quality:
        # anchors that hold the per-GT max IoU are forced positive
        gt_best = jnp.max(iou, axis=0)        # (G,)
        is_best = (iou == gt_best[None, :]) & (gt_best[None, :] > 0) \
            & gt_valid[None, :]
        label = jnp.where(jnp.any(is_best, axis=1), 1, label)
    return matched, label


def subsample(label, num_samples: int, positive_fraction: float, key):
    """detectron2 subsample_labels with static shapes.

    Returns a boolean mask selecting <= num_samples entries: up to
    num_samples*positive_fraction positives (random), rest negatives.
    """
    kp, kn = jax.random.split(key)
    n = label.shape[0]
    pos = label == 1
    neg = label == 0
    pos_quota = int(num_samples * positive_fraction)

    def rank_of(mask, k):
        r = jnp.where(mask, jax.random.uniform(k, (n,)), 2.0)
        order = jnp.argsort(r)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n))
        return jnp.where(mask, rank, n)

    pos_rank = rank_of(pos, kp)
    pos_sel = pos & (pos_rank < pos_quota)
    num_pos = jnp.sum(pos_sel)
    neg_rank = rank_of(neg, kn)
    neg_sel = neg & (neg_rank < num_samples - num_pos)
    return pos_sel, neg_sel


def gather_topk_mask(mask, priority_key, k):
    """Pick the indices of up to k set entries (random order); returns
    (idx (k,), valid (k,))."""
    n = mask.shape[0]
    pri = jnp.where(mask, 1.0 + jax.random.uniform(priority_key, (n,)), 0.0)
    vals, idx = jax.lax.top_k(pri, k)
    return idx, vals > 0.5


# ---------------------------------------------------------------------------
# losses

def smooth_l1(pred, target, beta: float):
    diff = jnp.abs(pred - target)
    if beta <= 1e-8:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def softmax_ce(logits, labels, num_classes):
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes)
    return -jnp.sum(onehot * logp, axis=-1)


def crop_mask_targets(gt_masks, boxes, out: int):
    """Bilinearly crop full-tile instance bitmaps to per-ROI targets.

    gt_masks (M, S, S) float in [0,1] (already gathered per-ROI),
    boxes (M, 4) XYXY in tile coords -> (M, out, out) in {0,1}.
    """
    M, S, _ = gt_masks.shape
    u = (jnp.arange(out, dtype=jnp.float32) + 0.5) / out
    x = boxes[:, 0:1] + u[None, :] * (boxes[:, 2:3] - boxes[:, 0:1])  # (M,out)
    y = boxes[:, 1:2] + u[None, :] * (boxes[:, 3:4] - boxes[:, 1:2])
    px = jnp.clip(x - 0.5, 0.0, S - 1.0)
    py = jnp.clip(y - 0.5, 0.0, S - 1.0)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, S - 1)
    y1 = jnp.minimum(y0 + 1, S - 1)
    wx1 = px - x0
    wy1 = py - y0

    def gather(m, yy, xx):
        return m[yy[:, None], xx[None, :]]

    vals = jax.vmap(lambda m, iy0, iy1, ix0, ix1, wy, wx:
                    (gather(m, iy0, ix0) * ((1 - wy)[:, None] * (1 - wx)[None, :])
                     + gather(m, iy0, ix1) * ((1 - wy)[:, None] * wx[None, :])
                     + gather(m, iy1, ix0) * (wy[:, None] * (1 - wx)[None, :])
                     + gather(m, iy1, ix1) * (wy[:, None] * wx[None, :])))(
        gt_masks, y0, y1, x0, x1, wy1, wx1)
    return (vals >= 0.5).astype(jnp.float32)


# ---------------------------------------------------------------------------
# the training step

def compute_losses(params, batch, key, cfg: ModelConfig, image_size: int):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    images = batch["image"]
    B = images.shape[0]
    S = image_size
    x = preprocess(images, cfg, S).astype(dtype)

    remat = (jax.checkpoint if getattr(cfg, "train_remat", False)
             else (lambda f: f))

    backbone_params = stop_gradient_frozen(params["backbone"], cfg.freeze_at)
    feats = remat(lambda p, h: resnet_forward(p, h, dtype))(
        backbone_params, x)
    fpn_feats = remat(lambda p, f: fpn_forward(p, f, dtype))(
        params["fpn"], feats)

    logits, deltas = rpn_head_forward(params["rpn"], fpn_feats,
                                      cfg.num_anchors, dtype)
    anchors_np = all_level_anchors(S, cfg.fpn_strides, cfg.anchor_sizes,
                                   cfg.anchor_aspect_ratios, cfg.anchor_offset)
    anchors = jnp.asarray(np.concatenate(anchors_np, axis=0), jnp.float32)
    all_logits = jnp.concatenate(logits, axis=1).astype(jnp.float32)
    all_deltas = jnp.concatenate(deltas, axis=1).astype(jnp.float32)

    keys = jax.random.split(key, 2 * B + 2)

    # ---- RPN losses -------------------------------------------------------
    def rpn_one(lg, dl, gt_boxes, gt_valid, k):
        matched, label = match_to_gt(anchors, gt_boxes, gt_valid,
                                     cfg.rpn_iou_thresholds,
                                     allow_low_quality=True)
        pos_sel, neg_sel = subsample(label, cfg.rpn_batch_per_image,
                                     cfg.rpn_positive_fraction, k)
        sel = pos_sel | neg_sel
        obj_loss = jnp.sum(
            jnp.where(sel, bce_with_logits(lg, (label == 1).astype(jnp.float32)),
                      0.0))
        tgt = get_deltas(anchors, gt_boxes[matched], cfg.rpn_bbox_weights)
        reg = jnp.sum(smooth_l1(dl, tgt, cfg.rpn_smooth_l1_beta), axis=-1)
        reg_loss = jnp.sum(jnp.where(pos_sel, reg, 0.0))
        return obj_loss, reg_loss

    obj_losses, reg_losses = jax.vmap(rpn_one)(
        all_logits, all_deltas, batch["gt_boxes"], batch["gt_valid"],
        keys[:B])
    norm = B * cfg.rpn_batch_per_image
    loss_rpn_cls = jnp.sum(obj_losses) / norm
    loss_rpn_reg = jnp.sum(reg_losses) / norm

    # ---- proposals (no grad through RPN outputs) --------------------------
    proposals, prop_scores = select_proposals(
        [jax.lax.stop_gradient(l) for l in logits],
        [jax.lax.stop_gradient(d) for d in deltas],
        anchors_np, S, cfg.rpn_pre_nms_topk_train,
        cfg.rpn_post_nms_topk_train, cfg.rpn_nms_thresh)
    # append GT boxes (PROPOSAL_APPEND_GT, detectron2_config_3bands.yaml:193)
    proposals = jnp.concatenate([proposals, batch["gt_boxes"]], axis=1)

    # ---- ROI sampling -----------------------------------------------------
    # detectron2 samples min(BATCH_SIZE_PER_IMAGE, #candidates): with 1000
    # post-NMS proposals + G gt boxes there can be fewer candidates than the
    # 1024 quota
    T = min(cfg.roi_batch_per_image, proposals.shape[1])

    def roi_sample_one(props, gt_boxes, gt_classes, gt_valid, k):
        matched, label = match_to_gt(props, gt_boxes, gt_valid,
                                     (cfg.roi_iou_threshold,
                                      cfg.roi_iou_threshold))
        k1, k2 = jax.random.split(k)
        pos_sel, neg_sel = subsample(label, T, cfg.roi_positive_fraction, k1)
        idx, valid = gather_topk_mask(pos_sel | neg_sel, k2, T)
        is_pos = pos_sel[idx] & valid
        cls = jnp.where(is_pos, gt_classes[matched[idx]], cfg.num_classes)
        cls = jnp.where(valid, cls, cfg.num_classes)
        return (props[idx], matched[idx], cls, is_pos, valid)

    s_props, s_matched, s_cls, s_pos, s_valid = jax.vmap(roi_sample_one)(
        proposals, batch["gt_boxes"], batch["gt_classes"],
        batch["gt_valid"], keys[B:2 * B])

    # ---- box head ---------------------------------------------------------
    class_logits, box_deltas = remat(
        lambda p, f, b: box_head_forward(p, f, b, cfg, dtype))(
        params["box_head"], fpn_feats[:4], s_props)
    cls_loss_el = softmax_ce(class_logits.astype(jnp.float32), s_cls,
                             cfg.num_classes + 1)
    loss_cls = jnp.sum(jnp.where(s_valid, cls_loss_el, 0.0)) / (B * T)

    matched_boxes = jnp.take_along_axis(batch["gt_boxes"], s_matched[..., None],
                                        axis=1)
    tgt_deltas = get_deltas(s_props, matched_boxes, cfg.box_bbox_weights)
    fg_cls = jnp.clip(s_cls, 0, cfg.num_classes - 1)
    pred_deltas = jnp.take_along_axis(
        box_deltas.astype(jnp.float32),
        fg_cls[..., None, None].repeat(4, axis=-1), axis=2)[:, :, 0, :]
    reg_el = jnp.sum(smooth_l1(pred_deltas, tgt_deltas, 0.0), axis=-1)
    loss_box_reg = jnp.sum(jnp.where(s_pos, reg_el, 0.0)) / (B * T)

    # ---- mask head --------------------------------------------------------
    M = int(T * cfg.roi_positive_fraction)
    cap = int(getattr(cfg, "train_mask_rois", 0) or 0)
    if cap > 0:
        M = min(M, cap)      # static pad budget; see ModelConfig docstring

    def mask_pick_one(props, matched, cls, is_pos, k):
        idx, valid = gather_topk_mask(is_pos, k, M)
        return props[idx], matched[idx], cls[idx], valid

    m_props, m_matched, m_cls, m_valid = jax.vmap(mask_pick_one)(
        s_props, s_matched, s_cls, s_pos,
        jax.random.split(keys[2 * B], B))

    res = 2 * cfg.mask_pooler_resolution

    def mask_tgt_one(gt_masks, matched, props):
        gm = gt_masks[matched].astype(jnp.float32)
        return crop_mask_targets(gm, props, res)

    def mask_branch(mask_params, feats4, props, matched, cls_, valid,
                    gt_masks):
        """Pool + convs + deconv + target crop + masked BCE sum for a
        group of images; returns (loss numerator, #valid ROIs) so chunks
        combine by addition."""
        logits = mask_head_forward(mask_params, feats4, props, cfg, dtype)
        sel = jnp.take_along_axis(
            logits, jnp.clip(cls_, 0, cfg.num_classes - 1)
            [:, :, None, None, None], axis=-1)[..., 0]
        tgt = jax.vmap(mask_tgt_one)(gt_masks, matched, props)
        el = bce_with_logits(sel.astype(jnp.float32), tgt)
        return (jnp.sum(jnp.where(valid[:, :, None, None], el, 0.0)),
                jnp.sum(valid))

    mask_branch_r = remat(mask_branch)
    chunks = int(getattr(cfg, "train_head_chunks", 1) or 1)
    if chunks > 1 and B % chunks == 0:
        C_ = B // chunks
        xs = ([f.reshape(chunks, C_, *f.shape[1:]) for f in fpn_feats[:4]],
              m_props.reshape(chunks, C_, M, 4),
              m_matched.reshape(chunks, C_, M),
              m_cls.reshape(chunks, C_, M),
              m_valid.reshape(chunks, C_, M),
              batch["gt_masks"].reshape(
                  chunks, C_, *batch["gt_masks"].shape[1:]))
        sums, counts = jax.lax.map(
            lambda t: mask_branch_r(params["mask_head"], *t), xs)
        mask_sum, n_valid = jnp.sum(sums), jnp.sum(counts)
    else:
        mask_sum, n_valid = mask_branch_r(
            params["mask_head"], fpn_feats[:4], m_props, m_matched, m_cls,
            m_valid, batch["gt_masks"])
    loss_mask = mask_sum / (jnp.maximum(n_valid, 1) * res * res)

    losses = {
        "loss_rpn_cls": loss_rpn_cls,
        "loss_rpn_loc": loss_rpn_reg,
        "loss_cls": loss_cls,
        "loss_box_reg": loss_box_reg,
        "loss_mask": loss_mask,
    }
    losses["total"] = sum(losses.values())
    return losses


# ---------------------------------------------------------------------------
# optimizer: SGD + momentum + WarmupMultiStepLR (reference solver spec)

def lr_schedule(step, cfg: ModelConfig):
    step = step.astype(jnp.float32)
    warm = jnp.minimum(step / cfg.warmup_iters, 1.0)
    factor = cfg.warmup_factor + (1.0 - cfg.warmup_factor) * warm
    milestones = jnp.asarray(cfg.steps, jnp.float32)
    ndecay = jnp.sum(step >= milestones)
    return cfg.base_lr * factor * (cfg.gamma ** ndecay)


def _is_frozen(path, freeze_at: int = 2) -> bool:
    """FrozenBN affine params never train (detectron2 FrozenBatchNorm), and
    the stem/res2 stages are fully frozen per BACKBONE.FREEZE_AT."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    if "backbone" not in keys:
        return False
    if keys[-1] in ("scale", "bias"):
        return True
    if freeze_at >= 1 and "stem" in keys:
        return True
    if freeze_at >= 2 and "res2" in keys:
        return True
    return False


def init_train_state(key, cfg: ModelConfig, seed: int = 7) -> dict:
    params = init_params(key, cfg)
    return {
        "params": params,
        "velocity": jax.tree.map(jnp.zeros_like, params),
        "step": jnp.zeros((), jnp.int32),
        # sampling seed as STATE, not a compile-time constant: seed sweeps
        # (scripts/ablate_seeded.py) then share one compiled step
        "seed": jnp.asarray(seed, jnp.int32),
    }


def make_train_step(cfg: ModelConfig, image_size: int, seed: int = 7):
    """The per-step sampling noise (RPN/ROI minibatch draws) is keyed by
    fold_in(state seed, step counter) so resume is deterministic and
    independent seed sweeps decorrelate WITHOUT recompiling (the seed
    rides in the train state; the ``seed`` kwarg only serves legacy states
    saved without one)."""
    def step_fn(state, batch):
        base = state.get("seed", jnp.asarray(seed, jnp.int32))
        key = jax.random.fold_in(jax.random.fold_in(
            jax.random.PRNGKey(0), base), state["step"])

        def loss_fn(params):
            losses = compute_losses(params, batch, key, cfg, image_size)
            return losses["total"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state["params"])
        lr = lr_schedule(state["step"], cfg)

        def upd(path, g, v, p):
            if _is_frozen(path, cfg.freeze_at):
                return v, p
            g = g + cfg.weight_decay * p
            v = cfg.momentum * v + g
            return v, p - lr * v

        paths_g = jax.tree_util.tree_flatten_with_path(grads)
        treedef = paths_g[1]
        vs = jax.tree.leaves(state["velocity"])
        ps = jax.tree.leaves(state["params"])
        new_v, new_p = [], []
        for (path, g), v, p in zip(paths_g[0], vs, ps):
            nv, np_ = upd(path, g, v, p)
            new_v.append(nv)
            new_p.append(np_)
        metrics = dict(losses)
        metrics["lr"] = lr
        return ({"params": jax.tree.unflatten(treedef, new_p),
                 "velocity": jax.tree.unflatten(treedef, new_v),
                 "step": state["step"] + 1,
                 "seed": base}, metrics)

    return step_fn


_JITTED_STEPS: dict = {}


def jitted_train_step(cfg: ModelConfig, image_size: int, mesh=None):
    """Process-wide cache of jitted train steps keyed by
    (cfg, image_size, mesh): repeated trainings (seed sweeps, resumed
    runs, tests) reuse one traced/compiled executable."""
    key = (cfg, image_size, mesh)
    if key not in _JITTED_STEPS:
        fn = make_train_step(cfg, image_size)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            _JITTED_STEPS[key] = jax.jit(
                fn,
                in_shardings=(NamedSharding(mesh, P()),
                              NamedSharding(mesh, P("data"))),
                out_shardings=(NamedSharding(mesh, P()), None))
        else:
            _JITTED_STEPS[key] = jax.jit(fn)
    return _JITTED_STEPS[key]


def make_train_scan_step(cfg: ModelConfig, image_size: int, k: int):
    """k optimizer steps inside ONE dispatch: lax.scan over a stacked
    batch dict of (k, B, ...) arrays. The host pays one dispatch + one
    metrics fetch per k steps — on dispatch-latency-bound links (the
    tunneled dev chip; any remote host) this exposes the device-bound
    step time the per-step loop hides. Returns (state, metrics of the
    last step)."""
    step = make_train_step(cfg, image_size)

    def fn(state, batches):
        def body(st, b):
            return step(st, b)

        state, ms = jax.lax.scan(body, state, batches)
        return state, jax.tree.map(lambda x: x[-1], ms)

    return fn
