"""Stage-by-stage throughput profile of the fast-profile inference graph.

Times cumulative sub-graphs of the Mask R-CNN forward (each stage jitted
separately, distinct inputs per step, completion forced by a scalar fetch —
see bench.py's measurement notes) and prints a per-stage cost table. The
difference between consecutive rows is that stage's marginal cost.

Run:  python scripts/profile_stages.py            (real TPU)
      BENCH_BATCH=512 BENCH_STEPS=4 python scripts/profile_stages.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from roadsurf_tpu.models import fast_profile, init_params
    from roadsurf_tpu.models.mask_rcnn import preprocess, forward_features
    from roadsurf_tpu.models.anchors import all_level_anchors
    from roadsurf_tpu.models.rpn import rpn_head_forward, select_proposals
    from roadsurf_tpu.models.roi_heads import (
        box_head_forward, inference_detections, mask_head_forward)
    from roadsurf_tpu.ops.nms import NEG_INF

    if os.environ.get("BENCH_PROFILE", "fast") == "parity":
        from roadsurf_tpu.models import ModelConfig
        cfg = ModelConfig()
        batch = int(os.environ.get("BENCH_BATCH", "16"))
    else:
        cfg = fast_profile(
            post_nms_topk=int(os.environ.get("BENCH_TOPK", "32")))
        batch = int(os.environ.get("BENCH_BATCH", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "4"))
    dtype = jnp.bfloat16

    # mirror bench.py's deployment path: optional static-int8 scopes and
    # the fused Pallas pooler on real TPU (BENCH_INT8=1 BENCH_INT8_SCOPE=full)
    if os.environ.get("BENCH_INT8", "0") == "1":
        from dataclasses import replace
        cfg = replace(cfg,
                      int8_scope=os.environ.get("BENCH_INT8_SCOPE", "full"),
                      int8_pyramid=os.environ.get("BENCH_INT8_PYR",
                                                  "1") == "1")
    use_pallas = bool(cfg.pallas_pooler) and jax.default_backend() == "tpu"

    S = cfg.min_size_test
    anchors = all_level_anchors(S, cfg.fpn_strides, cfg.anchor_sizes,
                                cfg.anchor_aspect_ratios, cfg.anchor_offset)

    from roadsurf_tpu.models.mask_rcnn import _quant_tree

    def st_preprocess(params, images):
        return preprocess(images, cfg, S).astype(dtype)

    def st_stem(params, images):
        from roadsurf_tpu.models.resnet import conv_bn, max_pool
        x = st_preprocess(params, images)
        return max_pool(conv_bn(x, params["backbone"]["stem"], stride=2,
                                dtype=dtype), 3, 2)

    def _bb_input(params, images, q):
        # mirror forward_inference: the uint8-direct stem consumes raw
        # tiles when present and the size matches (no preprocess pass)
        stem_u8 = q.get("backbone", {}).get("stem_u8")
        if (stem_u8 is not None and images.dtype == jnp.uint8
                and images.shape[1] == S and images.shape[2] == S
                and stem_u8["bias"].shape[0] == -(-S // 2)):
            return images
        return st_preprocess(params, images)

    def st_backbone(params, images):
        q = _quant_tree(params, cfg)
        if "backbone" in q:
            from roadsurf_tpu.models.quant import resnet_forward_int8
            pyr = q.get("pyr") if getattr(cfg, "int8_pyramid", False) \
                else None
            return resnet_forward_int8(
                q["backbone"], _bb_input(params, images, q),
                out_sas=pyr["res_sa"] if pyr is not None else None)
        from roadsurf_tpu.models.resnet import resnet_forward
        return resnet_forward(params["backbone"], st_preprocess(params, images), dtype)

    def _features(params, images):
        """(fpn_feats, feat_scales) — the int8-pyramid path when active."""
        q = _quant_tree(params, cfg)
        pyr = q.get("pyr") if getattr(cfg, "int8_pyramid", False) else None
        if pyr is not None:
            from roadsurf_tpu.models.quant import (fpn_forward_int8_pyr,
                                                   resnet_forward_int8)
            res = resnet_forward_int8(q["backbone"],
                                      _bb_input(params, images, q),
                                      out_sas=pyr["res_sa"])
            return fpn_forward_int8_pyr(q["fpn"], pyr, res), pyr["out_sa"]
        return forward_features(params, st_preprocess(params, images),
                                cfg, dtype), None

    def st_fpn(params, images):
        return _features(params, images)[0]

    def _rpn(params, feats):
        q = _quant_tree(params, cfg)
        pyr = q.get("pyr") if getattr(cfg, "int8_pyramid", False) else None
        if pyr is not None:
            from roadsurf_tpu.models.quant import rpn_head_forward_int8_pyr
            return rpn_head_forward_int8_pyr(q["rpn"], pyr, feats,
                                             cfg.num_anchors, dtype)
        if "rpn" in q:
            from roadsurf_tpu.models.quant import rpn_head_forward_int8
            return rpn_head_forward_int8(q["rpn"], feats, cfg.num_anchors,
                                         dtype)
        return rpn_head_forward(params["rpn"], feats, cfg.num_anchors, dtype)

    def st_rpn_head(params, images):
        return _rpn(params, _features(params, images)[0])

    gate_geom = [(cfg.num_anchors, cfg.anchor_aspect_ratios, st, sz)
                 for st, sz in zip(cfg.fpn_strides, cfg.anchor_sizes)]

    def _proposals(params, images):
        feats, scl = _features(params, images)
        logits, deltas = _rpn(params, feats)
        props, pscores = select_proposals(
            logits, deltas, anchors, S, cfg.rpn_pre_nms_topk_test,
            cfg.rpn_post_nms_topk_test, cfg.rpn_nms_thresh,
            fast_nms=cfg.fast_nms,
            local_max_gate=getattr(cfg, "rpn_local_max_gate", False),
            gate_geom=gate_geom)
        return feats, scl, props, pscores

    def st_proposals(params, images):
        _, _, props, pscores = _proposals(params, images)
        return props, pscores

    def st_box_head(params, images):
        feats, scl, props, pscores = _proposals(params, images)
        q = _quant_tree(params, cfg)
        return box_head_forward(params["box_head"], feats[:4], props, cfg,
                                dtype, use_pallas=use_pallas,
                                qp=q.get("box"), feat_scales=scl)

    def _dets(params, images):
        feats, scl, props, pscores = _proposals(params, images)
        q = _quant_tree(params, cfg)
        cl, bd = box_head_forward(params["box_head"], feats[:4], props, cfg,
                                  dtype, use_pallas=use_pallas,
                                  qp=q.get("box"), feat_scales=scl)
        return feats, scl, inference_detections(cl, bd, props, pscores,
                                                cfg, S)

    def st_detections(params, images):
        return _dets(params, images)[2]

    def st_full(params, images):
        feats, scl, dets = _dets(params, images)
        q = _quant_tree(params, cfg)
        ml = mask_head_forward(params["mask_head"], feats[:4], dets["boxes"],
                               cfg, dtype, use_pallas=use_pallas,
                               qp=q.get("mask"), feat_scales=scl)
        cls = dets["classes"]
        dets["mask_logits"] = jnp.take_along_axis(
            ml, cls[:, :, None, None, None], axis=-1)[..., 0]
        return dets

    stages = [
        ("preprocess", st_preprocess),
        ("stem", st_stem),
        ("backbone", st_backbone),
        ("+fpn", st_fpn),
        ("+rpn_head", st_rpn_head),
        ("+proposals(topk+nms)", st_proposals),
        ("+box_head(roialign+fc)", st_box_head),
        ("+detections(cls_nms)", st_detections),
        ("+mask_head=FULL", st_full),
    ]
    # BENCH_STAGES=backbone,+fpn runs a subset (marginal-cost column then
    # only meaningful between adjacent selected rows)
    sel = os.environ.get("BENCH_STAGES", "")
    if sel:
        keep = set(sel.split(","))
        stages = [s for s in stages if s[0] in keep]

    params = init_params(jax.random.PRNGKey(0), cfg)
    if getattr(cfg, "int8_scope", ""):
        from roadsurf_tpu.models.quant import prepare_quantized
        cal = np.random.default_rng(1).integers(
            0, 255, (8, 256, 256, 3), dtype=np.uint8)
        params["quant"] = prepare_quantized(params, cal, cfg)
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}, "
          f"batch={batch}, steps={steps}", file=sys.stderr)
    params = jax.device_put(params, dev)

    rng = np.random.default_rng(0)
    batches = [jax.device_put(jnp.asarray(
        rng.integers(0, 255, (batch, 256, 256, 3), dtype=np.uint8)), dev)
        for _ in range(steps + 1)]

    prev_ms = 0.0
    rows = []
    for name, fn in stages:
        def scalar_fn(p, x, _fn=fn):
            # reduce to ONE scalar inside the jit: the timed loop is then
            # exactly one dispatch + one scalar fetch per step. The
            # optimization_barrier forces the stage's declared outputs to
            # MATERIALIZE before the reduction — without it XLA fuses the
            # sum into the producers and elides the interface HBM writes,
            # under-measuring boundary stages (advisor r3 finding).
            out = jax.lax.optimization_barrier(
                [l for l in jax.tree.leaves(_fn(p, x))])
            return sum(jnp.sum(l.astype(jnp.float32)) for l in out)

        jfn = jax.jit(scalar_fn)
        try:
            flops = jfn.lower(params, batches[0]).compile().cost_analysis()
            gflops = flops.get("flops", 0.0) / 1e9
        except Exception:
            gflops = float("nan")
        float(jfn(params, batches[0]))  # warm
        t0 = time.perf_counter()
        for x in batches[1:]:
            float(jfn(params, x))
        dt = time.perf_counter() - t0
        ms = dt / steps * 1000.0
        marg = ms - prev_ms
        rows.append((name, ms, marg, gflops / batch,
                     batch / (dt / steps)))
        prev_ms = ms
        print(f"{name:28s} {ms:9.2f} ms/batch  marginal {marg:8.2f} ms  "
              f"{gflops / batch:7.2f} GFLOP/tile  {batch / (dt / steps):8.0f} tiles/s",
              file=sys.stderr)

    print("\nstage                         ms/batch  marginal_ms  GFLOP/tile  tiles/s")
    for name, ms, marg, gft, tps in rows:
        print(f"{name:28s} {ms:9.2f} {marg:12.2f} {gft:11.2f} {tps:8.0f}")


if __name__ == "__main__":
    main()
