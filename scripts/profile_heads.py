"""Isolated sub-stage costs of the box/mask heads (pooler vs FC/convs),
FPN, and backbone at the deployment config (batch 512, int8-full+pyramid).

Each row is an independent jitted graph over synthetic inputs with the
bench.py measurement discipline; subtract the noop row (relay dispatch
floor) from every number.

Run: python scripts/profile_heads.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from roadsurf_tpu.models import fast_profile, init_params
    from roadsurf_tpu.models.quant import prepare_quantized
    from roadsurf_tpu.models.roi_heads import (box_head_forward,
                                               mask_head_forward)

    cfg = fast_profile(post_nms_topk=int(os.environ.get("BENCH_TOPK", "32")))
    cfg = replace(cfg, int8_scope="full", int8_pyramid=True)
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "4"))
    dtype = jnp.bfloat16
    S = cfg.min_size_test
    R = cfg.rpn_post_nms_topk_test
    D = cfg.detections_per_image

    params = init_params(jax.random.PRNGKey(0), cfg)
    cal = np.random.default_rng(1).integers(0, 255, (8, 256, 256, 3),
                                            dtype=np.uint8)
    params["quant"] = prepare_quantized(params, cal, cfg)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    q = params["quant"]
    scales = q["pyr"]["out_sa"]

    rng = np.random.default_rng(0)
    sizes = [(S + s - 1) // s for s in cfg.fpn_strides[:4]]

    def mk():
        feats = [jnp.asarray(rng.integers(-127, 127, (batch, h, h, 256),
                                          dtype=np.int8)) for h in sizes]
        boxes = rng.uniform(8, 200, (batch, R, 4)).astype(np.float32)
        boxes = np.stack([np.minimum(boxes[..., 0], boxes[..., 2]),
                          np.minimum(boxes[..., 1], boxes[..., 3]),
                          np.maximum(boxes[..., 0], boxes[..., 2]) + 8,
                          np.maximum(boxes[..., 1], boxes[..., 3]) + 8], -1)
        props = jnp.asarray(boxes)
        imgs = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3),
                                        dtype=np.uint8))
        return jax.device_put((feats, props, imgs), dev)

    inputs = [mk() for _ in range(steps + 1)]

    from roadsurf_tpu.ops.roi_align import roi_align_multilevel

    def st_noop(feats, props, imgs):
        return props[:, :1, :1]

    def st_box_pool(feats, props, imgs):
        return roi_align_multilevel(
            feats, props, cfg.box_pooler_resolution,
            sampling=cfg.pooler_sampling_ratio,
            canonical_size=cfg.canonical_box_size,
            canonical_level=cfg.canonical_level, use_pallas=True,
            feat_scales=scales)

    def st_box_full(feats, props, imgs):
        return box_head_forward(params["box_head"], feats, props, cfg,
                                dtype, use_pallas=True, qp=q.get("box"),
                                feat_scales=scales)

    def st_mask_pool(feats, props, imgs):
        return roi_align_multilevel(
            feats, props[:, :D], cfg.mask_pooler_resolution,
            sampling=cfg.pooler_sampling_ratio,
            canonical_size=cfg.canonical_box_size,
            canonical_level=cfg.canonical_level, use_pallas=True,
            feat_scales=scales)

    def st_mask_full(feats, props, imgs):
        return mask_head_forward(params["mask_head"], feats, props[:, :D],
                                 cfg, dtype, use_pallas=True,
                                 qp=q.get("mask"), feat_scales=scales)

    from roadsurf_tpu.models.quant import (fpn_forward_int8_pyr,
                                           resnet_forward_int8)

    def st_backbone(feats, props, imgs):
        return resnet_forward_int8(q["backbone"], imgs,
                                   out_sas=q["pyr"]["res_sa"])

    def st_bb_fpn(feats, props, imgs):
        res = resnet_forward_int8(q["backbone"], imgs,
                                  out_sas=q["pyr"]["res_sa"])
        return fpn_forward_int8_pyr(q["fpn"], q["pyr"], res, dtype)

    stages = [
        ("noop(dispatch floor)", st_noop),
        ("box pooler (R=%d)" % R, st_box_pool),
        ("box pooler+FCs", st_box_full),
        ("mask pooler (D=%d)" % D, st_mask_pool),
        ("mask pooler+convs", st_mask_full),
        ("backbone int8 (u8 stem)", st_backbone),
        ("backbone+fpn int8 pyr", st_bb_fpn),
    ]

    prev = None
    print(f"batch={batch} R={R} D={D}", file=sys.stderr)
    rows = []
    for name, fn in stages:
        def scalar_fn(feats, props, imgs, _fn=fn):
            out = jax.lax.optimization_barrier(
                [l for l in jax.tree.leaves(_fn(feats, props, imgs))])
            return sum(jnp.sum(l.astype(jnp.float32)) for l in out)

        jfn = jax.jit(scalar_fn)
        f0, p0, i0 = inputs[0]
        float(jfn(f0, p0, i0))
        t0 = time.perf_counter()
        for f, p, i in inputs[1:]:
            float(jfn(f, p, i))
        ms = (time.perf_counter() - t0) / steps * 1000.0
        rows.append((name, ms))
        print(f"{name:28s} {ms:9.2f} ms/batch", file=sys.stderr)

    print("\nsub-stage                     ms/batch")
    for name, ms in rows:
        print(f"{name:28s} {ms:9.2f}")


if __name__ == "__main__":
    main()
