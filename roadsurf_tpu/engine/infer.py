"""Sharded tile-inference engine: the throughput-critical path.

Wraps the jitted detector with the data-parallel mesh (tile batch sharded
over ICI, parameters replicated — SURVEY §2.5/§5.8: DP is the model's whole
parallelism story), a lag-k in-flight pipeline that overlaps host fetch with
device compute, and per-stage throughput counters. This is the TPU-native
replacement for the reference engine's single-CUDA-stream batch loop
(make_detections, reference config_obj_detec.yaml:74-90).
"""

from __future__ import annotations

import collections
import time

import numpy as np

from ..models.config import ModelConfig
from ..models.mask_rcnn import make_inference_fn
from ..parallel import batch_sharding, data_parallel_mesh, replicate
from ..utils.logging import logger


class TileInferenceEngine:
    """Batched, sharded, pipelined detector inference.

    >>> eng = TileInferenceEngine(params, cfg, batch_size=256)
    >>> for dets in eng.run(tile_iterator):  # dicts of numpy arrays
    ...     consume(dets)
    """

    def __init__(self, params, cfg: ModelConfig, batch_size: int = 64,
                 with_masks: bool = True, devices=None, in_flight: int = 2,
                 mask_format: str = "logits"):
        import jax

        self.cfg = cfg
        self.batch_size = batch_size
        self.in_flight = max(1, in_flight)
        devices = devices if devices is not None else jax.devices()
        if len(devices) > 1 and batch_size % len(devices) == 0:
            self.mesh = data_parallel_mesh(devices)
            self.params = replicate(self.mesh, params)
            self._batch_sharding = batch_sharding(self.mesh)
            logger.info(f"inference mesh: {len(devices)} devices, batch "
                        f"{batch_size} ({batch_size // len(devices)}/chip)")
        else:
            self.mesh = None
            self.params = jax.device_put(params, devices[0])
            self._batch_sharding = devices[0]
        from ..models.mask_rcnn import jitted_inference_fn
        self.fn = jitted_inference_fn(cfg, with_masks=with_masks,
                                      mask_format=mask_format)
        self.tiles_seen = 0
        self.elapsed = 0.0
        # per-stage wall clock (h2d = upload wait, d2h = result fetch wait;
        # device compute hides inside the in-flight window)
        self.stats = {"h2d_s": 0.0, "d2h_s": 0.0}

    def _put(self, images: np.ndarray):
        # h2d stays asynchronous — blocking here would serialize upload
        # with drain/decode and distort the throughput being measured; the
        # dispatch call itself surfaces any upload backpressure, which is
        # what h2d_s accounts (issue time, not transfer completion)
        import jax
        t0 = time.perf_counter()
        out = jax.device_put(images, self._batch_sharding)
        self.stats["h2d_s"] += time.perf_counter() - t0
        return out

    def run(self, image_iter):
        """Consume an iterator of (B', H, W, 3) uint8 arrays (B' ≤ batch
        size; the tail batch is padded and trimmed transparently); yields
        per-batch dicts of numpy detection arrays."""
        import jax

        queue = collections.deque()
        t0 = time.perf_counter()

        def drain_one():
            out, n = queue.popleft()
            t1 = time.perf_counter()
            host = {k: np.asarray(v)[:n] for k, v in out.items()}
            self.stats["d2h_s"] += time.perf_counter() - t1
            self.tiles_seen += n
            return host

        for images in image_iter:
            n = images.shape[0]
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n,) + images.shape[1:],
                               images.dtype)
                images = np.concatenate([images, pad])
            out = self.fn(self.params, self._put(images))
            queue.append((out, n))
            while len(queue) > self.in_flight:
                yield drain_one()
        while queue:
            yield drain_one()
        self.elapsed += time.perf_counter() - t0
        if self.elapsed > 0 and self.tiles_seen:
            logger.info(
                f"inference engine: {self.tiles_seen} tiles at "
                f"{self.tiles_seen / self.elapsed:.1f} tiles/s "
                f"(h2d wait {self.stats['h2d_s']:.1f}s, d2h wait "
                f"{self.stats['d2h_s']:.1f}s of {self.elapsed:.1f}s)")
