"""Sharded tile-inference engine: the throughput-critical path.

Wraps the jitted detector with the data-parallel mesh (tile batch sharded
over ICI, parameters replicated — SURVEY §2.5/§5.8: DP is the model's whole
parallelism story), a lag-k in-flight pipeline that overlaps host fetch with
device compute, and per-stage throughput counters. This is the TPU-native
replacement for the reference engine's single-CUDA-stream batch loop
(make_detections, reference config_obj_detec.yaml:74-90).

Two transport optimizations matter on high-latency links (the tunneled dev
chip; also any DCN-attached host):

* **packed fetch** — every output array (boxes/scores/classes/valid/masks)
  is bitcast to uint8 and concatenated into ONE (B, bytes) buffer on
  device, so each drain is a single device→host transfer instead of five;
  the host unpacks with numpy views.
* **scan-k dispatch** — ``lax.map`` folds k tile batches into one
  executable call, so the host pays one dispatch + one fetch per k batches
  (``make_inference_scan_fn`` notes the ~25 ms/dispatch relay latency).
"""

from __future__ import annotations

import collections
import queue as _queue
import threading
import time
from functools import lru_cache

import numpy as np

from ..models.config import ModelConfig
from ..models.mask_rcnn import make_inference_fn
from ..parallel import batch_sharding, data_parallel_mesh, replicate
from ..utils.logging import logger


def _pack_wrap(base):
    """Wrap a detection fn so it returns (sorted-key metadata is rebuilt on
    the host) one uint8 buffer of all outputs, concatenated per image."""
    import jax
    import jax.numpy as jnp

    def packed(params, images):
        dets = base(params, images)
        parts = []
        for k in sorted(dets):
            v = dets[k]
            if v.dtype == jnp.bool_:
                v = v.astype(jnp.uint8)
            if v.dtype != jnp.uint8:
                v = jax.lax.bitcast_convert_type(v, jnp.uint8)
            parts.append(v.reshape(v.shape[0], -1))
        return jnp.concatenate(parts, axis=-1)

    return packed


@lru_cache(maxsize=32)
def _jitted_packed_fn(cfg: ModelConfig, with_masks: bool, mask_format: str,
                      scan_k: int):
    import jax

    base = make_inference_fn(cfg, with_masks=with_masks,
                             mask_format=mask_format)
    packed = _pack_wrap(base)
    if scan_k > 1:
        def fn(params, images):  # images: (k, B, H, W, 3)
            return jax.lax.map(lambda x: packed(params, x), images)
        return jax.jit(fn)
    return jax.jit(packed)


def _unpack_meta(base, params, batch: int, tile: int):
    """(key, dtype, trailing shape, byte offset, byte length) per output,
    in the device-side concatenation order (sorted keys)."""
    import jax
    import jax.numpy as jnp

    p_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        if not hasattr(x, "shape") else jax.ShapeDtypeStruct(x.shape, x.dtype),
        params)
    spec = jax.eval_shape(
        base, p_spec,
        jax.ShapeDtypeStruct((batch, tile, tile, 3), jnp.uint8))
    meta, off = [], 0
    for k in sorted(spec):
        v = spec[k]
        dt = np.bool_ if v.dtype == jnp.bool_ else np.dtype(v.dtype)
        nbytes = int(np.prod(v.shape[1:])) * np.dtype(dt).itemsize
        meta.append((k, np.dtype(dt), tuple(v.shape[1:]), off, nbytes))
        off += nbytes
    return meta, off


def prefetch_iter(it, depth: int = 2):
    """Run an iterator in a background thread with a bounded queue so the
    producer (e.g. tile decode) overlaps the consumer (device dispatch)."""
    q = _queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:         # surface in the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class TileInferenceEngine:
    """Batched, sharded, pipelined detector inference.

    >>> eng = TileInferenceEngine(params, cfg, batch_size=256, scan_k=4)
    >>> for dets in eng.run(tile_iterator):  # dicts of numpy arrays
    ...     consume(dets)
    """

    def __init__(self, params, cfg: ModelConfig, batch_size: int = 64,
                 with_masks: bool = True, devices=None, in_flight: int = 2,
                 mask_format: str = "logits", scan_k: int = 1):
        import jax

        self.cfg = cfg
        self.batch_size = batch_size
        self.in_flight = max(1, in_flight)
        self.scan_k = max(1, scan_k)
        devices = devices if devices is not None else jax.devices()
        if len(devices) > 1 and batch_size % len(devices) == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.mesh = data_parallel_mesh(devices)
            self.params = replicate(self.mesh, params)
            self._batch_sharding = (
                batch_sharding(self.mesh) if self.scan_k == 1
                else NamedSharding(self.mesh, P(None, "data")))
            logger.info(f"inference mesh: {len(devices)} devices, batch "
                        f"{batch_size} ({batch_size // len(devices)}/chip)")
        else:
            self.mesh = None
            self.params = jax.device_put(params, devices[0])
            self._batch_sharding = devices[0]
        self._base = make_inference_fn(cfg, with_masks=with_masks,
                                       mask_format=mask_format)
        self.fn = _jitted_packed_fn(cfg, with_masks, mask_format, self.scan_k)
        self._meta = None                   # built lazily (needs tile size)
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

    def _unpack(self, buf: np.ndarray, n: int) -> dict:
        """One packed (B, bytes) host buffer -> dict of arrays, trimmed."""
        out = {}
        for k, dt, shape, off, nbytes in self._meta:
            raw = np.ascontiguousarray(buf[:n, off:off + nbytes])
            out[k] = raw.view(dt).reshape((n,) + shape)
        return out

    def run(self, image_iter):
        """Consume an iterator of (B', H, W, 3) uint8 arrays (B' ≤ batch
        size; the tail batch is padded and trimmed transparently); yields
        per-batch dicts of numpy detection arrays."""
        queue = collections.deque()
        t0 = time.perf_counter()

        def drain_one():
            out, ns = queue.popleft()
            t1 = time.perf_counter()
            buf = np.asarray(out)           # ONE device->host fetch
            self.stats["d2h_s"] += time.perf_counter() - t1
            if self.scan_k == 1:
                buf = buf[None]
            res = []
            for i, n in enumerate(ns):
                if n:
                    self.tiles_seen += n
                    res.append(self._unpack(buf[i], n))
            return res

        def dispatch(stacked, ns):
            if self._meta is None:
                self._meta, self._row_bytes = _unpack_meta(
                    self._base, self.params, self.batch_size,
                    stacked.shape[-2])
            x = stacked if self.scan_k > 1 else stacked[0]
            queue.append((self.fn(self.params, self._put(x)), ns))

        pend_imgs, pend_ns = [], []
        for images in image_iter:
            n = images.shape[0]
            if n < self.batch_size:
                pad = np.zeros((self.batch_size - n,) + images.shape[1:],
                               images.dtype)
                images = np.concatenate([images, pad])
            pend_imgs.append(images)
            pend_ns.append(n)
            if len(pend_imgs) == self.scan_k:
                dispatch(np.stack(pend_imgs), pend_ns)
                pend_imgs, pend_ns = [], []
                while len(queue) > self.in_flight:
                    yield from drain_one()
        if pend_imgs:                       # tail: pad to k empty batches
            while len(pend_imgs) < self.scan_k:
                pend_imgs.append(np.zeros_like(pend_imgs[0]))
                pend_ns.append(0)
            dispatch(np.stack(pend_imgs), pend_ns)
        while queue:
            yield from drain_one()
        self.elapsed += time.perf_counter() - t0
        if self.elapsed > 0 and self.tiles_seen:
            logger.info(
                f"inference engine: {self.tiles_seen} tiles at "
                f"{self.tiles_seen / self.elapsed:.1f} tiles/s "
                f"(h2d wait {self.stats['h2d_s']:.1f}s, d2h wait "
                f"{self.stats['d2h_s']:.1f}s of {self.elapsed:.1f}s)")
