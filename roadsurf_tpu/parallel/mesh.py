"""Device mesh and sharding for the tile pipeline.

The model is a per-tile CNN detector: the scale axis is the tile batch, not
the sequence/width of the network (SURVEY §2.5 — the reference has no
distributed compute at all; a single CUDA stream). The TPU-native design is
therefore **data parallelism over ICI**:

* inference — tile batch sharded over the ``data`` mesh axis, parameters
  replicated; XLA inserts zero collectives in the forward pass and results
  stream back per-shard;
* training — same batch sharding; gradient psum across ``data`` is inserted
  automatically by jit when the loss averages over the global batch.

Multi-slice scale-out later maps an outer ``dcn`` axis onto the same helpers.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with its leading dim split over the data axis."""
    return jax.device_put(batch, batch_sharding(mesh))
