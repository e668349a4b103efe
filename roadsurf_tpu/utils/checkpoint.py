"""Checkpoint save/load for model/optimizer pytrees.

The reference trains with detectron2's ``CHECKPOINT_PERIOD: 500`` and pins
inference to ``logs/model_0005999.pth`` (config_obj_detec.yaml:86). Native
checkpoints here are flat ``.npz`` archives keyed by pytree path ("a/b/c"),
which load on any host without torch; ``load_params`` also accepts a
detectron2 ``.pth``/``.pkl`` and converts it (utils/d2_convert.py).
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np


def _flatten(tree, prefix="") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict[str, np.ndarray]):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [fix(node[str(i)]) for i in range(len(keys))]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_params(path: str, tree, step: int | None = None) -> str:
    """Save a pytree of arrays as .npz (creating parent dirs)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    if step is not None:
        flat["__step__"] = np.asarray(step)
    np.savez(path, **flat)
    return path


def load_params(path: str):
    """Load a checkpoint → (tree, step). Accepts native .npz or a
    detectron2 .pth/.pkl (converted on the fly)."""
    if path.endswith((".pth", ".pkl")):
        from .d2_convert import load_detectron2_checkpoint
        return load_detectron2_checkpoint(path), None
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    step = None
    if "__step__" in flat:
        step = int(flat.pop("__step__"))
    return _unflatten(flat), step


def latest_checkpoint(log_dir: str, prefix: str = "model_") -> str | None:
    """Find the newest ``model_*.npz`` in a log dir."""
    if not os.path.isdir(log_dir):
        return None
    best, best_step = None, -1
    for f in os.listdir(log_dir):
        m = re.fullmatch(rf"{prefix}(\d+)\.npz", f)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(log_dir, f), int(m.group(1))
    return best
