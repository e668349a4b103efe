"""Config system: one YAML file per workflow, one block per consumer script.

The reference keys every script's config block by the script's own filename
(``yaml.load(fp)[os.path.basename(__file__)]`` — see reference
scripts/road_segmentation/prepare_data_obj_detec.py:29-30).  We keep the
exact same YAML schemas so existing config files work verbatim, but expose
the loader as a function instead of copy-pasted boilerplate.
"""

from __future__ import annotations

import os
from typing import Any

import yaml


def load_config(path: str) -> dict[str, Any]:
    """Load a whole YAML config file."""
    with open(path) as fp:
        return yaml.safe_load(fp)


def load_script_config(path: str, script_name: str) -> dict[str, Any]:
    """Load the block of a YAML config keyed by the consumer script name.

    ``script_name`` may be a bare name ("prepare_data_obj_detec.py") or a
    path (its basename is used), matching the reference convention.
    """
    key = os.path.basename(script_name)
    cfg = load_config(path)
    if key not in cfg:
        raise KeyError(
            f"config file {path!r} has no block for script {key!r}; "
            f"available blocks: {sorted(cfg)}"
        )
    return cfg[key]
