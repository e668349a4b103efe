from .config import load_config, load_script_config
from .logging import get_logger, format_logger
from .misc import ensure_dir_exists, test_crs, Manifest

__all__ = [
    "load_config",
    "load_script_config",
    "get_logger",
    "format_logger",
    "ensure_dir_exists",
    "test_crs",
    "Manifest",
]
