"""Filesystem locations (reference invesalius/inv_paths.py)."""

from __future__ import annotations

import os
from pathlib import Path


def user_dir() -> Path:
    base = os.environ.get("XDG_CONFIG_HOME", str(Path.home() / ".config"))
    return Path(base) / "invesalius3_tpu"


def user_log_dir() -> Path:
    return user_dir() / "logs"


def user_presets_dir() -> Path:
    return user_dir() / "presets"


def user_plugins_dir() -> Path:
    return user_dir() / "plugins"


def models_dir() -> Path:
    """DL weight storage (reference inv_paths.MODELS_DIR 'ai/')."""
    return user_dir() / "ai"


def create_conf_folders() -> None:
    """Reference inv_paths.create_conf_folders :95."""
    for p in (user_dir(), user_log_dir(), user_presets_dir(),
              user_plugins_dir(), models_dir()):
        p.mkdir(parents=True, exist_ok=True)


def check_for_updates(current_version: str, timeout: float = 3.0):
    """Release update check (reference utils.py:311 UpdateCheck phones the
    project site).  Returns the latest version string or None; silently
    None in offline/zero-egress environments."""
    import json
    import urllib.request

    try:
        with urllib.request.urlopen(
            "https://api.github.com/repos/invesalius/invesalius3/releases/latest",
            timeout=timeout,
        ) as r:
            return json.load(r).get("tag_name")
    except Exception:
        return None
