"""Internationalization scaffolding.

Reference: invesalius/i18n.py — gettext with 25 locales under ``locale/``
(InstallLanguage :74, lazy ``tr`` Translator :95-108).  This build ships
the same mechanism (standard gettext .mo discovery under the user dir +
a package ``locale/`` dir) without bundling translations; ``tr`` falls
back to the message id, so every user-facing string routes through it
from day one.
"""

from __future__ import annotations

import gettext
import locale as locale_mod
import os
from pathlib import Path
from typing import Callable, Optional

_translator: Optional[Callable[[str], str]] = None


def locale_dirs():
    here = Path(__file__).resolve().parent.parent / "locale"
    from invesalius3_tpu.utils.paths import user_dir

    return [here, user_dir() / "locale"]


def get_locales() -> list:
    """Available language codes (directories containing LC_MESSAGES)."""
    out = {"en"}
    for root in locale_dirs():
        if root.is_dir():
            for child in root.iterdir():
                if (child / "LC_MESSAGES").is_dir():
                    out.add(child.name)
    return sorted(out)


def install_language(language: str = "") -> Callable[[str], str]:
    """Install the translator (reference InstallLanguage :74); returns the
    translation function (also exposed as ``tr``)."""
    global _translator
    if not language:
        language = (locale_mod.getdefaultlocale()[0] or "en").split("_")[0]
    for root in locale_dirs():
        try:
            t = gettext.translation(
                "invesalius3_tpu", localedir=str(root), languages=[language])
            _translator = t.gettext
            return _translator
        except (FileNotFoundError, OSError):
            continue
    _translator = lambda s: s  # fallback: identity
    return _translator


def tr(message: str) -> str:
    """Lazy translation (reference Translator ``tr`` :95-108)."""
    if _translator is None:
        install_language()
    return _translator(message)
