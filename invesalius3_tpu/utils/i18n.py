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


def parse_po(text: str) -> dict:
    """Minimal .po parser (msgid/msgstr pairs, quoted-string continuation)."""
    import re

    entries = {}
    msgid = msgstr = None
    mode = None

    def unquote(line):
        return re.match(r'\s*"(.*)"\s*$', line).group(1).encode(
            "raw_unicode_escape").decode("unicode_escape")

    for line in text.splitlines():
        s = line.strip()
        if s.startswith("#") or not s:
            continue
        if s.startswith("msgid "):
            if msgid is not None and msgstr is not None:
                entries[msgid] = msgstr
            msgid = unquote(s[6:])
            msgstr = None
            mode = "id"
        elif s.startswith("msgstr "):
            msgstr = unquote(s[7:])
            mode = "str"
        elif s.startswith('"'):
            if mode == "id":
                msgid += unquote(s)
            elif mode == "str":
                msgstr += unquote(s)
    if msgid is not None and msgstr is not None:
        entries[msgid] = msgstr
    # keep the "" header entry (carries the charset); drop untranslated ids
    return {k: v for k, v in entries.items() if v or k == ""}


def compile_po_to_mo(po_path: Path, mo_path: Path) -> None:
    """Tiny msgfmt: write a GNU .mo from a .po (no plural forms needed)."""
    import struct

    entries = parse_po(Path(po_path).read_text(encoding="utf-8"))
    keys = sorted(entries)
    offsets = []
    ids = strs = b""
    for k in keys:
        kid = k.encode("utf-8")
        val = entries[k].encode("utf-8")
        offsets.append((len(ids), len(kid), len(strs), len(val)))
        ids += kid + b"\x00"
        strs += val + b"\x00"
    n = len(keys)
    keystart = 7 * 4 + 16 * n
    valuestart = keystart + len(ids)
    koffsets = []
    voffsets = []
    for o1, l1, o2, l2 in offsets:
        koffsets += [l1, o1 + keystart]
        voffsets += [l2, o2 + valuestart]
    out = struct.pack("<7I", 0x950412DE, 0, n, 7 * 4, 7 * 4 + n * 8, 0, 0)
    out += struct.pack(f"<{2 * n}I", *koffsets)
    out += struct.pack(f"<{2 * n}I", *voffsets)
    out += ids + strs
    mo_path.parent.mkdir(parents=True, exist_ok=True)
    mo_path.write_bytes(out)


def _ensure_compiled(root: Path, language: str) -> None:
    po = root / language / "LC_MESSAGES" / "invesalius3_tpu.po"
    mo = po.with_suffix(".mo")
    if po.is_file() and (not mo.is_file()
                         or mo.stat().st_mtime < po.stat().st_mtime):
        try:
            compile_po_to_mo(po, mo)
        except (OSError, ValueError, AttributeError):
            pass


def install_language(language: str = "") -> Callable[[str], str]:
    """Install the translator (reference InstallLanguage :74); returns the
    translation function (also exposed as ``tr``).  Catalogs ship as .po
    sources and compile to .mo on first use."""
    global _translator
    if not language:
        language = current_language()
    for root in locale_dirs():
        for lang in (language, language.split("_")[0]):
            _ensure_compiled(root, lang)
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


def current_language() -> str:
    lang = os.environ.get("INV3_LANGUAGE", "")
    if lang:
        return lang
    try:
        lang = (locale_mod.getlocale()[0] or "en").split("_")[0]
    except ValueError:
        return "en"
    return "en" if lang in ("C", "POSIX") else lang


def current_catalog(language: str = "") -> dict:
    """msgid -> msgstr map for ``language`` (the web client fetches this
    via GET /api/i18n and localizes its UI strings)."""
    language = language or current_language()
    for root in locale_dirs():
        for lang in (language, language.split("_")[0]):
            po = root / lang / "LC_MESSAGES" / "invesalius3_tpu.po"
            if po.is_file():
                cat = parse_po(po.read_text(encoding="utf-8"))
                cat.pop("", None)
                return cat
    return {}
