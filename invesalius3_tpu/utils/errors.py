"""Error taxonomy, decorators, global exception hook, and crash reports.

Reference: invesalius/error_handling.py — ``ErrorCategory``/``ErrorSeverity``
:57/:78, ``InVesaliusException`` + domain subclasses :89-259,
``handle_errors`` decorator :263, ``global_exception_handler`` :657, crash
report generator with system info :391-495.
"""

from __future__ import annotations

import datetime
import functools
import json
import platform
import sys
import traceback
from enum import Enum
from pathlib import Path
from typing import Callable, Optional

from invesalius3_tpu.utils.logging import get_logger


class ErrorCategory(Enum):
    FILE_IO = "file_io"
    DICOM = "dicom"
    SEGMENTATION = "segmentation"
    SURFACE = "surface"
    NAVIGATION = "navigation"
    NETWORK = "network"
    DEVICE = "device"  # TPU/accelerator errors
    PROJECT = "project"
    UNKNOWN = "unknown"


class ErrorSeverity(Enum):
    INFO = "info"
    WARNING = "warning"
    ERROR = "error"
    CRITICAL = "critical"


class InVesaliusError(Exception):
    category = ErrorCategory.UNKNOWN
    severity = ErrorSeverity.ERROR

    def __init__(self, message: str, details: Optional[dict] = None):
        super().__init__(message)
        self.details = details or {}


class FileIOError(InVesaliusError):
    category = ErrorCategory.FILE_IO


class DicomReadError(InVesaliusError):
    category = ErrorCategory.DICOM


class SegmentationError(InVesaliusError):
    category = ErrorCategory.SEGMENTATION


class SurfaceError(InVesaliusError):
    category = ErrorCategory.SURFACE


class NavigationError(InVesaliusError):
    category = ErrorCategory.NAVIGATION


class NetworkError(InVesaliusError):
    category = ErrorCategory.NETWORK


class DeviceError(InVesaliusError):
    category = ErrorCategory.DEVICE
    severity = ErrorSeverity.CRITICAL


class ProjectError(InVesaliusError):
    category = ErrorCategory.PROJECT


def handle_errors(category: ErrorCategory = ErrorCategory.UNKNOWN,
                  reraise: bool = True, default=None):
    """Decorator: log + categorize exceptions (reference
    error_handling.py:263)."""

    def deco(fn: Callable):
        @functools.wraps(fn)
        def wrapper(*a, **kw):
            try:
                return fn(*a, **kw)
            except Exception as e:
                get_logger("errors").exception(
                    "[%s] %s failed: %s", category.value, fn.__qualname__, e)
                if reraise:
                    raise
                return default

        return wrapper

    return deco


def generate_crash_report(exc_type, exc_value, exc_tb,
                          out_dir: Optional[Path] = None) -> Path:
    """Categorized crash-report file with system info (reference
    error_handling.py:391-495)."""
    import invesalius3_tpu

    out_dir = Path(out_dir) if out_dir else Path.home() / ".config" / "invesalius3_tpu" / "crash"
    out_dir.mkdir(parents=True, exist_ok=True)
    ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    report = {
        "timestamp": ts,
        "version": invesalius3_tpu.__version__,
        "exception": repr(exc_value),
        "category": getattr(exc_value, "category", ErrorCategory.UNKNOWN).value
        if isinstance(exc_value, InVesaliusError) else ErrorCategory.UNKNOWN.value,
        "traceback": "".join(traceback.format_exception(exc_type, exc_value, exc_tb)),
        "system": {
            "platform": platform.platform(),
            "python": sys.version,
        },
    }
    try:
        import jax

        report["system"]["jax"] = jax.__version__
        report["system"]["devices"] = [str(d) for d in jax.devices()]
    except Exception:
        pass
    path = out_dir / f"crash_{ts}.json"
    path.write_text(json.dumps(report, indent=2))
    return path


def install_global_exception_handler(out_dir: Optional[Path] = None) -> None:
    """sys.excepthook writing crash reports (reference
    error_handling.py:657)."""

    def hook(exc_type, exc_value, exc_tb):
        try:
            path = generate_crash_report(exc_type, exc_value, exc_tb, out_dir)
            get_logger("errors").critical("crash report written to %s", path)
        finally:
            sys.__excepthook__(exc_type, exc_value, exc_tb)

    sys.excepthook = hook
