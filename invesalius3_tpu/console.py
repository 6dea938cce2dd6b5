"""Interactive console with application context.

Reference: invesalius/gui/interactive_shell.py — an embedded Python shell
preloaded with the app's objects.  Headless equivalent: a stdlib
``code.interact`` with the framework's domain objects bound, launched via
``python -m invesalius3_tpu.console [volume-file]``.
"""

from __future__ import annotations

import code
import sys


def make_context(volume_path: str | None = None) -> dict:
    import numpy as np

    import invesalius3_tpu as inv
    from invesalius3_tpu import constants as const, events
    from invesalius3_tpu.core.project import Project
    from invesalius3_tpu.core.session import Session
    from invesalius3_tpu.core.slice import Slice
    from invesalius3_tpu.core.volume import Volume
    from invesalius3_tpu.ops import (
        floodfill, marching, mesh, morphology, projections, raycast,
        threshold, watershed,
    )

    ctx = {
        "np": np, "inv": inv, "const": const, "events": events,
        "Volume": Volume, "Slice": Slice, "Project": Project,
        "Session": Session, "ops": {
            "threshold": threshold, "floodfill": floodfill,
            "watershed": watershed, "marching": marching, "mesh": mesh,
            "morphology": morphology, "projections": projections,
            "raycast": raycast,
        },
    }
    if volume_path:
        from invesalius3_tpu.io.nifti import read_nifti

        img = read_nifti(volume_path)
        vol = Volume.from_numpy(img.data, spacing=img.spacing, affine=img.affine)
        ctx["volume"] = vol
        ctx["slc"] = Slice(vol)
    return ctx


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    ctx = make_context(argv[0] if argv else None)
    banner = (
        "invesalius3_tpu interactive console\n"
        f"bound: {', '.join(sorted(ctx))}\n"
    )
    code.interact(banner=banner, local=ctx)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
