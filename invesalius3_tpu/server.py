"""Headless HTTP server: the web-era equivalent of the reference's GUI
surface.

SURVEY §7.9 calls a headless server + web viewer "the idiomatic modern
equivalent" of the 37.8k-LoC wxPython GUI, and the reference's own
remote-control channel (net/remote_control.py) already mirrors the full
event bus to external clients.  This server exposes the behavioral
surface the viewers consumed:

  GET  /api/status                         volume/mask/surface inventory
  GET  /api/slice/{orientation}/{index}    rendered RGB slice (PNG) with
        ?ww=&wl=&projection=&slabs=        mask overlay
  GET  /api/render?azimuth=&elevation=     raycast volume render (PNG)
        &preset=&size=
  GET  /api/masks                          mask list (index/name/colour)
  POST /api/threshold {"tmin","tmax"}      create threshold mask
  POST /api/floodfill {"seed":[z,y,x],...} region grow into the mask
  POST /api/watershed {"markers":[...]}    watershed segmentation
  POST /api/surface {"algorithm",...}      create surface from the mask
  GET  /api/surface/{index}.stl            download a surface
  GET  /api/events                         recent bus events (polling)

Everything is stdlib http.server + PIL for PNG encoding — zero new deps.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from invesalius3_tpu import constants as const, events
from invesalius3_tpu.core.slice import Slice


class AppState:
    """What the server serves: one Slice + its project-level objects."""

    def __init__(self, slc: Slice):
        self.slice = slc
        self.surfaces = {}
        self.recent_events = []

        @events.wants_topic
        def tap(topic=None, **kw):
            self.record_event(topic, _jsonable_shallow(kw))

        self._tap = tap  # keep a reference (bus stores it)
        slc.bus.subscribe(tap, events.ALL_TOPICS)

    def record_event(self, topic, data):
        self.recent_events.append({"topic": topic, "data": data})
        self.recent_events = self.recent_events[-200:]


def _jsonable_shallow(kw: dict) -> dict:
    out = {}
    for k, v in kw.items():
        if isinstance(v, (str, int, float, bool)) or v is None:
            out[k] = v
        elif isinstance(v, (list, tuple)) and len(v) <= 16:
            out[k] = [x if isinstance(x, (str, int, float, bool)) else repr(x) for x in v]
        else:
            out[k] = repr(v)[:120]
    return out


def _png_bytes(rgb: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "PNG")
    return buf.getvalue()


def make_handler(state: AppState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        # -- helpers -----------------------------------------------------------
        def _json(self, obj, code=200):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _png(self, rgb):
            payload = _png_bytes(rgb)
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0) or 0)
            return json.loads(self.rfile.read(n) or b"{}")

        # -- GET ---------------------------------------------------------------
        def do_GET(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            parts = [p for p in url.path.split("/") if p]
            slc = state.slice
            try:
                if url.path == "/api/status":
                    self._json({
                        "volume_shape": list(slc.volume.shape) if slc.volume else None,
                        "spacing": list(slc.spacing) if slc.volume else None,
                        "window": [slc.window_width, slc.window_level],
                        "n_masks": len(slc.masks),
                        "n_surfaces": len(state.surfaces),
                        "projection": const.PROJECTION_NAMES[slc.projection_type],
                    })
                elif url.path == "/api/masks":
                    self._json([
                        {"index": m.index, "name": m.name, "colour": list(m.colour),
                         "visible": m.is_shown,
                         "threshold_range": list(m.threshold_range)}
                        for m in slc.masks.values()
                    ])
                elif len(parts) == 4 and parts[:2] == ["api", "slice"]:
                    orientation = parts[2].upper()
                    index = int(parts[3])
                    if "ww" in q:
                        slc.window_width = float(q["ww"])
                    if "wl" in q:
                        slc.window_level = float(q["wl"])
                    if "projection" in q:
                        slc.projection_type = int(q["projection"])
                    slc.n_slabs = int(q.get("slabs", slc.n_slabs))
                    rgb = slc.get_rendered_slice(orientation, index)
                    self._png(rgb)
                elif url.path == "/api/render":
                    from invesalius3_tpu.ops import raycast

                    preset = raycast.builtin_preset(q.get("preset", "Bone"))
                    img = raycast.render(
                        np.asarray(slc.matrix), slc.spacing, preset,
                        azimuth=float(q.get("azimuth", 0)),
                        elevation=float(q.get("elevation", 0)),
                        image_size=int(q.get("size", 256)),
                        n_steps=int(q.get("steps", 128)),
                    )
                    self._png(img)
                elif len(parts) == 3 and parts[:2] == ["api", "surface"]:
                    idx = int(parts[2].split(".")[0])
                    surf = state.surfaces[idx]
                    import tempfile, os

                    fd, tmp = tempfile.mkstemp(suffix=".stl")
                    os.close(fd)
                    surf.export(tmp)
                    data = open(tmp, "rb").read()
                    os.remove(tmp)
                    self.send_response(200)
                    self.send_header("Content-Type", "model/stl")
                    self.send_header("Content-Length", str(len(data)))
                    self.end_headers()
                    self.wfile.write(data)
                elif url.path == "/api/events":
                    self._json(state.recent_events)
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:  # surface errors as JSON
                self._json({"error": repr(e)}, 500)

        # -- POST --------------------------------------------------------------
        def do_POST(self):
            slc = state.slice
            try:
                body = self._body()
                if self.path == "/api/threshold":
                    m = slc.create_new_mask(
                        threshold_range=(body["tmin"], body["tmax"]))
                    n = int(np.asarray(m.visible_array()).sum())
                    state.record_event("mask.created", {"index": m.index, "voxels": n})
                    self._json({"index": m.index, "voxels": n})
                elif self.path == "/api/floodfill":
                    from invesalius3_tpu.ops import floodfill

                    import jax.numpy as jnp

                    seed = tuple(body["seed"])
                    seeds = jnp.zeros(slc.matrix.shape, jnp.bool_).at[seed].set(True)
                    reached = floodfill.floodfill_threshold(
                        slc.matrix, seeds, body["tmin"], body["tmax"])
                    mask = slc.current_mask or slc.create_new_mask(apply_threshold=False)
                    mask.apply(floodfill.apply_fill(
                        mask.data, reached, body.get("fill", 254)))
                    self._json({"voxels": int(np.asarray(reached).sum())})
                elif self.path == "/api/watershed":
                    from invesalius3_tpu.ops import watershed

                    import jax.numpy as jnp

                    markers = np.zeros(slc.matrix.shape, np.int16)
                    for mk in body["markers"]:
                        markers[tuple(mk["position"])] = mk["label"]
                    labels = watershed.watershed(
                        slc.matrix, jnp.asarray(markers),
                        algorithm=body.get("algorithm", "Watershed"))
                    keep = body.get("keep_label", 1)
                    mask = slc.current_mask or slc.create_new_mask(apply_threshold=False)
                    mask.apply(jnp.where(labels == keep, jnp.uint8(253), jnp.uint8(0)))
                    self._json({"voxels": int(np.asarray(labels == keep).sum())})
                elif self.path == "/api/surface":
                    surf = slc.create_surface_from_mask(
                        algorithm=body.get("algorithm", "Default"),
                        decimate_reduction=body.get("decimate_reduction"),
                        keep_largest=body.get("keep_largest", False),
                    )
                    state.surfaces[surf.index] = surf
                    self._json({
                        "index": surf.index, "triangles": int(len(surf.faces)),
                        "volume_mm3": surf.volume, "area_mm2": surf.area,
                    })
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:
                self._json({"error": repr(e)}, 500)

    return Handler


class ViewerServer:
    def __init__(self, slc: Slice, host: str = "127.0.0.1", port: int = 0):
        self.state = AppState(slc)
        self.httpd = ThreadingHTTPServer((host, port), make_handler(self.state))
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
