"""Native (C++) host-side runtime components, loaded via ctypes.

The reference's native layer is a Rust cdylib (invesalius_rs); here the
TPU handles the compute path and the only genuinely host-bound pipeline
stage — dynamic-topology mesh decimation — is C++ (decimate.cpp, a
Garland-Heckbert QEM edge-collapse simplifier replacing
vtkQuadricDecimation, reference surface_process.py:350-372).

The shared library is compiled on first use with g++ (cached next to the
sources); callers fall back to the pure-Python vertex-clustering
decimation if no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_LIB_PATH = _HERE / f"_native_{sys.implementation.cache_tag}.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


_SOURCES = ("decimate.cpp", "codecs.cpp", "meshpack.cpp")


def _build() -> Optional[ctypes.CDLL]:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        *(str(_HERE / s) for s in _SOURCES), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    return ctypes.CDLL(str(_LIB_PATH))


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if _LIB_PATH.exists():
            try:
                lib = ctypes.CDLL(str(_LIB_PATH))
                _configure(lib)
                _lib = lib
                return _lib
            except (OSError, AttributeError):
                # stale .so from before a new source file was added: rebuild
                _LIB_PATH.unlink()
        lib = _build()
        if lib is None:
            _build_failed = True
            return None
        _configure(lib)
        _lib = lib
        return _lib


def _configure(lib: ctypes.CDLL) -> None:
    lib.decimate_qem.restype = ctypes.c_int
    lib.decimate_qem.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.jpegll_decode.restype = ctypes.c_int
    lib.jpegll_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.packbits_decode.restype = ctypes.c_int64
    lib.packbits_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.stl_pack.restype = ctypes.c_int
    lib.stl_pack.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.stl_pack_mt.restype = ctypes.c_int
    lib.stl_pack_mt.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.verts3v_f16_to_n3.restype = ctypes.c_int
    lib.verts3v_f16_to_n3.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.verts3v_f32_to_n3.restype = ctypes.c_int
    lib.verts3v_f32_to_n3.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.faces_u24_to_n3.restype = ctypes.c_int
    lib.faces_u24_to_n3.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]


def available() -> bool:
    return get_lib() is not None


def decimate_qem(verts: np.ndarray, faces: np.ndarray,
                 reduction: float) -> Tuple[np.ndarray, np.ndarray]:
    """QEM edge-collapse decimation to (1 - reduction) of the input
    triangle count.  Raises RuntimeError if the native lib is missing."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decimater unavailable (no g++)")
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    target = max(4, int(len(faces) * (1.0 - reduction)))
    out_v = np.empty_like(verts)
    out_f = np.empty_like(faces)
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    rc = lib.decimate_qem(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
        target,
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        raise RuntimeError(f"decimate_qem failed with code {rc}")
    return out_v[: nv.value].copy(), out_f[: nf.value].copy()


def jpegll_decode(data: bytes) -> np.ndarray:
    """Decode one lossless-JPEG (SOF3) frame -> (rows, cols) or
    (rows, cols, ncomp) uint16.  Raises RuntimeError on failure."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native codecs unavailable (no g++)")
    src = np.frombuffer(data, np.uint8)
    # capacity guess: parse rows/cols from SOF3 would need a scan; just use
    # the compressed length heuristic with a generous floor
    cap = max(len(data) * 8, 1 << 22)
    out = np.empty(cap, np.uint16)
    rows = ctypes.c_int32(0)
    cols = ctypes.c_int32(0)
    ncomp = ctypes.c_int32(0)
    rc = lib.jpegll_decode(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), cap,
        ctypes.byref(rows), ctypes.byref(cols), ctypes.byref(ncomp),
    )
    if rc != 0:
        raise RuntimeError(f"jpegll_decode failed with code {rc}")
    n = rows.value * cols.value * ncomp.value
    arr = out[:n].copy()
    if ncomp.value > 1:
        return arr.reshape(rows.value, cols.value, ncomp.value)
    return arr.reshape(rows.value, cols.value)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decode one PackBits-compressed RLE segment to `expected` bytes."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native codecs unavailable (no g++)")
    src = np.frombuffer(data, np.uint8)
    dst = np.empty(expected, np.uint8)
    n = lib.packbits_decode(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), expected,
    )
    if n < 0:
        raise RuntimeError("packbits_decode: truncated or oversized segment")
    return dst[:n].tobytes()


def stl_pack(verts: np.ndarray, faces: np.ndarray,
             n_threads: Optional[int] = None) -> np.ndarray:
    """(nf, 50)-byte binary-STL records (normal, corners, attr=0) in one
    streaming pass, thread-parallel over the face range (records are
    independent fixed-size rows).  Defaults to the host core count; the
    1-core dev VM degrades to the single-thread loop.  Raises
    RuntimeError if the native lib is missing."""
    import os

    lib = get_lib()
    if lib is None:
        raise RuntimeError("native meshpack unavailable (no g++)")
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out = np.empty((len(faces), 50), np.uint8)
    nt = int(n_threads if n_threads is not None
             else min(os.cpu_count() or 1, 16))
    rc = lib.stl_pack_mt(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nt,
    )
    if rc != 0:
        raise RuntimeError("stl_pack: face index out of range")
    return out


def verts3v_to_n3(rows: np.ndarray, n: int) -> np.ndarray:
    """(3, V_pad) float16/float32 device layout -> (n, 3) float32."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native meshpack unavailable (no g++)")
    rows = np.ascontiguousarray(rows)
    out = np.empty((n, 3), np.float32)
    if rows.dtype == np.float16:
        rc = lib.verts3v_f16_to_n3(
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            rows.shape[1], n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    else:
        rows = np.ascontiguousarray(rows, np.float32)
        rc = lib.verts3v_f32_to_n3(
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows.shape[1], n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError("verts3v_to_n3 failed")
    return out


def faces_u24_to_n3(packed: np.ndarray, n: int) -> np.ndarray:
    """(9, T_pad) uint8 packed uint24 corners -> (n, 3) int32 faces."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native meshpack unavailable (no g++)")
    packed = np.ascontiguousarray(packed, np.uint8)
    out = np.empty((n, 3), np.int32)
    rc = lib.faces_u24_to_n3(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        packed.shape[1], n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError("faces_u24_to_n3 failed")
    return out
