"""Mesh file I/O: STL (binary + ASCII), PLY, OBJ, VTP (VTK XML PolyData),
X3D, and 3MF writers plus STL/PLY/OBJ readers.

Covers the reference's exporter surface (reference
invesalius/data/surface.py:1647-1726 ``OnExportSurface`` writes STL
ascii/binary, PLY, OBJ, VRML, X3D, 3MF, Inventor, VTP via VTK writers and
lib3mf) without VTK: these are simple formats written directly with numpy.

All writers take (vertices (V, 3) float, faces (F, 3) int) in world mm.
"""

from __future__ import annotations

import struct
import zipfile
from pathlib import Path
from typing import Tuple

import numpy as np


# ---------------------------------------------------------------------------
# STL
# ---------------------------------------------------------------------------


def _tri_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    norm = np.linalg.norm(n, axis=1, keepdims=True)
    return (n / np.where(norm == 0, 1.0, norm)).astype(np.float32)


def write_stl(path, verts: np.ndarray, faces: np.ndarray, binary: bool = True,
              name: str = "invesalius3_tpu") -> None:
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    if binary:
        with open(path, "wb") as f:
            header = (name.encode()[:80]).ljust(80, b"\0")
            f.write(header)
            f.write(struct.pack("<I", len(faces)))
            try:  # single-pass native packer: this host executes numpy's
                # strided field-writes at ~4 MB/s, so the (n, 50) record
                # interleave below costs minutes at 7M triangles
                from invesalius3_tpu import native

                if native.available():
                    f.write(native.stl_pack(verts, faces))
                    return
            except Exception:
                pass
            # contiguous byte-buffer assembly: structured-field assignment
            # (tri["v"] = ...) is a strided copy that costs ~40 s at 7M
            # triangles; plain uint8 block copies are ~100x faster
            n = len(faces)
            tv = np.ascontiguousarray(verts[faces], dtype="<f4")  # (n, 3, 3)
            # normals from the gathered corners (a second verts[faces]
            # gather + np.cross in f64 costed ~5 s at 7M tris)
            u = tv[:, 1] - tv[:, 0]
            w = tv[:, 2] - tv[:, 0]
            nr = np.empty((n, 3), "<f4")
            nr[:, 0] = u[:, 1] * w[:, 2] - u[:, 2] * w[:, 1]
            nr[:, 1] = u[:, 2] * w[:, 0] - u[:, 0] * w[:, 2]
            nr[:, 2] = u[:, 0] * w[:, 1] - u[:, 1] * w[:, 0]
            mag = np.sqrt(np.einsum("ij,ij->i", nr, nr, dtype=np.float32))
            np.maximum(mag, np.float32(1e-30), out=mag)
            nr /= mag[:, None]
            buf = np.empty((n, 50), np.uint8)
            buf[:, 0:12] = nr.view(np.uint8).reshape(n, 12)
            buf[:, 12:48] = tv.reshape(n, 9).view(np.uint8).reshape(n, 36)
            buf[:, 48:50] = 0
            f.write(buf)  # buf is contiguous: no tobytes() copy
    else:
        normals = _tri_normals(verts, faces)
        with open(path, "w") as f:
            f.write(f"solid {name}\n")
            tv = verts[faces]
            for n, (a, b, c) in zip(normals, tv):
                f.write(f" facet normal {n[0]:e} {n[1]:e} {n[2]:e}\n  outer loop\n")
                f.write(f"   vertex {a[0]:e} {a[1]:e} {a[2]:e}\n")
                f.write(f"   vertex {b[0]:e} {b[1]:e} {b[2]:e}\n")
                f.write(f"   vertex {c[0]:e} {c[1]:e} {c[2]:e}\n")
                f.write("  endloop\n endfacet\n")
            f.write(f"endsolid {name}\n")


def read_stl(path) -> Tuple[np.ndarray, np.ndarray]:
    """Read STL (auto-detect binary/ascii); returns deduplicated
    (verts, faces)."""
    with open(path, "rb") as f:
        head = f.read(5)
    if head == b"solid":
        # could still be binary with a 'solid' header; try ascii first
        try:
            return _read_stl_ascii(path)
        except ValueError:
            pass
    return _read_stl_binary(path)


def _read_stl_binary(path) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        f.seek(80)
        (n,) = struct.unpack("<I", f.read(4))
        dt = np.dtype([("n", "<f4", 3), ("v", "<f4", (3, 3)), ("attr", "<u2")])
        tri = np.frombuffer(f.read(n * dt.itemsize), dtype=dt)
    flat = tri["v"].reshape(-1, 3)
    verts, inverse = np.unique(flat, axis=0, return_inverse=True)
    return verts.astype(np.float32), inverse.reshape(-1, 3).astype(np.int32)


def _read_stl_ascii(path) -> Tuple[np.ndarray, np.ndarray]:
    pts = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            ls = line.strip()
            if ls.startswith("vertex"):
                parts = ls.split()
                pts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    if not pts or len(pts) % 3:
        raise ValueError("not a valid ascii STL")
    flat = np.asarray(pts, np.float32)
    verts, inverse = np.unique(flat, axis=0, return_inverse=True)
    return verts, inverse.reshape(-1, 3).astype(np.int32)


# ---------------------------------------------------------------------------
# PLY
# ---------------------------------------------------------------------------


def write_ply(path, verts: np.ndarray, faces: np.ndarray, binary: bool = True) -> None:
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    fmt = "binary_little_endian" if binary else "ascii"
    header = (
        "ply\n"
        f"format {fmt} 1.0\n"
        "comment created by invesalius3_tpu\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    if binary:
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(verts.astype("<f4").tobytes())
            rec = np.zeros(len(faces), dtype=np.dtype([("n", "u1"), ("v", "<i4", 3)]))
            rec["n"] = 3
            rec["v"] = faces
            f.write(rec.tobytes())
    else:
        with open(path, "w") as f:
            f.write(header)
            for v in verts:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
            for t in faces:
                f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def read_ply(path) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii", errors="replace")
    body = data[head_end:]
    n_verts = n_faces = 0
    binary = "binary_little_endian" in header
    for line in header.splitlines():
        if line.startswith("element vertex"):
            n_verts = int(line.split()[-1])
        elif line.startswith("element face"):
            n_faces = int(line.split()[-1])
    if binary:
        verts = np.frombuffer(body, "<f4", n_verts * 3).reshape(-1, 3).copy()
        off = n_verts * 12
        rec = np.frombuffer(body, np.dtype([("n", "u1"), ("v", "<i4", 3)]), n_faces, offset=off)
        faces = rec["v"].copy()
    else:
        lines = body.decode().splitlines()
        verts = np.array([[float(x) for x in ln.split()[:3]] for ln in lines[:n_verts]], np.float32)
        faces = np.array(
            [[int(x) for x in ln.split()[1:4]] for ln in lines[n_verts : n_verts + n_faces]],
            np.int32,
        )
    return verts.astype(np.float32), faces.astype(np.int32)


# ---------------------------------------------------------------------------
# OBJ
# ---------------------------------------------------------------------------


def write_obj(path, verts: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write("# created by invesalius3_tpu\n")
        for v in np.asarray(verts):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for t in np.asarray(faces):
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def read_obj(path) -> Tuple[np.ndarray, np.ndarray]:
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                verts.append([float(p[1]), float(p[2]), float(p[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for i in range(1, len(idx) - 1):  # fan-triangulate
                    faces.append([idx[0], idx[i], idx[i + 1]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


# ---------------------------------------------------------------------------
# VTP (VTK XML PolyData, ascii) — enough for interchange with the reference
# ---------------------------------------------------------------------------


def write_vtp(path, verts: np.ndarray, faces: np.ndarray) -> None:
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    connectivity = " ".join(map(str, faces.ravel()))
    offsets = " ".join(map(str, (np.arange(1, len(faces) + 1) * 3)))
    points = " ".join(f"{x:g}" for x in verts.ravel())
    with open(path, "w") as f:
        f.write(
            '<?xml version="1.0"?>\n'
            '<VTKFile type="PolyData" version="0.1" byte_order="LittleEndian">\n'
            " <PolyData>\n"
            f'  <Piece NumberOfPoints="{len(verts)}" NumberOfVerts="0" '
            f'NumberOfLines="0" NumberOfStrips="0" NumberOfPolys="{len(faces)}">\n'
            "   <Points>\n"
            f'    <DataArray type="Float32" NumberOfComponents="3" format="ascii">{points}</DataArray>\n'
            "   </Points>\n"
            "   <Polys>\n"
            f'    <DataArray type="Int64" Name="connectivity" format="ascii">{connectivity}</DataArray>\n'
            f'    <DataArray type="Int64" Name="offsets" format="ascii">{offsets}</DataArray>\n'
            "   </Polys>\n"
            "  </Piece>\n"
            " </PolyData>\n"
            "</VTKFile>\n"
        )


_VTK_XML_DTYPES = {
    "Float32": np.float32, "Float64": np.float64,
    "Int8": np.int8, "UInt8": np.uint8, "Int16": np.int16,
    "UInt16": np.uint16, "Int32": np.int32, "UInt32": np.uint32,
    "Int64": np.int64, "UInt64": np.uint64,
}


def _vtk_b64_read(b64: str, header_dtype, compressed: bool) -> bytes:
    """Decode one VTK XML base64 payload (inline ``format="binary"`` or one
    appended-data slice).

    Uncompressed: base64(header || data) in a single stream, header = one
    integer byte count.  Compressed (vtkZLibDataCompressor): the header
    ``[n_blocks, block_size, last_block_size, z_size_0..]`` is base64-encoded
    SEPARATELY from the concatenated zlib blocks — the two streams are
    simply concatenated, so the header must be decoded in two passes (the
    block count is only known after reading the first integer).
    """
    import base64
    import zlib

    hsize = np.dtype(header_dtype).itemsize
    if not compressed:
        raw = base64.b64decode(b64 + "===")
        n = int(np.frombuffer(raw[:hsize], header_dtype)[0])
        return raw[hsize:hsize + n]
    # pass 1: first integer = number of blocks (a full-quantum slice of
    # ceil(hsize/3)*4 chars decodes to >= hsize bytes)
    first = base64.b64decode(b64[: -(-hsize // 3) * 4])
    n_blocks = int(np.frombuffer(first[:hsize], header_dtype)[0])
    header_len = (3 + n_blocks) * hsize
    b64_header_chars = -(-header_len // 3) * 4  # ceil to base64 quantum
    header = np.frombuffer(
        base64.b64decode(b64[:b64_header_chars] + "==="), header_dtype)
    data = base64.b64decode(b64[b64_header_chars:] + "===")
    out = []
    pos = 0
    for zsize in header[3:3 + n_blocks]:
        out.append(zlib.decompress(data[pos:pos + int(zsize)]))
        pos += int(zsize)
    return b"".join(out)


def _vtk_raw_appended(buf: bytes, offset: int, header_dtype,
                      compressed: bool) -> bytes:
    import zlib

    hsize = np.dtype(header_dtype).itemsize
    if not compressed:
        n = int(np.frombuffer(buf[offset:offset + hsize], header_dtype)[0])
        return buf[offset + hsize:offset + hsize + n]
    head = np.frombuffer(buf[offset:offset + 3 * hsize], header_dtype)
    n_blocks = int(head[0])
    header = np.frombuffer(buf[offset:offset + (3 + n_blocks) * hsize],
                           header_dtype)
    pos = offset + (3 + n_blocks) * hsize
    out = []
    for zsize in header[3:3 + n_blocks]:
        out.append(zlib.decompress(buf[pos:pos + int(zsize)]))
        pos += int(zsize)
    return b"".join(out)


def read_vtp(path) -> Tuple[np.ndarray, np.ndarray]:
    """Read VTK XML PolyData in any mode the reference's
    ``vtkXMLPolyDataWriter`` emits (reference polydata_utils.py:159 Export —
    ascii or binary, surface .vtp inside .inv3 archives is binary): inline
    ascii, inline base64 ``format="binary"``, and ``format="appended"``
    (base64 or raw encoding), with optional vtkZLibDataCompressor blocks
    and UInt32/UInt64 headers."""
    import re
    import xml.etree.ElementTree as ET

    data = Path(path).read_bytes()
    # the <AppendedData encoding="raw"> body is not valid XML — split it off
    appended_raw = None
    m = re.search(br'<AppendedData\s+encoding="raw"\s*>', data)
    if m:
        body_start = data.index(b"_", m.end()) + 1
        end = data.rindex(b"</AppendedData>")
        appended_raw = data[body_start:end]
        data = data[:m.start()] + b"</VTKFile>"
    root = ET.fromstring(data.decode("utf-8", errors="replace"))
    header_dtype = _VTK_XML_DTYPES[root.get("header_type", "UInt32")]
    compressed = root.get("compressor", "") == "vtkZLibDataCompressor"
    appended_b64 = None
    app = root.find("AppendedData")
    if app is not None and app.get("encoding", "base64") == "base64":
        appended_b64 = "".join(app.itertext()).strip().lstrip("_")

    def decode_array(da) -> np.ndarray:
        dtype = _VTK_XML_DTYPES[da.get("type")]
        fmt = da.get("format", "ascii")
        if fmt == "ascii":
            return np.fromstring("".join(da.itertext()), sep=" ", dtype=dtype)
        if fmt == "binary":
            raw = _vtk_b64_read("".join(da.itertext()).strip(),
                                header_dtype, compressed)
        elif fmt == "appended":
            off = int(da.get("offset", 0))
            if appended_raw is not None:
                raw = _vtk_raw_appended(appended_raw, off, header_dtype,
                                        compressed)
            elif appended_b64 is not None:
                raw = _vtk_b64_read(appended_b64[off:], header_dtype,
                                    compressed)
            else:
                raise ValueError("appended DataArray without AppendedData")
        else:
            raise ValueError(f"unknown DataArray format {fmt!r}")
        return np.frombuffer(raw, dtype)

    piece = root.find(".//Piece")
    verts = decode_array(piece.find("./Points/DataArray")).astype(
        np.float32).reshape(-1, 3)
    conn = None
    for da in piece.find("./Polys"):
        if da.get("Name") == "connectivity":
            conn = decode_array(da)
    return verts, conn.reshape(-1, 3).astype(np.int32)


# ---------------------------------------------------------------------------
# X3D (minimal IndexedFaceSet)
# ---------------------------------------------------------------------------


def write_x3d(path, verts: np.ndarray, faces: np.ndarray) -> None:
    coord_index = " ".join(f"{a} {b} {c} -1" for a, b, c in np.asarray(faces))
    points = " ".join(f"{x:g}" for x in np.asarray(verts).ravel())
    with open(path, "w") as f:
        f.write(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<X3D profile="Interchange" version="3.2">\n <Scene>\n  <Shape>\n'
            f'   <IndexedFaceSet coordIndex="{coord_index}">\n'
            f'    <Coordinate point="{points}"/>\n'
            "   </IndexedFaceSet>\n  </Shape>\n </Scene>\n</X3D>\n"
        )


# ---------------------------------------------------------------------------
# 3MF (minimal single-object model, zip container per the 3MF core spec)
# ---------------------------------------------------------------------------


def write_3mf(path, verts: np.ndarray, faces: np.ndarray, name: str = "Surface") -> None:
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    vtx_xml = "".join(f'<vertex x="{v[0]:g}" y="{v[1]:g}" z="{v[2]:g}"/>' for v in verts)
    tri_xml = "".join(f'<triangle v1="{t[0]}" v2="{t[1]}" v3="{t[2]}"/>' for t in faces)
    model = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<model unit="millimeter" xml:lang="en-US" '
        'xmlns="http://schemas.microsoft.com/3dmanufacturing/core/2015/02">\n'
        " <resources>\n"
        f'  <object id="1" type="model" name="{name}">\n'
        f"   <mesh><vertices>{vtx_xml}</vertices><triangles>{tri_xml}</triangles></mesh>\n"
        "  </object>\n </resources>\n"
        ' <build><item objectid="1"/></build>\n'
        "</model>\n"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">\n'
        ' <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>\n'
        ' <Default Extension="model" ContentType="application/vnd.ms-package.3dmanufacturing-3dmodel+xml"/>\n'
        "</Types>\n"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">\n'
        ' <Relationship Target="/3D/3dmodel.model" Id="rel0" '
        'Type="http://schemas.microsoft.com/3dmanufacturing/2013/01/3dmodel"/>\n'
        "</Relationships>\n"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", rels)
        z.writestr("3D/3dmodel.model", model)


def read_3mf(path) -> Tuple[np.ndarray, np.ndarray]:
    import xml.etree.ElementTree as ET

    with zipfile.ZipFile(path) as z:
        model_name = next(n for n in z.namelist() if n.endswith(".model"))
        root = ET.fromstring(z.read(model_name))
    ns = {"m": root.tag.split("}")[0][1:]}
    verts, faces = [], []
    for v in root.iter(f"{{{ns['m']}}}vertex"):
        verts.append([float(v.get("x")), float(v.get("y")), float(v.get("z"))])
    for t in root.iter(f"{{{ns['m']}}}triangle"):
        faces.append([int(t.get("v1")), int(t.get("v2")), int(t.get("v3"))])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def write_vrml(path, verts: np.ndarray, faces: np.ndarray) -> None:
    """VRML 2.0 (utf8) IndexedFaceSet (reference surface.py export via
    vtkVRMLExporter)."""
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64)
    with open(path, "w") as fh:
        fh.write("#VRML V2.0 utf8\n")
        fh.write("# written by invesalius3_tpu\n")
        fh.write("Shape {\n geometry IndexedFaceSet {\n  coord Coordinate { point [\n")
        np.savetxt(fh, v, fmt="%.6g %.6g %.6g,")
        fh.write("  ] }\n  coordIndex [\n")
        idx = np.column_stack([f, np.full(len(f), -1, np.int64)])
        np.savetxt(fh, idx, fmt="%d %d %d %d,")
        fh.write("  ]\n }\n}\n")


def read_vrml(path) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal VRML 2.0 IndexedFaceSet reader (point + coordIndex blocks,
    triangles only)."""
    text = Path(path).read_text()

    def block(after: str) -> str:
        start = text.index(after) + len(after)
        start = text.index("[", start) + 1
        return text[start:text.index("]", start)]

    pts = np.fromstring(block("point").replace(",", " "), sep=" ")
    idx = np.fromstring(block("coordIndex").replace(",", " "), sep=" ").astype(np.int64)
    verts = pts.reshape(-1, 3).astype(np.float32)
    faces = idx.reshape(-1, 4)[:, :3].astype(np.int32)  # strip -1 terminators
    return verts, faces


def write_iv(path, verts: np.ndarray, faces: np.ndarray) -> None:
    """OpenInventor 2.x ascii IndexedFaceSet (reference surface.py export
    via vtkIVExporter)."""
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64)
    with open(path, "w") as fh:
        fh.write("#Inventor V2.1 ascii\n\nSeparator {\n")
        fh.write(" Coordinate3 { point [\n")
        np.savetxt(fh, v, fmt="%.6g %.6g %.6g,")
        fh.write(" ] }\n IndexedFaceSet { coordIndex [\n")
        idx = np.column_stack([f, np.full(len(f), -1, np.int64)])
        np.savetxt(fh, idx, fmt="%d, %d, %d, %d,")
        fh.write(" ] }\n}\n")



# ---------------------------------------------------------------------------
# Dispatch (the reference's export filetype table, surface.py:1647+)
# ---------------------------------------------------------------------------

WRITERS = {
    ".stl": write_stl,
    ".ply": write_ply,
    ".obj": write_obj,
    ".vtp": write_vtp,
    ".x3d": write_x3d,
    ".3mf": write_3mf,
    ".wrl": write_vrml,
    ".vrml": write_vrml,
    ".iv": write_iv,
}

READERS = {
    ".stl": read_stl,
    ".ply": read_ply,
    ".obj": read_obj,
    ".vtp": read_vtp,
    ".3mf": read_3mf,
    ".wrl": read_vrml,
    ".vrml": read_vrml,
}


def export_surface(path, verts: np.ndarray, faces: np.ndarray, **kw) -> None:
    ext = Path(path).suffix.lower()
    if ext not in WRITERS:
        raise ValueError(f"unsupported mesh format: {ext}")
    WRITERS[ext](path, verts, faces, **kw)


def import_surface(path) -> Tuple[np.ndarray, np.ndarray]:
    ext = Path(path).suffix.lower()
    if ext not in READERS:
        raise ValueError(f"unsupported mesh format: {ext}")
    return READERS[ext](path)


# ---------------------------------------------------------------------------
# Custom neuronavigation ".bin" format (reference converters.py:206
# convert_custom_bin_to_vtk / surface.py:437 OnImportCustomBinFile):
# header int32[3] = (?, n_points, n_triangles), then float32 points (in
# meters; scaled x1000 to mm on read), then int32 triangle indices.
# ---------------------------------------------------------------------------


def read_neuronav_bin(path) -> Tuple[np.ndarray, np.ndarray]:
    numbers = np.fromfile(path, count=3, dtype=np.int32)
    points = np.fromfile(path, dtype=np.float32)
    elements = np.fromfile(path, dtype=np.int32)
    n_pts, n_tris = int(numbers[1]), int(numbers[2])
    verts = (points[3 : n_pts * 3 + 3] * 1000.0).reshape(n_pts, 3)
    faces = elements[n_pts * 3 + 3 :].reshape(n_tris, 3)
    return verts.astype(np.float32), faces.astype(np.int32)


def write_neuronav_bin(path, verts: np.ndarray, faces: np.ndarray) -> None:
    verts = np.asarray(verts, np.float32) / 1000.0  # mm -> meters
    faces = np.asarray(faces, np.int32)
    with open(path, "wb") as f:
        np.asarray([0, len(verts), len(faces)], np.int32).tofile(f)
        verts.astype(np.float32).tofile(f)
        faces.tofile(f)


WRITERS[".bin"] = write_neuronav_bin
READERS[".bin"] = read_neuronav_bin


_chunk_max_jit = None


def jnp_chunk_max(faces3t, K: int, CH: int):
    """Per-face-chunk max referenced vertex id (K,) — the vertex-window
    bound each streamed STL chunk waits for.  The jitted helper lives at
    module level so repeated exports hit the jit cache instead of
    retracing (CLAUDE.md rule 3; this backend has no persistent compile
    cache)."""
    global _chunk_max_jit
    if _chunk_max_jit is None:
        from functools import partial

        import jax
        import jax.numpy as jnp

        @partial(jax.jit, static_argnums=(1, 2))
        def f(ft, k, ch):
            pad = k * ch - ft.shape[1]
            if pad > 0:
                ft = jnp.pad(ft, ((0, 0), (0, pad)))
            return jnp.max(ft.reshape(3, k, ch), axis=(0, 2))

        _chunk_max_jit = f
    return _chunk_max_jit(faces3t, K, CH)


class DeviceFaceStream:
    """Background device→host stream of the packed uint24 face table.

    The face topology is final the moment marching finishes — smoothing
    only moves vertices — so the relay transfer of the face table (78% of
    the export bytes at 512³ meshes) can run concurrently with the
    smoothing passes instead of serializing after them.  Construct this
    right after marching and hand it to ``write_stl_from_device``; chunks
    accumulate host-side while the device computes.  Reference flow:
    surface export (reference data/surface.py:1647 vtkSTLWriter after
    surface_process.py smoothing)."""

    def __init__(self, dm, chunk: int = 1 << 20):
        import queue as _q
        import threading

        from invesalius3_tpu.ops import marching

        packed_dev = marching._pack_uint24(dm.faces3t)  # (9, T_pad) u8
        self.n_tris = int(dm.n_tris)
        T_pad = int(packed_dev.shape[1])
        self.chunk = min(chunk, T_pad)  # last chunk may be short (jax
        # slicing clamps); consumers size windows via jnp_chunk_max
        # unbounded: the whole table is <= ~100 MB host-side and the point
        # is to drain the relay while the device is busy smoothing
        self._q: _q.Queue = _q.Queue()
        self._th = threading.Thread(
            target=self._run, args=(packed_dev,), daemon=True,
            name="face-stream")
        self._th.start()

    def _run(self, packed_dev):
        import numpy as np

        try:
            for i in range(0, self.n_tris, self.chunk):
                chunk = np.asarray(packed_dev[:, i : i + self.chunk])
                self._q.put((chunk, min(self.chunk, self.n_tris - i)))
            self._q.put(None)
        except Exception as e:  # surface the transfer error on the consumer
            self._q.put(e)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                self._th.join()
                return
            if isinstance(item, Exception):
                raise item
            yield item


def write_stl_from_device(path, dm, name: str = "invesalius3_tpu",
                          face_stream: "DeviceFaceStream | None" = None
                          ) -> None:
    """Stream a DeviceMesh straight to a binary STL: fixed-size packed-face
    chunks transfer from the device on a producer thread while the main
    thread packs records natively and writes — the relay transfer, the
    record pack, and the disk write overlap instead of serializing
    (mesh_to_host + write_stl cost ~43 s at 7.3M triangles on this host;
    this path needs no host mesh at all).  Pass a ``DeviceFaceStream``
    started right after marching to additionally overlap the face-table
    transfer with the smoothing compute.  Reference flow: surface export
    (reference data/surface.py:1647 vtkSTLWriter)."""
    import numpy as np

    from invesalius3_tpu import native
    from invesalius3_tpu.ops import marching

    if not native.available():  # fall back to the two-step host path
        if face_stream is not None:
            for _ in face_stream:  # drain so the thread exits
                pass
        verts, faces = marching.mesh_to_host(dm)
        write_stl(path, verts, faces, name=name)
        return

    import threading

    if face_stream is None:
        face_stream = DeviceFaceStream(dm)

    # Smoothed-verts transfer in pieces on a producer thread: face chunk k
    # only references vertices up to a (precomputed) max index, and both
    # face position and vertex rank follow the lattice z-order, so early
    # chunks pack + write while later vert pieces are still in flight —
    # the verts D2H overlaps the single-core pack/write instead of
    # serializing ahead of it.
    V_pad = int(dm.verts3v.shape[1])
    VCH = max(1, V_pad // 8)
    verts = np.empty((dm.n_verts, 3), np.float32)
    state = {"received": 0, "error": None}
    cond = threading.Condition()
    rows16 = marching._verts_f16(dm.verts3v)  # dispatch cast once

    # per-chunk max referenced vertex id, one tiny device program
    T_pad = int(dm.faces3t.shape[1])
    CH = face_stream.chunk
    K = (T_pad + CH - 1) // CH
    chunk_max = np.asarray(
        jnp_chunk_max(dm.faces3t, K, CH)) if K > 1 else \
        np.asarray([dm.n_verts - 1])

    def verts_producer():
        try:
            for a in range(0, V_pad, VCH):
                take = min(a + VCH, dm.n_verts) - a
                if take <= 0:
                    break
                piece = np.asarray(rows16[:, a : a + VCH])  # static shapes
                verts[a : a + take] = native.verts3v_to_n3(piece, take)
                with cond:
                    state["received"] = a + take
                    cond.notify_all()
        except Exception as e:
            state["error"] = e
        finally:
            with cond:
                state["received"] = dm.n_verts
                cond.notify_all()

    vth = threading.Thread(target=verts_producer, daemon=True,
                           name="verts-stream")
    vth.start()

    with open(path, "wb") as f:
        header = (name.encode()[:80]).ljust(80, b"\0")
        f.write(header)
        f.write(struct.pack("<I", dm.n_tris))
        for k, (chunk, n) in enumerate(face_stream):
            # padding columns may hold junk ids: clamp to the real count
            need = min(int(chunk_max[k]) + 1, dm.n_verts)
            with cond:
                while state["received"] < need and state["error"] is None:
                    cond.wait(timeout=1.0)
            if state["error"] is not None:
                raise state["error"]
            faces = native.faces_u24_to_n3(chunk, n)
            f.write(native.stl_pack(verts, faces))
    vth.join()
    if state["error"] is not None:
        raise state["error"]


def write_stl_sharded(path, verts_sh, faces_sh, checks, meta,
                      name: str = "invesalius3_tpu") -> None:
    """Pipelined STL export of `sharded_mask_to_surface(return_parts=True)`
    output: a producer thread drains each shard's owned vertices to the
    host in shard order (= global key order) while the main thread pulls
    face shards, waits only for the vertex coverage shard s's faces
    actually reference (boundary triangles reach into shard s+1's verts),
    packs records natively, and writes — so on a multi-queue host the
    per-shard D2H overlaps the pack/write instead of serializing ahead of
    the whole-mesh assembly.  Byte-identical to assembling then calling
    ``write_stl`` (same record order: shard-major, slab-then-tet-slot).
    Reference flow: surface export (reference data/surface.py:1647
    vtkSTLWriter after the slab join, surface.py:1360-1430)."""
    import threading

    from invesalius3_tpu import native
    from invesalius3_tpu.parallel.sharded_ops import (shard_world_verts,
                                                      shard_wound_faces)

    S = len(checks)
    T = int(meta["max_tris"])
    n_own = [int(checks[s, 0]) for s in range(S)]
    n_tri = [int(checks[s, 1]) for s in range(S)]
    spacing = meta["spacing"]
    smoothed = bool(meta["smoothed"])
    V = sum(n_own)
    n_faces = sum(n_tri)

    def shard_verts(s: int) -> np.ndarray:
        return shard_world_verts(verts_sh[s], n_own[s], spacing, smoothed)

    def shard_faces(s: int) -> np.ndarray:
        return shard_wound_faces(faces_sh[s], T, n_tri[s])

    if not native.available():  # assemble + plain writer fallback
        verts = np.concatenate([shard_verts(s) for s in range(S)], axis=0)
        faces = np.concatenate([shard_faces(s) for s in range(S)], axis=0)
        write_stl(path, verts, faces, name=name)
        return

    verts = np.empty((V, 3), np.float32)
    state = {"received": 0, "error": None}
    cond = threading.Condition()

    def verts_producer():
        try:
            off = 0
            for s in range(S):
                vo = shard_verts(s)
                verts[off : off + len(vo)] = vo
                off += len(vo)
                with cond:
                    state["received"] = off
                    cond.notify_all()
        except Exception as e:
            state["error"] = e
        finally:
            with cond:
                state["received"] = V
                cond.notify_all()

    vth = threading.Thread(target=verts_producer, daemon=True,
                           name="shard-verts-stream")
    vth.start()
    with open(path, "wb") as f:
        f.write((name.encode()[:80]).ljust(80, b"\0"))
        f.write(struct.pack("<I", n_faces))
        for s in range(S):
            faces = shard_faces(s)
            need = int(faces.max()) + 1 if len(faces) else 0
            with cond:
                while state["received"] < need and state["error"] is None:
                    cond.wait(timeout=1.0)
            if state["error"] is not None:
                raise state["error"]
            if len(faces):
                f.write(native.stl_pack(verts, faces))
    vth.join()
    if state["error"] is not None:
        raise state["error"]
