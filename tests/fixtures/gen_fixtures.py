"""Generate the cross-implementation .inv3 golden fixtures.

``reference_layout.inv3`` is constructed byte-convention-for-byte-convention
the way the reference's ``Project.SavePlistProject`` writes archives
(reference invesalius/project.py:219-345 + Compress :652-670):

* tar members under one random-named top-level folder (tempfile.mkdtemp
  basename), uncompressed tar by default;
* ``main.plist`` XML plist with the reference key set (window_width/level
  ints, ``matrix`` dict, str-indexed ``masks``/``surfaces`` maps,
  ``measurements`` -> member name);
* ``mask_0.dat`` uint8 with the +1 border (reference mask.py:422-431) and
  border flags;
* ``surface_0.vtp`` in vtkXMLPolyDataWriter *binary* data mode: inline
  base64 DataArrays with vtkZLibDataCompressor block framing (reference
  polydata_utils.py:159 Export(bin=True));
* ``measurements.plist`` with int type/location codes
  (reference constants.py:98-112, measures.py:699 get_as_dict).

Run from the repo root:  python tests/fixtures/gen_fixtures.py
"""

from __future__ import annotations

import base64
import io
import plistlib
import struct
import tarfile
import zlib
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent


def synth_volume(n=16):
    zz, yy, xx = np.mgrid[:n, :n, :n].astype(np.float32)
    r = np.sqrt((zz - n / 2) ** 2 + (yy - n / 2) ** 2 + (xx - n / 2) ** 2)
    ct = np.full((n, n, n), -1000, np.int16)
    ct[r < n * 0.4] = 40
    ct[(r >= n * 0.28) & (r < n * 0.4)] = 1200
    return ct


def cube_mesh(lo=2.0, hi=6.0):
    """Hand-built watertight cube (8 verts, 12 tris, outward winding)."""
    v = np.array([[x, y, z] for z in (lo, hi) for y in (lo, hi)
                  for x in (lo, hi)], np.float32)
    f = np.array([
        [0, 2, 1], [1, 2, 3],  # z=lo
        [4, 5, 6], [5, 7, 6],  # z=hi
        [0, 1, 4], [1, 5, 4],  # y=lo
        [2, 6, 3], [3, 6, 7],  # y=hi
        [0, 4, 2], [2, 4, 6],  # x=lo
        [1, 3, 5], [3, 7, 5],  # x=hi
    ], np.int64)
    return v, f


def vtk_binary_array(data: bytes, block_size=32768) -> str:
    """vtkZLibDataCompressor inline-binary encoding: base64(header) +
    base64(zlib blocks), concatenated (header encoded separately)."""
    blocks = [data[i:i + block_size] for i in range(0, len(data), block_size)]
    comp = [zlib.compress(b) for b in blocks]
    header = struct.pack(
        f"<{3 + len(blocks)}I", len(blocks), block_size,
        len(blocks[-1]) if blocks else 0, *(len(c) for c in comp))
    return (base64.b64encode(header).decode()
            + base64.b64encode(b"".join(comp)).decode())


def write_vtp_binary_compressed(verts: np.ndarray, faces: np.ndarray) -> bytes:
    verts = np.asarray(verts, np.float32)
    conn = np.asarray(faces, np.int64).ravel()
    offs = (np.arange(1, len(faces) + 1, dtype=np.int64) * 3)
    pts_b64 = vtk_binary_array(verts.tobytes())
    conn_b64 = vtk_binary_array(conn.tobytes())
    offs_b64 = vtk_binary_array(offs.tobytes())
    return (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="PolyData" version="1.0" byte_order="LittleEndian" '
        'header_type="UInt32" compressor="vtkZLibDataCompressor">\n'
        ' <PolyData>\n'
        f'  <Piece NumberOfPoints="{len(verts)}" NumberOfVerts="0" '
        f'NumberOfLines="0" NumberOfStrips="0" NumberOfPolys="{len(faces)}">\n'
        '   <Points>\n'
        f'    <DataArray type="Float32" Name="Points" NumberOfComponents="3" '
        f'format="binary">{pts_b64}</DataArray>\n'
        '   </Points>\n'
        '   <Polys>\n'
        f'    <DataArray type="Int64" Name="connectivity" format="binary">'
        f'{conn_b64}</DataArray>\n'
        f'    <DataArray type="Int64" Name="offsets" format="binary">'
        f'{offs_b64}</DataArray>\n'
        '   </Polys>\n'
        '  </Piece>\n'
        ' </PolyData>\n'
        '</VTKFile>\n'
    ).encode()


def write_vtp_appended_raw(verts: np.ndarray, faces: np.ndarray) -> bytes:
    """The other writer mode VTK emits: format="appended", encoding="raw",
    uncompressed UInt64 headers (modern VTK default header type)."""
    verts = np.asarray(verts, np.float32)
    conn = np.asarray(faces, np.int64).ravel()
    offs = (np.arange(1, len(faces) + 1, dtype=np.int64) * 3)
    payload = b""
    offsets = []
    for arr in (verts.tobytes(), conn.tobytes(), offs.tobytes()):
        offsets.append(len(payload))
        payload += struct.pack("<Q", len(arr)) + arr
    head = (
        '<?xml version="1.0"?>\n'
        '<VTKFile type="PolyData" version="1.0" byte_order="LittleEndian" '
        'header_type="UInt64">\n'
        ' <PolyData>\n'
        f'  <Piece NumberOfPoints="{len(verts)}" NumberOfVerts="0" '
        f'NumberOfLines="0" NumberOfStrips="0" NumberOfPolys="{len(faces)}">\n'
        '   <Points>\n'
        f'    <DataArray type="Float32" Name="Points" NumberOfComponents="3" '
        f'format="appended" offset="{offsets[0]}"/>\n'
        '   </Points>\n'
        '   <Polys>\n'
        f'    <DataArray type="Int64" Name="connectivity" format="appended" '
        f'offset="{offsets[1]}"/>\n'
        f'    <DataArray type="Int64" Name="offsets" format="appended" '
        f'offset="{offsets[2]}"/>\n'
        '   </Polys>\n'
        '  </Piece>\n'
        ' </PolyData>\n'
        ' <AppendedData encoding="raw">\n_'
    ).encode()
    return head + payload + b"\n </AppendedData>\n</VTKFile>\n"


def make_reference_inv3(path: Path) -> None:
    ct = synth_volume(16)
    bone = ((ct >= 226) & (ct <= 3071)).astype(np.uint8) * 255

    # +1-border mask layout, border flags = 1 (mask.py:422-431 convention)
    bordered = np.zeros(tuple(s + 1 for s in bone.shape), np.uint8)
    bordered[1:, 1:, 1:] = bone
    bordered[0, 0, 0] = 1
    bordered[1:, 0, 0] = 1

    mask_plist = plistlib.dumps({
        "index": 0,
        "name": "Mask 1",
        "colour": [0.0, 1.0, 0.0],
        "opacity": 0.4,
        "threshold_range": (226, 3071),
        "edition_threshold_range": (127, 255),
        "visible": True,
        "mask_file": "mask_0.dat",
        "mask_shape": tuple(bordered.shape),
        "edited": False,
        "derived_from": "original",
    })

    cv, cf = cube_mesh()
    surf0_vtp = write_vtp_binary_compressed(cv, cf)
    surf1_vtp = write_vtp_appended_raw(cv + 8.0, cf)
    surf_plists = {}
    for i in range(2):
        surf_plists[i] = plistlib.dumps({
            "colour": (1.0, 0.78, 0.65),
            "index": i,
            "name": f"Surface {i + 1}",
            "polydata": f"surface_{i}.vtp",
            "transparency": 0.0,
            "visible": True,
            "volume": 64.0,
            "area": 96.0,
            "category": "General",
        })

    measurements = plistlib.dumps({
        "0": {
            "index": 0, "name": "M 1", "colour": (1.0, 0.0, 0.0),
            "value": 5.0, "location": 1, "type": 6,  # AXIAL, LINEAR
            "slice_number": 8,
            "points": [(1.0, 2.0, 3.0), (4.0, 6.0, 3.0)], "visible": True,
        },
        "1": {
            "index": 1, "name": "M 2", "colour": (0.0, 0.0, 1.0),
            "value": 90.0, "location": 2, "type": 7,  # CORONAL, ANGULAR
            "slice_number": 4,
            "points": [(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (1.0, 1.0, 0.0)],
            "visible": True,
        },
    })

    main = plistlib.dumps({
        "format_version": 1.1,
        "invesalius_version": "3.1.99998",
        "date": "2026-08-17T00:00:00",
        "compress": False,
        "name": "FIXTURE SPHERE",
        "modality": "CT",
        "orientation": "AXIAL",
        "window_width": 2000,
        "window_level": 300,
        "scalar_range": (-1000, 1200),
        "spacing": (0.5, 0.5, 1.0),
        "image_fiducials": [[float("nan")] * 3] * 3,
        "affine": np.diag([0.5, 0.5, 1.0, 1.0]).tolist(),
        "matrix": {"filename": "matrix.dat", "shape": ct.shape,
                   "dtype": "int16"},
        "image_versions": [],
        "masks": {"0": "mask_0.plist"},
        "surfaces": {"0": "surface_0.plist", "1": "surface_1.plist"},
        "measurements": "measurements.plist",
        "annotations": {},
    })

    # reference Compress(): members under the mkdtemp basename
    sub = "tmp7kq2p1x3"
    members = {
        "main.plist": main,
        "matrix.dat": ct.tobytes(),
        "mask_0.plist": mask_plist,
        "mask_0.dat": bordered.tobytes(),
        "surface_0.plist": surf_plists[0],
        "surface_0.vtp": surf0_vtp,
        "surface_1.plist": surf_plists[1],
        "surface_1.vtp": surf1_vtp,
        "measurements.plist": measurements,
    }
    with tarfile.open(path, "w") as tar:
        for name, data in members.items():
            info = tarfile.TarInfo(f"{sub}/{name}")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def make_repo_inv3(path: Path) -> None:
    import sys

    sys.path.insert(0, str(HERE.parent.parent))
    from invesalius3_tpu.core.mask import Mask
    from invesalius3_tpu.core.project import Project
    from invesalius3_tpu.core.surface import Surface
    from invesalius3_tpu.core.volume import Volume

    ct = synth_volume(16)
    proj = Project()
    proj.name = "FIXTURE SPHERE"
    proj.modality = "CT"
    proj.window, proj.level = 2000, 300
    proj.volume = Volume.from_numpy(ct, spacing=(0.5, 0.5, 1.0))
    bone = ((ct >= 226) & (ct <= 3071)).astype(np.uint8) * 255
    m = Mask(index=0, name="Mask 1")
    m.threshold_range = (226, 3071)
    m.data = bone
    proj.mask_dict[0] = m
    cv, cf = cube_mesh()
    proj.surface_dict[0] = Surface(vertices=cv, faces=cf.astype(np.int32),
                                   index=0, name="Surface 1")
    proj.measurement_dict[0] = {
        "index": 0, "name": "M 1", "colour": [1.0, 0.0, 0.0],
        "value": 5.0, "location": "AXIAL", "type": "linear",
        "slice_number": 8, "points": [[1.0, 2.0, 3.0], [4.0, 6.0, 3.0]],
        "visible": True,
    }
    proj.save(path)


if __name__ == "__main__":
    make_reference_inv3(HERE / "reference_layout.inv3")
    make_repo_inv3(HERE / "repo_written.inv3")
    print("wrote", HERE / "reference_layout.inv3",
          (HERE / "reference_layout.inv3").stat().st_size, "bytes")
    print("wrote", HERE / "repo_written.inv3",
          (HERE / "repo_written.inv3").stat().st_size, "bytes")
