"""Surface extraction (marching tetrahedra), smoothing, mass properties,
and mesh I/O round-trips — semantics of the reference surface pipeline
(surface_process.py create_surface_piece/join_process_surface)."""

import jax.numpy as jnp
import numpy as np
import pytest

from invesalius3_tpu.io import mesh_io
from invesalius3_tpu.ops import marching, mesh


def _cube_mask(n=20, lo=5, hi=15):
    m = np.zeros((n, n, n), np.uint8)
    m[lo:hi, lo:hi, lo:hi] = 255
    return m


def _sphere_mask(n=48, r=18.0):
    zz, yy, xx = np.mgrid[:n, :n, :n].astype(np.float64)
    c = (n - 1) / 2.0
    d = np.sqrt((zz - c) ** 2 + (yy - c) ** 2 + (xx - c) ** 2)
    return np.where(d <= r, 255, 0).astype(np.uint8)


def _edge_face_counts(faces):
    from collections import Counter

    cnt = Counter()
    for a, b, c in faces:
        for e in ((a, b), (b, c), (c, a)):
            cnt[tuple(sorted(e))] += 1
    return cnt


def test_cube_surface_watertight_and_metrics():
    mask = _cube_mask()
    verts, faces = marching.mask_to_surface(mask, spacing=(1.0, 1.0, 1.0))
    assert len(verts) > 0 and len(faces) > 0
    # watertight: every edge shared by exactly two triangles
    cnt = _edge_face_counts(faces)
    assert set(cnt.values()) == {2}
    vol, area = mesh.mass_properties(verts.astype(np.float32), faces)
    # iso-surface of a 10^3 voxel cube at the half-crossing: 10.0 side
    assert abs(float(vol) - 1000.0) / 1000.0 < 0.11
    assert abs(float(area) - 600.0) / 600.0 < 0.25  # MT staircase diagonal area


def test_sphere_surface_volume():
    mask = _sphere_mask()
    verts, faces = marching.mask_to_surface(mask)
    cnt = _edge_face_counts(faces)
    assert set(cnt.values()) == {2}
    vol, _ = mesh.mass_properties(verts.astype(np.float32), faces)
    want = 4.0 / 3.0 * np.pi * 18.0**3
    assert abs(float(vol) - want) / want < 0.03


def test_surface_normals_point_outward():
    mask = _cube_mask()
    verts, faces = marching.mask_to_surface(mask)
    center = verts.mean(axis=0)
    p0, p1, p2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    outward = np.einsum("ij,ij->i", n, (p0 + p1 + p2) / 3.0 - center)
    assert (outward > 0).mean() > 0.999


def test_anisotropic_spacing_scales_world_coords():
    mask = _cube_mask()
    v1, _ = marching.mask_to_surface(mask, spacing=(1.0, 1.0, 1.0))
    v2, _ = marching.mask_to_surface(mask, spacing=(0.5, 1.0, 2.0))
    np.testing.assert_allclose(v2[:, 0].max() / v1[:, 0].max(), 0.5, atol=1e-5)
    np.testing.assert_allclose(v2[:, 2].max() / v1[:, 2].max(), 2.0, atol=1e-5)


def test_taubin_smooth_shrinks_noise():
    rng = np.random.default_rng(0)
    verts, faces = marching.mask_to_surface(_sphere_mask(32, 12.0))
    noisy = verts + rng.normal(0, 0.15, verts.shape).astype(np.float32)
    neigh, deg = mesh.vertex_adjacency(faces, len(verts))
    import jax.numpy as jnp

    sm = np.asarray(
        mesh.taubin_smooth(
            jnp.asarray(noisy), jnp.asarray(neigh), jnp.asarray(deg),
            jnp.ones(len(verts), jnp.float32), 0.5, -0.53, 10,
        )
    )
    c = verts.mean(axis=0)

    def roughness(v):
        r = np.linalg.norm(v - c, axis=1)
        return r.std()

    assert roughness(sm) < roughness(noisy)


def test_ca_smoothing_reduces_staircase():
    # anisotropic mask: staircase along z
    zz, yy, xx = np.mgrid[:12, :40, :40].astype(float)
    d = np.sqrt(((zz - 5.5) * 4) ** 2 + (yy - 19.5) ** 2 + (xx - 19.5) ** 2)
    mask = np.where(d <= 14, 255, 0).astype(np.uint8)
    verts, faces = marching.mask_to_surface(mask, spacing=(1.0, 1.0, 4.0))
    out = mesh.ca_smoothing(verts, faces, t=0.7, tmax=6.0, bmin=0.5, n_iters=10)
    assert out.shape == verts.shape
    assert not np.allclose(out, verts)
    vol0, _ = mesh.mass_properties(verts.astype(np.float32), faces)
    vol1, _ = mesh.mass_properties(out.astype(np.float32), faces)
    assert abs(float(vol1) - float(vol0)) / float(vol0) < 0.2


def test_keep_largest_component():
    m = np.zeros((24, 24, 24), np.uint8)
    m[2:6, 2:6, 2:6] = 255
    m[10:20, 10:20, 10:20] = 255
    verts, faces = marching.mask_to_surface(m)
    kv, kf = mesh.keep_largest_component(verts, faces)
    vol, _ = mesh.mass_properties(kv.astype(np.float32), kf)
    assert 800 < float(vol) < 1100  # the 10^3 cube only


@pytest.mark.parametrize("ext", [".stl", ".ply", ".obj", ".vtp", ".3mf"])
def test_mesh_io_roundtrip(tmp_path, ext):
    verts, faces = marching.mask_to_surface(_cube_mask(12, 3, 9))
    p = tmp_path / f"m{ext}"
    mesh_io.export_surface(str(p), verts, faces)
    rv, rf = mesh_io.import_surface(str(p))
    assert len(rf) == len(faces)
    vol0, area0 = mesh.mass_properties(verts.astype(np.float32), faces)
    vol1, area1 = mesh.mass_properties(rv.astype(np.float32), rf)
    np.testing.assert_allclose(float(vol1), float(vol0), rtol=1e-4)
    np.testing.assert_allclose(float(area1), float(area0), rtol=1e-4)


def test_stl_ascii_roundtrip(tmp_path):
    verts, faces = marching.mask_to_surface(_cube_mask(10, 3, 7))
    p = tmp_path / "m.stl"
    mesh_io.write_stl(str(p), verts, faces, binary=False)
    rv, rf = mesh_io.read_stl(str(p))
    assert len(rf) == len(faces)


def test_x3d_writes(tmp_path):
    verts, faces = marching.mask_to_surface(_cube_mask(10, 3, 7))
    p = tmp_path / "m.x3d"
    mesh_io.write_x3d(str(p), verts, faces)
    assert p.exists() and p.stat().st_size > 100


# ---------------------------------------------------------------------------
# connectivity editing (reference surface.py:319-435) + relaxation smoothing
# ---------------------------------------------------------------------------
def _two_tets():
    tet_v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tet_f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    # second, bigger component: a tet subdivided = use 2 tets sharing verts
    far = tet_v + 10.0
    extra_v = np.array([[10.5, 10.5, 11.5]], np.float32)
    v = np.vstack([tet_v, far, extra_v])
    f2 = tet_f + 4
    f3 = np.array([[4, 5, 8], [5, 6, 8], [4, 6, 8]], np.int32)
    f = np.vstack([tet_f, f2, f3])
    return v, f


def test_split_components_largest_first():
    from invesalius3_tpu.ops import mesh as mesh_ops

    v, f = _two_tets()
    parts = mesh_ops.split_components(v, f)
    assert len(parts) == 2
    (v0, f0), (v1, f1) = parts
    assert len(f0) >= len(f1)          # largest first
    assert len(v0) == 5 and len(f0) == 7
    assert len(v1) == 4 and len(f1) == 4
    assert f0.max() < len(v0) and f1.max() < len(v1)  # reindexed


def test_select_components_by_seed_point():
    from invesalius3_tpu.core.surface import Surface, surface_from_seeds

    v, f = _two_tets()
    s = Surface(vertices=v, faces=f, name="two")
    picked = surface_from_seeds(s, [[0.1, 0.1, 0.1]])  # near first tet
    assert len(picked.vertices) == 4 and len(picked.faces) == 4
    both = surface_from_seeds(s, [[0.1, 0.1, 0.1], [10.2, 10.0, 10.1]])
    assert len(both.vertices) == 9 and len(both.faces) == 11


def test_split_surface_objects():
    from invesalius3_tpu.core.surface import Surface, split_surface

    v, f = _two_tets()
    parts = split_surface(Surface(vertices=v, faces=f, name="two"))
    assert [p.name for p in parts] == ["two part 1", "two part 2"]
    assert all(p.area > 0 for p in parts)


def test_laplacian_smooth_contracts():
    from invesalius3_tpu.ops import mesh as mesh_ops

    # icosahedron-ish: unit-sphere random triangulation via convex hull
    from scipy.spatial import ConvexHull

    pts = np.random.default_rng(3).normal(size=(80, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    hull = ConvexHull(pts)
    v, f = pts.astype(np.float32), hull.simplices.astype(np.int32)
    out = mesh_ops.laplacian_smooth(v, f, iterations=20, relaxation=0.4)
    assert out.shape == v.shape
    r_before = np.linalg.norm(v - v.mean(0), axis=1).mean()
    r_after = np.linalg.norm(out - out.mean(0), axis=1).mean()
    assert 0.3 * r_before < r_after < r_before  # shrinks but doesn't collapse


# ---------------------------------------------------------------------------
# fused device pipeline: adjacency-from-dedup-sort, grid propagate
# ---------------------------------------------------------------------------
def test_adjacency_gather_formulation_identical():
    """The gather table build (INV3_ADJ_GATHER) is bit-identical to the
    scatter build, including with padding slots (an orphan group 0)."""
    from invesalius3_tpu.ops import marching, mesh as mesh_ops

    for mask in (_sphere_mask(24, 9.0), _cube_mask()):
        dm = marching.mask_to_surface_device(mask)
        mg = int(mesh_ops._max_group_size(dm.group_of_sorted,
                                          dm.sorted_valid))
        max_deg = max(8, 1 << (mg - 1).bit_length())
        T = dm.faces3t.shape[1]
        args = (dm.inverse, dm.order, dm.group_of_sorted, dm.sorted_valid)
        n_s, d_s, t_s = mesh_ops._adjacency_from_sorted_corners(
            *args, T, dm.verts3v.shape[1], max_deg, return_raw=True,
            use_gather=False)
        n_g, d_g, t_g = mesh_ops._adjacency_from_sorted_corners(
            *args, T, dm.verts3v.shape[1], max_deg, return_raw=True,
            use_gather=True)
        np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_g))
        np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_g))
        np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_g))


def test_adjacency_from_device_mesh_matches_lexsort():
    from invesalius3_tpu.ops import marching, mesh as mesh_ops

    dm = marching.mask_to_surface_device(_sphere_mask(24, 9.0))
    neigh, deg = mesh_ops.adjacency_from_device_mesh(dm)
    neigh = np.asarray(neigh)
    deg = np.asarray(deg)
    verts, faces = marching.mesh_to_host(dm, fp16=False)
    table2, deg2 = mesh_ops.vertex_adjacency_fast(faces, len(verts))
    table2 = np.asarray(table2.T)  # (D2, V)
    deg2 = np.asarray(deg2)
    V = len(verts)
    np.testing.assert_array_equal(deg[:V], deg2)
    for v in range(0, V, 97):  # spot-check neighbor sets
        a = set(neigh[:deg[v], v].tolist())
        b = set(table2[:deg2[v], v].tolist())
        assert a == b, f"vertex {v}: {a} != {b}"
    # full check: valid entries equal as sorted arrays
    D = min(neigh.shape[0], table2.shape[0])
    mask_valid = np.arange(D)[:, None] < deg2[None, :]
    a = np.where(mask_valid, np.sort(neigh[:D, :V], axis=0)[:D], -1)
    b = np.where(mask_valid, np.sort(table2[:D], axis=0)[:D], -1)
    # sorts differ only in sentinel handling; compare within-degree prefix
    got = np.sort(np.where(np.arange(neigh.shape[0])[:, None] < deg[None, :V],
                           neigh[:, :V], 2**30), axis=0)[:D]
    want = np.sort(np.where(np.arange(table2.shape[0])[:, None] < deg2[None, :],
                            table2, 2**30), axis=0)[:D]
    np.testing.assert_array_equal(np.where(mask_valid, got, -1),
                                  np.where(mask_valid, want, -1))


def test_adjacency_maxdeg_overflow_raises(monkeypatch):
    """adjacency_from_device_mesh hardcodes max_deg=16 and verifies the
    untruncated run-length max post-hoc; forcing the bound below the
    mesh's real max degree must raise (not silently truncate fans)."""
    import pytest

    from invesalius3_tpu.ops import marching, mesh as mesh_ops

    dm = marching.mask_to_surface_device(_sphere_mask(24, 9.0))
    _, deg = mesh_ops.adjacency_from_device_mesh(dm)
    real_max = int(np.asarray(deg).max())
    assert real_max > 4  # the forced bound below must actually be violated
    monkeypatch.setenv("INV3_ADJ_MAXD", "4")
    with pytest.raises(ValueError, match="exceeds the max_deg"):
        mesh_ops.adjacency_from_device_mesh(dm)


def test_ca_smoothing_device_mesh_propagate_matches_host():
    from invesalius3_tpu.ops import marching, mesh as mesh_ops

    mask = _sphere_mask(20, 7.0)
    dm = marching.mask_to_surface_device(mask)
    out_dev = np.asarray(mesh_ops.ca_smoothing_device(
        dm, propagate="mesh").T)[:dm.n_verts]
    verts, faces = marching.mesh_to_host(dm, fp16=False)
    out_host = mesh_ops.ca_smoothing(verts, faces)
    np.testing.assert_allclose(out_dev, out_host, atol=1e-5)


def test_ca_smoothing_grid_propagate_close_to_mesh():
    from invesalius3_tpu.ops import marching, mesh as mesh_ops

    mask = _cube_mask(20, 4, 15)
    dm = marching.mask_to_surface_device(mask)
    dev_grid = np.asarray(mesh_ops.ca_smoothing_device(
        dm, propagate="grid").T)[:dm.n_verts]
    dev_mesh = np.asarray(mesh_ops.ca_smoothing_device(
        dm, propagate="mesh").T)[:dm.n_verts]
    # same smoothing character: vertices move by comparable amounts
    base = np.asarray(dm.verts3v.T)[:dm.n_verts]
    d_grid = np.linalg.norm(dev_grid - base, axis=1)
    d_mesh = np.linalg.norm(dev_mesh - base, axis=1)
    assert abs(d_grid.mean() - d_mesh.mean()) < 0.15 * max(d_mesh.mean(), 1e-6)
    np.testing.assert_allclose(dev_grid, dev_mesh, atol=0.5)


def test_mesh_to_host_fp16_packing():
    from invesalius3_tpu.ops import marching

    mask = _sphere_mask(16, 6.0)
    dm = marching.mask_to_surface_device(mask, spacing=(0.7, 0.9, 1.1))
    v32, f32_ = marching.mesh_to_host(dm, fp16=False)
    v16, f16_ = marching.mesh_to_host(dm, fp16=True)
    np.testing.assert_array_equal(f32_, f16_)
    np.testing.assert_allclose(v16, v32, atol=0.05)  # fp16 ulp at ~16mm


def test_write_stl_from_device_matches_host_path(tmp_path):
    """The streamed device->STL writer produces the same triangle soup as
    mesh_to_host + write_stl (both fp16-quantized verts)."""
    from invesalius3_tpu.io import mesh_io
    from invesalius3_tpu import native

    if not native.available():
        import pytest
        pytest.skip("no native meshpack")
    mask = _cube_mask()
    dm = marching.mask_to_surface_device(mask, spacing=(0.5, 0.5, 1.0))
    p1 = tmp_path / "stream.stl"
    p2 = tmp_path / "host.stl"
    mesh_io.write_stl_from_device(p1, dm)
    verts, faces = marching.mesh_to_host(dm)
    mesh_io.write_stl(p2, verts, faces)
    v1, f1 = mesh_io.read_stl(p1)
    v2, f2 = mesh_io.read_stl(p2)
    assert len(f1) == len(f2) == dm.n_tris
    np.testing.assert_array_equal(np.sort(v1.round(3), axis=0),
                                  np.sort(v2.round(3), axis=0))


def test_write_stl_from_device_prefetched_face_stream(tmp_path):
    """A DeviceFaceStream started before smoothing (bench.py overlap path)
    yields a byte-identical STL to the unprefetched writer, including with
    a chunk smaller than the face count."""
    import dataclasses

    from invesalius3_tpu.io import mesh_io
    from invesalius3_tpu.ops import mesh as mesh_ops
    from invesalius3_tpu import native

    if not native.available():
        import pytest
        pytest.skip("no native meshpack")
    mask = _sphere_mask(16, 6.0)
    dm = marching.mask_to_surface_device(mask, spacing=(0.5, 0.5, 1.0))
    fs = mesh_io.DeviceFaceStream(dm, chunk=64)  # many chunks
    out3v = mesh_ops.ca_smoothing_device(dm, 0.7, 3.0, 0.5, 2)
    dm2 = dataclasses.replace(dm, verts3v=out3v)
    p1 = tmp_path / "prefetch.stl"
    p2 = tmp_path / "plain.stl"
    mesh_io.write_stl_from_device(p1, dm2, face_stream=fs)
    mesh_io.write_stl_from_device(p2, dm2)
    assert p1.read_bytes() == p2.read_bytes()


# ---------------------------------------------------------------------------
# Hole filling + mesh import flow (reference surface_process.py:397-415
# vtkFillHolesFilter(HoleSize=300); surface.py:619 OnImportSurfaceFile)
# ---------------------------------------------------------------------------


def _punch_hole(verts, faces, n_remove=1):
    """Remove the n_remove faces nearest +z apex to open a boundary loop."""
    tri_z = verts[faces].mean(axis=1)[:, 2]
    drop = np.argsort(tri_z)[-n_remove:]
    keep = np.ones(len(faces), bool)
    keep[drop] = False
    return faces[keep]


def test_fill_holes_restores_watertight():
    from invesalius3_tpu.ops import mesh as mesh_ops

    mask = _sphere_mask(32, 12.0)
    verts, faces = marching.mask_to_surface(mask)
    verts, faces = np.asarray(verts), np.asarray(faces)
    full_vol = float(np.asarray(mesh_ops.mass_properties(
        jnp.asarray(verts), jnp.asarray(faces))[0]))

    holed = _punch_hole(verts, faces, n_remove=6)
    assert len(mesh_ops.boundary_loops(holed, len(verts))) >= 1

    v2, f2, n_filled = mesh_ops.fill_holes(verts, holed)
    assert n_filled >= 1
    assert mesh_ops.boundary_loops(f2, len(v2)) == []
    # every edge used exactly twice -> watertight, consistent winding
    cnt = _edge_face_counts(f2)
    assert set(cnt.values()) == {2}
    vol = float(np.asarray(mesh_ops.mass_properties(
        jnp.asarray(v2), jnp.asarray(f2))[0]))
    assert abs(vol - full_vol) / full_vol < 0.01


def test_fill_holes_respects_size_cap():
    from invesalius3_tpu.ops import mesh as mesh_ops

    verts, faces = marching.mask_to_surface(_sphere_mask(32, 12.0))
    verts, faces = np.asarray(verts), np.asarray(faces)
    holed = _punch_hole(verts, faces, n_remove=4)
    v2, f2, n_filled = mesh_ops.fill_holes(verts, holed, hole_size=1e-3)
    assert n_filled == 0 and len(f2) == len(holed)


def test_import_surface_file_fills_and_measures(tmp_path):
    from invesalius3_tpu.core.surface import import_surface_file
    from invesalius3_tpu.ops import mesh as mesh_ops

    verts, faces = marching.mask_to_surface(_sphere_mask(32, 12.0))
    verts, faces = np.asarray(verts), np.asarray(faces)
    holed = _punch_hole(verts, faces, n_remove=6)
    p = tmp_path / "holed.stl"
    mesh_io.write_stl(p, verts, holed)

    surf = import_surface_file(p)
    assert surf.name == "holed"
    assert surf.filled_holes >= 1
    assert surf.volume > 0 and surf.area > 0
    assert mesh_ops.boundary_loops(surf.faces, len(surf.vertices)) == []


def test_cli_standalone_surface_import(tmp_path, capsys):
    from invesalius3_tpu import app

    verts, faces = marching.mask_to_surface(_cube_mask())
    p = tmp_path / "cube.stl"
    mesh_io.write_stl(p, np.asarray(verts), np.asarray(faces))
    out = tmp_path / "cube.ply"
    rc = app.main(["--import-surface", str(p), "-e", str(out)])
    assert rc == 0 and out.exists()
    v2, f2 = mesh_io.read_ply(out)
    assert len(f2) == len(np.asarray(faces))


def test_taubin_bucketed_matches_unbucketed():
    from invesalius3_tpu.ops import marching, mesh as mesh_ops

    dm = marching.mask_to_surface_device(_sphere_mask(64, 26.0))
    neigh, deg = mesh_ops.adjacency_from_device_mesh(dm)
    # big enough that the bucketed path actually splits
    n_lo = int(jnp.sum(deg <= 6))
    assert (n_lo // 4096) * 4096 >= 4096
    w = jnp.linspace(0.5, 1.0, dm.verts3v.shape[1])
    a = mesh_ops._taubin_core(dm.verts3v, neigh, deg, w,
                              jnp.float32(0.5), jnp.float32(-0.53), 5)
    b = mesh_ops.taubin_smooth_bucketed(dm.verts3v, neigh, deg, w,
                                        jnp.float32(0.5), jnp.float32(-0.53),
                                        5)
    used = np.zeros(dm.verts3v.shape[1], bool)
    used[np.asarray(dm.faces3t).ravel()] = True
    np.testing.assert_allclose(np.asarray(a)[:, used], np.asarray(b)[:, used],
                               atol=1e-5)
