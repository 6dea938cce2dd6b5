"""Isosurface extraction on TPU: marching tetrahedra over active cells.

The reference extracts surfaces with VTK's ``vtkContourFilter`` (marching
cubes) run per 20-slice slab in spawned worker processes (reference
invesalius/data/surface_process.py:71-198, pool at surface.py:1360-1430).

TPU design decisions:

* **Marching tetrahedra (6-tet cube split) instead of classic MC.**  The
  15-case MC tables have face-ambiguity holes on binary masks; the 16-case
  tetrahedra split is watertight by construction — strictly better for the
  framework's headline use (watertight STL for surgical planning / 3D
  printing) and its tiny case table is trivially verifiable.  Triangle
  counts differ from VTK's MC, but volume/area and topology match (tests
  assert volume/area convergence on analytic shapes).

* **Irregular output via two-pass count/compact with static buckets.**
  Everything under ``jit`` needs static shapes, so: (1) find active cells
  (cells whose 8 corners straddle the iso value) and compact their ids
  with ``jnp.nonzero(size=...)``; (2) emit per-tet triangle *edge codes*
  (compact int8, not coordinates) into an (A, 6, 2) buffer; (3) compact
  valid triangles and only then interpolate coordinates.  The host wrapper
  picks bucket sizes from the actual counts (one cheap count pass), so
  recompiles happen only across size buckets.

* **Triangle orientation** is fixed numerically: a triangle's normal is
  flipped to point away from the inside-corner centroid, giving outward
  STL normals regardless of case table winding.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Tetrahedra tables (static, verified by tests)
# ---------------------------------------------------------------------------

# Cube corners, bit i at offset CUBE_OFFSETS[i] (z, y, x)
CUBE_OFFSETS = np.array(
    [
        (0, 0, 0),  # 0
        (0, 0, 1),  # 1
        (0, 1, 1),  # 2
        (0, 1, 0),  # 3
        (1, 0, 0),  # 4
        (1, 0, 1),  # 5
        (1, 1, 1),  # 6
        (1, 1, 0),  # 7
    ],
    np.int32,
)

# 6 tetrahedra around the 0-6 body diagonal (each row: 4 cube-corner ids)
TETS = np.array(
    [
        (0, 5, 1, 6),
        (0, 1, 2, 6),
        (0, 2, 3, 6),
        (0, 3, 7, 6),
        (0, 7, 4, 6),
        (0, 4, 5, 6),
    ],
    np.int32,
)

# Tet edges: local corner pairs
TET_EDGES = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], np.int32)

# Case table: for each of 16 inside-bitmasks, up to 2 triangles of 3 edge
# ids (-1 = unused).  Winding is normalized numerically afterwards.
# int8 keeps the per-active-cell gather at (A, 6, 2, 3) bytes, not 4x that.
_T = -1
TET_TRIS = np.array(
    [
        [[_T] * 3, [_T] * 3],                  # 0000
        [[0, 1, 2], [_T] * 3],                 # 0001 (v0 in)
        [[0, 3, 4], [_T] * 3],                 # 0010 (v1 in)
        [[1, 3, 4], [1, 4, 2]],                # 0011 (v0,v1)
        [[1, 3, 5], [_T] * 3],                 # 0100 (v2 in)
        [[0, 3, 5], [0, 5, 2]],                # 0101 (v0,v2)
        [[0, 1, 5], [0, 5, 4]],                # 0110 (v1,v2)
        [[2, 4, 5], [_T] * 3],                 # 0111 (v3 out)
        [[2, 4, 5], [_T] * 3],                 # 1000 (v3 in)
        [[0, 4, 5], [0, 5, 1]],                # 1001 (v0,v3)
        [[0, 3, 5], [0, 5, 2]],                # 1010 (v1,v3)
        [[1, 3, 5], [_T] * 3],                 # 1011 (v2 out)
        [[1, 3, 4], [1, 4, 2]],                # 1100 (v2,v3)
        [[0, 3, 4], [_T] * 3],                 # 1101 (v1 out)
        [[0, 1, 2], [_T] * 3],                 # 1110 (v0 out)
        [[_T] * 3, [_T] * 3],                  # 1111
    ],
    np.int8,
)

# triangles emitted per tet case (for the exact count pass)
TET_TRI_COUNT = np.array([int(t[0][0] >= 0) + int(t[1][0] >= 0) for t in TET_TRIS],
                         np.int8)


def _cell_strides(shape: Tuple[int, int, int]) -> np.ndarray:
    _, sy, sx = shape
    return np.array([sy * sx, sx, 1], np.int64)


@partial(jax.jit, static_argnames=("iso_greater",))
def count_active_cells(field: jax.Array, iso: float, iso_greater: bool = True) -> jax.Array:
    """Number of cells whose corners straddle the iso surface."""
    inside = field > iso if iso_greater else field < iso
    c = inside
    agg_any = jnp.zeros(tuple(s - 1 for s in field.shape), jnp.bool_)
    agg_all = jnp.ones(tuple(s - 1 for s in field.shape), jnp.bool_)
    for dz, dy, dx in CUBE_OFFSETS:
        corner = c[dz : dz + c.shape[0] - 1, dy : dy + c.shape[1] - 1, dx : dx + c.shape[2] - 1]
        agg_any = agg_any | corner
        agg_all = agg_all & corner
    active = agg_any & ~agg_all
    return jnp.sum(active.astype(jnp.int32))


@partial(jax.jit, static_argnames=("iso_greater",))
def count_cells_and_triangles(field: jax.Array, iso: float,
                              iso_greater: bool = True):
    """(n_active_cells, n_triangles) in one fused pass over the cell
    corners — sizes both compaction buckets tightly."""
    Z, Y, X = field.shape
    inside = field > iso if iso_greater else field < iso
    corners = []
    for dz, dy, dx in CUBE_OFFSETS:
        corners.append(inside[dz : dz + Z - 1, dy : dy + Y - 1, dx : dx + X - 1])
    agg_any = corners[0]
    agg_all = corners[0]
    for c in corners[1:]:
        agg_any = agg_any | c
        agg_all = agg_all & c
    n_active = jnp.sum((agg_any & ~agg_all).astype(jnp.int32))
    # closed form: a tet with s inside-corners emits min(s, 4-s) triangles
    # (0,1,2,1,0 for s = 0..4) — no case-table gathers, uint8 arithmetic
    total = jnp.zeros((), jnp.int32)
    for tet in TETS:
        s = (
            corners[tet[0]].astype(jnp.uint8)
            + corners[tet[1]].astype(jnp.uint8)
            + corners[tet[2]].astype(jnp.uint8)
            + corners[tet[3]].astype(jnp.uint8)
        )
        total = total + jnp.sum(jnp.minimum(s, 4 - s).astype(jnp.int32))
    return n_active, total


def count_triangles(field: jax.Array, iso: float, iso_greater: bool = True):
    return count_cells_and_triangles(field, iso, iso_greater)[1]


@partial(jax.jit, static_argnames=("max_active", "iso_greater"))
def _extract_cells(field: jax.Array, iso: float, max_active: int,
                   iso_greater: bool = True):
    """Stage A: find + compact active cells, gather their 8 corner values /
    inside bits.  Separate jit so the full-volume buffers free before the
    triangle stages run (a single fused program peaked at 26 GB at 512^3)."""
    Z, Y, X = field.shape
    inside = field > iso if iso_greater else field < iso

    agg_any = jnp.zeros((Z - 1, Y - 1, X - 1), jnp.bool_)
    agg_all = jnp.ones((Z - 1, Y - 1, X - 1), jnp.bool_)
    for dz, dy, dx in CUBE_OFFSETS:
        corner = inside[dz : dz + Z - 1, dy : dy + Y - 1, dx : dx + X - 1]
        agg_any = agg_any | corner
        agg_all = agg_all & corner
    active = (agg_any & ~agg_all).reshape(-1)
    n_active = jnp.sum(active.astype(jnp.int32))
    (cell_ids,) = jnp.nonzero(active, size=max_active, fill_value=-1)
    valid_cell = cell_ids >= 0
    cell_ids_safe = jnp.maximum(cell_ids, 0)

    cz = cell_ids_safe // ((Y - 1) * (X - 1))
    rem = cell_ids_safe % ((Y - 1) * (X - 1))
    cy = rem // (X - 1)
    cx = rem % (X - 1)

    # gather in the input dtype (a full-volume float32 copy would cost 4x
    # the bytes of a uint8 mask), cast the small gathered block after.
    # Layout: (8, A) — corners on sublanes, cells on lanes (an (A, 8)
    # array pads its trailing dim to 128 and inflates 16x on TPU).
    flat_f = field.reshape(-1)
    flat_in = inside.reshape(-1)
    corner_lin = []
    for dz, dy, dx in CUBE_OFFSETS:
        corner_lin.append((cz + dz) * (Y * X) + (cy + dy) * X + (cx + dx))
    corner_lin = jnp.stack(corner_lin, axis=0)  # (8, A) lattice ids
    vals = flat_f[corner_lin].astype(jnp.float32)  # (8, A)
    ins = flat_in[corner_lin]  # (8, A) bool
    return corner_lin, vals, ins, valid_cell, n_active


@partial(jax.jit, static_argnames=("max_tris",))
def _emit_slots(ins: jax.Array, valid_cell: jax.Array, max_tris: int):
    """Stage B: per-tet case codes + valid-triangle compaction.

    ins is (8, A); case comes out (6, A) and the flat slot order is
    tet-major: slot = t * 2A + k * A + a.
    """
    tet_in = ins[jnp.asarray(TETS)]  # (6, 4, A)
    case = (
        tet_in[:, 0].astype(jnp.uint8)
        + 2 * tet_in[:, 1].astype(jnp.uint8)
        + 4 * tet_in[:, 2].astype(jnp.uint8)
        + 8 * tet_in[:, 3].astype(jnp.uint8)
    )  # (6, A) uint8
    tri_count_tbl = jnp.asarray(TET_TRI_COUNT)  # (16,)
    n_per_tet = tri_count_tbl[case.astype(jnp.int32)]  # (6, A) int8
    # slot (t, k, a) valid iff k < n_per_tet[t, a]
    tri_valid = (
        jnp.arange(2, dtype=jnp.int8)[None, :, None] < n_per_tet[:, None, :]
    ) & valid_cell[None, None, :]  # (6, 2, A)
    n_tris = jnp.sum(tri_valid.astype(jnp.int32))
    flat_valid = tri_valid.reshape(-1)  # (12A,) tet-major
    (tri_slots,) = jnp.nonzero(flat_valid, size=max_tris, fill_value=-1)
    return case, tri_slots, n_tris


@partial(jax.jit, static_argnames=("vol_shape",))
def _materialize(
    corner_lin: jax.Array,  # (8, A)
    vals: jax.Array,  # (8, A)
    ins: jax.Array,  # (8, A)
    case: jax.Array,  # (6, A) uint8
    tri_slots: jax.Array,  # (T,)
    iso: float,
    vol_shape,
):
    """Stage C: triangle coordinates, outward orientation, dedup keys.

    Everything is computed as 1-D (T,) arrays with the three triangle
    corners unrolled in Python — a (T, 3)-shaped array pads its trailing
    dim to 128 lanes on TPU (42x bandwidth), and (T, 3, 3) pads ~114x (a
    single such copy demanded 25.7 GB at 512^3).

    Returns (pts (3 corners, 3 zyx, T) f32, keys (3 corners, 2, T) i32).
    """
    Z, Y, X = vol_shape
    tets = jnp.asarray(TETS)  # (6, 4) small table
    tet_edges = jnp.asarray(TET_EDGES)  # (6, 2)
    tet_tris = jnp.asarray(TET_TRIS.astype(np.int32))  # (16, 2, 3)

    slot_ok = tri_slots >= 0
    slots = jnp.maximum(tri_slots, 0)
    # tet-major flat order from _emit_slots: slot = t*2A + k*A + a
    A = corner_lin.shape[1]
    t_idx = slots // (2 * A)
    k_idx = (slots // A) % 2
    a_idx = slots % A

    tri_case = case[t_idx, a_idx].astype(jnp.int32)  # (T,)

    def lat_z(lin):
        return (lin // (Y * X)).astype(jnp.float32)

    def lat_y(lin):
        return ((lin // X) % Y).astype(jnp.float32)

    def lat_x(lin):
        return (lin % X).astype(jnp.float32)

    # per-corner 1-D pipelines
    pcs = []  # corner -> (z, y, x) float coords, each (T,)
    lakeys = []  # corner -> (lo, hi) lattice-id pair
    for c in range(3):
        e = tet_tris[tri_case, k_idx, c]  # (T,) local tet edge id
        ea = tet_edges[e, 0]  # (T,) local tet corner
        eb = tet_edges[e, 1]
        ca = tets[t_idx, ea]  # (T,) cube corner id
        cb = tets[t_idx, eb]
        la = corner_lin[ca, a_idx]  # (T,) lattice id
        lb = corner_lin[cb, a_idx]
        fa = vals[ca, a_idx]
        fb = vals[cb, a_idx]
        denom = fb - fa
        t = jnp.where(denom == 0, 0.5,
                      (jnp.float32(iso) - fa) / jnp.where(denom == 0, 1.0, denom))
        t = jnp.clip(t, 0.0, 1.0)
        pz = lat_z(la) + t * (lat_z(lb) - lat_z(la))
        py = lat_y(la) + t * (lat_y(lb) - lat_y(la))
        px = lat_x(la) + t * (lat_x(lb) - lat_x(la))
        pcs.append((pz, py, px))
        lakeys.append((jnp.minimum(la, lb), jnp.maximum(la, lb)))

    # inside-corner centroid of the tet (unrolled over the 4 tet corners)
    czs = cys = cxs = wsum = None
    for j in range(4):
        cj = tets[t_idx, j]  # (T,) cube corner id
        lj = corner_lin[cj, a_idx]
        wj = ins[cj, a_idx].astype(jnp.float32)
        z_, y_, x_ = lat_z(lj) * wj, lat_y(lj) * wj, lat_x(lj) * wj
        if czs is None:
            czs, cys, cxs, wsum = z_, y_, x_, wj
        else:
            czs, cys, cxs, wsum = czs + z_, cys + y_, cxs + x_, wsum + wj
    wsum = jnp.maximum(wsum, 1.0)
    icz, icy, icx = czs / wsum, cys / wsum, cxs / wsum

    (p0z, p0y, p0x), (p1z, p1y, p1x), (p2z, p2y, p2x) = pcs
    e1z, e1y, e1x = p1z - p0z, p1y - p0y, p1x - p0x
    e2z, e2y, e2x = p2z - p0z, p2y - p0y, p2x - p0x
    nz = e1y * e2x - e1x * e2y
    ny = e1x * e2z - e1z * e2x
    nx = e1z * e2y - e1y * e2z
    tcz = (p0z + p1z + p2z) / 3.0
    tcy = (p0y + p1y + p2y) / 3.0
    tcx = (p0x + p1x + p2x) / 3.0
    outward = nz * (tcz - icz) + ny * (tcy - icy) + nx * (tcx - icx) >= 0

    # winding flip under inward orientation: corners (0, 1, 2) -> (0, 2, 1)
    out_p = [pcs[0], [jnp.where(outward, a, b) for a, b in zip(pcs[1], pcs[2])],
             [jnp.where(outward, a, b) for a, b in zip(pcs[2], pcs[1])]]
    out_k = [lakeys[0],
             (jnp.where(outward, lakeys[1][0], lakeys[2][0]),
              jnp.where(outward, lakeys[1][1], lakeys[2][1])),
             (jnp.where(outward, lakeys[2][0], lakeys[1][0]),
              jnp.where(outward, lakeys[2][1], lakeys[1][1]))]

    pts = jnp.stack([jnp.stack([jnp.where(slot_ok, comp, 0.0) for comp in corner])
                     for corner in out_p])  # (3 corners, 3 zyx, T)
    keys = jnp.stack([jnp.stack([jnp.where(slot_ok, comp, -1) for comp in corner])
                      for corner in out_k])  # (3 corners, 2, T)
    return pts, keys


@partial(jax.jit, static_argnames=())
def _dedup_vertices(pts: jax.Array, keys: jax.Array):
    """Device-side shared-vertex dedup by lattice-edge key.

    pts: (3 zyx, M) float32, keys: (2, M) int32 sorted lattice-id pairs
    (invalid slots = -1, one group at the front after sorting).
    Returns (verts (3, M) padded, inverse (M,) int32 group ids, n_groups).
    """
    M = pts.shape[1]
    order = jnp.lexsort((keys[1], keys[0]))
    k0 = keys[0][order]
    k1 = keys[1][order]
    new_group = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        ((k0[1:] != k0[:-1]) | (k1[1:] != k1[:-1])).astype(jnp.int32),
    ])
    group_of_sorted = jnp.cumsum(new_group) - 1  # (M,)
    inverse = jnp.zeros((M,), jnp.int32).at[order].set(group_of_sorted)
    verts = jnp.zeros((3, M), jnp.float32).at[:, group_of_sorted].set(pts[:, order])
    n_groups = group_of_sorted[-1] + 1
    return verts, inverse, n_groups


def marching_cubes(
    field: np.ndarray | jax.Array,
    iso: float,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    max_active: int | None = None,
    max_tris: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract an isosurface; returns (vertices (V, 3) float32 in world mm
    (x, y, z), faces (F, 3) int32) with shared vertices.

    Host wrapper: counts actives first, rounds bucket sizes up to powers of
    two (so jit caches stay small), runs the jitted extraction, then
    deduplicates vertices by lattice-edge key.
    """
    field = jnp.asarray(field)
    if max_active is None or max_tris is None:
        n_act, n_tri = (int(x) for x in count_cells_and_triangles(field, iso))
        if max_active is None:
            max_active = max(1024, _next_pow2(n_act))
        if max_tris is None:
            max_tris = max(2048, _next_pow2(int(n_tri)))

    corner_lin, vals, ins, valid_cell, n_active = _extract_cells(
        field, iso, max_active)
    case, tri_slots, n_tris = _emit_slots(ins, valid_cell, max_tris)
    n_tris = int(n_tris)
    n_active_i = int(n_active)
    if n_active_i > max_active or n_tris > max_tris:  # bucket overflow: retry
        return marching_cubes(
            field, iso, spacing,
            max_active=_next_pow2(n_active_i),
            max_tris=_next_pow2(max(n_tris, n_active_i * 4)),
        )
    # materialize in fixed-size chunks: caps the per-program live set
    CHUNK = 1 << 21
    vol_shape = tuple(int(s) for s in field.shape)
    if max_tris <= CHUNK:
        pts, keys = _materialize(corner_lin, vals, ins, case, tri_slots,
                                 float(iso), vol_shape)
    else:
        pts_parts, key_parts = [], []
        for i in range(0, max_tris, CHUNK):
            p, k = _materialize(corner_lin, vals, ins, case,
                                jax.lax.dynamic_slice_in_dim(tri_slots, i, CHUNK),
                                float(iso), vol_shape)
            pts_parts.append(p)
            key_parts.append(k)
        pts = jnp.concatenate(pts_parts, axis=2)
        keys = jnp.concatenate(key_parts, axis=2)
    del corner_lin, vals, ins, case, tri_slots

    # flatten vertices corner-major: m = corner * T + t
    T = pts.shape[2]
    pts_m = pts.transpose(1, 0, 2).reshape(3, 3 * T)  # (3 zyx, M)
    keys_m = keys.transpose(1, 0, 2).reshape(2, 3 * T)  # (2, M)

    # device-side dedup of shared vertices by edge key, then transfer only
    # the valid prefixes
    verts_d, inverse_d, n_groups = _dedup_vertices(pts_m, keys_m)
    n_groups = int(n_groups)
    verts = np.asarray(verts_d[:, :n_groups]).T  # (V, 3) zyx
    inverse = np.asarray(inverse_d).reshape(3, T)
    faces = inverse[:, :n_tris].T.astype(np.int32)

    # the invalid-slot group (keys == -1) becomes one orphan vertex when
    # padding slots exist; valid faces never reference it.

    # voxel (z, y, x) -> world mm (x, y, z).  Swapping the z and x axes
    # mirrors space (det = -1), so face winding must flip to keep normals
    # outward.
    sx, sy, sz = spacing
    world = np.stack([verts[:, 2] * sx, verts[:, 1] * sy, verts[:, 0] * sz], axis=1)
    return world.astype(np.float32), faces[:, ::-1]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def mask_to_surface(
    mask: np.ndarray | jax.Array,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    **kw,
) -> Tuple[np.ndarray, np.ndarray]:
    """Surface of a visible mask (>= 127), padded by one empty voxel layer
    so border-touching masks still close (reference surface_process.py:52
    pads the image before contouring)."""
    m = jnp.asarray(mask)
    vis = (m >= 127).astype(jnp.uint8)  # stay 1-byte: gathers + passes 4x cheaper
    vis = jnp.pad(vis, 1)
    verts, faces = marching_cubes(vis, 0.5, spacing, **kw)
    # remove the pad offset (one voxel in each axis)
    sx, sy, sz = spacing
    verts = verts - np.array([sx, sy, sz], np.float32)
    return verts, faces
