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

import dataclasses
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


BLOCK = 8  # cells per side of the hierarchical-extraction blocks


def _pad_to_blocks(active: jax.Array):
    """Pad a (Zc, Yc, Xc) cell grid up to BLOCK multiples (False fill)."""
    pads = tuple((0, -s % BLOCK) for s in active.shape)
    return jnp.pad(active, pads) if any(p[1] for p in pads) else active


def _block_any(active: jax.Array) -> jax.Array:
    """(Zb, Yb, Xb) flags: does this BLOCK^3 cell block contain an active
    cell?  One bandwidth pass over the bool grid — the hierarchy that lets
    extraction sort ~n_blocks * 512 candidate ids instead of all (N-1)^3
    cell ids (134M at 512^3, whose sort alone costs ~0.44 s)."""
    a = _pad_to_blocks(active)
    Zp, Yp, Xp = a.shape
    return a.reshape(Zp // BLOCK, BLOCK, Yp // BLOCK, BLOCK,
                     Xp // BLOCK, BLOCK).any(axis=(1, 3, 5))


@partial(jax.jit, static_argnames=("iso_greater",))
def _count_all(field: jax.Array, iso: float, iso_greater: bool = True):
    """(n_active_cells, n_triangles, n_active_blocks) in one fused pass
    over the cell corners — sizes all three compaction buckets tightly."""
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
    active = agg_any & ~agg_all
    n_active = jnp.sum(active.astype(jnp.int32))
    n_blocks = jnp.sum(_block_any(active).astype(jnp.int32))
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
    return n_active, total, n_blocks


def count_cells_and_triangles(field: jax.Array, iso: float,
                              iso_greater: bool = True):
    """(n_active_cells, n_triangles) — see _count_all."""
    return _count_all(field, iso, iso_greater)[:2]


def count_triangles(field: jax.Array, iso: float, iso_greater: bool = True):
    return count_cells_and_triangles(field, iso, iso_greater)[1]


def _compact_true_ids(mask_flat: jax.Array, size: int) -> jax.Array:
    """Indices of True entries, ascending, padded with -1 — the
    ``jnp.nonzero(size=..., fill_value=-1)`` contract, but via one device
    sort: on this TPU the nonzero lowering's scatter costs ~1.2 s at
    134M elements while the equivalent sort costs 0.44 s (probe7; the
    cumsum inside nonzero is only 0.06 s — scatters are the expense,
    rule: sorts are nearly free, scatters are not)."""
    M = mask_flat.shape[0]
    sentinel = jnp.int32(2**31 - 1)
    keys = jnp.where(mask_flat, jnp.arange(M, dtype=jnp.int32), sentinel)
    if size > M:  # tiny volumes: bucket exceeds the cell count
        keys = jnp.pad(keys, (0, size - M), constant_values=2**31 - 1)
    ids = jax.lax.slice(jax.lax.sort(keys), (0,), (size,))
    return jnp.where(ids == sentinel, jnp.int32(-1), ids)


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
    cell_ids = _compact_true_ids(active, max_active)
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


@partial(jax.jit, static_argnames=("max_blocks", "max_active", "iso_greater"))
def _extract_cells_blocked(field: jax.Array, iso: float, max_blocks: int,
                           max_active: int, iso_greater: bool = True):
    """Stage A, block-hierarchical: compact active BLOCK^3 cell blocks
    first (a (N/8)^3 sort — 262k ids at 512^3, effectively free), then
    sort only the candidate cells inside active blocks (~n_blocks * 512 ≈
    20M at 512^3 vs the flat variant's full 134M cell-id sort).  Returns
    the same (corner_lin, vals, ins, valid_cell, n_active, n_blocks)
    contract as _extract_cells (+ n_blocks for overflow detection); cell
    ids come out in the same ascending global order, so every downstream
    stage is bit-identical.  The per-corner inside bits are derived from
    the gathered corner values (vals > iso) instead of a second
    33M-index gather — identical by construction.
    """
    Z, Y, X = field.shape
    Zc, Yc, Xc = Z - 1, Y - 1, X - 1
    inside = field > iso if iso_greater else field < iso

    agg_any = jnp.zeros((Zc, Yc, Xc), jnp.bool_)
    agg_all = jnp.ones((Zc, Yc, Xc), jnp.bool_)
    for dz, dy, dx in CUBE_OFFSETS:
        corner = inside[dz : dz + Zc, dy : dy + Yc, dx : dx + Xc]
        agg_any = agg_any | corner
        agg_all = agg_all & corner
    active = agg_any & ~agg_all
    n_active = jnp.sum(active.astype(jnp.int32))

    blk = _block_any(active)
    n_blocks = jnp.sum(blk.astype(jnp.int32))
    nbz, nby, nbx = blk.shape
    blk_ids = _compact_true_ids(blk.reshape(-1), max_blocks)
    blk_valid = blk_ids >= 0
    bid = jnp.maximum(blk_ids, 0)
    bz = bid // (nby * nbx)
    rem = bid % (nby * nbx)
    by = rem // nbx
    bx = rem % nbx

    # candidate cells: (max_blocks, BLOCK^3) global cell coordinates
    loc = jnp.arange(BLOCK**3, dtype=jnp.int32)
    lz, ly, lx = loc // BLOCK**2, (loc // BLOCK) % BLOCK, loc % BLOCK
    cz = bz[:, None] * BLOCK + lz[None, :]
    cy = by[:, None] * BLOCK + ly[None, :]
    cx = bx[:, None] * BLOCK + lx[None, :]
    in_grid = ((cz < Zc) & (cy < Yc) & (cx < Xc)
               & blk_valid[:, None]).reshape(-1)
    cell_lin = ((cz * Yc + cy) * Xc + cx).reshape(-1)
    act_g = active.reshape(-1)[jnp.where(in_grid, cell_lin, 0)]
    sentinel = jnp.int32(2**31 - 1)
    keys = jnp.where(act_g & in_grid, cell_lin, sentinel)
    size = max_active
    if size > keys.shape[0]:
        keys = jnp.pad(keys, (0, size - keys.shape[0]),
                       constant_values=2**31 - 1)
    cell_ids = jax.lax.slice(jax.lax.sort(keys), (0,), (size,))
    valid_cell = cell_ids != sentinel
    cell_ids_safe = jnp.where(valid_cell, cell_ids, 0)

    cz = cell_ids_safe // (Yc * Xc)
    rem = cell_ids_safe % (Yc * Xc)
    cy = rem // Xc
    cx = rem % Xc
    flat_f = field.reshape(-1)
    corner_lin = []
    for dz, dy, dx in CUBE_OFFSETS:
        corner_lin.append((cz + dz) * (Y * X) + (cy + dy) * X + (cx + dx))
    corner_lin = jnp.stack(corner_lin, axis=0)  # (8, A) lattice ids
    vals_native = flat_f[corner_lin]  # (8, A) input dtype
    ins = vals_native > iso if iso_greater else vals_native < iso
    return (corner_lin, vals_native.astype(jnp.float32), ins, valid_cell,
            n_active, n_blocks)


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
    tri_slots = _compact_true_ids(flat_valid, max_tris)
    return case, tri_slots, n_tris


def _materialize_tables(vol_shape):
    """Composed per-(tet, k, case, corner) lookup tables for _materialize.

    Chained small-table gathers (case -> edge -> endpoints -> offsets) and
    per-endpoint div/mod lattice decompositions dominated the materialize
    stage; every chain folds into ONE 192-entry lookup per triangle corner
    because (t, k, case) has only 6*2*16 combinations:

    - geom[c][idx]: packed int32 — ea(2) eb(2) za(1) ya(1) xa(1)
      (ddz+1)(2) (ddy+1)(2) (ddx+1)(2) where (za, ya, xa) is endpoint a's
      cube-corner offset and (ddz, ddy, ddx) = offset_b - offset_a.
    - keyoff[c][idx]: min(OFF[ca], OFF[cb]) * 8 + edge code, so the dedup
      key is just cell_lin * 8 + keyoff (no div/mod at all).
    - cent[t]: the 4 tet-corner offsets packed 3 bits each (12 bits).
    - cja[t * 4 + j]: TETS[t][j] * A is folded by the caller (A-dependent).
    """
    Z, Y, X = vol_shape
    off = (CUBE_OFFSETS[:, 0] * (Y * X) + CUBE_OFFSETS[:, 1] * X
           + CUBE_OFFSETS[:, 2]).astype(np.int64)
    geom = np.zeros((3, 192), np.int32)
    keyoff = np.zeros((3, 192), np.int32)
    for t in range(6):
        for k in range(2):
            for case_id in range(16):
                idx = t * 32 + k * 16 + case_id
                for c in range(3):
                    e = int(TET_TRIS[case_id][k][c])
                    if e < 0:  # unused slot: never compacted, any value
                        continue
                    ea, eb = (int(v) for v in TET_EDGES[e])
                    ca = int(TETS[t][ea])
                    cb = int(TETS[t][eb])
                    oa = CUBE_OFFSETS[ca]
                    dd = CUBE_OFFSETS[cb] - oa
                    code = abs(int(dd[2])) + 2 * abs(int(dd[1])) + \
                        4 * abs(int(dd[0]))
                    keyoff[c, idx] = int(min(off[ca], off[cb])) * 8 + code
                    geom[c, idx] = (
                        ea | (eb << 2)
                        | (int(oa[0]) << 4) | (int(oa[1]) << 5)
                        | (int(oa[2]) << 6)
                        | ((int(dd[0]) + 1) << 7) | ((int(dd[1]) + 1) << 9)
                        | ((int(dd[2]) + 1) << 11))
    cent = np.zeros((6,), np.int32)
    for t in range(6):
        v = 0
        for j in range(4):
            o = CUBE_OFFSETS[int(TETS[t][j])]
            v |= (int(o[0]) | (int(o[1]) << 1) | (int(o[2]) << 2)) << (3 * j)
        cent[t] = v
    return geom, keyoff, cent


@partial(jax.jit, static_argnames=("vol_shape",))
def _materialize(
    corner_lin: jax.Array,  # (8, A)
    vals: jax.Array,  # (8, A)
    ins: jax.Array,  # (8, A)  (kept for API; inside == vals > iso)
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

    Returns (pts (3 corners, 3 zyx, T) f32, keys (3 corners, T) i32) where
    a key is the lattice-EDGE id ``min_endpoint_lin * 8 + code``: tet edges
    join cube corners, so the endpoint offset decomposes uniquely as
    a*1 + b*X + c*X*Y with a, b, c in {0, 1} (axis edges, face diagonals,
    the body diagonal) and code = a + 2b + 4c in 1..7.  One int32 per
    vertex instead of an endpoint pair halves the dedup sort payload.
    Callers assert 8 * Z * Y * X < 2^31.

    Per-slot data comes from SIX length-T gathers over the (8, A) blocks
    (tri_case, cell lattice id, the 4 tet-corner values); everything else
    is composed 192-entry tables (see _materialize_tables) + VPU bit math.
    The earlier endpoint-chain formulation paid 21 big gathers and 6
    div/mod lattice decompositions per chunk and measured 2.96 s at 512^3.
    """
    del ins  # == vals > iso; deriving it saves 4 big gathers
    geom_np, keyoff_np, cent_np = _materialize_tables(vol_shape)
    geom_t = jnp.asarray(geom_np)      # (3, 192)
    keyoff_t = jnp.asarray(keyoff_np)  # (3, 192)
    cent_t = jnp.asarray(cent_np)      # (6,)
    case_f = case.reshape(-1)
    corner_lin_f = corner_lin.reshape(-1)
    vals_f = vals.reshape(-1)

    slot_ok = tri_slots >= 0
    slots = jnp.maximum(tri_slots, 0)
    # tet-major flat order from _emit_slots: slot = t*2A + k*A + a
    A = corner_lin.shape[1]
    t_idx = slots // (2 * A)
    k_idx = (slots // A) % 2
    a_idx = slots % A

    tri_case = case_f[t_idx * A + a_idx].astype(jnp.int32)  # (T,)
    cell0 = corner_lin_f[a_idx]  # (T,) lattice id of the cell origin
    Z, Y, X = vol_shape
    cz = (cell0 // (Y * X)).astype(jnp.float32)
    rem = cell0 % (Y * X)
    cy = (rem // X).astype(jnp.float32)
    cx = (rem % X).astype(jnp.float32)

    # the 4 tet-corner values (cube-corner id folded into the gather index)
    cja = jnp.asarray(TETS.astype(np.int32) * A)  # (6, 4) -> flat (24,)
    cja_f = cja.reshape(-1)
    vj = [vals_f[cja_f[t_idx * 4 + j] + a_idx] for j in range(4)]  # 4x (T,)

    def sel4(code2, xs):
        """xs[code2] for code2 in 0..3 without a gather."""
        lo = jnp.where(code2 == 0, xs[0], xs[1])
        hi = jnp.where(code2 == 2, xs[2], xs[3])
        return jnp.where(code2 < 2, lo, hi)

    idx_tk = t_idx * 32 + k_idx * 16 + tri_case  # (T,) in 0..191
    pcs = []   # corner -> (z, y, x) float coords, each (T,)
    lakeys = []  # corner -> int32 lattice-edge key
    for c in range(3):
        g = geom_t[c][idx_tk]  # (T,) packed endpoint geometry
        fa = sel4(g & 3, vj)
        fb = sel4((g >> 2) & 3, vj)
        denom = fb - fa
        t = jnp.where(denom == 0, 0.5,
                      (jnp.float32(iso) - fa) / jnp.where(denom == 0, 1.0, denom))
        t = jnp.clip(t, 0.0, 1.0)
        pz = cz + ((g >> 4) & 1).astype(jnp.float32) + \
            t * (((g >> 7) & 3) - 1).astype(jnp.float32)
        py = cy + ((g >> 5) & 1).astype(jnp.float32) + \
            t * (((g >> 9) & 3) - 1).astype(jnp.float32)
        px = cx + ((g >> 6) & 1).astype(jnp.float32) + \
            t * (((g >> 11) & 3) - 1).astype(jnp.float32)
        pcs.append((pz, py, px))
        lakeys.append(cell0 * 8 + keyoff_t[c][idx_tk])

    # inside-corner centroid of the tet (unrolled over the 4 tet corners);
    # inside == value > iso, exactly _extract_cells' flag
    cb_ = cent_t[t_idx]  # (T,) packed 4x (dz, dy, dx)
    czs = cys = cxs = wsum = None
    for j in range(4):
        wj = (vj[j] > jnp.float32(iso)).astype(jnp.float32)
        z_ = ((cb_ >> (3 * j)) & 1).astype(jnp.float32) * wj
        y_ = ((cb_ >> (3 * j + 1)) & 1).astype(jnp.float32) * wj
        x_ = ((cb_ >> (3 * j + 2)) & 1).astype(jnp.float32) * wj
        if czs is None:
            czs, cys, cxs, wsum = z_, y_, x_, wj
        else:
            czs, cys, cxs, wsum = czs + z_, cys + y_, cxs + x_, wsum + wj
    wsum = jnp.maximum(wsum, 1.0)
    icz = cz + czs / wsum
    icy = cy + cys / wsum
    icx = cx + cxs / wsum

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
             jnp.where(outward, lakeys[1], lakeys[2]),
             jnp.where(outward, lakeys[2], lakeys[1])]

    pts = jnp.stack([jnp.stack([jnp.where(slot_ok, comp, 0.0) for comp in corner])
                     for corner in out_p])  # (3 corners, 3 zyx, T)
    keys = jnp.stack([jnp.where(slot_ok, k, -1) for k in out_k])  # (3, T)
    return pts, keys


@jax.jit
def _dedup_structure(keys: jax.Array):
    """Device-side shared-vertex dedup by lattice-edge key — structure only.

    keys: (M,) int32 lattice-edge ids (invalid slots = -1, one group at the
    front after sorting).  Returns (inverse (M,) corner -> group id,
    n_groups, order (M,) sorted-corner permutation, group_of_sorted (M,),
    starts (M,) sorted-position of each group's first corner (pad = junk),
    sorted_valid (M,) bool).

    The single int32 key (vs an endpoint pair) halves the sort payload —
    one sort_key_val pass.  The sort byproducts are the mesh's
    vertex-incidence structure for free: corners sorted by owning vertex
    (``order``) with group ids (``group_of_sorted``) — ca_smoothing's
    adjacency build reuses them instead of paying its own lexsort.

    Coordinates are NOT gathered here: the caller reads n_groups to the
    host (it sizes every downstream bucket anyway) and gathers vertex
    coordinates at the V_pad bucket, not at M — at 512^3 that replaces a
    3 x 22M-index gather with a 3 x ~4M one (gathers cost ~6 ns/index on
    this TPU regardless of width, so the cut is ~0.3 s).
    """
    M = keys.shape[0]
    arange = jnp.arange(M, dtype=jnp.int32)
    _, order = jax.lax.sort_key_val(keys, arange)
    ks = keys[order]
    new_group = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (ks[1:] != ks[:-1]).astype(jnp.int32),
    ])
    group_of_sorted = jnp.cumsum(new_group) - 1  # (M,)
    # Scatter-free inverses: this TPU sorts a 22M-element key/val pair in
    # 0.08 s while the equivalent scatters cost ~1 s each (CLAUDE.md rules
    # 12/13), so BOTH scatters below are re-expressed as sorts.
    # 1. permutation inverse: sorting (order, group) by order lands group
    #    ids back at their corner-major positions.
    _, inverse = jax.lax.sort_key_val(order, group_of_sorted)
    # 2. representative corner per group: group starts get key = their own
    #    group id (< M), everything else a unique key >= M — after sorting,
    #    position g holds the sorted-position of group g's first corner.
    start_key = jnp.where(new_group == 1, group_of_sorted, M + arange)
    _, starts = jax.lax.sort_key_val(start_key, arange)
    n_groups = group_of_sorted[-1] + 1
    return inverse, n_groups, order, group_of_sorted, starts, ks >= 0


@partial(jax.jit, static_argnames=("V_pad",))
def _gather_verts_bucket(pts: jax.Array, order: jax.Array, starts: jax.Array,
                         V_pad: int):
    """Gather each group's representative corner coordinates, sized to the
    V_pad bucket (not M).  pts: (3 zyx, M); returns (3, V_pad)."""
    M = pts.shape[1]
    k = min(V_pad, M)
    rep = order[starts[:k]]  # (k,) original corner id per group
    verts = pts[:, rep]
    if V_pad > M:
        verts = jnp.pad(verts, ((0, 0), (0, V_pad - M)))
    return verts


def _dedup_vertices(pts: jax.Array, keys: jax.Array):
    """Full-M dedup (coordinates gathered at M) — kept for the sharded
    extraction, where everything lives inside one shard_map program and no
    host-side bucket read is possible.  Single-device callers use
    _dedup_structure + _gather_verts_bucket instead."""
    M = pts.shape[1]
    inverse, n_groups, order, group_of_sorted, starts, _ = _dedup_structure(keys)
    verts = pts[:, order[starts]]
    return verts, inverse, n_groups, order, group_of_sorted


@dataclasses.dataclass
class DeviceMesh:
    """A device-resident triangle mesh plus the dedup sort's byproducts —
    the handle the fused surface pipeline passes between marching,
    ca_smoothing, and the final packed transfer (no intermediate host
    copies; at the ~35 MB/s relay readback each avoided round trip is
    seconds)."""

    verts3v: jax.Array        # (3 xyz world mm, V_pad) f32
    faces3t: jax.Array        # (3 corners, T_pad) i32, outward winding
    n_verts: int              # valid vertex count (<= V_pad)
    n_tris: int               # valid triangle count (<= T_pad)
    inverse: jax.Array        # (M = 3*T_pad,) corner -> vertex, corner-major
    order: jax.Array          # (M,) corner permutation sorted by vertex
    group_of_sorted: jax.Array  # (M,) vertex id per sorted corner
    sorted_valid: jax.Array   # (M,) real (non-padding) sorted corners
    spacing: Tuple[float, float, float]
    vol_shape: Tuple[int, int, int]  # field shape the mesh came from
    origin_shift: Tuple[float, float, float] = (0.0, 0.0, 0.0)  # world mm


@partial(jax.jit, static_argnames=("T", "spacing", "shift"))
def _finalize_device(verts_zyx: jax.Array, inverse: jax.Array, T: int,
                     spacing, shift):
    """voxel (z, y, x) -> world mm (x, y, z) + winding flip (the axis swap
    mirrors space, det = -1)."""
    sx, sy, sz = spacing
    ox, oy, oz = shift
    verts3v = jnp.stack([
        verts_zyx[2] * sx + ox, verts_zyx[1] * sy + oy, verts_zyx[0] * sz + oz])
    faces3t = inverse.reshape(3, T)[::-1]  # corner order reversed
    return verts3v, faces3t


def marching_cubes_device(
    field: np.ndarray | jax.Array,
    iso: float,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    max_active: int | None = None,
    max_tris: int | None = None,
    origin_shift: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    max_blocks: int | None = None,
) -> DeviceMesh:
    """Isosurface extraction, device-resident end to end.

    Counts actives first, rounds buckets up to powers of two (jit caches
    stay small and transfer shapes stay stable), runs the jitted stages,
    deduplicates shared vertices by lattice-edge key, and returns device
    arrays — callers chain smoothing/measures without a host round trip.
    """
    field = jnp.asarray(field)
    if 8 * int(np.prod(field.shape)) >= 2**31:
        raise ValueError("volume too large for int32 lattice-edge keys "
                         "(> ~640^3); shard it over a mesh instead")
    if max_tris is not None:
        # chunked materialization requires bucket-aligned sizes (the
        # granule must divide max_tris or the last dynamic slice clamps
        # and re-emits slots)
        max_tris = _round_bucket(max_tris)
    if max_active is None or max_tris is None or max_blocks is None:
        n_act, n_tri, n_blk = (int(x) for x in _count_all(field, iso))
        if max_active is None:
            max_active = max(1024, _round_bucket(n_act))
        if max_tris is None:
            max_tris = max(2048, _round_bucket(int(n_tri)))
        if max_blocks is None:
            max_blocks = max(256, _round_bucket(n_blk))

    corner_lin, vals, ins, valid_cell, n_active, n_blocks = \
        _extract_cells_blocked(field, iso, max_blocks, max_active)
    case, tri_slots, n_tris = _emit_slots(ins, valid_cell, max_tris)
    n_tris = int(n_tris)
    n_active_i = int(n_active)
    n_blocks_i = int(n_blocks)
    if (n_active_i > max_active or n_tris > max_tris
            or n_blocks_i > max_blocks):  # bucket overflow: retry
        return marching_cubes_device(
            field, iso, spacing,
            max_active=_round_bucket(n_active_i),
            max_tris=_round_bucket(max(n_tris, n_active_i * 4)),
            origin_shift=origin_shift,
            max_blocks=_round_bucket(n_blocks_i),
        )
    # materialize in fixed-size chunks: caps the per-program live set
    # chunk size = the bucket granule (which always divides max_tris), so
    # every dynamic slice is full-size — a clamped slice would re-emit slots
    CHUNK = min(1 << 21, 1 << max(0, (max_tris - 1).bit_length() - 3))
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
        keys = jnp.concatenate(key_parts, axis=1)  # (3 corners, T)
    del corner_lin, vals, ins, case, tri_slots

    # flatten vertices corner-major: m = corner * T + t
    T = pts.shape[2]
    pts_m = pts.transpose(1, 0, 2).reshape(3, 3 * T)  # (3 zyx, M)
    keys_m = keys.reshape(3 * T)  # (M,) corner-major

    (inverse_d, n_groups, order, group_of_sorted, starts,
     sorted_valid) = _dedup_structure(keys_m)
    n_groups = int(n_groups)
    # the invalid-slot group (keys == -1 sorts first) is one orphan vertex
    # when padding slots exist; valid faces never reference it.
    V_pad = max(1024, _round_bucket(n_groups))
    verts_zyx = _gather_verts_bucket(pts_m, order, starts, V_pad)
    verts3v, faces3t = _finalize_device(
        verts_zyx, inverse_d, T, tuple(spacing), tuple(origin_shift))
    return DeviceMesh(
        verts3v=verts3v, faces3t=faces3t, n_verts=n_groups, n_tris=n_tris,
        inverse=inverse_d, order=order, group_of_sorted=group_of_sorted,
        sorted_valid=sorted_valid, spacing=tuple(spacing),
        vol_shape=vol_shape, origin_shift=tuple(origin_shift))


@jax.jit
def _pack_uint24(faces3t: jax.Array) -> jax.Array:
    """(3, T) int32 -> (9, T) uint8 (vertex counts < 2^24): cuts the
    relay readback of the face table by 25%."""
    return jnp.concatenate([
        (faces3t >> (8 * k)).astype(jnp.uint8) for k in range(3)])


@jax.jit
def _verts_f16(verts3v: jax.Array) -> jax.Array:
    return verts3v.astype(jnp.float16)


def mesh_to_host(dm: DeviceMesh, fp16: bool = True
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """One packed transfer: fp16 vertices (fp16 ulp at 256 mm is 0.125 mm,
    far below print tolerance; INV3_F32_VERTS=1 restores f32) + uint24
    faces.  Returns (verts (V, 3) f32 world mm, faces (F, 3) i32)."""
    import os

    if os.environ.get("INV3_F32_VERTS") == "1":
        fp16 = False
    rows = np.asarray(_verts_f16(dm.verts3v) if fp16 else dm.verts3v)
    packed = np.asarray(_pack_uint24(dm.faces3t))  # (9, T_pad) u8
    try:  # native streaming unpack: numpy's strided transposes/field ops
        # run at ~4 MB/s on this host (minutes at 512^3 mesh sizes)
        from invesalius3_tpu import native

        if native.available():
            return (native.verts3v_to_n3(rows, dm.n_verts),
                    native.faces_u24_to_n3(packed, dm.n_tris))
    except Exception:
        pass
    verts = np.ascontiguousarray(rows.astype(np.float32).T[:dm.n_verts])
    b = packed[:, :dm.n_tris].astype(np.int32)
    faces = np.empty((3, dm.n_tris), np.int32)
    for c in range(3):
        faces[c] = b[c] | (b[3 + c] << 8) | (b[6 + c] << 16)
    return verts, np.ascontiguousarray(faces.T)


def marching_cubes(
    field: np.ndarray | jax.Array,
    iso: float,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    max_active: int | None = None,
    max_tris: int | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract an isosurface; returns (vertices (V, 3) float32 in world mm
    (x, y, z), faces (F, 3) int32) with shared vertices."""
    dm = marching_cubes_device(field, iso, spacing, max_active, max_tris)
    return mesh_to_host(dm, fp16=False)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _round_bucket(n: int, steps: int = 8) -> int:
    """Smallest (steps+k) * 2^e/steps >= n: 1/steps-pow2 rounding.  At the
    default steps=8 padding waste drops from <=2x (pow2) to <=12.5% —
    materialize/dedup/taubin all pay per padded element — while the jit
    cache stays bounded (8 shapes per octave).  steps=32 (<=3.1% waste) is
    used where a single bucket's padding dominates a hot stage (the
    sharded taubin vertex bucket: at 512^3 the 1/8 grid is 65536 wide,
    ~17% of the real vertex count)."""
    if n <= steps:
        return max(1, n)
    e = (n - 1).bit_length()  # n <= 2^e
    g = (1 << e) // steps
    return ((n + g - 1) // g) * g


def mask_to_surface_device(
    mask: np.ndarray | jax.Array,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    **kw,
) -> DeviceMesh:
    """Surface of a visible mask (>= 127) as a device-resident mesh,
    padded by one empty voxel layer so border-touching masks still close
    (reference surface_process.py:52 pads the image before contouring).
    The one-voxel pad offset is folded into the world transform."""
    m = jnp.asarray(mask)
    vis = (m >= 127).astype(jnp.uint8)  # stay 1-byte: gathers + passes 4x cheaper
    vis = jnp.pad(vis, 1)
    sx, sy, sz = spacing
    return marching_cubes_device(vis, 0.5, spacing,
                                 origin_shift=(-sx, -sy, -sz), **kw)


def mask_to_surface(
    mask: np.ndarray | jax.Array,
    spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    **kw,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-array variant of mask_to_surface_device."""
    return mesh_to_host(mask_to_surface_device(mask, spacing, **kw), fp16=False)
