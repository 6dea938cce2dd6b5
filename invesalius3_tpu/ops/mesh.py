"""Mesh post-processing: adjacency, Taubin smoothing, context-aware
(staircase-artifact) smoothing, mass properties, and connectivity
filtering.

Reference behavior: the Rust ``context_aware_smoothing`` pipeline
(invesalius_rs/src/mesh.rs:27-87 — find_staircase_artifacts :125,
propagate_weights :202, taubin_smooth :345 with lambda=0.5, mu=-0.53) and
VTK's vtkMassProperties / vtkPolyDataConnectivityFilter used by the surface
pipeline (reference surface_process.py:377-415); GUI defaults angle=0.7,
max_distance=3.0, min_weight=0.5, steps=10 (reference gui/dialogs.py
CAOptions).

TPU design: the mesh is (V, 3) vertices + (F, 3) faces; adjacency is a
host-built padded neighbor table (V, max_degree) so every smoothing
iteration is a fixed-shape gather + mean — pure VPU work under jit.

Note on reference fidelity: the Rust ``find_staircase_artifacts`` has an
init quirk (min trackers only update on non-max steps, so the first face
leaves min at +inf and *every* vertex with a face is flagged, collapsing
ca_smoothing into uniform Taubin).  We implement the intended published
algorithm — proper min/max spread of (1 - |n . axis|) over incident faces
— and note that setting ``angle=0`` reproduces the reference's effective
all-vertices behavior.  The Taubin step direction matches the Rust exactly
(d = mean(v_i - v_j); v += w * lambda * d with lambda=+0.5, mu=-0.53).
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Adjacency (host-built once per mesh)
# ---------------------------------------------------------------------------


def vertex_adjacency(faces: np.ndarray, n_vertices: int) -> Tuple[np.ndarray, np.ndarray]:
    """Padded neighbor table: (V, max_deg) int32 (pad = self-index) and
    per-vertex neighbor counts (V,).  Fully vectorized (runs on multi-
    million-triangle meshes in ~a second)."""
    faces = np.asarray(faces, np.int64)
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [0, 2]]])
    e = np.concatenate([e, e[:, ::-1]])
    # lexsort + diff dedup: ~10x faster than np.unique(axis=0) at millions
    # of edges (unique's void-view comparison is the bottleneck)
    order = np.lexsort((e[:, 1], e[:, 0]))
    e = e[order]
    keep = np.ones(len(e), bool)
    keep[1:] = (e[1:, 0] != e[:-1, 0]) | (e[1:, 1] != e[:-1, 1])
    e = e[keep]
    src = e[:, 0]
    deg = np.bincount(src, minlength=n_vertices).astype(np.int32)
    max_deg = max(1, int(deg.max()) if len(deg) else 1)
    table = np.tile(np.arange(n_vertices, dtype=np.int32)[:, None], (1, max_deg))
    starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
    positions = np.arange(len(e)) - starts[src]
    table[src, positions] = e[:, 1]
    return table, deg


@jax.jit
def _face_normals_t(verts3v: jax.Array, faces: jax.Array) -> jax.Array:
    """(3, F) normals from (3, V) verts — lane-friendly layout."""
    p0 = verts3v[:, faces[:, 0]]  # (3, F)
    p1 = verts3v[:, faces[:, 1]]
    p2 = verts3v[:, faces[:, 2]]
    u = p1 - p0
    w = p2 - p0
    n = jnp.stack([
        u[1] * w[2] - u[2] * w[1],
        u[2] * w[0] - u[0] * w[2],
        u[0] * w[1] - u[1] * w[0],
    ])
    norm = jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True))
    return n / jnp.where(norm == 0, 1.0, norm)


def face_normals(verts: jax.Array, faces: jax.Array) -> jax.Array:
    return _face_normals_t(jnp.asarray(verts, jnp.float32).T,
                           jnp.asarray(faces)).T


# ---------------------------------------------------------------------------
# Mass properties (vtkMassProperties semantics)
# ---------------------------------------------------------------------------


@jax.jit
def mass_properties(verts: jax.Array, faces: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(volume, area) by the divergence theorem over the closed mesh
    (transposed gathers: see _calc_d layout note)."""
    v3 = jnp.asarray(verts, jnp.float32).T  # (3, V)
    p0 = v3[:, faces[:, 0]]
    p1 = v3[:, faces[:, 1]]
    p2 = v3[:, faces[:, 2]]

    def cross3(a, b):
        return jnp.stack([
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ])

    c = cross3(p1 - p0, p2 - p0)
    area = jnp.sum(jnp.sqrt(jnp.sum(c * c, axis=0))) / 2.0
    vol = jnp.abs(jnp.sum(p0 * cross3(p1, p2)) / 6.0)
    return vol, area


# ---------------------------------------------------------------------------
# Taubin smoothing (reference mesh.rs:345-395 semantics)
# ---------------------------------------------------------------------------


def _calc_d(verts: jax.Array, neigh: jax.Array, deg: jax.Array) -> jax.Array:
    """d_i = mean_j (v_i - v_j) over neighbors (reference mesh.rs:296-334;
    border handling is a no-op there, matching is_border == false).

    TPU layout: verts is (3, V) and neigh is (D, V) — the big dimension
    rides the 128-lane axis.  A (V, 3)/(V, D) layout pads the trailing dim
    to 128 and inflates every gather ~8-42x.
    """
    nb = verts[:, neigh]  # (3, D, V)
    valid = (jnp.arange(neigh.shape[0])[:, None] < deg[None, :]).astype(verts.dtype)
    diff = (verts[:, None, :] - nb) * valid[None, :, :]
    cnt = jnp.maximum(deg.astype(verts.dtype), 1.0)
    return jnp.sum(diff, axis=1) / cnt[None, :]


@partial(jax.jit, static_argnames=("steps",))
def _taubin_core(verts3v, neigh_dv, deg, weights, lam, mu, steps: int):
    def one_step(v, _):
        d = _calc_d(v, neigh_dv, deg)
        v = v + weights[None, :] * lam * d
        d = _calc_d(v, neigh_dv, deg)
        v = v + weights[None, :] * mu * d
        return v, None

    out, _ = jax.lax.scan(one_step, verts3v, None, length=steps)
    return out


def _taubin_core_bucketed(verts3v, neigh_p, deg_p, weights_p, lam, mu,
                          steps: int, buckets):
    """_taubin_core over DEGREE-SORTED vertices: ``buckets`` is a static
    tuple of (start, end, d_cap) column spans; span b gathers only its
    d_cap neighbor rows.  Marching-tet meshes are ~70% degree == 6 with a
    thin tail to ~12, and the TPU gather costs ~6 ns per INDEX regardless
    of fetched width (probe4: 3x indices = 3x time; sorted indices = no
    change), so the pass cost is exactly the gathered-index count — finer
    buckets cut it toward sum(deg).  Bit-identical to the unbucketed core
    on the permuted arrays (the skipped rows are masked out anyway)."""

    def d_bucket(v, s, e, dcap):
        nb_tbl = neigh_p[:dcap, s:e]
        deg_b = deg_p[s:e]
        nb = v[:, nb_tbl]  # (3, dcap, e-s) gather of GLOBAL columns
        valid = (jnp.arange(dcap)[:, None] < deg_b[None, :]).astype(v.dtype)
        diff = (v[:, None, s:e] - nb) * valid[None]
        return jnp.sum(diff, axis=1) / jnp.maximum(
            deg_b.astype(v.dtype), 1.0)[None, :]

    def one_pass(v, factor):
        dw = jnp.concatenate(
            [weights_p[None, s:e] * d_bucket(v, s, e, d)
             for (s, e, d) in buckets], axis=1)
        return v + factor * dw

    def one_step(v, _):
        v = one_pass(v, lam)
        v = one_pass(v, mu)
        return v, None

    out, _ = jax.lax.scan(one_step, verts3v, None, length=steps)
    return out


_taubin_core_bucketed = partial(jax.jit, static_argnames=("steps", "buckets")
                                )(_taubin_core_bucketed)


def taubin_smooth_bucketed(verts3v, neigh_dv, deg, weights, lam, mu,
                           steps: int, d_caps=(5, 6, 7)):
    """Degree-bucketed Taubin: sort vertices by degree (device), run the
    multi-bucket core, unsort.  Returns (3, V) like _taubin_core.

    d_caps negative result (512^3, V=3.08M, warm): widening to
    (5, 6, 7, 8, 10) measured 2.918 s vs 2.884 s for (5, 6, 7) — the
    degree tail past 7 is too thin for extra buckets to beat their
    added per-bucket dispatch; the pass is at its Σdeg gather floor."""
    V = verts3v.shape[1]
    D = neigh_dv.shape[0]
    deg_sorted, perm = jax.lax.sort_key_val(
        deg, jnp.arange(V, dtype=jnp.int32))
    caps = [c for c in sorted(set(d_caps)) if c < D]
    # one tiny device reduction per cap (scalars only — the relay D2H of
    # a full histogram would cost more than it saves)
    counts = [int(jnp.sum(deg <= c)) for c in caps]
    # round splits DOWN to 4k boundaries (bounded jit cache; columns
    # between a boundary and the true count just use the next, wider cap)
    buckets = []
    start = 0
    for c, n in zip(caps, counts):
        end = (n // 4096) * 4096
        if end - start >= 4096:
            buckets.append((start, end, c))
            start = end
    if start < V:
        buckets.append((start, V, D))
    if len(buckets) < 2:
        return _taubin_core(verts3v, neigh_dv, deg, weights, lam, mu, steps)
    inv_perm = jnp.zeros((V,), jnp.int32).at[perm].set(
        jnp.arange(V, dtype=jnp.int32))
    # the adjacency table pads with sentinel id V -> keep it V after remap
    remap = jnp.concatenate([inv_perm, jnp.asarray([V], jnp.int32)])
    neigh_p = remap[jnp.minimum(neigh_dv[:, perm], V)]
    out_p = _taubin_core_bucketed(
        verts3v[:, perm], neigh_p, deg_sorted, weights[perm],
        lam, mu, steps, tuple(buckets))
    return out_p[:, inv_perm]


def taubin_smooth(
    verts: jax.Array,
    neigh: jax.Array,
    deg: jax.Array,
    weights: jax.Array,
    lam: float = 0.5,
    mu: float = -0.53,
    steps: int = 10,
) -> jax.Array:
    """Weighted two-phase Taubin iteration, sign convention identical to the
    reference Rust (v += w * lambda * mean(v - neighbors)).  Accepts
    (V, 3) verts + (V, D) neigh and transposes to lane-friendly layouts."""
    v3 = jnp.asarray(verts, jnp.float32).T  # (3, V)
    n_dv = jnp.asarray(neigh).T  # (D, V)
    out = _taubin_core(v3, n_dv, jnp.asarray(deg), jnp.asarray(weights),
                       jnp.float32(lam), jnp.float32(mu), steps)
    return out.T


@partial(jax.jit, static_argnames=("steps",))
def _laplacian_core(verts3v, neigh_dv, deg, relax, steps: int):
    def one_step(v, _):
        d = _calc_d(v, neigh_dv, deg)  # mean(v - neighbors)
        return v - relax * d, None     # move toward the neighbor mean

    out, _ = jax.lax.scan(one_step, verts3v, None, length=steps)
    return out


def laplacian_smooth(verts: np.ndarray, faces: np.ndarray,
                     iterations: int = 20,
                     relaxation: float = 0.4) -> np.ndarray:
    """vtkSmoothPolyDataFilter-style Laplacian relaxation
    (reference surface.py:355 ApplySmoothFilter defaults 20 x 0.4)."""
    table, deg = vertex_adjacency_fast(np.asarray(faces), len(verts))
    v3 = jnp.asarray(verts, jnp.float32).T
    out = _laplacian_core(v3, jnp.asarray(table).T, jnp.asarray(deg),
                          jnp.float32(relaxation), int(iterations))
    return np.asarray(out.T)


# ---------------------------------------------------------------------------
# Context-aware smoothing (reference mesh.rs:27-87)
# ---------------------------------------------------------------------------


def find_staircase_artifacts(
    verts: np.ndarray,
    faces: np.ndarray,
    normals: np.ndarray,
    t: float = 0.7,
    stack_orientation=(0.0, 0.0, 1.0),
) -> np.ndarray:
    """Vertices whose incident-face normals' axis-deviation spread exceeds
    ``t`` on any axis (intended algorithm of reference mesh.rs:125-189).
    Returns a boolean (V,) array.  ``t=0`` flags every vertex with a face,
    matching the reference build's effective behavior."""
    axes = jnp.asarray([stack_orientation, (0.0, 1.0, 0.0), (1.0, 0.0, 0.0)],
                       jnp.float32)
    of = 1.0 - jnp.abs(jnp.asarray(normals, jnp.float32) @ axes.T)  # (F, 3)
    V = len(verts)
    faces_j = jnp.asarray(faces)
    vmax = jnp.full((V, 3), -jnp.inf)
    vmin = jnp.full((V, 3), jnp.inf)
    for c in range(3):  # device scatter-max/min per face corner
        vmax = vmax.at[faces_j[:, c]].max(of)
        vmin = vmin.at[faces_j[:, c]].min(of)
    spread = vmax - vmin
    has_face = jnp.isfinite(spread).all(axis=1)
    flagged = has_face & (spread >= t).any(axis=1)
    return np.asarray(flagged)


@partial(jax.jit, static_argnames=("max_iters",))
def _propagate_core_t(verts3v, neigh_dv, deg_j, seeds_j, tmax, bmin,
                      max_iters: int = 24):
    """Lane-friendly layout: verts (3, V), neigh (D, V) — see _calc_d."""
    valid = jnp.arange(neigh_dv.shape[0])[:, None] < deg_j[None, :]  # (D, V)
    inf = jnp.float32(np.inf)
    dist0 = jnp.where(seeds_j, 0.0, inf)  # (V,)
    seed_pos0 = jnp.where(seeds_j[None, :], verts3v, 0.0)  # (3, V)
    tmax_sq = (tmax * tmax).astype(jnp.float32)

    def body(state):
        dist, seed_pos, it, _ = state
        nb_dist = dist[neigh_dv]  # (D, V)
        nb_seed = seed_pos[:, neigh_dv]  # (3, D, V)
        # candidate: distance from MY position to the neighbor's seed
        d_sq = jnp.sum((verts3v[:, None, :] - nb_seed) ** 2, axis=0)  # (D, V)
        ok = valid & jnp.isfinite(nb_dist) & (d_sq <= tmax_sq)
        d_sq = jnp.where(ok, d_sq, inf)
        best = jnp.argmin(d_sq, axis=0)  # (V,)
        best_d = jnp.min(d_sq, axis=0)
        take = best_d < dist
        new_dist = jnp.where(take, best_d, dist)
        chosen = jnp.take_along_axis(nb_seed, best[None, None, :], axis=1)[:, 0, :]
        new_seed = jnp.where(take[None, :], chosen, seed_pos)
        return new_dist, new_seed, it + 1, jnp.any(take)

    # max_iters caps the BFS depth: distances are capped at tmax anyway, so
    # any vertex farther than max_iters hops from a seed is past tmax for
    # all realistic edge lengths — the weight is bmin either way.
    state = (dist0, seed_pos0, jnp.int32(0), jnp.bool_(True))
    state = jax.lax.while_loop(lambda s: s[3] & (s[2] < max_iters), body, state)
    dist = state[0]
    reached = jnp.isfinite(dist)
    w = (1.0 - jnp.sqrt(jnp.where(reached, dist, 0.0)) / tmax) * (1.0 - bmin) + bmin
    return jnp.where(reached, w, bmin).astype(jnp.float32)


def _propagate_core(verts_j, neigh_j, deg_j, seeds_j, tmax, bmin,
                    max_iters: int = 24):
    """(V, 3)/(V, D) wrapper over the transposed core."""
    return _propagate_core_t(
        jnp.asarray(verts_j, jnp.float32).T, jnp.asarray(neigh_j).T,
        deg_j, seeds_j, tmax, bmin, max_iters)


def propagate_weights(
    verts: np.ndarray,
    neigh: np.ndarray,
    deg: np.ndarray,
    seeds: np.ndarray,
    tmax: float,
    bmin: float,
    max_iters: int = 24,
) -> np.ndarray:
    """BFS weight propagation from staircase vertices (reference
    mesh.rs:202-294): each vertex takes the squared distance to the seed
    vertex that reaches it (within tmax), weight = (1 - d/tmax)(1-bmin)+bmin,
    unreached -> bmin.  Data-parallel relaxation over the neighbor table,
    fully jitted (cached per mesh shape)."""
    return np.asarray(
        _propagate_core(
            jnp.asarray(verts, jnp.float32), jnp.asarray(neigh),
            jnp.asarray(deg), jnp.asarray(seeds),
            jnp.float32(tmax), jnp.float32(bmin), max_iters,
        )
    )


@partial(jax.jit, static_argnames=())
def _staircase_core_t(normals3f, faces_j, n_vertices_pad, t, stack_orientation):
    """normals (3, F), faces (F, 3); 1-D row scatters (see
    _staircase_core_3t)."""
    axes = jnp.stack([
        stack_orientation,
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
    ])  # (3 axes, 3 comps)
    of = 1.0 - jnp.abs(axes @ normals3f)  # (3 axes, F)
    V = n_vertices_pad.shape[0]
    has_face = None
    flag = jnp.zeros((V,), jnp.bool_)
    for a in range(3):
        vmax = jnp.full((V,), -jnp.inf)
        vmin = jnp.full((V,), jnp.inf)
        for c in range(3):
            idx = faces_j[:, c]
            vmax = vmax.at[idx].max(of[a])
            vmin = vmin.at[idx].min(of[a])
        if has_face is None:
            has_face = jnp.isfinite(vmax)
        flag = flag | ((vmax - vmin) >= t)
    return has_face & flag


def _staircase_core(verts_j, faces_j, normals_j, t, stack_orientation):
    """(V, 3)/(F, 3) wrapper."""
    return _staircase_core_t(
        jnp.asarray(normals_j, jnp.float32).T, faces_j,
        jnp.zeros((verts_j.shape[0],), jnp.uint8), t, stack_orientation)


@jax.jit
def _face_normals_3t(verts3v: jax.Array, faces3t: jax.Array) -> jax.Array:
    """(3, F) normals from (3, V) verts and corner-major (3, F) faces."""
    p0 = verts3v[:, faces3t[0]]
    p1 = verts3v[:, faces3t[1]]
    p2 = verts3v[:, faces3t[2]]
    u = p1 - p0
    w = p2 - p0
    n = jnp.stack([
        u[1] * w[2] - u[2] * w[1],
        u[2] * w[0] - u[0] * w[2],
        u[0] * w[1] - u[1] * w[0],
    ])
    norm = jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True))
    return n / jnp.where(norm == 0, 1.0, norm)


@jax.jit
def _staircase_core_3t(normals3f, faces3t, n_vertices_pad, t, stack_orientation):
    """_staircase_core_t for corner-major (3, F) faces.

    Unrolled to 1-D row scatters: the (3, V)-row form (`.at[:, idx]`)
    measured 3.7 s at 512^3 vs 1.5 s for eighteen plain 1-D scatters."""
    axes = jnp.stack([
        stack_orientation,
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
    ])
    of = 1.0 - jnp.abs(axes @ normals3f)  # (3 axes, F)
    V = n_vertices_pad.shape[0]
    has_face = None
    flag = jnp.zeros((V,), jnp.bool_)
    for a in range(3):
        vmax = jnp.full((V,), -jnp.inf)
        vmin = jnp.full((V,), jnp.inf)
        for c in range(3):
            idx = faces3t[c]
            vmax = vmax.at[idx].max(of[a])
            vmin = vmin.at[idx].min(of[a])
        if has_face is None:
            has_face = jnp.isfinite(vmax)
        flag = flag | ((vmax - vmin) >= t)
    return has_face & flag


@partial(jax.jit, static_argnames=("V",))
def _staircase_minmax_3t(normals3f, faces3t, V: int, stack_orientation=None):
    """Per-vertex (vmax (3 axes, V), vmin (3, V)) of the staircase
    off-axis measure — the raw accumulators behind _staircase_core_3t's
    range test.  The sharded pipeline needs them separately: the flag is
    ``max - min >= t`` over ALL incident faces, so shard-boundary vertices
    must combine accumulators across shards before thresholding (a
    boolean OR of per-side flags misses split ranges)."""
    if stack_orientation is None:
        stack_orientation = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    axes = jnp.stack([
        stack_orientation,
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
    ])
    of = 1.0 - jnp.abs(axes @ normals3f)  # (3 axes, F)
    vmaxs = []
    vmins = []
    for a in range(3):
        vmax = jnp.full((V,), -jnp.inf)
        vmin = jnp.full((V,), jnp.inf)
        for c in range(3):
            idx = faces3t[c]
            vmax = vmax.at[idx].max(of[a])
            vmin = vmin.at[idx].min(of[a])
        vmaxs.append(vmax)
        vmins.append(vmin)
    return jnp.stack(vmaxs), jnp.stack(vmins)


# ---------------------------------------------------------------------------
# Adjacency from the marching dedup-sort byproducts (no extra lexsort)
# ---------------------------------------------------------------------------


@jax.jit
def _max_group_size(group_of_sorted: jax.Array, sorted_valid: jax.Array):
    """Maximum incident-corner count over vertices (= max vertex degree on
    a closed manifold) — one scatter-add + max.  (An associative_scan
    formulation compiled for tens of minutes through the remote-compile
    hop; scatters lower to simple kernels.)"""
    M = group_of_sorted.shape[0]
    ones = sorted_valid.astype(jnp.int32)
    deg = jnp.zeros((M,), jnp.int32).at[group_of_sorted].add(ones)
    return jnp.max(deg)


@partial(jax.jit, static_argnames=("T", "n_verts_pad", "max_deg", "out_deg",
                                   "return_raw", "use_gather", "sort_rows",
                                   "return_mg"))
def _adjacency_from_sorted_corners(inverse, order, group_of_sorted,
                                   sorted_valid, T: int, n_verts_pad: int,
                                   max_deg: int, out_deg: int = None,
                                   return_raw: bool = False,
                                   use_gather: bool = False,
                                   sort_rows: bool = True,
                                   return_mg: bool = False):
    """Deduplicated (max_deg, V) neighbor table + degrees, built from the
    vertex-dedup sort the marching stage already paid for.

    Corners sorted by owning vertex give each vertex its incident-corner
    run; a corner's two face-partners are its (duplicated) neighbors.  On
    a closed manifold every unique neighbor appears exactly twice (one per
    shared face), so sorting each vertex's 2*deg neighbor slots and taking
    every other entry yields the dedup'd list — one scatter + a tiny-axis
    sort instead of the 44M-element lexsort vertex_adjacency_fast pays
    (measured 16.4 s at 512^3; this path is ~3 s).
    """
    M = order.shape[0]
    V = n_verts_pad
    arange = jnp.arange(M, dtype=jnp.int32)
    # groups are contiguous in sorted order: group start/end positions via
    # two M-element sorts instead of colliding scatter-min/max into (V+1,)
    # buffers (rule 12: 22M sorts cost ~0.08 s, the scatters ~0.25 s each).
    # Group g's start lands at output position g by keying starts with
    # their group id and everything else with M + arange.
    gos = group_of_sorted
    new_group = jnp.concatenate([
        jnp.ones((1,), jnp.bool_), gos[1:] != gos[:-1]])
    last_group = jnp.concatenate([
        gos[1:] != gos[:-1], jnp.ones((1,), jnp.bool_)])
    _, starts = jax.lax.sort_key_val(
        jnp.where(new_group, gos, M + arange), arange)
    _, ends = jax.lax.sort_key_val(
        jnp.where(last_group, gos, M + arange), arange)
    if V > M:  # tiny meshes: V_pad has a 1024 floor
        fill = jnp.full((V - M,), M, jnp.int32)
        starts = jnp.concatenate([starts, fill])
        ends = jnp.concatenate([ends, fill])
    start_v = starts[:V]  # junk for g >= n_groups, masked below
    end_v = ends[:V]
    pos = arange - start_v[gos]

    tri = order % T
    corner = order // T
    nb1 = inverse[((corner + 1) % 3) * T + tri]

    sentinel = jnp.int32(V)  # sorts after every real vertex id
    # degree = run length, zeroed for the invalid orphan group (validity
    # is per-group: invalid slots share key -1, one group at the front)
    # and for padding groups beyond n_groups
    n_groups = gos[-1] + 1
    garange = jnp.arange(V, dtype=jnp.int32)
    valid_at_start = sorted_valid[jnp.minimum(start_v, M - 1)]
    deg = jnp.where(
        (garange < n_groups) & valid_at_start,
        jnp.minimum(end_v - start_v + 1, max_deg), 0)
    if not (return_raw or use_gather):
        # closed-fan fast path (the production single-chip route): on a
        # closed oriented manifold each neighbor of v is the ccw-NEXT
        # corner of exactly ONE of v's incident faces, so the nb1 list
        # alone enumerates the one-ring once — no nb2 gather, HALF the
        # scatter (22M vs 44M entries at 512^3), and no bitonic pair-dedup
        # at all.  Marching output is consistently oriented and closed
        # (the mask is border-padded), matching the reference smoother's
        # is_border == false assumption (mesh.rs _calc_d note above).
        # Shard-boundary rings (return_raw) have OPEN local fans where
        # this breaks — they keep the pair-dedup path below.
        okf = sorted_valid & (pos < max_deg)
        gf = jnp.where(okf, gos, V)
        flat = jnp.full((max_deg * (V + 1),), sentinel, jnp.int32)
        lin = jnp.where(okf, pos * (V + 1) + gf, max_deg * (V + 1) - 1)
        flat = flat.at[lin].set(jnp.where(okf, nb1, sentinel))
        dedup = flat.reshape(max_deg, V + 1)[:, :V]
        if sort_rows:
            # sort rows ascending: the table is then BITWISE identical to
            # the pair-dedup output, so fp summation order matches it.
            # The scatter above already lands vertex v's neighbors
            # compactly at rows 0..deg(v)-1 (pos enumerates the run), so
            # the sort is ONLY for that bitwise match — and it is FREE:
            # probed 0.651 s unsorted vs 0.657 s sorted at 512^3 (the
            # 16-row bitonic is whole-row min/max at HBM speed).
            dedup = _bitonic_sort_rows(dedup)
        if out_deg is not None:
            dedup = dedup[:out_deg]
        if return_mg:
            # untruncated max run length (deg above clamps to max_deg):
            # lets the caller hardcode max_deg and verify post-hoc with
            # one scalar read instead of paying _max_group_size's 22M
            # colliding scatter-add up front (~0.25 s at 512^3)
            mg_val = jnp.max(jnp.where(
                (garange < n_groups) & valid_at_start,
                end_v - start_v + 1, 0))
            return dedup, deg, mg_val
        return dedup, deg
    nb2 = inverse[((corner + 2) % 3) * T + tri]

    D2 = 2 * max_deg
    ok = sorted_valid & (2 * pos + 1 < D2)
    g = jnp.where(ok, group_of_sorted, V)  # dummy column for masked writes
    if use_gather:
        # gather formulation (MEASURED SLOWER — kept as a documented
        # negative result): corner validity is per-GROUP (invalid slots
        # share key -1 and sort into one orphan group at the front, see
        # marching._dedup_vertices), so each real vertex's run is fully
        # valid and table[d, v] == nb_inter[2*start_of[v] + d] for
        # d < 2*deg[v].  On the v5e at 512^3 (V=3.1M, D2=32) this D2*V
        # gather costs 3.75 s vs 1.19 s for the two 22M scatter-sets:
        # the ~6 ns/index model holds for SMALL index sets, but a 99M
        # index vector + 400 MB output makes the gather bandwidth-bound
        # on its index/output traffic, while scatter-set traffic scales
        # with the 22M source elements.
        nb_inter = jnp.stack([nb1, nb2], axis=1).reshape(2 * M)
        nb_inter = jnp.concatenate([nb_inter,
                                    jnp.full((1,), sentinel, jnp.int32)])
        d = jnp.arange(D2, dtype=jnp.int32)[:, None]  # (D2, 1)
        base = 2 * start_v[None, :]  # (1, V)
        take = d < 2 * deg[None, :]
        flat_idx = jnp.where(take, base + d, 2 * M).reshape(-1)
        table = nb_inter[flat_idx].reshape(D2, V)
    else:
        # ONE 1-D flattened scatter of both face-partners (a 2-D scatter
        # with two index vectors lowers to a serial loop on TPU, and one
        # 2M-element scatter beats two M-element ones); row-major
        # (D2, V+1)
        flat = jnp.full((D2 * (V + 1),), sentinel, jnp.int32)
        lin1 = jnp.where(ok, (2 * pos) * (V + 1) + g, D2 * (V + 1) - 1)
        lin2 = jnp.where(ok, (2 * pos + 1) * (V + 1) + g, D2 * (V + 1) - 1)
        lin = jnp.concatenate([lin1, lin2])
        val = jnp.where(jnp.concatenate([ok, ok]),
                        jnp.concatenate([nb1, nb2]), sentinel)
        flat = flat.at[lin].set(val)
        table = flat.reshape(D2, V + 1)[:, :V]
    # sort the tiny D2 axis with an explicit bitonic network of
    # jnp.minimum/maximum passes — pure elementwise, runs at HBM speed
    # (XLA's general sort HLO is orders of magnitude slower here)
    table = _bitonic_sort_rows(table)
    dedup = table[0::2]  # duplicates pair up; sentinels pad the tail
    if out_deg is not None:  # trim pow2 padding rows: smoothing gathers
        dedup = dedup[:out_deg]  # scale with the REAL max degree
    if return_raw:
        # undeduped entries (2 per incident corner): what shard-boundary
        # ring vertices need — their local fans are OPEN, so the
        # pair-dedup assumption breaks there; summing raw entries from
        # both shards counts every true neighbor exactly twice
        # (parallel/sharded_ops.py fused smoothing).
        return dedup, deg, table
    return dedup, deg


def _bitonic_sort_rows(table: jax.Array) -> jax.Array:
    """Sort along axis 0 (a power-of-two, <= ~64) with a static bitonic
    network: log^2(D) compare-exchange stages of whole-row min/max."""
    D = table.shape[0]
    assert D & (D - 1) == 0, "bitonic network needs a power-of-two axis"
    rows = [table[i] for i in range(D)]
    k = 2
    while k <= D:
        j = k // 2
        while j >= 1:
            for i in range(D):
                l = i ^ j
                if l > i:
                    up = (i & k) == 0
                    lo = jnp.minimum(rows[i], rows[l])
                    hi = jnp.maximum(rows[i], rows[l])
                    rows[i], rows[l] = (lo, hi) if up else (hi, lo)
            j //= 2
        k *= 2
    return jnp.stack(rows)


def adjacency_from_device_mesh(dm) -> Tuple[jax.Array, jax.Array]:
    """(neigh (D, V_pad), deg (V_pad,)) for a marching.DeviceMesh.
    D is the real max degree bucketed to 4 (the pow2 padding the bitonic
    network needs is trimmed before return — every downstream smoothing
    gather pays per row).

    max_deg is HARDCODED to 16 (the marching-tet vertex degree bound the
    sharded path has always asserted; 12 is the max ever observed) and
    verified post-hoc from the untruncated run-length max — one ~30 ms
    scalar read instead of _max_group_size's up-front 22M colliding
    scatter-add (measured ~0.25 s of the 0.90 s adjacency stage at
    512^3).  INV3_ADJ_MAXD overrides the bound for pathological
    (non-marching) meshes."""
    import os

    if os.environ.get("INV3_ADJ_GATHER", "0") == "1":
        # documented-slower gather formulation keeps the measured-mg path
        mg = int(_max_group_size(dm.group_of_sorted, dm.sorted_valid))
        max_deg = max(8, 1 << (mg - 1).bit_length())
        out_deg = min(max_deg, ((mg + 3) // 4) * 4)
        T = dm.faces3t.shape[1]
        return _adjacency_from_sorted_corners(
            dm.inverse, dm.order, dm.group_of_sorted, dm.sorted_valid,
            T, dm.verts3v.shape[1], max_deg, out_deg, use_gather=True)
    max_deg = int(os.environ.get("INV3_ADJ_MAXD", "16"))
    max_deg = max(4, 1 << (max_deg - 1).bit_length())  # bitonic needs pow2
    T = dm.faces3t.shape[1]
    neigh, deg, mg_dev = _adjacency_from_sorted_corners(
        dm.inverse, dm.order, dm.group_of_sorted, dm.sorted_valid,
        T, dm.verts3v.shape[1], max_deg, None, return_mg=True)
    mg = int(mg_dev)
    if mg > max_deg:
        raise ValueError(
            f"vertex degree {mg} exceeds the max_deg={max_deg} bound — "
            "set INV3_ADJ_MAXD to the next power of two")
    out_deg = min(max_deg, ((max(mg, 4) + 3) // 4) * 4)
    return neigh[:out_deg], deg


# ---------------------------------------------------------------------------
# Grid-chamfer weight propagation (fast path for the fused pipeline)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("shape",))
def _rasterize_seeds(vox3v: jax.Array, flagged: jax.Array, shape):
    Z, Y, X = shape
    zi = jnp.clip(jnp.round(vox3v[0]).astype(jnp.int32), 0, Z - 1)
    yi = jnp.clip(jnp.round(vox3v[1]).astype(jnp.int32), 0, Y - 1)
    xi = jnp.clip(jnp.round(vox3v[2]).astype(jnp.int32), 0, X - 1)
    lin = jnp.where(flagged, (zi * Y + yi) * X + xi, 0)
    val = jnp.where(flagged, 0.0, jnp.inf)
    grid = jnp.full((Z * Y * X,), jnp.inf, jnp.float32).at[lin].min(val)
    return grid.reshape(shape)


@partial(jax.jit, static_argnames=("spacing_zyx", "steps"))
def _chamfer(grid: jax.Array, spacing_zyx, steps: int):
    """26-neighbor min-plus distance relaxation: `steps` fused passes of
    shifted adds (pure shifts — no gathers — so each pass runs at HBM
    bandwidth)."""
    sz, sy, sx = spacing_zyx
    offs = [(dz, dy, dx)
            for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dz, dy, dx) != (0, 0, 0)]
    costs = [float(np.sqrt((dz * sz) ** 2 + (dy * sy) ** 2 + (dx * sx) ** 2))
             for dz, dy, dx in offs]

    def shifted(g, dz, dy, dx):
        pad = [(max(dz, 0), max(-dz, 0)), (max(dy, 0), max(-dy, 0)),
               (max(dx, 0), max(-dx, 0))]
        p = jnp.pad(g, pad, constant_values=jnp.inf)
        Z, Y, X = g.shape
        return p[max(-dz, 0):max(-dz, 0) + Z,
                 max(-dy, 0):max(-dy, 0) + Y,
                 max(-dx, 0):max(-dx, 0) + X]

    def body(g, _):
        out = g
        for (dz, dy, dx), c in zip(offs, costs):
            out = jnp.minimum(out, shifted(g, dz, dy, dx) + c)
        return out, None

    out, _ = jax.lax.scan(body, grid, None, length=steps)
    return out


@jax.jit
def _grid_weights(grid: jax.Array, vox3v: jax.Array, tmax, bmin):
    Z, Y, X = grid.shape
    zi = jnp.clip(jnp.round(vox3v[0]).astype(jnp.int32), 0, Z - 1)
    yi = jnp.clip(jnp.round(vox3v[1]).astype(jnp.int32), 0, Y - 1)
    xi = jnp.clip(jnp.round(vox3v[2]).astype(jnp.int32), 0, X - 1)
    d = grid.reshape(-1)[(zi * Y + yi) * X + xi]
    w = (1.0 - d / tmax) * (1.0 - bmin) + bmin
    return jnp.where(d <= tmax, w, bmin).astype(jnp.float32)


def ca_smoothing_device(dm, t: float = 0.7, tmax: float = 3.0,
                        bmin: float = 0.5, n_iters: int = 10,
                        propagate: str = "grid",
                        propagate_iters: int = 12) -> jax.Array:
    """Context-aware smoothing over a marching.DeviceMesh, device-resident
    end to end.  Returns smoothed (3, V_pad) world verts.

    ``propagate="grid"`` computes the staircase-distance weights with a
    voxel-grid chamfer transform (the weight is a function of euclidean
    distance to the nearest flagged vertex — same semantics as the mesh
    BFS, measured 18.7 s -> ~2 s at 512^3; max chamfer overestimate ~8%
    of tmax).  ``propagate="mesh"`` keeps the exact BFS."""
    verts3v = dm.verts3v
    V = verts3v.shape[1]
    normals3f = _face_normals_3t(verts3v, dm.faces3t)
    flagged = _staircase_core_3t(
        normals3f, dm.faces3t, jnp.zeros((V,), jnp.uint8),
        jnp.float32(t), jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
    neigh_dv, deg_j = adjacency_from_device_mesh(dm)
    if propagate == "grid":
        sx, sy, sz = dm.spacing
        ox, oy, oz = dm.origin_shift
        vox3v = jnp.stack([(verts3v[2] - oz) / sz, (verts3v[1] - oy) / sy,
                           (verts3v[0] - ox) / sx])  # (3 zyx, V)
        steps = min(16, int(np.ceil(tmax / min(dm.spacing))))
        grid = _rasterize_seeds(vox3v, flagged, dm.vol_shape)
        grid = _chamfer(grid, (sz, sy, sx), steps)
        weights = _grid_weights(grid, vox3v, jnp.float32(tmax),
                                jnp.float32(bmin))
    else:
        weights = _propagate_core_t(
            verts3v, neigh_dv, deg_j, flagged,
            jnp.float32(tmax), jnp.float32(bmin), propagate_iters)
    return taubin_smooth_bucketed(verts3v, neigh_dv, deg_j, weights,
                                  jnp.float32(0.5), jnp.float32(-0.53),
                                  n_iters)


def ca_smoothing(
    verts: np.ndarray,
    faces: np.ndarray,
    t: float = 0.7,
    tmax: float = 3.0,
    bmin: float = 0.5,
    n_iters: int = 10,
    propagate_iters: int = 12,
) -> np.ndarray:
    """Full context-aware smoothing (reference mesh.rs:27-87 /
    invesalius_rs/__init__.py ca_smoothing): detect staircase vertices,
    propagate weights, weighted Taubin with lambda=0.5, mu=-0.53.

    Everything stays on device end to end (one final readback).
    ``propagate_iters`` bounds the BFS depth: weights only matter within
    ``tmax`` mm of a seed, i.e. ~tmax/min_edge_length hops."""
    verts3v = jnp.asarray(verts, jnp.float32).T  # (3, V) lane-friendly
    faces_j = jnp.asarray(faces)
    normals3f = _face_normals_t(verts3v, faces_j)
    flagged = _staircase_core_t(
        normals3f, faces_j, jnp.zeros((verts3v.shape[1],), jnp.uint8),
        jnp.float32(t), jnp.asarray([0.0, 0.0, 1.0], jnp.float32))
    if len(faces) > 200_000:  # device adjacency (deduplicated)
        neigh, deg_j = vertex_adjacency_fast(faces, len(verts))
        neigh_dv = jnp.asarray(neigh).T  # (D, V)
    else:
        neigh, deg = vertex_adjacency(faces, len(verts))
        neigh_dv, deg_j = jnp.asarray(neigh).T, jnp.asarray(deg)
    weights = _propagate_core_t(
        verts3v, neigh_dv, deg_j, flagged,
        jnp.float32(tmax), jnp.float32(bmin), propagate_iters)
    out = _taubin_core(verts3v, neigh_dv, deg_j, weights,
                       jnp.float32(0.5), jnp.float32(-0.53), n_iters)
    return np.asarray(out.T)


# ---------------------------------------------------------------------------
# Hole filling (vtkFillHolesFilter semantics, reference
# surface_process.py:397-415 — HoleSize=300 cap on created surfaces and the
# mesh-import flow surface.py:619)
# ---------------------------------------------------------------------------


def boundary_loops(faces: np.ndarray, n_vertices: int) -> list:
    """Closed boundary loops (vertex index lists, walk order = the directed
    boundary edges of the existing faces).

    An undirected edge used by exactly one face is a boundary edge.  On a
    consistently-wound manifold each boundary vertex has one outgoing
    boundary edge, so loops chain by successor.  Open/non-manifold chains
    are dropped (vtk does the same silently).
    """
    faces = np.asarray(faces, np.int64)
    if len(faces) == 0:
        return []
    src = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    dst = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    key = np.minimum(src, dst) * n_vertices + np.maximum(src, dst)
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    on_boundary = counts[inv] == 1
    bsrc, bdst = src[on_boundary], dst[on_boundary]
    succ: dict = {}
    for a, b in zip(bsrc.tolist(), bdst.tolist()):
        if a in succ:  # non-manifold pinch: keep first, drop rest
            continue
        succ[a] = b
    loops = []
    visited: set = set()
    for start in succ:
        if start in visited:
            continue
        loop = [start]
        visited.add(start)
        cur = succ[start]
        ok = True
        while cur != start:
            if cur in visited or cur not in succ or len(loop) > len(succ):
                ok = False
                break
            loop.append(cur)
            visited.add(cur)
            cur = succ[cur]
        if ok and len(loop) >= 3:
            loops.append(loop)
    return loops


def fill_holes(verts: np.ndarray, faces: np.ndarray,
               hole_size: float = 300.0) -> Tuple[np.ndarray, np.ndarray, int]:
    """Cap boundary loops whose circumsphere radius <= ``hole_size``.

    Triangulation: centroid fan (adds one vertex per hole) wound opposite
    to the boundary edges so the cap pairs every boundary edge and the
    mesh stays consistently oriented.  Returns (verts, faces, n_filled).
    """
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    loops = boundary_loops(faces, len(verts))
    new_verts = [verts]
    new_faces = [faces]
    n_total = len(verts)
    n_filled = 0
    for loop in loops:
        pts = verts[loop]
        radius = 0.5 * float(np.linalg.norm(pts.max(0) - pts.min(0)))
        if radius > hole_size:
            continue
        if len(loop) == 3:
            a, b, c = loop
            cap = np.array([[c, b, a]], np.int32)
        else:
            centroid = pts.mean(0, dtype=np.float64).astype(np.float32)
            ci = n_total
            new_verts.append(centroid[None])
            n_total += 1
            nxt = np.roll(loop, -1)
            cap = np.stack([nxt, np.asarray(loop), np.full(len(loop), ci)],
                           axis=1).astype(np.int32)
        new_faces.append(cap)
        n_filled += 1
    if n_filled == 0:
        return verts, faces, 0
    return (np.concatenate(new_verts), np.concatenate(new_faces), n_filled)


# ---------------------------------------------------------------------------
# Connectivity filtering on meshes (vtkPolyDataConnectivityFilter semantics)
# ---------------------------------------------------------------------------


def mesh_components(faces: np.ndarray, n_vertices: int) -> np.ndarray:
    """Connected-component id per vertex (scipy sparse BFS — vectorized)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    faces = np.asarray(faces, np.int64)
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    g = coo_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                   shape=(n_vertices, n_vertices))
    _, labels = connected_components(g, directed=False)
    return labels


def keep_largest_component(
    verts: np.ndarray, faces: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep only the largest connected surface (reference
    surface_process.py:377-391 keep_largest branch)."""
    comp = mesh_components(faces, len(verts))
    ids, counts = np.unique(comp, return_counts=True)
    best = ids[np.argmax(counts)]
    keep_v = comp == best
    remap = -np.ones(len(verts), np.int64)
    remap[keep_v] = np.arange(keep_v.sum())
    keep_f = keep_v[faces].all(axis=1)
    new_faces = remap[faces[keep_f]].astype(np.int32)
    return verts[keep_v], new_faces


def _extract_vertex_subset(
    verts: np.ndarray, faces: np.ndarray, keep_v: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Compact a mesh to the vertices flagged in boolean keep_v, keeping
    faces whose three corners all survive."""
    remap = -np.ones(len(verts), np.int64)
    remap[keep_v] = np.arange(int(keep_v.sum()))
    keep_f = keep_v[faces].all(axis=1)
    return verts[keep_v], remap[faces[keep_f]].astype(np.int32)


def split_components(
    verts: np.ndarray, faces: np.ndarray
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Split a mesh into its connected components, largest first
    (reference surface.py:431 OnSplitSurface -> polydata_utils.SplitDisconectedParts,
    vtkPolyDataConnectivityFilter in SPECIFIED_REGION mode)."""
    comp = mesh_components(faces, len(verts))
    ids, counts = np.unique(comp, return_counts=True)
    out = []
    for cid in ids[np.argsort(-counts)]:
        out.append(_extract_vertex_subset(verts, faces, comp == cid))
    return out


def select_components_by_seeds(
    verts: np.ndarray, faces: np.ndarray, seed_vertices
) -> Tuple[np.ndarray, np.ndarray]:
    """Keep every connected component containing at least one seed vertex
    id (reference surface.py:319 OnSeedSurface ->
    polydata_utils.JoinSeedsParts, connectivity filter with
    AddSeed per point id)."""
    seed_vertices = np.atleast_1d(np.asarray(seed_vertices, np.int64))
    comp = mesh_components(faces, len(verts))
    wanted = np.unique(comp[seed_vertices])
    return _extract_vertex_subset(verts, faces, np.isin(comp, wanted))


def nearest_vertex(verts: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Vertex id nearest to each query point (world mm) — how a 3D-picked
    seed becomes a point id.  Chunked to bound memory."""
    points = np.atleast_2d(np.asarray(points, np.float32))
    out = np.empty(len(points), np.int64)
    v = np.asarray(verts, np.float32)
    for i, p in enumerate(points):
        out[i] = int(np.argmin(((v - p) ** 2).sum(axis=1)))
    return out


# ---------------------------------------------------------------------------
# Device-side adjacency (large meshes)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_vertices", "max_deg"))
def _adjacency_device(faces: jax.Array, n_vertices: int, max_deg: int):
    """Padded, DEDUPLICATED neighbor table built fully on device:
    lexsort the directed edge list by (src, dst), mark first occurrences,
    compute each unique edge's slot as (global unique rank - group-start
    unique rank), and scatter.  One sort, a few scans/scatters — the halved
    table width halves every downstream smoothing gather."""
    e_src = jnp.concatenate([faces[:, 0], faces[:, 1], faces[:, 2],
                             faces[:, 1], faces[:, 2], faces[:, 0]])
    e_dst = jnp.concatenate([faces[:, 1], faces[:, 2], faces[:, 0],
                             faces[:, 0], faces[:, 1], faces[:, 2]])
    order = jnp.lexsort((e_dst, e_src))
    src_s = e_src[order]
    dst_s = e_dst[order]
    is_new = jnp.concatenate([
        jnp.ones((1,), jnp.bool_),
        (src_s[1:] != src_s[:-1]) | (dst_s[1:] != dst_s[:-1]),
    ])
    uniq_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    big = jnp.int32(2**30)
    group_start = jnp.full((n_vertices,), big, jnp.int32).at[src_s].min(uniq_rank)
    pos = uniq_rank - group_start[src_s]
    deg = jnp.zeros((n_vertices,), jnp.int32).at[src_s].add(is_new.astype(jnp.int32))
    # masked (duplicate or overflow) writes are routed to a dummy row
    ok = is_new & (pos < max_deg)
    table = jnp.tile(jnp.arange(n_vertices + 1, dtype=jnp.int32)[:, None],
                     (1, max_deg))
    table = table.at[jnp.where(ok, src_s, n_vertices),
                     jnp.where(ok, pos, 0)].set(dst_s)
    table = table[:n_vertices]
    deg = jnp.minimum(deg, max_deg)
    return table, deg


def vertex_adjacency_fast(faces: np.ndarray, n_vertices: int):
    """Adjacency via the device path (exact, deduplicated).  max_deg is
    bucketed to limit recompiles."""
    faces_j = jnp.asarray(faces, jnp.int32)
    deg_counts = np.bincount(np.asarray(faces).ravel(), minlength=n_vertices)
    max_deg = int(deg_counts.max()) if len(deg_counts) else 1
    max_deg = max(8, ((max_deg + 7) // 8) * 8)  # bucket to limit recompiles
    table, deg = _adjacency_device(faces_j, n_vertices, max_deg)
    return table, deg


# ---------------------------------------------------------------------------
# Remesh utilities for the brain-peel chain (reference brainmesh_handler.py
# downsample/upsample/warp helpers :418-500)
# ---------------------------------------------------------------------------


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals, normalized (the quantity
    vtkPolyDataNormals feeds vtkWarpVector in reference SliceDown
    brainmesh_handler.py:200-210)."""
    v = np.asarray(verts, np.float64)
    f = np.asarray(faces)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    vn = np.zeros_like(v)
    for c in range(3):  # unrolled scatter-add (CLAUDE.md rule 5 idiom)
        np.add.at(vn, f[:, c], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return (vn / np.maximum(norm, 1e-12)).astype(np.float32)


def cluster_remesh(verts: np.ndarray, faces: np.ndarray,
                   n_clusters: int = 3000):
    """Uniform vertex-clustering remesh — the array-native stand-in for
    the reference's pyacvd ``Clustering(...).cluster(3000)`` downsample
    (brainmesh_handler.py:466).  Vertices merge into ~n_clusters uniform
    grid cells (new vertex = cluster mean); degenerate and duplicate
    faces drop.  Vectorized lexsort/bincount, no Python-per-vertex work."""
    v = np.asarray(verts, np.float32)
    f = np.asarray(faces, np.int64)
    lo = v.min(axis=0)
    span = np.maximum(v.max(axis=0) - lo, 1e-6)
    # occupied-cell count grows ~quadratically with grid res for a
    # surface: binary-search the res that lands near n_clusters
    res_lo, res_hi = 2, 256
    best = None
    for _ in range(10):
        res = (res_lo + res_hi) // 2
        cell = np.floor((v - lo) / span * (res - 1e-4)).astype(np.int64)
        key = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
        uniq, inverse = np.unique(key, return_inverse=True)
        if best is None or abs(len(uniq) - n_clusters) < abs(best[0] - n_clusters):
            best = (len(uniq), inverse, len(uniq))
        if len(uniq) < n_clusters:
            res_lo = res + 1
        else:
            res_hi = res - 1
        if res_lo > res_hi:
            break
        cell_res = res
    _, inverse, n_new = best
    sums = np.zeros((n_new, 3), np.float64)
    np.add.at(sums, inverse, v)
    counts = np.bincount(inverse, minlength=n_new)
    new_v = (sums / counts[:, None]).astype(np.float32)
    nf = inverse[f]
    keep = ((nf[:, 0] != nf[:, 1]) & (nf[:, 1] != nf[:, 2])
            & (nf[:, 0] != nf[:, 2]))
    nf = nf[keep]
    # drop duplicate faces regardless of rotation (sorted-tuple key)
    sf = np.sort(nf, axis=1)
    _, first = np.unique((sf[:, 0] * n_new + sf[:, 1]) * n_new + sf[:, 2],
                         return_index=True)
    return new_v, nf[np.sort(first)].astype(np.int32)


def subdivide_linear(verts: np.ndarray, faces: np.ndarray,
                     n_subdivisions: int = 1):
    """Midpoint (linear) subdivision — vtkLinearSubdivisionFilter
    (reference brainmesh_handler.py:438 upsample; each pass: 1 tri -> 4,
    shared edge midpoints deduplicated by sorted-edge key)."""
    v = np.asarray(verts, np.float64)
    f = np.asarray(faces, np.int64)
    for _ in range(n_subdivisions):
        V = len(v)
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        ek = np.sort(e, axis=1)
        key = ek[:, 0] * V + ek[:, 1]
        uniq, inv = np.unique(key, return_inverse=True)
        mids = (v[uniq // V] + v[uniq % V]) * 0.5
        m = inv.reshape(3, -1).T + V  # midpoint ids per face: 01, 12, 20
        v = np.concatenate([v, mids])
        f = np.concatenate([
            np.stack([f[:, 0], m[:, 0], m[:, 2]], 1),
            np.stack([m[:, 0], f[:, 1], m[:, 1]], 1),
            np.stack([m[:, 2], m[:, 1], f[:, 2]], 1),
            m,
        ])
    return v.astype(np.float32), f.astype(np.int32)


def warp_along_normals(verts: np.ndarray, faces: np.ndarray,
                       distance: float):
    """Move every vertex ``distance`` along its normal — vtkWarpVector
    with SetScaleFactor (reference SliceDown warps by -1 to peel inward,
    brainmesh_handler.py:202-210)."""
    return (np.asarray(verts, np.float32)
            + np.float32(distance) * vertex_normals(verts, faces))
