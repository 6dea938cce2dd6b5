"""Multi-chip sharded volume operations: Z-sharded kernels with halo
exchange over ICI.

The structural analog of the reference's slab parallelism (reference
surface.py:1360-1430: 20-slice slabs, 1-slice overlap, spawn pool):
volumes shard along Z over the mesh; elementwise kernels (threshold,
WW/WL) need no communication; neighborhood kernels (dilation, active-cell
detection for marching cubes, floodfill fixpoints) exchange a 1-slice halo
with ``jax.lax.ppermute`` — the ICI version of the reference's overlapped
slabs.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from invesalius3_tpu.ops.morphology import _offsets


def halo_exchange_z(x: jax.Array, axis_name: str = "z") -> Tuple[jax.Array, jax.Array]:
    """Inside shard_map: return (slice from the previous shard, slice from
    the next shard) — each (1, Y, X); edges receive zeros."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x[:1]
    bottom = x[-1:]
    # send my bottom slice to the next shard (it becomes their "prev")
    prev_halo = jax.lax.ppermute(bottom, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    next_halo = jax.lax.ppermute(top, axis_name,
                                 [(i, (i - 1) % n) for i in range(n)])
    prev_halo = jnp.where(idx == 0, jnp.zeros_like(prev_halo), prev_halo)
    next_halo = jnp.where(idx == n - 1, jnp.zeros_like(next_halo), next_halo)
    return prev_halo, next_halo


def sharded_threshold_mask(mesh: Mesh):
    """Z-sharded threshold (pure elementwise; sharding propagates, no
    collectives)."""
    from invesalius3_tpu.ops.threshold import threshold_new_mask

    @partial(jax.jit, static_argnums=())
    def f(image, tmin, tmax):
        return threshold_new_mask(image, tmin, tmax)

    return f


def sharded_binary_dilation(mesh: Mesh, strct: np.ndarray, axis_name: str = "z"):
    """Binary dilation over a Z-sharded volume: each shard dilates locally
    after receiving 1-slice halos from its neighbors (structuring elements
    up to 3 deep in Z)."""
    from jax import shard_map

    offs = _offsets(strct)
    assert all(abs(o[0]) <= 1 for o in offs), "halo depth 1 supports Z-extent-3 elements"

    def local(x):
        prev_halo, next_halo = halo_exchange_z(x.astype(jnp.bool_), axis_name)
        padded = jnp.concatenate([prev_halo.astype(jnp.bool_), x.astype(jnp.bool_),
                                  next_halo.astype(jnp.bool_)], axis=0)
        out = jnp.zeros_like(padded)
        from invesalius3_tpu.ops.morphology import shift_nd

        for off in offs:
            out = out | shift_nd(padded, off, fill=False)
        return out[1:-1]

    spec = P(axis_name, None, None)
    return jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec))


def sharded_floodfill_threshold(mesh: Mesh, strct: np.ndarray, axis_name: str = "z",
                                steps_per_check: int = 8):
    """Z-sharded region grow: the fixpoint loop runs *inside* shard_map so
    each iteration's halo exchange rides ICI; convergence is checked with a
    global psum, mirroring the reference's overlapping-slab stitching."""
    from jax import shard_map
    from invesalius3_tpu.ops.morphology import shift_nd

    offs = _offsets(strct)
    assert all(abs(o[0]) <= 1 for o in offs)

    def local(data, seeds, t0, t1):
        allowed = (data >= t0) & (data <= t1)
        reached0 = seeds & allowed

        def dilate_with_halo(r):
            prev_halo, next_halo = halo_exchange_z(r, axis_name)
            padded = jnp.concatenate([prev_halo, r, next_halo], axis=0)
            out = jnp.zeros_like(padded)
            for off in offs:
                out = out | shift_nd(padded, off, fill=False)
            return out[1:-1] & allowed | r

        def body(state):
            r, _ = state
            new = r
            for _ in range(steps_per_check):
                new = dilate_with_halo(new)
            changed_local = jnp.any(new != r)
            changed = jax.lax.psum(changed_local.astype(jnp.int32), axis_name) > 0
            return new, changed

        reached, _ = jax.lax.while_loop(lambda s: s[1], body, (reached0, jnp.bool_(True)))
        return reached

    spec = P(axis_name, None, None)
    return jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(spec, spec, P(), P()),
            out_specs=spec,
        )
    )


# ---------------------------------------------------------------------------
# Z-sharded watershed (SURVEY P3 + P1 halo pattern)
# ---------------------------------------------------------------------------


def _halo_z(x: jax.Array, axis_name: str, edge_fill) -> jax.Array:
    """Ghost-pad a local Z-shard with its neighbors' boundary planes:
    returns (n_local + 2, Y, X); outer edges get ``edge_fill``."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    prev_halo = jax.lax.ppermute(x[-1:], axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    next_halo = jax.lax.ppermute(x[:1], axis_name,
                                 [(i, (i - 1) % n) for i in range(n)])
    fill = jnp.full_like(prev_halo, edge_fill)
    prev_halo = jnp.where(idx == 0, fill, prev_halo)
    next_halo = jnp.where(idx == n - 1, fill, next_halo)
    return jnp.concatenate([prev_halo, x, next_halo], axis=0)


def sharded_watershed(mesh: Mesh, connectivity: int = 6,
                      axis_name: str = "z", levels: int | None = None,
                      quiet_rounds: int = 1, stop: str = "rank"):
    """Z-sharded marker watershed: the full multigrid IFT solver runs
    inside ONE shard_map program.

    Per relaxation round each shard ghost-pads rank/lab with its
    neighbors' boundary planes (``ppermute``), runs the 6 directional
    sweeps locally (ops/watershed.py ``_one_round_padded`` — the same
    Pallas/scan kernels as single-device; the explicit neighbor relax
    runs only for 18/26-connectivity), and drops the
    ghosts; label stability is checked with a global ``psum``.  Bellman
    relaxation converges to the identical fixpoint from any schedule, so
    basins match the single-device solver voxel-for-voxel (asserted in
    tests/test_parallel.py); cross-shard information moves one shard per
    round, which the coarse multigrid levels make cheap (a level-3 coarse
    grid spans the volume in a handful of rounds).

    The multigrid transfer operators (2x max-pool down, repeat-up) are
    Z-uniform, so they stay shard-local; Z extents must divide evenly by
    2^levels * n_shards.

    Mirrors reference watershed_process.py:19 ``do_watershed`` (subprocess
    + scipy/skimage) as the multi-chip path.
    """
    from jax import shard_map

    from invesalius3_tpu.ops import watershed as ws
    from invesalius3_tpu.ops.morphology import shift_nd

    n_shards = mesh.shape[axis_name]

    def local(image, markers, mg_z, mg_y, mg_x, use_gradient, n_levels,
              debug_rank=False, debug_rounds=False):
        rounds_per_level = []  # one traced counter per multigrid level
        # f: shifted-to-positive image, optional morphological gradient
        img = (image - jax.lax.pmin(jnp.min(image), axis_name)).astype(jnp.int32)
        if use_gradient:  # static: morphological gradient with 1-plane halo
            # separate edge fills so outer-volume ghost planes are identity
            # elements for max resp. min (matches reduce_window SAME edges)
            big = jnp.iinfo(jnp.int32).max
            img_lo = _halo_z(img, axis_name, -big - 1)  # identity for max
            img_hi = _halo_z(img, axis_name, big)       # identity for min
            offs = [(dz, dy, dx)
                    for dz in range(-(mg_z // 2), mg_z // 2 + 1)
                    for dy in range(-(mg_y // 2), mg_y // 2 + 1)
                    for dx in range(-(mg_x // 2), mg_x // 2 + 1)]
            dil = img_lo
            ero = img_hi
            for off in offs:
                if off == (0, 0, 0):
                    continue
                dil = jnp.maximum(dil, shift_nd(img_lo, off, fill=-big - 1))
                ero = jnp.minimum(ero, shift_nd(img_hi, off, fill=big))
            f_fine = (dil - ero)[1:-1]
        else:
            f_fine = img
        f_fine = jnp.clip(f_fine, 0, 2**16 - 2)
        lab_fine = markers.astype(jnp.int32)

        def refine(f, lab0, rank_init, lab_init):
            frozen = lab0 != 0
            rank0 = jnp.where(frozen, jnp.int32(0), rank_init)
            lab0_applied = jnp.where(frozen, lab0, lab_init)

            def round_(state):
                rank, lab, quiet, n_rounds = state
                rank_p = _halo_z(rank, axis_name, ws._INF_RANK)
                lab_p = _halo_z(lab, axis_name, 0)
                # outer-edge ghost f = 2^16-1: one above any real cost
                # (f clips to 2^16-2), so the in-round sweeps running over
                # the ghost plane can never fabricate a winning path
                # through out-of-volume space.  (A ghost f of 0 is a
                # zero-cost superhighway: the backward Z sweep writes
                # column minima into the ghost plane, the Y/X sweeps
                # spread them for free, and the neighbor relax injects
                # them back as phantom shortcuts.)  Interior ghosts carry
                # the neighbor's REAL boundary f, so paths through them
                # are genuine relaxations.
                f_p = _halo_z(f, axis_name, 2**16 - 1)
                nr, nl = ws._one_round_padded(rank_p, lab_p, f_p, connectivity)
                nr, nl = nr[1:-1], nl[1:-1]
                nr = jnp.where(frozen, jnp.int32(0), nr)
                nl = jnp.where(frozen, lab0, nl)
                # stopping rule, measured at 256^3/8 shards (project8):
                #
                # - stop="rank": full rank+label stability.  With
                #   halo-limited propagation (1 shard-hop per round) a
                #   label-only quiet window can close while better
                #   (cost, dist) ranks are still in flight across shards —
                #   tie voxels would then keep the wrong side.  Rank
                #   quiescence IS the Bellman fixpoint: bitwise-exact tie
                #   distances, but 170 fine-level rounds (vs 14 single-
                #   device): ranks keep polishing plateau tie distances
                #   nobody observes, ~12x the rounds.
                #
                # - stop="label": label stability over the quiet window —
                #   the SAME criterion the single-device host loop uses
                #   (ops/watershed.py _watershed_refine).  Basins match
                #   everywhere off the tie plateau (which is schedule-
                #   dependent in every IFT solver and already excluded
                #   from the agreement tests); fine-level rounds drop to
                #   single-device-like counts.  This is the scaling path's
                #   default via the bench (INV3_SHARDED).
                delta = jnp.any(nl != lab)
                if stop == "rank":
                    delta = delta | jnp.any(nr != rank)
                changed = jax.lax.psum(delta.astype(jnp.int32),
                                       axis_name) > 0
                quiet = jnp.where(changed, 0, quiet + 1)
                return nr, nl, quiet, n_rounds + 1

            rank, lab, _, n_rounds = jax.lax.while_loop(
                lambda s: s[2] < quiet_rounds, round_,
                (rank0, lab0_applied, jnp.int32(0), jnp.int32(0)))
            rounds_per_level.append(n_rounds)
            return rank, lab

        def solve(f_lvl, lab_lvl, level):
            if level == 0 or f_lvl.shape[0] <= 4:  # local planes per shard
                rank_init = jnp.full(f_lvl.shape, ws._INF_RANK, jnp.int32)
                return refine(f_lvl, lab_lvl, rank_init, lab_lvl)
            f_c = jax.lax.reduce_window(
                f_lvl, -(2**31), jax.lax.max, (2, 2, 2), (2, 2, 2),
                padding="SAME")
            lab_c = jax.lax.reduce_window(
                lab_lvl, jnp.int32(-(2**15)), jax.lax.max, (2, 2, 2),
                (2, 2, 2), padding="SAME")
            rank_c, lab_sol_c = solve(f_c, lab_c, level - 1)
            up = lambda a: jnp.repeat(jnp.repeat(jnp.repeat(
                a, 2, axis=0), 2, axis=1), 2, axis=2)[
                : f_lvl.shape[0], : f_lvl.shape[1], : f_lvl.shape[2]]
            # max with pooled f: the coarse-seed-cell validity fix
            # (ops/watershed.py watershed_ift_multigrid has the proof)
            cost_up = up(jnp.maximum(rank_c >> ws._DIST_BITS, f_c))
            rank_init = jnp.where(
                cost_up >= (ws._INF_RANK >> ws._DIST_BITS), ws._INF_RANK,
                cost_up * (1 << ws._DIST_BITS) + ws._DIST_MAX)
            return refine(f_lvl, lab_lvl, rank_init, up(lab_sol_c))

        rank_out, lab = solve(f_fine, lab_fine, n_levels)
        if debug_rounds:
            # coarse -> fine order; replicated across shards (psum'd rounds
            # are identical, the counter is shard-local but loop exit is
            # global) — shape (n_levels + 1,)
            return lab.astype(jnp.int16), jnp.stack(rounds_per_level)[None]
        if debug_rank:
            return lab.astype(jnp.int16), rank_out
        return lab.astype(jnp.int16)

    spec = P(axis_name, None, None)

    def run(image, markers, algorithm: str = "Watershed",
            mg_size=(3, 3, 3), debug_rank: bool = False,
            debug_rounds: bool = False):
        n_levels = levels
        if n_levels is None:
            n_levels = 3 if min(image.shape) >= 192 else 0
        local_z = image.shape[0] // n_shards
        while n_levels > 0 and (local_z % (2 ** n_levels)
                                or (local_z // 2 ** n_levels) < 1):
            n_levels -= 1
        if debug_rounds:
            out_specs = (spec, P(axis_name))
        elif debug_rank:
            out_specs = (spec, spec)
        else:
            out_specs = spec
        fn = shard_map(
            partial(local, mg_z=int(mg_size[0]), mg_y=int(mg_size[1]),
                    mg_x=int(mg_size[2]),
                    use_gradient=(algorithm == "Watershed"),
                    n_levels=n_levels, debug_rank=debug_rank,
                    debug_rounds=debug_rounds),
            mesh=mesh, in_specs=(spec, spec),
            out_specs=out_specs,
            # pallas_call outputs carry no varying-axis annotation; the
            # sweeps are verified vs single-device by tests instead
            check_vma=False)
        sharding = NamedSharding(mesh, spec)
        image = jax.device_put(jnp.asarray(image), sharding)
        markers = jax.device_put(jnp.asarray(markers), sharding)
        return jax.jit(fn)(image, markers)

    return run


# ---------------------------------------------------------------------------
# Z-sharded marching-tetrahedra surface extraction (SURVEY P1)
# ---------------------------------------------------------------------------


def shard_world_verts(verts_row, n_own: int, spacing, smoothed: bool
                      ) -> np.ndarray:
    """One shard's (3, V) vertex row → (n_own, 3) world-frame f32 verts.
    The ONE place the pad-offset/world transform lives — both the host
    assembly below and mesh_io.write_stl_sharded call it, so the two
    export paths cannot desynchronize."""
    vo = np.asarray(verts_row)[:, :n_own].T  # (v, 3)
    if smoothed:  # the fused smoother already emitted world-frame (x,y,z)
        return np.ascontiguousarray(vo, np.float32)
    sx, sy, sz = spacing
    world = np.stack([vo[:, 2] * sx, vo[:, 1] * sy, vo[:, 0] * sz],
                     axis=1).astype(np.float32)
    # remove the one-voxel pad offset (Y/X pad + the conceptual leading
    # empty Z plane that the halo of shard 0 provides)
    world -= np.array([sx, sy, sz], np.float32)
    return world


def shard_wound_faces(faces_row, T: int, n_tri: int) -> np.ndarray:
    """One shard's flat face row → (n_tri, 3) int32 with the outward
    winding the export writers expect (see shard_world_verts)."""
    inv = np.asarray(faces_row).reshape(3, T)[:, :n_tri]
    return np.ascontiguousarray(inv.T[:, ::-1], np.int32)


def sharded_mask_to_surface(mesh: Mesh, mask: jax.Array,
                            spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0),
                            axis_name: str = "z", smooth: dict | None = None,
                            return_stats: bool = False, balance: bool = False,
                            return_parts: bool = False,
                            _vbucket_scale: float = 1.0):
    """Full surface extraction over a Z-sharded mask: each shard runs the
    marching-tet stages on its slab (+1-slice halo) with *global* lattice
    keys, dedups locally, and the shards stitch on device by the
    boundary-plane key property:

      a vertex is duplicated across shards iff both its lattice-edge
      endpoints lie in the shard-boundary plane; both copies sort to the
      same relative position (keys are global), so the upper shard's
      duplicates match the lower shard's exports *positionally* — the
      stitch is one ppermute of (ids) plus rank arithmetic, no search.

    Vertices come back in global-key order — bit-identical to the
    single-device path (including its leading orphan slot when triangle
    padding exists); faces are the same set, ordered by slab then
    tet-slot (the single-device order interleaves tets volume-wide), the
    same concatenation semantics as the reference's slab join
    (surface.py:1360-1430).

    ``balance=True`` picks the Z cut planes from a per-cell-row triangle
    histogram (measured by the count pass) so every shard carries
    ~1/n_shards of the triangles instead of 1/n_shards of the *slices*
    (project8 measured the uniform max shard at 0.159 of the tris vs the
    0.125 ideal at 512³ — taubin's gather floor scales with the max
    shard, so balance is worth ~20% of the dominant smoothing stage on
    real multi-chip).  Each shard then holds a fixed-size Zmax slab with
    a traced real length l_s = cuts[s+1] - cuts[s]; all slab arithmetic
    (halo rows, ownership filter, ghost planes) indexes through the
    replicated ``cuts`` array, so different cut positions reuse the same
    compiled program.  Outputs are identical to the uniform partition
    (verts in global key order; same face set).

    Returns host (verts (V, 3) world mm, faces (F, 3) int32).
    """
    from jax import shard_map

    from invesalius3_tpu.ops import marching as mc

    n_shards = mesh.devices.size
    spec = P(axis_name, None, None)
    mask = jax.device_put((jnp.asarray(mask) >= 127).astype(jnp.uint8),
                          NamedSharding(mesh, spec))
    Z, Y, X = (int(s) for s in mask.shape)
    assert Z % n_shards == 0, "Z must divide evenly over the mesh"
    Zs = Z // n_shards
    # pad Y/X globally (replicated); Z pad is the first/last shard's job,
    # handled by treating out-of-range halos as zeros.  To keep the classic
    # "pad by one empty voxel" semantics we pad Y/X here and add one empty
    # leading/trailing Z slice *inside* the owning shards.
    maskp = jax.device_put(jnp.pad(mask, ((0, 0), (1, 1), (1, 1))),
                           NamedSharding(mesh, spec))
    Yp, Xp = Y + 2, X + 2
    # conceptual global padded volume: [empty plane, Z slices, empty plane];
    # shard 0's zero prev-halo and the last shard's zero next-halo ARE those
    # empty planes, so no Z pad is materialized.

    # --- pass 1: per-cell-row counts.  Each shard counts, for every cell
    # row of its padded slab, the active cells and emitted triangles, plus
    # the per-slice "any 2×2 YX window set" occupancy (sizes the spurious
    # active row a truncated balanced slab sees against its zero padding).
    # The host assembles global (Z+1,) histograms: they size the SPMD
    # compaction buckets exactly AND drive the balanced cut selection.
    def count_pass(vis):
        prev_halo, next_halo = halo_exchange_z(vis, axis_name)
        c = jnp.concatenate([prev_halo, vis, next_halo], axis=0)
        Z1 = c.shape[0]
        corners = []
        for dz, dy, dx in mc.CUBE_OFFSETS:
            corners.append(c[dz:dz + Z1 - 1, dy:dy + Yp - 1, dx:dx + Xp - 1]
                           .astype(jnp.bool_))
        agg_any = corners[0]
        agg_all = corners[0]
        for cc in corners[1:]:
            agg_any = agg_any | cc
            agg_all = agg_all & cc
        act_row = jnp.sum((agg_any & ~agg_all).astype(jnp.int32),
                          axis=(1, 2))                       # (Zs + 1,)
        tri_row = jnp.zeros_like(act_row)
        for tet in mc.TETS:
            s = sum(corners[t].astype(jnp.uint8) for t in tet)
            tri_row = tri_row + jnp.sum(
                jnp.minimum(s, 4 - s).astype(jnp.int32), axis=(1, 2))
        sl = vis.astype(jnp.bool_)
        win = sl[:, :-1, :-1] | sl[:, 1:, :-1] | sl[:, :-1, 1:] | sl[:, 1:, 1:]
        occ_row = jnp.concatenate([
            jnp.sum(win, axis=(1, 2)).astype(jnp.int32),
            jnp.zeros((1,), jnp.int32)])                     # (Zs + 1,)
        # in-plane surface-crossing edges per slice: each is one vertex
        # in that lattice plane — sizes the B_RING bucket (cut-plane rim
        # vertices).  Tet face-diagonal crossings ride the x2 cushion
        # applied at sizing time.
        edge_row = jnp.concatenate([
            (jnp.sum(sl[:, 1:, :] != sl[:, :-1, :], axis=(1, 2))
             + jnp.sum(sl[:, :, 1:] != sl[:, :, :-1], axis=(1, 2)))
            .astype(jnp.int32),
            jnp.zeros((1,), jnp.int32)])                     # (Zs + 1,)
        return jnp.stack([act_row, tri_row, occ_row, edge_row])[None]

    counts = jax.jit(shard_map(count_pass, mesh=mesh, in_specs=(spec,),
                               out_specs=P(axis_name)))(maskp)
    counts = np.asarray(counts)  # (n_shards, 4, Zs + 1)
    # global cell rows 0..Z (leading/trailing empty planes close the
    # surface at rows handled by shard 0 / the last shard); occ per slice
    act_g = np.zeros(Z + 1, np.int64)
    tri_g = np.zeros(Z + 1, np.int64)
    occ_g = np.zeros(Z, np.int64)
    edge_g = np.zeros(Z, np.int64)
    for s in range(n_shards):
        act_g[s * Zs:(s + 1) * Zs] = counts[s, 0, :Zs]
        tri_g[s * Zs:(s + 1) * Zs] = counts[s, 1, :Zs]
        occ_g[s * Zs:(s + 1) * Zs] = counts[s, 2, :Zs]
        edge_g[s * Zs:(s + 1) * Zs] = counts[s, 3, :Zs]
    act_g[Z] = counts[n_shards - 1, 0, Zs]
    tri_g[Z] = counts[n_shards - 1, 1, Zs]

    # --- cut selection: shard s owns global cell rows [cuts[s], cuts[s+1])
    # (the last also owns row Z) and real slices [cuts[s], cuts[s+1]).
    if balance and n_shards > 1 and tri_g.sum() > 0:
        # cap slab lengths at 2x the uniform slab: every shard pays the
        # extraction grid + chamfer grid at Zmax rows, so an uncapped cut
        # around a thin surface band would inflate all shards' grids
        # toward full-volume size (n_shards x the uniform per-shard work)
        # for at most ~20% of taubin back
        cap = min(Z, 2 * Zs)
        cum = np.cumsum(tri_g.astype(np.float64))
        cuts = [0]
        for s in range(1, n_shards):
            c = int(np.searchsorted(cum, cum[-1] * s / n_shards))
            c = min(max(c, cuts[-1] + 1), Z - (n_shards - s), cuts[-1] + cap)
            cuts.append(c)
        cuts.append(Z)
        for s in range(n_shards - 1, 0, -1):  # feasibility: len <= cap
            cuts[s] = max(cuts[s], cuts[s + 1] - cap)
    else:
        cuts = [s * Zs for s in range(n_shards)] + [Z]
    lens = np.diff(np.asarray(cuts))
    uniform = bool((lens == Zs).all())
    Zmax = Zs if uniform else int(-(-int(lens.max()) // 8) * 8)
    Zmax = min(Zmax, Z) if not uniform else Zmax

    # bucket sizing (exact, from the histograms): a shard's field holds
    # cell rows [cuts[s], cuts[s+1]] (the shared boundary row compacts on
    # both sides before the ownership filter drops one copy) plus, when
    # its slab is shorter than Zmax, one spurious row of the next-halo
    # slice against the zero padding (counted by occ of that slice).
    b_act = np.zeros(n_shards, np.int64)
    b_tri = np.zeros(n_shards, np.int64)
    for s in range(n_shards):
        c0, c1 = cuts[s], cuts[s + 1]
        b_act[s] = act_g[c0:c1 + 1].sum()
        if c1 < Z and lens[s] < Zmax:
            b_act[s] += occ_g[c1]
        b_tri[s] = tri_g[c0:c1].sum() + (tri_g[Z] if s == n_shards - 1 else 0)
    # eighth-octave bucket rounding (mc._round_bucket): every padded
    # element below is PAID by the dedup sort, the interior gathers and
    # the per-vertex scatters — pow2 rounding wasted up to 2x (at 512^3:
    # max_tris 780646 -> 1048576 = 1.34x; now 786432 = 1.007x)
    max_active = max(1024, mc._round_bucket(int(b_act.max())))
    max_tris = max(2048, mc._round_bucket(int(b_tri.max())))
    # vertex bucket: per-shard open-mesh Euler bound instead of a flat
    # heuristic cushion.  V = T/2 + rim/2 + O(components): rim vertices
    # at a cut plane are bounded by 2x that plane's in-plane crossing
    # edges (the same bound B_RING uses, asserted post-hoc via
    # checks[:, 2:4] since it shipped), components contribute +2 each
    # (256 covers any clinical mask; pathological inputs hit the
    # overflow retry below, one recompile).  The old t/32 cushion plus
    # 1/8-octave rounding sized 458752 for a measured 391319 fill at
    # 512^3 — 17% padding PAID by every interior gather column of the
    # dominant sharded-taubin stage; this bound + 1/32 rounding gives
    # 393216 (0.5%).
    b_ver = np.zeros(n_shards, np.int64)
    for s in range(n_shards):
        c0, c1 = cuts[s], cuts[s + 1]
        rim = 0
        if s > 0:
            rim += 2 * max(int(edge_g[max(c0 - 1, 0)]),
                           int(edge_g[min(c0, Z - 1)]))
        if s < n_shards - 1:
            rim += 2 * max(int(edge_g[max(c1 - 1, 0)]),
                           int(edge_g[min(c1, Z - 1)]))
        b_ver[s] = b_tri[s] // 2 + rim // 2 + 256
    vbucket = min(max_tris, max(2048, mc._round_bucket(
        int(b_ver.max() * _vbucket_scale), steps=32)))
    # ring bucket: cut-plane rim vertices = in-plane crossing edges at
    # the cut (measured ~2.8k at 512^3 vs the stitch bucket's 131072 —
    # the per-pass (2*MAXD, bucket) raw gathers pay the PADDED width, so
    # a tight bucket matters).  x2 cushion covers tet face-diagonal
    # crossings; checks[:, 2]/[:, 3] assert the bound post-hoc.
    cut_edges = 0
    for c in cuts[1:-1]:
        cut_edges = max(cut_edges,
                        int(edge_g[max(c - 1, 0)]), int(edge_g[min(c, Z - 1)]))
    B_RING = max(4096, mc._round_bucket(2 * cut_edges))
    # global lattice-edge keys are lin * 8 + code in int32 (the same bound
    # marching_cubes_device enforces single-device)
    if 8 * (Z + 2) * Yp * Xp >= 2**31:
        raise ValueError("global volume too large for int32 lattice-edge "
                         "keys (> ~640^3 equivalent)")

    # --- repartition to the balanced frame: shard s's fixed-size slab is
    # [real slices cuts[s]..cuts[s+1]-1, zero padding to Zmax]
    if uniform:
        work = maskp
    else:
        idx_map = np.zeros(n_shards * Zmax, np.int32)
        valid = np.zeros(n_shards * Zmax, bool)
        for s in range(n_shards):
            idx_map[s * Zmax:s * Zmax + lens[s]] = np.arange(
                cuts[s], cuts[s + 1])
            valid[s * Zmax:s * Zmax + lens[s]] = True
        rep = jax.jit(
            lambda m, ix, va: jnp.where(va[:, None, None],
                                        jnp.take(m, ix, axis=0), 0)
            .astype(m.dtype),
            out_shardings=NamedSharding(mesh, spec))
        work = rep(maskp, jnp.asarray(idx_map), jnp.asarray(valid))
    cuts_dev = jnp.asarray(cuts, jnp.int32)  # (S + 1,) replicated

    # --- pass 2: extraction + local dedup + stitch
    BOUND = (1 << 16) if uniform else (1 << 17)  # boundary vertex bucket

    def extract_local(vis, cuts_arr):
        idx = jax.lax.axis_index(axis_name)
        # my cells start at local z in [0, l): global padded z0 of local
        # row 0 is cuts[idx] (prev halo plane = global plane cuts[idx],
        # since the conceptual global volume has one leading empty plane)
        z0 = cuts_arr[idx]
        l = cuts_arr[idx + 1] - z0
        # field (Zmax + 2, Yp, Xp): [prev shard's last real slice (or the
        # leading empty plane), my slab, next shard's first slice placed
        # at row l + 1 (or the trailing empty plane)]
        my_last = jax.lax.dynamic_slice_in_dim(vis, l - 1, 1, axis=0)
        prev_halo = jax.lax.ppermute(
            my_last, axis_name,
            [(i, (i + 1) % n_shards) for i in range(n_shards)])
        prev_halo = jnp.where(idx == 0, jnp.zeros_like(prev_halo), prev_halo)
        next_halo = jax.lax.ppermute(
            vis[:1], axis_name,
            [(i, (i - 1) % n_shards) for i in range(n_shards)])
        next_halo = jnp.where(idx == n_shards - 1,
                              jnp.zeros_like(next_halo), next_halo)
        field = jnp.concatenate(
            [prev_halo, vis, jnp.zeros_like(prev_halo)], axis=0)
        field = jax.lax.dynamic_update_slice_in_dim(
            field, next_halo, l + 1, axis=0)
        local_shape = tuple(int(s) for s in field.shape)
        corner_lin, vals, ins, valid_cell, _ = mc._extract_cells(
            field, 0.5, max_active)
        # keep only cells starting in my slab rows [0, l) of the padded
        # frame; the final shard also keeps row l (cells closing the
        # surface against the global trailing empty plane)
        cz = jnp.where(valid_cell, corner_lin[0] // (Yp * Xp), 0)
        keep = valid_cell & ((cz < l) | ((idx == n_shards - 1) & (cz <= l)))
        ins = ins & keep[None, :]
        case, tri_slots, n_tris_l = mc._emit_slots(ins, keep, max_tris)
        pts, keys = mc._materialize(corner_lin, vals, ins, case, tri_slots,
                                    0.5, local_shape)
        # local -> global: z += z0 (coordinates); the edge key is
        # lattice_lin * 8 + diff_code, so the lin shift scales by 8
        pts = pts.at[:, 0, :].add(z0.astype(jnp.float32))
        keys = jnp.where(keys >= 0, keys + 8 * z0 * Yp * Xp, -1)

        T = pts.shape[2]
        pts_m = pts.transpose(1, 0, 2).reshape(3, 3 * T)
        keys_m = keys.reshape(3 * T)
        verts_d, inverse_d, n_groups, order, gos = mc._dedup_vertices(
            pts_m, keys_m)

        # classify each vertex (group): orphan (key -1), lower-boundary
        # duplicate (an in-plane edge in my first plane), or own
        ks = keys_m[order]
        sorted_valid_l = ks >= 0
        new_group = jnp.concatenate([
            jnp.ones((1,), jnp.bool_), gos[1:] != gos[:-1]])
        M = gos.shape[0]
        g_key = jnp.zeros((M,), jnp.int32).at[gos].max(
            jnp.where(new_group, ks, 0))
        g_orphan = jnp.zeros((M,), jnp.bool_).at[gos].max(
            new_group & (ks < 0))
        # edge key -> (plane of the low endpoint, diff code); both
        # endpoints lie in that plane iff the z bit (4) of the code is 0
        g_plane = (g_key // 8) // (Yp * Xp)
        g_inplane = (g_key % 8) < 4
        lower = z0
        upper = z0 + l
        is_vert = jnp.arange(M) < n_groups
        # ownership: an in-plane vertex at a shard boundary belongs to the
        # shard whose slab STARTS there (the upper one) — then every own
        # key of shard s sorts strictly before every own key of shard s+1,
        # so shard-order concatenation IS the global key order.
        g_dup = (is_vert & ~g_orphan & g_inplane & (g_plane == upper)
                 & (idx < n_shards - 1))
        g_lower = (is_vert & ~g_orphan & g_inplane
                   & (g_plane == lower))  # owned by me, dup'd in prev
        # shard 0 owns the single global orphan slot; others drop theirs
        g_own = is_vert & ~g_dup & (~g_orphan | (idx == 0))

        own_rank = jnp.cumsum(g_own.astype(jnp.int32)) - 1
        n_own = jnp.sum(g_own.astype(jnp.int32))
        dup_rank = jnp.cumsum(g_dup.astype(jnp.int32)) - 1

        # shard bases: exclusive prefix sum of n_own over shards
        all_counts = jax.lax.all_gather(n_own, axis_name)  # (S,)
        base = jnp.sum(jnp.where(jnp.arange(n_shards) < idx, all_counts, 0))

        my_global = jnp.where(g_own, base + own_rank, 0)

        # export my lower-plane vertices' global ids (key-ordered) to the
        # PREVIOUS shard, whose upper-plane duplicates match positionally
        lo_rank = jnp.cumsum(g_lower.astype(jnp.int32)) - 1
        exports = jnp.zeros((BOUND,), jnp.int32).at[
            jnp.where(g_lower, lo_rank, BOUND - 1)].set(
            jnp.where(g_lower, my_global, 0), mode="drop")
        n_up = jnp.sum(g_lower.astype(jnp.int32))
        recv = jax.lax.ppermute(
            exports, axis_name,
            [(i, (i - 1) % n_shards) for i in range(n_shards)])

        final_id = jnp.where(g_dup, recv[jnp.clip(dup_rank, 0, BOUND - 1)],
                             my_global)
        # orphan groups on shards > 0 map to global orphan 0 (never used by
        # valid faces)
        final_id = jnp.where(g_orphan & (idx > 0), 0, final_id)

        faces_global = final_id[inverse_d]  # (M,) corner-major

        if smooth is None:
            # own vertices compacted into a max_out bucket, key-ordered
            verts_own = jnp.zeros((3, M), jnp.float32).at[
                :, jnp.where(g_own, own_rank, M - 1)].set(
                jnp.where(g_own, verts_d, 0.0), mode="drop")
            checks = jnp.stack([n_own, n_tris_l, n_up,
                                jnp.sum(g_dup.astype(jnp.int32)), n_groups])
            return (verts_own[None], faces_global[None], checks[None])

        # -- fused Z-sharded ca-smoothing (reference surface_process.py:
        # 270-319 ca_smoothing; single-device twin ops/mesh.py
        # ca_smoothing_device).  All mesh state stays per-shard; boundary
        # vertices are synchronized through key-ordered B_RING buckets
        # (same rank space as the id stitch's BOUND buckets, but sized
        # from the measured cut-plane edge counts — the per-pass raw
        # gathers pay the padded bucket width).
        from invesalius3_tpu.ops import mesh as mo

        t_ = jnp.float32(smooth.get("t", 0.7))
        tmax_ = float(smooth.get("tmax", 3.0))
        bmin_ = float(smooth.get("bmin", 0.5))
        n_iters = int(smooth.get("n_iters", 10))
        sx, sy, sz = spacing
        # static vertex bucket.  Euler for the closed marching output:
        # V = T/2 + 2 - 2g, plus the open shard-boundary rim (~n_up +
        # n_dup, a few thousand) — so T/2 with a rim cushion bounds it
        # tightly.  The old bucket (= max_tris) wasted ~2.7x: every
        # per-vertex gather/scatter below pays the PADDED width, masked
        # or not, and taubin's interior gather dominates the sharded
        # stage.  checks[:, 4] asserts the bound post-hoc.
        V = vbucket
        MAXD = 16     # marching-tet vertex degree bound; checked on host

        def pfwd(x):  # shard s -> s+1 (dup side -> owner side)
            return jax.lax.ppermute(
                x, axis_name, [(i, (i + 1) % n_shards) for i in range(n_shards)])

        def pbwd(x):  # owner side -> dup side
            return jax.lax.ppermute(
                x, axis_name, [(i, (i - 1) % n_shards) for i in range(n_shards)])

        # world frame + winding identical to marching._finalize_device
        # (padded-frame voxel -> world mm, minus the one-voxel pad shift)
        verts3v = jnp.stack([(verts_d[2] - 1.0) * sx, (verts_d[1] - 1.0) * sy,
                             (verts_d[0] - 1.0) * sz])[:, :V]
        faces3t = inverse_d.reshape(3, max_tris)[::-1]

        # 1. staircase flags.  The flag is a RANGE test (max - min of the
        #    off-axis measure over ALL incident faces >= t), so shard-
        #    boundary vertices exchange their (vmax, vmin) accumulators
        #    and re-threshold on the combined range — a boolean OR of
        #    per-side flags would miss ranges split across the boundary.
        normals3f = mo._face_normals_3t(verts3v, faces3t)
        vmax3, vmin3 = mo._staircase_minmax_3t(normals3f, faces3t, V)
        dup_v = g_dup[:V]
        lower_v = g_lower[:V]
        dup_rank_v = jnp.clip(dup_rank[:V], 0, B_RING - 1)
        lo_rank_v = jnp.clip(lo_rank[:V], 0, B_RING - 1)
        mm_bucket = jnp.zeros((6, B_RING), jnp.float32).at[
            :, jnp.where(dup_v, dup_rank_v, B_RING - 1)].set(
            jnp.where(dup_v,
                      jnp.concatenate([vmax3, -vmin3], axis=0),
                      -jnp.inf), mode="drop")
        recv_mm = pfwd(mm_bucket)
        take = (lower_v & (idx > 0))[None]
        vmax3 = jnp.maximum(vmax3, jnp.where(take, recv_mm[:3, lo_rank_v],
                                             -jnp.inf))
        vmin3 = jnp.minimum(vmin3, jnp.where(take, -recv_mm[3:, lo_rank_v],
                                             jnp.inf))
        flagged = (jnp.isfinite(vmax3[0])
                   & jnp.any(vmax3 - vmin3 >= t_, axis=0)).astype(jnp.uint8)

        # 2. weights: rasterize flagged verts into the local Z slab
        #    (+overflow ghost row folded into the next shard), chamfer with
        #    per-pass ghost-plane refresh — exactly the global operator —
        #    then sample.
        Zl = vis.shape[0]  # static slab rows (Zs uniform / Zmax balanced)
        zi = jnp.clip(jnp.round(verts_d[0, :V]).astype(jnp.int32) - z0 + 1,
                      0, l + 1)
        yi = jnp.clip(jnp.round(verts_d[1, :V]).astype(jnp.int32), 0, Yp - 1)
        xi = jnp.clip(jnp.round(verts_d[2, :V]).astype(jnp.int32), 0, Xp - 1)
        seed_ok = (flagged > 0) & is_vert[:V]
        lin = jnp.where(seed_ok, (zi * Yp + yi) * Xp + xi, 0)
        val = jnp.where(seed_ok, 0.0, jnp.inf)
        grid = jnp.full(((Zl + 2) * Yp * Xp,), jnp.inf, jnp.float32).at[
            lin].min(val).reshape(Zl + 2, Yp, Xp)
        inf_row = jnp.full((1, Yp, Xp), jnp.inf, jnp.float32)
        fold = pfwd(jax.lax.dynamic_slice_in_dim(grid, l + 1, 1, axis=0))
        grid = grid.at[1:2].min(jnp.where(idx == 0, inf_row, fold))

        offs26 = [(dz, dy, dx) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                  for dx in (-1, 0, 1) if (dz, dy, dx) != (0, 0, 0)]
        costs26 = [float(np.sqrt((dz * sz) ** 2 + (dy * sy) ** 2
                                 + (dx * sx) ** 2)) for dz, dy, dx in offs26]
        steps = min(16, int(np.ceil(tmax_ / min(spacing))))

        def refresh_ghosts(g):
            # prev shard's last real row -> my row 0; next shard's first
            # real row -> my row l + 1 (phantom rows above l + 1 of a
            # short balanced slab are never refreshed, never sampled, and
            # only the refreshed ghost row bridges to real rows)
            prev_g = pfwd(jax.lax.dynamic_slice_in_dim(g, l, 1, axis=0))
            next_g = pbwd(g[1:2])
            g = g.at[0:1].set(jnp.where(idx == 0, inf_row, prev_g))
            cur = jax.lax.dynamic_slice_in_dim(g, l + 1, 1, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                g, jnp.where(idx == n_shards - 1, cur, next_g), l + 1,
                axis=0)

        def shifted(g, dz, dy, dx):
            pad = [(max(dz, 0), max(-dz, 0)), (max(dy, 0), max(-dy, 0)),
                   (max(dx, 0), max(-dx, 0))]
            p = jnp.pad(g, pad, constant_values=jnp.inf)
            Zl, Yl, Xl = g.shape
            return p[max(-dz, 0):max(-dz, 0) + Zl,
                     max(-dy, 0):max(-dy, 0) + Yl,
                     max(-dx, 0):max(-dx, 0) + Xl]

        for _ in range(steps):
            grid = refresh_ghosts(grid)
            out = grid
            for (dz, dy, dx), cst in zip(offs26, costs26):
                out = jnp.minimum(out, shifted(grid, dz, dy, dx) + cst)
            grid = out
        grid = refresh_ghosts(grid)
        dist = grid.reshape(-1)[(zi * Yp + yi) * Xp + xi]
        w = (1.0 - dist / tmax_) * (1.0 - bmin_) + bmin_
        weights = jnp.where(dist <= tmax_, w, bmin_).astype(jnp.float32)

        # 3. local adjacency from the dedup-sort byproducts.  Interior
        #    vertices have closed local fans (all their triangles are in
        #    this shard) so the pair-dedup table is exact for them; the
        #    raw (undeduped) table feeds the boundary ring, where local
        #    fans are open and pair-dedup would drop rim neighbors.
        neigh_dv, deg, raw_table = mo._adjacency_from_sorted_corners(
            inverse_d, order, gos, sorted_valid_l,
            max_tris, V, MAXD, out_deg=MAXD, return_raw=True)
        mg = mo._max_group_size(gos, sorted_valid_l)
        D2 = raw_table.shape[0]

        # 4. weighted Taubin with cross-boundary ring exchange.  Summing
        #    RAW incidence entries from BOTH shards counts every true
        #    neighbor of a ring vertex exactly twice (each mesh edge lies
        #    in two triangles; for in-plane edges one triangle per side,
        #    for others both on one side) — so ring mean = (raw_own +
        #    raw_recv) / (2 deg), no in-plane bookkeeping needed.
        #
        #    Interior gathers are THREE-LEVEL: rows 0..LO for every
        #    column, rows LO..MID for a compacted deg>LO bucket, rows
        #    MID..MAXD for a compacted deg>MID bucket.  SPMD needs
        #    static shapes, so the per-degree bucketing the single-chip
        #    taubin_smooth_bucketed does (host-read bucket boundaries)
        #    is unavailable here; the overflow buckets get the same
        #    effect at static shape.  Measured degree histogram of the
        #    marching-tet output (128³ CT phantom, padded buckets):
        #    65% of real vertices are degree 6, 12% degree 7, 2.2%
        #    degree 8, 0.03% above — so LO=6 rows cover 79% of columns,
        #    the deg>6 bucket (V/4 slots, 2 rows) covers the 7-8 tail,
        #    and the deg>8 bucket (V/64 slots, 8 rows) the rest.
        #    Per-pass gather indices: LO*V + 2*MB + 8*HB ≈ 6.6*V vs the
        #    flat table's 16*V and the previous two-level's 9*V.
        #    n_mid/n_hi are checked on host against the bucket slack.
        LO = 6
        MID = 8
        MB = max(1024, V // 4)
        HB = max(1024, V // 64)
        rows_lo = jnp.arange(LO)[:, None] < deg[None, :]
        ar_v = jnp.arange(V, dtype=jnp.int32)

        def compact_bucket(mask_v, size):
            # ids of mask_v's true columns, padded with sentinel V
            rank = jnp.cumsum(mask_v.astype(jnp.int32)) - 1
            ids = jnp.full((size,), V, jnp.int32).at[
                jnp.where(mask_v, rank, size - 1)].set(
                jnp.where(mask_v, ar_v, V), mode="drop")
            return jnp.sum(mask_v.astype(jnp.int32)), ids

        n_mid, mid_ids = compact_bucket(deg > LO, MB)
        n_hi, hi_ids = compact_bucket(deg > MID, HB)
        mid_ok, hi_ok = mid_ids < V, hi_ids < V
        mid_idc = jnp.minimum(mid_ids, V - 1)
        hi_idc = jnp.minimum(hi_ids, V - 1)
        neigh_lo = jnp.minimum(neigh_dv[:LO], V - 1)
        neigh_mid = jnp.minimum(neigh_dv[LO:MID, mid_idc], V - 1)
        neigh_hi = jnp.minimum(neigh_dv[MID:, hi_idc], V - 1)
        rows_mid = ((LO + jnp.arange(MID - LO))[:, None]
                    < deg[mid_idc][None]) & mid_ok[None]
        rows_hi = ((MID + jnp.arange(MAXD - MID))[:, None]
                   < deg[hi_idc][None]) & hi_ok[None]

        def ring_ids_of(mask_v, rank_v):
            return jnp.full((B_RING,), V, jnp.int32).at[
                jnp.where(mask_v, rank_v, B_RING - 1)].set(
                jnp.where(mask_v, jnp.arange(V, dtype=jnp.int32), V),
                mode="drop")

        lower_ids = ring_ids_of(lower_v, lo_rank_v)  # (B_RING,) vert id | V
        dup_ids = ring_ids_of(dup_v, dup_rank_v)
        raw_lower = raw_table[:, jnp.minimum(lower_ids, V - 1)]  # (D2, B)
        raw_dup = raw_table[:, jnp.minimum(dup_ids, V - 1)]
        inc_lower = jnp.where(lower_ids < V, deg[jnp.minimum(lower_ids, V - 1)], 0)
        inc_dup = jnp.where(dup_ids < V, deg[jnp.minimum(dup_ids, V - 1)], 0)
        rows2 = jnp.arange(D2)[:, None]
        raw_lower_ok = rows2 < 2 * inc_lower[None, :]
        raw_dup_ok = rows2 < 2 * inc_dup[None, :]
        w_lower = jnp.where(lower_ids < V,
                            weights[jnp.minimum(lower_ids, V - 1)], 0.0)

        def raw_sum(v, tbl, ok):
            nb = v[:, jnp.minimum(tbl, V - 1)]  # (3, D2, B)
            s = jnp.sum(nb * ok[None], axis=1)
            return jnp.concatenate(
                [s, jnp.sum(ok, axis=0)[None].astype(jnp.float32)], axis=0)

        def pass_(v, factor):
            # interior update from the dedup'd table, three-level gather
            nb = v[:, neigh_lo]                              # (3, LO, V)
            local_sum = jnp.sum(nb * rows_lo[None], axis=1)
            nb_mid = v[:, neigh_mid]                         # (3, MID-LO, MB)
            mid_sum = jnp.sum(nb_mid * rows_mid[None], axis=1)
            local_sum = local_sum.at[:, mid_idc].add(
                jnp.where(mid_ok[None], mid_sum, 0.0))
            nb_hi = v[:, neigh_hi]                           # (3, D-MID, HB)
            hi_sum = jnp.sum(nb_hi * rows_hi[None], axis=1)  # (3, HB)
            local_sum = local_sum.at[:, hi_idc].add(
                jnp.where(hi_ok[None], hi_sum, 0.0))
            cnt = jnp.maximum(deg.astype(jnp.float32), 1.0)
            d = v - local_sum / cnt[None]
            v_new = v + weights[None] * factor * d
            # ring update: raw halves from both sides
            own_half = raw_sum(v, raw_lower, raw_lower_ok)   # (4, B)
            dup_half = raw_sum(v, raw_dup, raw_dup_ok)
            recv = pfwd(dup_half)
            recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
            tot = own_half + recv
            ring_cnt = jnp.maximum(tot[3], 1.0)
            ring_mean = tot[:3] / ring_cnt[None]
            ring_pos = v[:, jnp.minimum(lower_ids, V - 1)]
            ring_new = ring_pos + w_lower[None] * factor * (ring_pos - ring_mean)
            ring_ok = lower_ids < V
            v_new = v_new.at[:, jnp.minimum(lower_ids, V - 1)].set(
                jnp.where(ring_ok[None], ring_new,
                          v_new[:, jnp.minimum(lower_ids, V - 1)]))
            # owner's updated ring positions -> dup copies
            rp = pbwd(ring_new)
            return jnp.where(dup_v[None] & (idx < n_shards - 1),
                             rp[:, dup_rank_v], v_new)

        lam, mu = jnp.float32(0.5), jnp.float32(-0.53)

        def one_iter(v, _):
            v = pass_(v, lam)
            v = pass_(v, mu)
            return v, None

        verts_sm, _ = jax.lax.scan(one_iter, verts3v, None, length=n_iters)

        own_v = g_own[:V]
        own_rank_v = own_rank[:V]
        verts_own = jnp.zeros((3, V), jnp.float32).at[
            :, jnp.where(own_v, own_rank_v, V - 1)].set(
            jnp.where(own_v, verts_sm, 0.0), mode="drop")
        checks = jnp.stack([n_own, n_tris_l, n_up,
                            jnp.sum(g_dup.astype(jnp.int32)),
                            n_groups, mg, n_mid, n_hi])
        return (verts_own[None], faces_global[None], checks[None])

    f = jax.jit(shard_map(
        extract_local, mesh=mesh, in_specs=(spec, P()),
        out_specs=(P(axis_name), P(axis_name), P(axis_name))))
    verts_sh, faces_sh, checks = f(work, cuts_dev)
    checks = np.asarray(checks)  # (S, k): n_own, n_tris, n_up, n_dup, ...
    assert checks[:, 2].max() < BOUND, "boundary bucket overflow"
    if smooth is not None:
        assert checks[:, 2].max() < B_RING, "ring bucket overflow (n_up)"
        assert checks[:, 3].max() < B_RING, "ring bucket overflow (n_dup)"
        assert checks[:, 5].max() <= 16, "vertex degree exceeds MAXD=16"
        if (checks[:, 4].max() > vbucket
                or checks[:, 6].max() >= max(1024, vbucket // 4)
                or checks[:, 7].max() >= max(1024, vbucket // 64)):
            # Euler-bound undersizing (many tiny components, or a degree
            # histogram with a fat >6 tail): widen the vertex bucket one
            # step and redo — one recompile, never a crash.  The bound
            # holds for every clinical mask measured, so this path is
            # cold; three widenings (1.5x) covers even all-noise masks.
            if _vbucket_scale >= 1.5:
                raise AssertionError(
                    f"vertex bucket overflow persists at scale "
                    f"{_vbucket_scale:.2f}: fill {int(checks[:, 4].max())} "
                    f"vs bucket {vbucket}")
            # (mask was normalized to 0/1 above; x255 restores the >=127
            # contract for the retry entry)
            return sharded_mask_to_surface(
                mesh, mask * jnp.uint8(255), spacing, axis_name, smooth,
                return_stats, balance, return_parts,
                _vbucket_scale=_vbucket_scale * 1.15)

    if return_parts:
        # pipelined per-shard export (mesh_io.write_stl_sharded): hand the
        # still-on-device shard outputs + the assembly metadata to the
        # writer so shard s's D2H overlaps shard s-1's pack/write — the
        # 8-chip analog of the single-chip face-table prefetch (rule 21).
        return verts_sh, faces_sh, checks, {
            "max_tris": max_tris, "spacing": spacing,
            "smoothed": smooth is not None}

    # host assembly in shard order = global key order
    T = max_tris
    verts_parts = []
    for s in range(n_shards):
        verts_parts.append(shard_world_verts(
            verts_sh[s], int(checks[s, 0]), spacing, smooth is not None))
    faces_parts = []
    for s in range(n_shards):
        faces_parts.append(shard_wound_faces(
            faces_sh[s], T, int(checks[s, 1])))
    out = (np.concatenate(verts_parts, axis=0),
           np.concatenate(faces_parts, axis=0))
    if return_stats:
        # per-shard (n_own, n_tris, n_up, n_dup, n_groups[, max_group,
        # n_mid, n_hi]) + bucket sizes — sizes the project8 comm/compute
        # model
        return out + ({"checks": checks.tolist(), "max_active": max_active,
                       "max_tris": max_tris, "vbucket": vbucket,
                       "bound": BOUND, "b_ring": B_RING,
                       "cuts": [int(c) for c in cuts],
                       "tri_hist": tri_g.tolist()},)
    return out


def sharded_active_cell_count(mesh: Mesh, axis_name: str = "z"):
    """Marching-cubes active-cell count over a Z-sharded mask volume with a
    1-slice halo (cells straddle shard boundaries; each shard owns the
    cells that START in it)."""
    from jax import shard_map

    def local(vis):
        prev_halo, next_halo = halo_exchange_z(vis, axis_name)
        del prev_halo
        padded = jnp.concatenate([vis, next_halo], axis=0)  # (z+1, Y, X)
        c = padded
        Z1, Y, X = c.shape
        agg_any = jnp.zeros((Z1 - 1, Y - 1, X - 1), jnp.bool_)
        agg_all = jnp.ones((Z1 - 1, Y - 1, X - 1), jnp.bool_)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    corner = c[dz : dz + Z1 - 1, dy : dy + Y - 1, dx : dx + X - 1]
                    agg_any = agg_any | corner
                    agg_all = agg_all & corner
        n = jax.lax.axis_index(axis_name)
        last = jax.lax.axis_size(axis_name) - 1
        active = agg_any & ~agg_all
        # the final shard's trailing halo row is zeros: cells there are
        # partially fictitious only when the mask touches the global border,
        # which mask_to_surface's padding already prevents.
        count = jnp.sum(active.astype(jnp.int32))
        return jax.lax.psum(count, axis_name)[None]

    spec = P(axis_name, None, None)
    return jax.jit(shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=P(axis_name)))
