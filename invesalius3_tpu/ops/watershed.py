"""Marker-based watershed segmentation.

Reference behavior (invesalius/data/watershed_process.py:19-61): the GUI
watershed tool runs either skimage's priority-flood ``watershed`` on a
morphological gradient, or scipy's ``watershed_ift`` directly on the
(window/levelled) image, with int16 markers, inside a subprocess.

TPU design: both reference algorithms compute the *image foresting
transform* with the max-arc path cost — each voxel joins the marker that
reaches it with the smallest "highest intensity along the path" (ties
resolved by flood order).  That cost satisfies a Bellman relaxation:

    cost[v] = min over neighbors u of max(cost[u], f[v])

solved by data-parallel fixpoint iteration: six directional scan sweeps
per round (a ``lax.scan`` along each axis collapses whole monotone runs,
chamfer-style), until no voxel changes.  For 6-connectivity the sweeps
alone are complete (any 6-path is a sequence of axis moves, so iterative
bidirectional sweeping reaches the minimax fixpoint — fast-sweeping);
an explicit neighbor relaxation runs only for 18/26-connectivity, whose
diagonal arcs skip the intermediate voxel's f and are not expressible as
axis-move compositions.  No priority queue, no subprocess — one jitted
program.

Ties in minimax cost are resolved by a secondary hop-distance
(equal-speed flooding on plateaus).  Memory/layout trick: (cost, dist)
pack into ONE int32 rank = cost * 2^15 + min(dist, 2^15-1) — the
lexicographic compare becomes a plain integer compare and the state
arrays halve.  Valid because every reference input is uint16 (or a
uint16 morphological gradient), so cost < 2^16 and the pack fits int32.
scipy/skimage break plateau ties by FIFO queue chronology, which their
own docs call arbitrary; on all strictly-decided voxels — the watershed
criterion itself — this kernel is exact (proven against a Dijkstra
oracle in tests/test_segmentation_ops.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from invesalius3_tpu.ops.morphology import morphological_gradient, shift_nd
from invesalius3_tpu.ops.windowing import get_lut_value

_DIST_BITS = 15
_DIST_MAX = (1 << _DIST_BITS) - 1
_INF_RANK = jnp.int32(2**31 - 1)


def _pack(cost, dist):
    return cost * (1 << _DIST_BITS) + jnp.minimum(dist, _DIST_MAX)


def _relax_rank(parent_rank, f_here):
    """Child candidate rank from a parent rank: cost = max(parent_cost, f),
    dist = parent_dist + 1 (saturating)."""
    pcost = parent_rank >> _DIST_BITS
    pdist = parent_rank & _DIST_MAX
    cand_cost = jnp.maximum(pcost, f_here)
    cand_dist = jnp.minimum(pdist + 1, _DIST_MAX)
    cand = cand_cost * (1 << _DIST_BITS) + cand_dist
    # parents at INF stay INF (guard overflow of the shift arithmetic)
    return jnp.where(parent_rank == _INF_RANK, _INF_RANK, cand)


def _sweep_axis(rank, lab, f, axis: int, reverse: bool):
    """One directional relaxation sweep along ``axis`` via lax.scan
    (scan's native ``reverse`` avoids materializing flipped copies)."""
    r = jnp.moveaxis(rank, axis, 0)
    l = jnp.moveaxis(lab, axis, 0)
    v = jnp.moveaxis(f, axis, 0)

    def step(carry, xs):
        pr, pl = carry
        ri, li, vi = xs
        cand = _relax_rank(pr, vi)
        take = cand < ri
        nr = jnp.where(take, cand, ri)
        nl = jnp.where(take, pl, li)
        return (nr, nl), (nr, nl)

    # derive inits from the inputs (full_like keeps shard_map's varying-axis
    # type; fresh jnp.full constants are unvarying and fail scan typing)
    init = (jnp.full_like(r[0], _INF_RANK), jnp.zeros_like(l[0]))
    _, (nr, nl) = jax.lax.scan(step, init, (r, l, v), reverse=reverse)
    return jnp.moveaxis(nr, 0, axis), jnp.moveaxis(nl, 0, axis)


def _neighbor_relax(rank, lab, f, offsets):
    for off in offsets:
        cand = _relax_rank(shift_nd(rank, off, fill=_INF_RANK), f)
        nl = shift_nd(lab, off, fill=0)
        take = cand < rank
        rank = jnp.where(take, cand, rank)
        lab = jnp.where(take, nl, lab)
    return rank, lab


@partial(jax.jit, static_argnames=("connectivity",))
def watershed_ift(
    image: jax.Array, markers: jax.Array, connectivity: int = 6
) -> jax.Array:
    """Watershed via image-foresting transform with max-arc cost.

    Args:
      image: non-negative integer intensity, values < 2^16 (the reference
        feeds uint16; larger inputs are clipped).
      markers: int labels; >0 are seeds, 0 unknown.  (scipy's negative
        "barrier" markers are honored too: voxels with marker < 0 are
        frozen and keep their negative label.)
    Returns int16 label volume (int32 if markers were int32).
    """
    # clip to 2^16-2 so max rank (cost=65534, dist=32767) stays < INF_RANK
    f = jnp.clip(image.astype(jnp.int32), 0, 2**16 - 2)
    lab_dtype = jnp.int32 if markers.dtype == jnp.int32 else jnp.int16
    lab0 = markers.astype(lab_dtype)
    seeded = lab0 > 0
    barrier = lab0 < 0
    frozen = seeded | barrier
    rank0 = jnp.where(frozen, jnp.int32(0), _INF_RANK)

    if connectivity == 6:
        offs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    else:
        offs = [
            (a, b, c)
            for a in (-1, 0, 1)
            for b in (-1, 0, 1)
            for c in (-1, 0, 1)
            if (a, b, c) != (0, 0, 0)
        ]

    def round_(state):
        rank, lab, _ = state
        pr, pl = rank, lab
        for axis in range(3):
            for reverse in (False, True):
                nr, nl = _sweep_axis(rank, lab, f, axis, reverse)
                take = nr < rank
                rank = jnp.where(take, nr, rank)
                lab = jnp.where(take, nl, lab)
        if connectivity != 6:
            # Diagonal arcs skip the intermediate voxel's f, so they are NOT
            # expressible as axis-move compositions — relax them explicitly.
            # The 6 axis offsets themselves are subsumed transitively by the
            # bidirectional sweeps (any 6-path is a sequence of axis moves;
            # iterative sweeping alone reaches the minimax fixpoint), and
            # that relax was ~60% of the per-round HBM traffic at 512^3.
            rank, lab = _neighbor_relax(rank, lab, f, offs)
        # frozen voxels never change
        rank = jnp.where(frozen, jnp.int32(0), rank)
        lab = jnp.where(frozen, lab0, lab)
        changed = jnp.any(lab != pl) | jnp.any(rank != pr)
        return rank, lab, changed

    rank, lab, _ = jax.lax.while_loop(
        lambda s: s[2], round_, (rank0, lab0, jnp.bool_(True))
    )
    return lab


def watershed(
    image: jax.Array,
    markers: jax.Array,
    algorithm: str = "Watershed",
    mg_size: Tuple[int, int, int] = (3, 3, 3),
    use_ww_wl: bool = False,
    wl: float = 127.5,
    ww: float = 255.0,
    connectivity: int = 6,
    multigrid_levels: int = None,
) -> jax.Array:
    """Full watershed tool semantics (reference watershed_process.py:19-61):

    - algorithm == "Watershed": flood the morphological gradient of the
      (optionally WW/WL-mapped) image — skimage-equivalent basins.
    - otherwise ("Watershed (IFT)"): flood the image itself —
      scipy.watershed_ift-equivalent basins.

    multigrid_levels: None = auto (coarse-to-fine for volumes >= 192^3;
    pure accelerator, same fixpoint).
    """
    if use_ww_wl:
        img = get_lut_value(image, ww, wl).astype(jnp.int32)
    else:
        img = (image - jnp.min(image)).astype(jnp.int32)
    if algorithm == "Watershed":
        img = morphological_gradient(img, mg_size)
    if multigrid_levels is None:
        # 512^3 sweep (levels x inner_rounds, identical labels): 2 levels
        # 2.12 s / 3 levels 2.29 s / 4 levels 2.43 s warm — deeper
        # coarsening adds refine calls without cutting fine-level rounds
        multigrid_levels = 2 if min(image.shape) >= 192 else 0
    if multigrid_levels > 0:
        return watershed_ift_multigrid(img, markers, connectivity,
                                       multigrid_levels)
    return watershed_ift(img, markers, connectivity)


# ---------------------------------------------------------------------------
# Multigrid acceleration
# ---------------------------------------------------------------------------


def _offsets_for(connectivity: int):
    if connectivity == 6:
        return [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    return [
        (a, b, c)
        for a in (-1, 0, 1)
        for b in (-1, 0, 1)
        for c in (-1, 0, 1)
        if (a, b, c) != (0, 0, 0)
    ]


def _use_pallas_sweep() -> bool:
    """Default-on for TPU (INV3_PALLAS_WS=0 disables): the Pallas Z/Y
    sweep pairs keep the whole ray column in VMEM (one HBM read per pass
    vs a lax.scan carry round-tripping HBM every step) and handle int16
    labels natively, so no cast overhead remains."""
    import os

    return (jax.default_backend() == "tpu"
            and os.environ.get("INV3_PALLAS_WS", "1") != "0")


def _one_round(rank, lab, f, lab0, frozen, connectivity: int):
    if _use_pallas_sweep():
        from invesalius3_tpu.ops import pallas_kernels as pk

        rank, lab = pk.watershed_sweep_z(rank, lab, f)
        rank, lab = pk.watershed_sweep_y(rank, lab, f)
        rank, lab = _sweep_x_pallas(rank, lab, f)
        axes = ()
    else:
        axes = (0, 1, 2)
    for axis in axes:
        for reverse in (False, True):
            nr, nl = _sweep_axis(rank, lab, f, axis, reverse)
            take = nr < rank
            rank = jnp.where(take, nr, rank)
            lab = jnp.where(take, nl, lab)
    if connectivity != 6:
        # axis offsets are subsumed by the sweeps (see watershed_ift.round_);
        # only diagonal arcs need the explicit relax
        rank, lab = _neighbor_relax(rank, lab, f, _offsets_for(connectivity))
    rank = jnp.where(frozen, jnp.int32(0), rank)
    lab = jnp.where(frozen, lab0, lab)
    return rank, lab


def _sweep_x_pallas(rank, lab, f):
    """X sweep on the Pallas path: swap the trailing axes and reuse the Y
    kernel.  A native axis-2 kernel (in-VMEM transposed scratch, probe 10)
    measured correct in interpret mode but FAULTED the TPU worker at run
    time (in-kernel 3-D swapaxes on (8, 128, X) i32 VMEM values); the
    four HBM transposes here are the reliable formulation."""
    from invesalius3_tpu.ops import pallas_kernels as pk

    rt, lt = pk.watershed_sweep_y(
        jnp.swapaxes(rank, 1, 2), jnp.swapaxes(lab, 1, 2),
        jnp.swapaxes(f, 1, 2))
    return jnp.swapaxes(rt, 1, 2), jnp.swapaxes(lt, 1, 2)


def _one_round_padded(rank_p, lab_p, f_p, connectivity: int):
    """One relaxation round on ghost-padded local arrays (first/last Z
    plane = neighbor shard's boundary, exchanged by the sharded driver in
    parallel/sharded_ops.py).  Ghost planes participate as scan carries /
    relax parents only; the caller slices them off, so their own updated
    values are never observed."""
    rank, lab = rank_p, lab_p
    if _use_pallas_sweep():
        from invesalius3_tpu.ops import pallas_kernels as pk

        rank, lab = pk.watershed_sweep_z(rank, lab, f_p)
        rank, lab = pk.watershed_sweep_y(rank, lab, f_p)
        rank, lab = _sweep_x_pallas(rank, lab, f_p)
        axes = ()
    else:
        axes = (0, 1, 2)
    for axis in axes:
        for reverse in (False, True):
            nr, nl = _sweep_axis(rank, lab, f_p, axis, reverse)
            take = nr < rank
            rank = jnp.where(take, nr, rank)
            lab = jnp.where(take, nl, lab)
    if connectivity != 6:
        rank, lab = _neighbor_relax(rank, lab, f_p, _offsets_for(connectivity))
    return rank, lab


@partial(jax.jit, static_argnames=("connectivity", "inner_rounds"),
         donate_argnums=(0, 1))
def _refine_round(rank, lab, f, lab0, frozen, connectivity: int = 6,
                  inner_rounds: int = 1):
    """``inner_rounds`` relaxation rounds (6 sweeps + neighbor relax each)
    with rank/lab buffers donated — keeps the 512^3 peak memory down vs a
    fused while_loop holding every sweep's intermediates live.  Batching
    rounds per jit call amortizes the per-dispatch relay sync (~26 ms on
    the tunneled chip).  On TPU the Z and Y fwd+bwd pairs run as Pallas
    VMEM-column kernels (bit-exact, int16-label native)."""
    labels_changed = jnp.bool_(False)
    for _ in range(inner_rounds):
        prev = lab
        rank, lab = _one_round(rank, lab, f, lab0, frozen, connectivity)
        labels_changed = labels_changed | jnp.any(lab != prev)
    return rank, lab, labels_changed


# diagnostic: per-_watershed_refine round counts of the last watershed call
# (coarse -> fine).  Consumed by tools/project8.py's v5e-8 comm/compute
# model; cleared by each watershed_ift_multigrid entry.
LAST_REFINE_ROUNDS: list = []


def _watershed_refine(f, lab0, rank_init, lab_init, connectivity: int = 6,
                      max_rounds: int = 1000, quiet_rounds: int = 2,
                      inner_rounds: int = 2):
    """Fine-level relaxation from a valid upper-bound init (Bellman
    relaxation converges to the true minimax solution from ANY upper-bound
    initialization).  Host-level round loop with donated buffers.

    Termination: ``quiet_rounds`` consecutive rounds without a LABEL
    change.  The basin assignment (what the watershed criterion defines)
    stabilizes long before the secondary hop-distance field reaches its
    exact fixpoint — running ranks to full convergence only polishes tie
    distances nobody observes, at ~10x the rounds on noisy plateaus.
    Criterion-exactness on strictly-decided voxels is re-verified by the
    oracle tests under this stopping rule."""
    seeded = lab0 > 0
    barrier = lab0 < 0
    frozen = seeded | barrier
    rank = jnp.where(frozen, jnp.int32(0), rank_init)
    lab = jnp.where(frozen, lab0, lab_init)
    quiet = 0
    # ``inner_rounds`` rounds run per host convergence check; a quiet batch
    # of k rounds == k consecutive quiet rounds, so the stopping rule is
    # unchanged while the per-dispatch relay sync amortizes k-fold.
    quiet_batches = max(1, -(-quiet_rounds // inner_rounds))
    n_rounds = 0
    # Pipelined convergence check: the host reads batch i's changed-flag
    # only after dispatching batch i+1, so the ~26 ms relay round-trip per
    # flag read overlaps device work instead of serializing with it (the
    # flag read was a round-sized fraction of the stage once the sweeps
    # got cheap).  Cost: one extra dispatched batch after quiescence —
    # harmless, relaxation is monotone past the fixpoint.
    pending = None
    for _ in range(0, max_rounds, inner_rounds):
        rank, lab, labels_changed = _refine_round(rank, lab, f, lab0, frozen,
                                                  connectivity, inner_rounds)
        n_rounds += inner_rounds
        prev, pending = pending, labels_changed
        if prev is None:
            continue
        if bool(prev):
            quiet = 0
        else:
            quiet += 1
            if quiet >= quiet_batches:
                break
    LAST_REFINE_ROUNDS.append((tuple(int(s) for s in f.shape), n_rounds))
    return rank, lab


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -(2**31), jax.lax.max, (2, 2, 2), (2, 2, 2), padding="SAME")


def watershed_ift_multigrid(
    image: jax.Array, markers: jax.Array, connectivity: int = 6,
    levels: int = 2,
) -> jax.Array:
    """Coarse-to-fine watershed: solve on max-pooled f, upsample the rank
    field as a *valid upper bound* (a coarse path's max-arc over max-pooled
    cells dominates the best fine path through the same corridor, and every
    voxel in a cell sits under the cell's pooled value), then refine.

    The packed rank makes the init strictly improvable wherever a real
    path exists (init carries dist = DIST_MAX; any true path has smaller
    hop count), so fine labels always converge to the exact watershed_ift
    fixpoint — the multigrid is a pure accelerator, not an approximation.
    Volumes must have even dims per level (pad first if needed).
    """
    LAST_REFINE_ROUNDS.clear()
    f = jnp.clip(image.astype(jnp.int32), 0, 2**16 - 2)
    out_dtype = jnp.int32 if markers.dtype == jnp.int32 else jnp.int16
    # labels are int32 through the refine loop: the Pallas Y-sweep's
    # per-step middle-axis slices are not int16-tileable on hardware
    lab0 = markers.astype(jnp.int32)

    def solve(f_lvl, lab_lvl, level):
        if level == 0 or min(f_lvl.shape) <= 32:
            rank_init = jnp.full(f_lvl.shape, _INF_RANK, jnp.int32)
            rank, lab = _watershed_refine(f_lvl, lab_lvl, rank_init, lab_lvl,
                                          connectivity)
            return rank, lab
        f_c = _maxpool2(f_lvl)
        # coarse seeds: max label in each cell (collisions pick the larger
        # label; exact fine labels are re-derived during refinement)
        lab_c = jax.lax.reduce_window(
            lab_lvl, jnp.array(-(2**15), lab_lvl.dtype), jax.lax.max,
            (2, 2, 2), (2, 2, 2), padding="SAME")
        rank_c, lab_sol_c = solve(f_c, lab_c, level - 1)
        # upsample: every fine voxel inherits its cell's (upper-bound) rank
        # with dist saturated, and the coarse label as a hint.
        # VALIDITY FIX: a coarse SEED cell has rank 0, but only the one
        # marker voxel inside it truly costs 0 — its 7 siblings' true cost
        # can be anything up to the cell's pooled f.  An init below the
        # true rank is unrecoverable (relaxation only decreases) and seeds
        # a false-low equilibrium that blocks correct labels from
        # propagating through.  max(coarse cost, pooled f) is a valid
        # upper bound for every voxel of the cell: non-seed cells already
        # satisfy cost_c >= f_c (the relax includes the cell's own f);
        # seed cells get the in-cell path bound f_c.
        up = lambda a: jnp.repeat(jnp.repeat(jnp.repeat(
            a, 2, axis=0), 2, axis=1), 2, axis=2)[
            : f_lvl.shape[0], : f_lvl.shape[1], : f_lvl.shape[2]]
        cost_up = up(jnp.maximum(rank_c >> _DIST_BITS, f_c))
        rank_init = jnp.where(
            cost_up >= (_INF_RANK >> _DIST_BITS),
            _INF_RANK,
            cost_up * (1 << _DIST_BITS) + _DIST_MAX,
        )
        lab_init = up(lab_sol_c)
        return _watershed_refine(f_lvl, lab_lvl, rank_init, lab_init, connectivity)

    _, lab = solve(f, lab0, levels)
    return lab.astype(out_dtype)
