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

which we solve by data-parallel fixpoint iteration: six directional
scan sweeps per round (a ``lax.scan`` along each axis collapses whole
monotone runs per round, chamfer-style) plus a neighbor relaxation, until
no voxel changes.  Labels ride along with costs.  No priority queue, no
subprocess — one jitted program.

Ties in minimax cost (voxels beyond the ridge reachable from several
markers at ridge height) are resolved by a secondary hop-distance cost —
lexicographic (max-arc, path length), i.e. equal-speed flooding on
plateaus.  scipy/skimage break these same ties by FIFO queue chronology,
which is implementation-defined (their docs call plateau assignment
arbitrary); on all strictly-decided voxels — the watershed criterion
itself — this kernel is exact (tests/test_segmentation_ops.py proves
100% agreement against a Dijkstra oracle).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from invesalius3_tpu.ops.morphology import morphological_gradient, shift_nd
from invesalius3_tpu.ops.windowing import get_lut_value

_INF = jnp.int32(2**30)


def _lex_less(c_a, d_a, c_b, d_b):
    """(c_a, d_a) < (c_b, d_b) lexicographically."""
    return (c_a < c_b) | ((c_a == c_b) & (d_a < d_b))


def _sweep_axis(cost, dist, lab, f, axis: int, reverse: bool):
    """One directional relaxation sweep along ``axis`` via lax.scan:
    (cost, dist)[i] <- lexmin((cost, dist)[i], (max(cost[i-1], f[i]),
    dist[i-1] + 1))."""
    c = jnp.moveaxis(cost, axis, 0)
    d = jnp.moveaxis(dist, axis, 0)
    l = jnp.moveaxis(lab, axis, 0)
    v = jnp.moveaxis(f, axis, 0)
    if reverse:
        c, d, l, v = c[::-1], d[::-1], l[::-1], v[::-1]

    def step(carry, xs):
        pc, pd, pl = carry
        ci, di, li, vi = xs
        cand_c = jnp.maximum(pc, vi)
        cand_d = pd + 1
        take = _lex_less(cand_c, cand_d, ci, di)
        nc = jnp.where(take, cand_c, ci)
        nd = jnp.where(take, cand_d, di)
        nl = jnp.where(take, pl, li)
        return (nc, nd, nl), (nc, nd, nl)

    init = (
        jnp.full(c.shape[1:], _INF, c.dtype),
        jnp.zeros(d.shape[1:], d.dtype),
        jnp.zeros(l.shape[1:], l.dtype),
    )
    _, (nc, nd, nl) = jax.lax.scan(step, init, (c, d, l, v))
    if reverse:
        nc, nd, nl = nc[::-1], nd[::-1], nl[::-1]
    return (
        jnp.moveaxis(nc, 0, axis),
        jnp.moveaxis(nd, 0, axis),
        jnp.moveaxis(nl, 0, axis),
    )


def _neighbor_relax(cost, dist, lab, f, offsets):
    for off in offsets:
        nc = jnp.maximum(shift_nd(cost, off, fill=_INF), f)
        nd = shift_nd(dist, off, fill=_INF) + 1
        nl = shift_nd(lab, off, fill=0)
        take = _lex_less(nc, nd, cost, dist)
        cost = jnp.where(take, nc, cost)
        dist = jnp.where(take, nd, dist)
        lab = jnp.where(take, nl, lab)
    return cost, dist, lab


@partial(jax.jit, static_argnames=("connectivity",))
def watershed_ift(
    image: jax.Array, markers: jax.Array, connectivity: int = 6
) -> jax.Array:
    """Watershed via image-foresting transform with max-arc cost.

    Args:
      image: non-negative integer intensity (the reference feeds uint16).
      markers: int labels; >0 are seeds, 0 unknown.  (scipy's negative
        "barrier" markers are honored too: voxels with marker < 0 are
        frozen and keep their negative label.)
    Returns int32 label volume.
    """
    f = image.astype(jnp.int32)
    lab0 = markers.astype(jnp.int32)
    seeded = lab0 > 0
    barrier = lab0 < 0
    cost0 = jnp.where(seeded | barrier, jnp.int32(0), _INF)
    dist0 = jnp.where(seeded | barrier, jnp.int32(0), _INF)

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
        cost, dist, lab, _ = state
        pc, pd, pl = cost, dist, lab
        for axis in range(3):
            for reverse in (False, True):
                nc, nd, nl = _sweep_axis(cost, dist, lab, f, axis, reverse)
                take = _lex_less(nc, nd, cost, dist)
                cost = jnp.where(take, nc, cost)
                dist = jnp.where(take, nd, dist)
                lab = jnp.where(take, nl, lab)
        cost, dist, lab = _neighbor_relax(cost, dist, lab, f, offs)
        # frozen voxels never change
        cost = jnp.where(seeded | barrier, jnp.int32(0), cost)
        dist = jnp.where(seeded | barrier, jnp.int32(0), dist)
        lab = jnp.where(seeded | barrier, lab0, lab)
        changed = jnp.any(lab != pl) | jnp.any(cost != pc) | jnp.any(dist != pd)
        return cost, dist, lab, changed

    cost, dist, lab, _ = jax.lax.while_loop(
        lambda s: s[3], round_, (cost0, dist0, lab0, jnp.bool_(True))
    )
    return lab


@partial(jax.jit, static_argnames=("connectivity", "mg_size", "algorithm", "use_ww_wl"))
def watershed(
    image: jax.Array,
    markers: jax.Array,
    algorithm: str = "Watershed",
    mg_size: Tuple[int, int, int] = (3, 3, 3),
    use_ww_wl: bool = False,
    wl: float = 127.5,
    ww: float = 255.0,
    connectivity: int = 6,
) -> jax.Array:
    """Full watershed tool semantics (reference watershed_process.py:19-61):

    - algorithm == "Watershed": flood the morphological gradient of the
      (optionally WW/WL-mapped) image — skimage-equivalent basins.
    - otherwise ("Watershed (IFT)"): flood the image itself —
      scipy.watershed_ift-equivalent basins.
    """
    if use_ww_wl:
        img = get_lut_value(image, ww, wl).astype(jnp.int32)
    else:
        img = (image - jnp.min(image)).astype(jnp.int32)
    if algorithm == "Watershed":
        img = morphological_gradient(img, mg_size)
    return watershed_ift(img, markers, connectivity)
