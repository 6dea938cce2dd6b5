"""Floodfill / connected components / watershed / morphology kernels vs.
scipy and reference-semantics oracles."""

import numpy as np
import pytest
from scipy import ndimage

from invesalius3_tpu.ops import connected, floodfill, morphology, watershed
from tests.oracles import oracle_floodfill_threshold, oracle_watershed_minimax

def rng_():
    return np.random.default_rng(3)


def test_generate_binary_structure_matches_scipy():
    for rank in (2, 3):
        for conn in range(1, rank + 1):
            got = morphology.generate_binary_structure(rank, conn)
            want = ndimage.generate_binary_structure(rank, conn)
            np.testing.assert_array_equal(got, want)


def test_binary_dilation_erosion_match_scipy():
    x = rng_().random((10, 12, 14)) > 0.7
    for conn in (6, 26):
        st = morphology.structure_3d(conn)
        np.testing.assert_array_equal(
            np.asarray(morphology.binary_dilation(x, st)),
            ndimage.binary_dilation(x, st),
        )
        np.testing.assert_array_equal(
            np.asarray(morphology.binary_erosion(x, st)),
            ndimage.binary_erosion(x, st, border_value=0),
        )


def test_grey_morphology_matches_scipy():
    x = rng_().integers(0, 1000, (8, 16, 16)).astype(np.int32)
    got = np.asarray(morphology.morphological_gradient(x, (3, 3, 3)))
    want = ndimage.morphological_gradient(x, size=(3, 3, 3))
    np.testing.assert_array_equal(got, want)


def test_floodfill_threshold_matches_reference_bfs():
    data = rng_().integers(0, 100, (12, 12, 12)).astype(np.int16)
    strct = morphology.structure_3d(6).astype(np.uint8)
    seeds_xyz = [(6, 6, 6)]
    want = np.zeros(data.shape, np.uint8)
    oracle_floodfill_threshold(data, seeds_xyz, 30, 80, 1, strct, want)
    seeds = floodfill.seeds_to_mask(data.shape, [(6, 6, 6)])  # z,y,x == symmetric here
    got = np.asarray(floodfill.floodfill_threshold(data, seeds, 30, 80)).astype(np.uint8)
    np.testing.assert_array_equal(got, want.astype(bool).astype(np.uint8))


def test_floodfill_value_two_regions():
    data = np.zeros((5, 5, 5), np.uint8)
    data[0, 0, 0] = data[0, 0, 1] = 7
    data[4, 4, 4] = 7  # same value, not connected
    seeds = floodfill.seeds_to_mask(data.shape, [(0, 0, 0)])
    got = np.asarray(floodfill.floodfill_value(data, seeds, 7))
    assert got[0, 0, 0] and got[0, 0, 1] and not got[4, 4, 4]
    assert got.sum() == 2


def test_floodfill_auto_threshold_matches_reference():
    # dynamic window: neighbor joins iff within +-p of the SOURCE voxel value
    data = np.array(
        [[[100, 105, 111, 160, 100]]], np.int16
    )  # 1x1x5 lane
    seeds = floodfill.seeds_to_mask(data.shape, [(0, 0, 0)])
    got = np.asarray(floodfill.floodfill_auto_threshold(data, seeds, 0.1))
    # 100 -> 105 (within [90,110]), 105 -> 111 (within [95,115]), 111 -> 160? no
    np.testing.assert_array_equal(got[0, 0], [True, True, True, False, False])


def test_label_matches_scipy():
    mask = rng_().random((10, 11, 12)) > 0.6
    for conn, s_conn in ((6, 1), (26, 3)):
        got, n_got = connected.count_regions(mask, conn)
        want, n_want = ndimage.label(mask, ndimage.generate_binary_structure(3, s_conn))
        assert n_got == n_want
        # same partition: bijection between label ids
        pairs = set(zip(got.ravel().tolist(), want.ravel().tolist()))
        assert len(pairs) == n_want + 1  # one pair per region + background


def test_largest_component():
    mask = np.zeros((6, 6, 6), bool)
    mask[0, 0, :4] = True  # size 4
    mask[3:5, 3:5, 3:5] = True  # size 8
    got = np.asarray(connected.largest_component(mask))
    assert got.sum() == 8
    assert got[4, 4, 4] and not got[0, 0, 0]


def test_largest_component_empty_mask():
    mask = np.zeros((4, 4, 4), bool)
    got = np.asarray(connected.largest_component(mask))
    assert got.sum() == 0


def test_fill_holes_automatically():
    # visible mask shell with an internal hole of size 1 and the big outside
    mask = np.zeros((7, 7, 7), np.uint8)
    mask[1:6, 1:6, 1:6] = 255
    mask[3, 3, 3] = 0  # hole
    got = np.asarray(connected.fill_holes_automatically(mask, max_size=10))
    assert got[3, 3, 3] == 254  # hole filled with the manual-edit code
    assert got[0, 0, 0] == 0  # outside (big) untouched
    assert (got[1:6, 1:6, 1:6][np.asarray(got[1:6, 1:6, 1:6]) == 255].size) > 0


def _minimax_cost(image, seed_mask):
    """Dijkstra max-arc cost from a seed set (for tie detection)."""
    import heapq

    cost = np.full(image.shape, np.iinfo(np.int64).max, np.int64)
    heap = []
    for idx in np.argwhere(seed_mask):
        cost[tuple(idx)] = 0
        heapq.heappush(heap, (0, *idx))
    while heap:
        c, z, y, x = heapq.heappop(heap)
        if c > cost[z, y, x]:
            continue
        for dz, dy, dx in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
            nz, ny, nx = z + dz, y + dy, x + dx
            if 0 <= nz < image.shape[0] and 0 <= ny < image.shape[1] and 0 <= nx < image.shape[2]:
                nc = max(c, int(image[nz, ny, nx]))
                if nc < cost[nz, ny, nx]:
                    cost[nz, ny, nx] = nc
                    heapq.heappush(heap, (nc, nz, ny, nx))
    return cost


def test_watershed_ift_two_seeds_gradient():
    # ramp valley: two basins split at the ridge
    x = np.abs(np.arange(20) - 10).astype(np.int32)
    image = np.tile(x, (4, 4, 1))
    markers = np.zeros(image.shape, np.int16)
    markers[:, :, 0] = 1
    markers[:, :, 19] = 2
    got = np.asarray(watershed.watershed_ift(image, markers))
    want = oracle_watershed_minimax(image, markers)
    # voxels where both seeds tie in minimax cost are resolved by flood
    # order in the oracle and by sweep order on TPU (documented) — compare
    # only the strictly-decided voxels.
    c1 = _minimax_cost(image, markers == 1)
    c2 = _minimax_cost(image, markers == 2)
    decided = c1 != c2
    assert decided.mean() > 0.9
    np.testing.assert_array_equal(got[decided], want[decided])


def test_watershed_criterion_exact_on_noise_images():
    """The kernel matches the watershed criterion (argmin of per-seed
    minimax cost) exactly on every strictly-decided voxel, across random
    smooth images.  (scipy.watershed_ift itself violates the criterion on
    some of these images — verified separately — so the Dijkstra oracle is
    the golden truth, not scipy.)"""
    for seed in (0, 3):
        r = np.random.default_rng(seed)
        img = r.integers(0, 200, (8, 16, 16)).astype(np.uint16)
        img = ndimage.gaussian_filter(img.astype(float), 2.0)
        img = (img * 50).astype(np.uint16)
        markers = np.zeros(img.shape, np.int16)
        markers[2, 3, 3] = 1
        markers[5, 12, 12] = 2
        got = np.asarray(watershed.watershed_ift(img, markers))
        c1 = _minimax_cost(img, markers == 1)
        c2 = _minimax_cost(img, markers == 2)
        decided = c1 != c2
        argmin = np.where(c1 < c2, 1, 2)
        np.testing.assert_array_equal(got[decided], argmin[decided])


def test_watershed_two_blobs_criterion_exact():
    """On a two-object gradient image the kernel matches the watershed
    criterion (argmin of per-seed minimax cost) exactly on every decided
    voxel and splits the valley at the midplane.  (scipy.watershed_ift
    itself violates the criterion near borders on this image, so the
    Dijkstra oracle — not scipy — is the golden truth here.)"""
    zz, yy, xx = np.mgrid[:12, :24, :12].astype(float)
    blob1 = np.exp(-((zz - 6) ** 2 + (yy - 6) ** 2 + (xx - 6) ** 2) / 18.0)
    blob2 = np.exp(-((zz - 6) ** 2 + (yy - 17) ** 2 + (xx - 6) ** 2) / 18.0)
    img = (1000 * (1.0 - np.maximum(blob1, blob2))).astype(np.uint16)
    markers = np.zeros(img.shape, np.int16)
    markers[6, 6, 6] = 1
    markers[6, 17, 6] = 2
    got = np.asarray(watershed.watershed_ift(img, markers))
    c1 = _minimax_cost(img, markers == 1)
    c2 = _minimax_cost(img, markers == 2)
    decided = c1 != c2
    argmin = np.where(c1 < c2, 1, 2)
    np.testing.assert_array_equal(got[decided], argmin[decided])
    # the basin boundary falls at the valley midplane
    assert (got[6, :12, 6] == 1).all() and (got[6, 12:, 6] == 2).all()


def test_watershed_sweeps_alone_reach_the_cost_fixpoint():
    """For 6-connectivity the six bidirectional sweeps are a complete
    relaxation basis (any 6-path is a sequence of axis moves), so the
    explicit neighbor relax was dropped from the production rounds.  Pin
    the claim: the quiescent COST field (rank >> 15 — the watershed
    criterion) of the sweep-only rounds is bitwise identical to rounds
    that also run the explicit 6-neighbor relax, on noise volumes where
    every plateau shape occurs.  (Labels on equal-cost ties and the
    hop-distance tie-break remain schedule-dependent — documented — so
    only the cost field is compared.)"""
    import jax
    import jax.numpy as jnp

    def fixpoint(image, markers, with_relax):
        f = jnp.clip(jnp.asarray(image).astype(jnp.int32), 0, 2**16 - 2)
        lab0 = jnp.asarray(markers).astype(jnp.int16)
        frozen = (lab0 > 0) | (lab0 < 0)
        rank0 = jnp.where(frozen, jnp.int32(0), watershed._INF_RANK)
        offs = watershed._offsets_for(6)

        def round_(state):
            rank, lab, _ = state
            pr = rank
            for axis in range(3):
                for reverse in (False, True):
                    nr, nl = watershed._sweep_axis(rank, lab, f, axis, reverse)
                    take = nr < rank
                    rank = jnp.where(take, nr, rank)
                    lab = jnp.where(take, nl, lab)
            if with_relax:
                rank, lab = watershed._neighbor_relax(rank, lab, f, offs)
            rank = jnp.where(frozen, jnp.int32(0), rank)
            lab = jnp.where(frozen, lab0, lab)
            return rank, lab, jnp.any(rank != pr)

        rank, _, _ = jax.lax.while_loop(
            lambda s: s[2], round_, (rank0, lab0, jnp.bool_(True)))
        return np.asarray(rank) >> 15

    r = np.random.default_rng(7)
    for shape in ((12, 14, 10), (16, 16, 16)):
        img = r.integers(0, 60, shape).astype(np.int32)
        markers = np.zeros(shape, np.int16)
        for i in range(4):
            markers[tuple(r.integers(0, s) for s in shape)] = i + 1
        np.testing.assert_array_equal(
            fixpoint(img, markers, False), fixpoint(img, markers, True))


def test_watershed_scipy_oracle_ct_phantom():
    """Reference-oracle agreement on a realistic CT phantom (VERDICT r3 #8):
    single-device watershed vs ``scipy.ndimage.watershed_ift`` — the exact
    solver the reference runs (watershed_process.py:19) — on a two-tissue
    noisy CT, asserting voxel-identical labels on every off-plateau voxel
    and bounding the plateau (tie) fraction.  Ties are schedule-dependent
    in every IFT solver (scipy's flood order vs our sweep order), so only
    strictly-decided voxels are comparable."""
    r = np.random.default_rng(7)
    zz, yy, xx = np.mgrid[:24, :48, :48].astype(np.float32)
    rad = np.sqrt((zz - 12) ** 2 + (yy - 24) ** 2 + (xx - 24) ** 2)
    ct = np.full((24, 48, 48), -1000.0, np.float32)      # air
    ct[rad < 20] = 40.0                                   # soft tissue
    ct[(rad >= 16) & (rad < 20)] = 1200.0                 # bone shell
    ct += r.normal(0.0, 12.0, ct.shape)                   # acquisition noise
    # the reference segments on the gaussian-smoothed gradient magnitude
    # (watershed_process.py do_watershed: gaussian_filter -> morphological
    # gradient as the relief)
    relief = ndimage.morphological_gradient(
        ndimage.gaussian_filter(ct, 1.0), size=3)
    relief = np.clip(relief, 0, 65535).astype(np.uint16)
    markers = np.zeros(ct.shape, np.int16)
    markers[12, 24, 24] = 1        # inside soft tissue
    markers[12, 2, 2] = 2          # air background
    got = np.asarray(watershed.watershed_ift(relief, markers))
    want = ndimage.watershed_ift(relief, markers.astype(np.int32))
    c1 = _minimax_cost(relief, markers == 1)
    c2 = _minimax_cost(relief, markers == 2)
    decided = c1 != c2
    plateau_frac = 1.0 - decided.mean()
    # measured on this phantom: 11.5% of voxels tie — the divide is the
    # whole gradient band of the bone shell, where both basins' minimax
    # cost equals the ridge peak (scaling the relief x8 before the uint16
    # cast leaves this unchanged, so it is geometry, not quantization).
    # Bound it so phantom drift gets caught.
    assert plateau_frac < 0.15, plateau_frac
    # scipy may violate the minimax criterion near borders (documented
    # above); restrict the identity check to voxels where scipy itself is
    # criterion-consistent, and separately require our kernel to be exact
    argmin = np.where(c1 < c2, 1, 2)
    np.testing.assert_array_equal(got[decided], argmin[decided])
    scipy_ok = want[decided] == argmin[decided]
    agree = (got[decided] == want[decided]).mean()
    # measured: scipy is criterion-consistent on 96.95% of decided voxels
    # (its IFT propagates along first-found paths and mislabels ~3% near
    # the divide — the violation the docstrings above document); wherever
    # scipy IS criterion-consistent we are voxel-identical to it.
    assert scipy_ok.mean() > 0.95
    assert agree > 0.95, agree
    np.testing.assert_array_equal(
        got[decided][scipy_ok], want[decided][scipy_ok])


def test_brush_paint_sphere():
    mask = np.zeros((16, 16, 16), np.uint8)
    brush = morphology.brush_element(3.0, (1.0, 1.0, 1.0), "circle", dims=3)
    import jax.numpy as jnp

    out = np.asarray(morphology.paint_brush(jnp.asarray(mask), brush, (8, 8, 8), 254))
    assert out[8, 8, 8] == 254
    assert out[8, 8, 11] == 254  # radius 3 inclusive
    assert out[8, 8, 12] == 0
    # border clipping: stamp at corner does not wrap or crash
    out2 = np.asarray(morphology.paint_brush(jnp.asarray(mask), brush, (0, 0, 0), 254))
    assert out2[0, 0, 0] == 254 and out2.sum() < out.sum()


def test_brush_trajectory_border_stamp_stays_at_border():
    """Regression: dynamic_slice wraps NEGATIVE starts to the far edge
    (python-style indexing), which teleported border stamps to the
    opposite corner before the maximum(start, 0) guard."""
    import jax.numpy as jnp

    mask = np.zeros((16, 16, 16), np.uint8)
    brush = morphology.brush_element(2.0, (1.0, 1.0, 1.0), "circle", dims=3)
    out = np.asarray(morphology.paint_brush_trajectory(
        jnp.asarray(mask), jnp.asarray(brush),
        jnp.asarray(np.array([(1, 1, 1)], np.int32)), 254,
        tuple(brush.shape)))
    zz, yy, xx = np.nonzero(out)
    assert zz.max() <= 4 and yy.max() <= 4 and xx.max() <= 4
    assert out[1, 1, 1] == 254


def _oracle_threshold_stamp(mask, image, brush, center, tmin, tmax, op):
    """Reference slice_.py:722-736 editor semantics for one stamp, with
    dynamic_slice start-clamping (the jitted path's border behavior)."""
    start = [min(max(c - s // 2, 0), m - s)
             for c, s, m in zip(center, brush.shape, mask.shape)]
    sl = tuple(slice(st, st + s) for st, s in zip(start, brush.shape))
    roi_m, roi_i, idx = mask[sl], image[sl], brush
    inside = (roi_i >= tmin) & (roi_i <= tmax)
    if op == "thresh":
        roi_m[idx] = inside[idx] * 253 + 1
    elif op == "thresh_erase":
        roi_m[idx] = (~inside[idx]) * 253 + 1
    elif op == "thresh_add":
        roi_m[idx & inside] = 254
    elif op == "thresh_erase_only":
        roi_m[idx & ~inside] = 1


@pytest.mark.parametrize(
    "op", ["thresh", "thresh_erase", "thresh_add", "thresh_erase_only"])
def test_brush_threshold_ops_match_reference(op):
    """The threshold-gated editor ops (reference styles.py:1361 BRUSH_THRESH*
    + slice_.py:722) vs a numpy oracle, incl. a border-clamped stamp."""
    import jax.numpy as jnp

    rng = rng_()
    image = rng.integers(-500, 1500, (16, 16, 16)).astype(np.int16)
    mask0 = (rng.random((16, 16, 16)) < 0.3).astype(np.uint8) * 255
    brush = morphology.brush_element(2.0, (1.0, 1.0, 1.0), "circle", dims=3)
    centers = [(8, 8, 8), (1, 1, 14)]  # interior + border-clamped
    tmin, tmax = 100, 900

    want = mask0.copy()
    for c in centers:
        _oracle_threshold_stamp(want, image, brush, c, tmin, tmax, op)

    got = np.asarray(morphology.paint_brush_trajectory_threshold(
        jnp.asarray(mask0), jnp.asarray(image), jnp.asarray(brush),
        jnp.asarray(np.array(centers, np.int32)), tmin, tmax,
        tuple(brush.shape), op))
    np.testing.assert_array_equal(got, want)
    assert (got != mask0).any()  # the op actually edited something


def test_region_grow_dynamic_and_confidence_run():
    data = rng_().integers(0, 200, (8, 16, 16)).astype(np.int16)
    data[4, 8, 8] = 100
    out = np.asarray(floodfill.region_grow_dynamic(data, (4, 8, 8), 25, 25))
    assert out[4, 8, 8]
    out2 = np.asarray(floodfill.region_grow_confidence(data, (4, 8, 8)))
    assert out2[4, 8, 8]
