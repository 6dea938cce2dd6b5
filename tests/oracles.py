"""Pure-numpy oracle implementations of the reference's kernel semantics.

Each oracle is a literal transliteration of the scalar algorithm described
by the reference (file:line cited per function) used as golden truth for
the TPU kernels.  They are deliberately slow and simple.
"""

from __future__ import annotations

import numpy as np


def oracle_lut_value(data, window, level):
    """Reference imagedata_utils.py:556-566 get_LUT_value."""
    data = np.asarray(data, dtype=np.float64)
    lo = level - 0.5 - (window - 1) / 2
    hi = level - 0.5 + (window - 1) / 2
    ramp = ((data - (level - 0.5)) / (window - 1) + 0.5) * window
    return np.where(data <= lo, 0.0, np.where(data > hi, window, ramp))


def oracle_threshold_slice(image, mask, tmin, tmax):
    """Reference slice_.py:1722-1738 do_threshold_to_a_slice."""
    m = ((image >= tmin) & (image <= tmax)) * 255
    m = m.astype(np.int64)
    for code in (1, 2, 253, 254):
        m[mask == code] = code
    return m.astype(np.uint8)


def oracle_lmip(image, axis, tmin, tmax):
    """Reference mips.rs:7-86 lmip (scalar loop)."""
    image = np.asarray(image)
    lanes = np.moveaxis(image, axis, 0)
    n = lanes.shape[0]
    out_shape = lanes.shape[1:]
    out = np.zeros(out_shape, dtype=image.dtype)
    for idx in np.ndindex(*out_shape):
        lane = lanes[(slice(None),) + idx]
        max_val = lane[0]
        start = (max_val >= tmin) and (max_val <= tmax)
        for z in range(n):
            val = lane[z]
            if val > max_val:
                max_val = val
            elif val < max_val and start:
                break
            if tmin <= val <= tmax:
                start = True
        out[idx] = max_val
    return out


def _opacity(vl, wl, ww):
    mn = wl - ww / 2.0
    mx = wl + ww / 2.0
    if vl < mn:
        return 0.0
    if vl > mx:
        return 1.0
    return (vl - mn) / (mx - mn)


def oracle_mida(image, axis, wl, ww):
    """Reference mips.rs:102-168 mida_internal (scalar loop)."""
    image = np.asarray(image)
    img_min = float(image.min())
    img_max = float(image.max())
    rng = img_max - img_min
    lanes = np.moveaxis(image, axis, 0)
    out_shape = lanes.shape[1:]
    out = np.zeros(out_shape, dtype=image.dtype)
    for idx in np.ndindex(*out_shape):
        lane = lanes[(slice(None),) + idx]
        fmax = 0.0
        alpha_p = 0.0
        colour_p = 0.0
        final_colour = 0.0
        for vl in lane.astype(np.float32):
            fpi = (1.0 / rng) * (vl - img_min)
            if fpi > fmax:
                dl = fpi - fmax
                fmax = fpi
            else:
                dl = 0.0
            bt = 1.0 - dl
            alpha = _opacity(vl, wl, ww)
            colour = bt * colour_p + (1.0 - bt * alpha_p) * fpi * alpha
            cur_alpha = bt * alpha_p + (1.0 - bt * alpha_p) * alpha
            colour_p = colour
            alpha_p = cur_alpha
            final_colour = colour
            if cur_alpha >= 1.0:
                break
        out[idx] = np.asarray(rng * final_colour + img_min).astype(image.dtype)
    return out


def oracle_fcm_intensity(image, n, axis):
    """Reference mips.rs:197-241 calc_fcm_intensity over the volume."""
    image = np.asarray(image)
    sz, sy, sx = image.shape
    dir_vec = np.zeros(3)
    dir_vec[{0: 2, 1: 1, 2: 0}[axis]] = 1.0
    out = np.zeros_like(image)
    imgf = image.astype(np.float64)
    for z in range(sz):
        for y in range(sy):
            for x in range(sx):
                px, fx = max(x - 1, 0), min(x + 1, sx - 1)
                py, fy = max(y - 1, 0), min(y + 1, sy - 1)
                pz, fz = max(z - 1, 0), min(z + 1, sz - 1)
                gx = (imgf[z, y, fx] - imgf[z, y, px]) / 2.0
                gy = (imgf[z, fy, x] - imgf[z, py, x]) / 2.0
                gz = (imgf[fz, y, x] - imgf[pz, y, x]) / 2.0
                gm = np.sqrt(gx * gx + gy * gy + gz * gz)
                if gm == 0.0:
                    out[z, y, x] = 0
                    continue
                d = gx * dir_vec[0] + gy * dir_vec[1] + gz * dir_vec[2]
                sf = (1.0 - abs(d / gm)) ** n
                out[z, y, x] = np.asarray(gm * sf).astype(image.dtype)
    return out


def oracle_fast_contour_mip(image, n, axis, wl, ww, tmip):
    """Reference mips.rs:215-279 fast_countour_mip_internal: the FCM
    intensity volume (cast to T per voxel), then tmip selects the
    reduction — 0: max along axis, 1: LMIP with the hard-coded 700..3033
    window, 2: MIDA with (wl, ww)."""
    tmp = oracle_fcm_intensity(image, n, axis)
    if tmip == 0:
        return tmp.max(axis=axis)
    if tmip == 1:
        return oracle_lmip(tmp, axis, 700, 3033)
    if tmip == 2:
        return oracle_mida(tmp, axis, wl, ww)
    raise ValueError(tmip)


def oracle_floodfill_threshold(data, seeds, t0, t1, fill, strct, out):
    """Reference floodfill.rs:96-166 generic_floodfill_threshold.
    ``seeds`` are (x, y, z) like the reference; ``strct`` is a 3D uint8
    structuring element; writes ``fill`` into ``out`` in place."""
    data = np.asarray(data)
    dz, dy, dx = data.shape
    odz, ody, odx = strct.shape
    oz, oy, ox = odz // 2, ody // 2, odx // 2
    stack = []
    for (i, j, k) in seeds:
        if t0 <= data[k, j, i] <= t1:
            stack.append((i, j, k))
            out[k, j, i] = fill
    while stack:
        x, y, z = stack.pop()
        out[z, y, x] = fill
        for kk in range(odz):
            zo = z + kk - oz
            if zo < 0 or zo >= dz:
                continue
            for jj in range(ody):
                yo = y + jj - oy
                if yo < 0 or yo >= dy:
                    continue
                for ii in range(odx):
                    if strct[kk, jj, ii]:
                        xo = x + ii - ox
                        if xo < 0 or xo >= dx:
                            continue
                        if out[zo, yo, xo] != fill and t0 <= data[zo, yo, xo] <= t1:
                            out[zo, yo, xo] = fill
                            stack.append((xo, yo, zo))
    return out


def oracle_watershed_minimax(image, markers, struct6=True):
    """Watershed as image-foresting-transform with max-arc path cost
    (the criterion computed by scipy.ndimage.watershed_ift and, on
    gradient images, by priority-flood watershed — reference
    watershed_process.py:19-61).  Dijkstra with cost = max intensity along
    the path, ties broken by insertion order (FIFO)."""
    import heapq

    image = np.asarray(image)
    labels = np.asarray(markers).copy()
    shape = image.shape
    visited = labels != 0
    heap = []
    counter = 0
    if struct6:
        neigh = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    else:
        neigh = [
            (a, b, c)
            for a in (-1, 0, 1)
            for b in (-1, 0, 1)
            for c in (-1, 0, 1)
            if (a, b, c) != (0, 0, 0)
        ]
    it = np.argwhere(labels != 0)
    for (z, y, x) in it:
        heapq.heappush(heap, (int(image[z, y, x]), counter, z, y, x, labels[z, y, x]))
        counter += 1
    cost = np.full(shape, np.iinfo(np.int64).max, dtype=np.int64)
    cost[labels != 0] = 0
    while heap:
        c, _, z, y, x, lab = heapq.heappop(heap)
        if visited[z, y, x] and labels[z, y, x] != lab:
            continue
        labels[z, y, x] = lab
        visited[z, y, x] = True
        for dz_, dy_, dx_ in neigh:
            nz, ny, nx = z + dz_, y + dy_, x + dx_
            if not (0 <= nz < shape[0] and 0 <= ny < shape[1] and 0 <= nx < shape[2]):
                continue
            nc = max(c, int(image[nz, ny, nx]))
            if nc < cost[nz, ny, nx] and not visited[nz, ny, nx]:
                cost[nz, ny, nx] = nc
                labels[nz, ny, nx] = lab
                heapq.heappush(heap, (nc, counter, nz, ny, nx, lab))
                counter += 1
    return labels
