"""Pallas TPU kernels for the hot per-frame ray scans (LMIP / MIDA).

The lax.scan formulations in ops/projections.py round-trip the (H, W)
carry through HBM on every ray step.  These kernels instead tile the
output plane into (8, 128) VPU registersful, DMA each tile's *entire ray
column* into VMEM once (Z x 8 x 128 f32 = 2 MB at Z = 512), and walk the
ray with an in-register ``fori_loop`` — one HBM read of the volume total,
zero intermediate traffic.

Semantics identical to ops/projections.lmip / .mida (which mirror the
reference invesalius_rs/src/mips.rs scalar loops); tests compare the two
paths in interpreter mode.  The projection axis is axis 0; callers
moveaxis first (the transpose is one fused copy, still cheaper than a
scan's per-step traffic for other axes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_Y = 8
_TILE_X = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_yx(volume):
    Z, Y, X = volume.shape
    py = (-Y) % _TILE_Y
    px = (-X) % _TILE_X
    if py or px:
        volume = jnp.pad(volume, ((0, 0), (0, py), (0, px)))
    return volume, Y, X


# ---------------------------------------------------------------------------
# LMIP
# ---------------------------------------------------------------------------


def _lmip_kernel(params_ref, vol_ref, out_ref):
    tmin = params_ref[0]
    tmax = params_ref[1]
    Z = vol_ref.shape[0]

    first = vol_ref[0]
    # flags carried as 0/1 float32: an i1 vector loop carry fails to
    # legalize on the current Mosaic toolchain ("failed to legalize
    # operation 'scf.for'"); transient bool masks inside the body are fine
    init = (
        first,  # max_val
        ((first >= tmin) & (first <= tmax)).astype(jnp.float32),  # start
        jnp.zeros_like(first),  # stopped
    )

    def body(z, carry):
        max_val, start, stopped = carry
        val = vol_ref[z]
        greater = val > max_val
        less = val < max_val
        new_stopped = jnp.maximum(stopped, jnp.where(less, start, 0.0))
        new_max = jnp.where((stopped == 0.0) & greater, val, max_val)
        in_range = (val >= tmin) & (val <= tmax)
        new_start = jnp.where(new_stopped == 0.0,
                              jnp.maximum(start, in_range.astype(jnp.float32)),
                              start)
        return new_max, new_start, new_stopped

    max_val, _, _ = jax.lax.fori_loop(0, Z, body, init)
    out_ref[:] = max_val


@partial(jax.jit, static_argnames=())
def lmip_axis0(volume: jax.Array, tmin, tmax) -> jax.Array:
    """LMIP along axis 0 (reference mips.rs:7-86 semantics)."""
    vol, Y, X = _pad_yx(volume.astype(jnp.float32))
    Z, Yp, Xp = vol.shape
    params = jnp.asarray([tmin, tmax], jnp.float32)
    out = pl.pallas_call(
        _lmip_kernel,
        grid=(Yp // _TILE_Y, Xp // _TILE_X),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Z, _TILE_Y, _TILE_X), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_Y, _TILE_X), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Yp, Xp), jnp.float32),
        interpret=_interpret(),
    )(params, vol)
    return out[:Y, :X].astype(volume.dtype)


# ---------------------------------------------------------------------------
# MIDA
# ---------------------------------------------------------------------------


def _mida_kernel(params_ref, vol_ref, out_ref):
    img_min = params_ref[0]
    rng = params_ref[1]
    wl = params_ref[2]
    ww = params_ref[3]
    Z = vol_ref.shape[0]
    shape = out_ref.shape

    init = (
        jnp.zeros(shape, jnp.float32),  # fmax
        jnp.zeros(shape, jnp.float32),  # alpha_p
        jnp.zeros(shape, jnp.float32),  # colour_p
        jnp.zeros(shape, jnp.float32),  # stopped (0/1: i1 carries fail to
    )                                   # legalize; see _lmip_kernel)
    min_v = wl - ww / 2.0
    max_v = wl + ww / 2.0

    def body(z, carry):
        fmax, alpha_p, colour_p, stopped = carry
        vl = vol_ref[z]
        fpi = (vl - img_min) / rng
        dl = jnp.maximum(fpi - fmax, 0.0)
        new_fmax = jnp.maximum(fmax, fpi)
        bt = 1.0 - dl
        alpha = jnp.clip((vl - min_v) / (max_v - min_v), 0.0, 1.0)
        colour = bt * colour_p + (1.0 - bt * alpha_p) * fpi * alpha
        new_alpha = bt * alpha_p + (1.0 - bt * alpha_p) * alpha
        run = stopped == 0.0
        out_fmax = jnp.where(run, new_fmax, fmax)
        out_alpha = jnp.where(run, new_alpha, alpha_p)
        out_colour = jnp.where(run, colour, colour_p)
        new_stopped = jnp.maximum(stopped,
                                  (out_alpha >= 1.0).astype(jnp.float32))
        return out_fmax, out_alpha, out_colour, new_stopped

    _, _, colour_p, _ = jax.lax.fori_loop(0, Z, body, init)
    out_ref[:] = rng * colour_p + img_min


@partial(jax.jit, static_argnames=())
def mida_axis0(volume: jax.Array, wl, ww) -> jax.Array:
    """MIDA along axis 0 (reference mips.rs:102-168 semantics; the global
    min/max normalization is computed outside the kernel, fused by XLA)."""
    volf = volume.astype(jnp.float32)
    img_min = jnp.min(volf)
    rng = jnp.max(volf) - img_min
    vol, Y, X = _pad_yx(volf)
    Z, Yp, Xp = vol.shape
    params = jnp.asarray([img_min, rng, wl, ww], jnp.float32)
    out = pl.pallas_call(
        _mida_kernel,
        grid=(Yp // _TILE_Y, Xp // _TILE_X),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Z, _TILE_Y, _TILE_X), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_Y, _TILE_X), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Yp, Xp), jnp.float32),
        interpret=_interpret(),
    )(params, vol)
    return out[:Y, :X].astype(volume.dtype)


# ---------------------------------------------------------------------------
# Watershed sweeps: forward + backward minimax relaxation along an axis in
# one kernel — the whole ray column stays in VMEM, replacing two lax.scan
# sweeps whose carries round-trip HBM every step.  Labels are handled in
# their native int16 (sublane tile 16) so callers pay zero casts.
# ---------------------------------------------------------------------------

_WS_TY = 16  # int16 sublane tile
_WS_TX = 128
_WS_TZ = 8  # z-rows per program in the axis-1 kernel
_DIST_BITS = 15
_DIST_MAX = (1 << _DIST_BITS) - 1
_INF_RANK = 2**31 - 1


def _ws_relax(parent_rank, f_here):
    pcost = parent_rank >> _DIST_BITS
    pdist = parent_rank & _DIST_MAX
    cand = jnp.maximum(pcost, f_here) * (1 << _DIST_BITS) + jnp.minimum(
        pdist + 1, _DIST_MAX)
    return jnp.where(parent_rank == _INF_RANK, _INF_RANK, cand)


def _ws_sweep_z_kernel(rank_ref, lab_ref, f_ref, rank_out, lab_out):
    Z = rank_ref.shape[0]
    rank_out[:] = rank_ref[:]
    lab_out[:] = lab_ref[:]

    def fwd(z, _):
        cand = _ws_relax(rank_out[z - 1], f_ref[z])
        cur = rank_out[z]
        take = cand < cur
        rank_out[z] = jnp.where(take, cand, cur)
        lab_out[z] = jnp.where(take, lab_out[z - 1], lab_out[z])
        return 0

    jax.lax.fori_loop(1, Z, fwd, 0)

    def bwd(i, _):
        z = Z - 2 - i
        cand = _ws_relax(rank_out[z + 1], f_ref[z])
        cur = rank_out[z]
        take = cand < cur
        rank_out[z] = jnp.where(take, cand, cur)
        lab_out[z] = jnp.where(take, lab_out[z + 1], lab_out[z])
        return 0

    jax.lax.fori_loop(0, Z - 1, bwd, 0)


def _ws_sweep_y_kernel(rank_ref, lab_ref, f_ref, rank_out, lab_out):
    Y = rank_ref.shape[1]
    rank_out[:] = rank_ref[:]
    lab_out[:] = lab_ref[:]

    def fwd(y, _):
        cand = _ws_relax(rank_out[:, y - 1], f_ref[:, y])
        cur = rank_out[:, y]
        take = cand < cur
        rank_out[:, y] = jnp.where(take, cand, cur)
        lab_out[:, y] = jnp.where(take, lab_out[:, y - 1], lab_out[:, y])
        return 0

    jax.lax.fori_loop(1, Y, fwd, 0)

    def bwd(i, _):
        y = Y - 2 - i
        cand = _ws_relax(rank_out[:, y + 1], f_ref[:, y])
        cur = rank_out[:, y]
        take = cand < cur
        rank_out[:, y] = jnp.where(take, cand, cur)
        lab_out[:, y] = jnp.where(take, lab_out[:, y + 1], lab_out[:, y])
        return 0

    jax.lax.fori_loop(0, Y - 1, bwd, 0)


def _ws_pad(rank, lab, f, pz, py, px):
    if pz or py or px:
        pads = ((0, pz), (0, py), (0, px))
        rank = jnp.pad(rank, pads, constant_values=_INF_RANK)
        lab = jnp.pad(lab, pads)
        f = jnp.pad(f, pads)
    return rank, lab, f


@partial(jax.jit, static_argnames=())
def watershed_sweep_z(rank: jax.Array, lab: jax.Array, f: jax.Array):
    """Bidirectional axis-0 minimax sweep (packed-rank semantics identical
    to ops.watershed._sweep_axis fwd+bwd).  lab int16-native."""
    Z, Y, X = rank.shape
    rank, lab, f = _ws_pad(rank, lab, f, 0, (-Y) % _WS_TY, (-X) % _WS_TX)
    Yp, Xp = rank.shape[1:]
    grid = (Yp // _WS_TY, Xp // _WS_TX)

    def spec(dt):
        return pl.BlockSpec((Z, _WS_TY, _WS_TX), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    nr, nl = pl.pallas_call(
        _ws_sweep_z_kernel,
        grid=grid,
        in_specs=[spec(jnp.int32), spec(lab.dtype), spec(jnp.int32)],
        out_specs=(spec(jnp.int32), spec(lab.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((Z, Yp, Xp), jnp.int32),
            jax.ShapeDtypeStruct((Z, Yp, Xp), lab.dtype),
        ),
        input_output_aliases={0: 0, 1: 1},  # rank/lab updated in place
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(rank, lab, f)
    return nr[:, :Y, :X], nl[:, :Y, :X]


@partial(jax.jit, static_argnames=())
def watershed_sweep_y(rank: jax.Array, lab: jax.Array, f: jax.Array):
    """Bidirectional axis-1 minimax sweep — same relaxation, the VMEM block
    is (8 z-rows, Y, 128) and the fori walks the middle axis.

    Labels must be int32 on hardware: the per-step (8, 1, 128) slice of an
    int16 ref is not sublane-tileable (Mosaic packs i16 sublanes in pairs);
    the refine loop therefore carries labels as int32 end-to-end."""
    Z, Y, X = rank.shape
    rank, lab, f = _ws_pad(rank, lab, f, (-Z) % _WS_TZ, (-Y) % _WS_TY,
                           (-X) % _WS_TX)
    Zp, Yp, Xp = rank.shape
    grid = (Zp // _WS_TZ, Xp // _WS_TX)

    def spec(dt):
        return pl.BlockSpec((_WS_TZ, Yp, _WS_TX), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    nr, nl = pl.pallas_call(
        _ws_sweep_y_kernel,
        grid=grid,
        in_specs=[spec(jnp.int32), spec(lab.dtype), spec(jnp.int32)],
        out_specs=(spec(jnp.int32), spec(lab.dtype)),
        out_shape=(
            jax.ShapeDtypeStruct((Zp, Yp, Xp), jnp.int32),
            jax.ShapeDtypeStruct((Zp, Yp, Xp), lab.dtype),
        ),
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(rank, lab, f)
    return nr[:Z, :Y, :X], nl[:Z, :Y, :X]
