"""Pallas TPU kernels for ops where XLA's graph form loses.

Currently: the EMA bandpass tracker.  The recurrence bp_t = s*p_t +
(1-s)*bp_{t-1} is inherently sequential in time; the XLA options are a
lax.scan (long serial loop with per-step dispatch) or an associative scan
(~log2(T) full passes over the (T, nchan) block, ~28x the minimal memory
traffic).  A Pallas kernel does it in ONE pass: the bandpass vector lives
in VMEM, the time loop runs inside the kernel, and each power row is read
and each output row written exactly once.

Round-2 note: a JAX/Mosaic lowering bug rejects these kernels when nested
inside the chain's per-segment lax.scan (minimal repro in PARITY.md), so
the chain calls them ONCE PER SECOND on the full (npol, nspec, nchan)
power block instead (models/baseband_dsp.process_second, ema_impl
'pallas').  The kernels tile time in `time_tile`-row blocks with the
bandpass carried across tiles in scratch; with time_tile = ffts_per_seg
the seeding/stale semantics per tile are IDENTICAL to the per-segment
call sequence of the reference (pb_kernels.cu:406-411 seeds from the
first block), so results match the 'scan' implementation exactly.

Kernels run in interpret mode automatically on non-TPU backends so the
same code path is CPU-testable (guide: pallas_guide.md "Debugging").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ema_kernel(pow_ref, bp_ref, out_ref, bp_out_ref, bp_scr, *,
                scale: float, ntt: int):
    """One (pol, channel-tile, time-tile) cell: seed + sequential EMA.

    pow_ref: (1, TT, CT) power block; bp_ref: (1, 1, CT) carry-in (used
    at time-tile 0); bp_scr: (1, CT) VMEM scratch carrying the bandpass
    across time tiles; out_ref: (1, TT, CT); bp_out_ref: (1, 1, CT).
    """
    t_idx = pl.program_id(2)
    TT = pow_ref.shape[1]
    # every value stays 2-D: Mosaic's vector-layout inference asserts on
    # 1-D vectors flowing through loop carries (layout.h join check)
    bp_in = jnp.where(t_idx == 0, bp_ref[0], bp_scr[:, :])    # (1, CT)
    seed = jnp.mean(pow_ref[0], axis=0, keepdims=True)        # (1, CT)
    bp0 = jnp.where(bp_in == 0.0, seed, bp_in)

    def body(t, bp):
        # rows read/written through the REF with pl.ds — Mosaic has no
        # dynamic_slice on materialized values
        p_t = pow_ref[0, pl.ds(t, 1), :]                      # (1, CT)
        bp_n = scale * p_t + (1.0 - scale) * bp
        out_ref[0, pl.ds(t, 1), :] = p_t / bp_n - 1.0
        return bp_n

    bp_f = jax.lax.fori_loop(0, TT, body, bp0)
    bp_scr[:, :] = bp_f

    @pl.when(t_idx == ntt - 1)
    def _():
        bp_out_ref[0] = bp_f


def _tile_geometry(T: int, nchan: int, chan_tile: int, time_tile: int):
    """(tt, ntt, ct, pad, ntile) satisfying Mosaic's block constraints on
    TPU: the time tile must divide T and be a multiple of 8 (or T
    itself); the channel axis is padded to a multiple of 128 and tiled in
    128-multiples.  In interpret mode (CPU tests) the requested tiles
    pass through unchanged."""
    interp = _interpret()
    tt = time_tile or T
    tt = min(tt, T)
    while T % tt:
        tt -= 1
    if not interp and tt != T and tt % 8:
        # largest divisor of T that is a multiple of 8, else whole-T
        cand = [d for d in range(tt, 0, -1) if T % d == 0 and d % 8 == 0]
        tt = cand[0] if cand else T
    ntt = T // tt
    if interp:
        ct = min(chan_tile, nchan)
        pad = (-nchan) % ct
    else:
        pad = (-nchan) % 128
        total = nchan + pad
        ct = min(chan_tile - chan_tile % 128 or 128, total)
        while total % ct:
            ct -= 128
    ntile = (nchan + pad) // ct
    return tt, ntt, ct, pad, ntile


@functools.partial(jax.jit, static_argnames=("scale", "chan_tile",
                                             "time_tile"))
def normalize_ema_pallas(power: jax.Array, bp: jax.Array, scale: float,
                         chan_tile: int = 512, time_tile: int = 0):
    """Drop-in for ops.normalize.normalize_ema (unweighted path).

    power: (npol, T, nchan); bp: (npol, nchan).  nchan is padded up to a
    multiple of chan_tile internally (pad channels carry bp=1 so the
    divide is safe).  time_tile (default: all of T) bounds the VMEM block;
    the bandpass carries across tiles in scratch.
    """
    npol, T, nchan = power.shape
    tt, ntt, ct, pad, ntile = _tile_geometry(T, nchan, chan_tile,
                                             time_tile)
    if pad:
        power = jnp.pad(power, ((0, 0), (0, 0), (0, pad)),
                        constant_values=1.0)
        bp = jnp.pad(bp, ((0, 0), (0, pad)), constant_values=1.0)
    bp3 = bp[:, None, :]
    out, bp_new = pl.pallas_call(
        functools.partial(_ema_kernel, scale=float(scale), ntt=ntt),
        grid=(npol, ntile, ntt),
        in_specs=[
            pl.BlockSpec((1, tt, ct), lambda i, j, t: (i, t, j)),
            pl.BlockSpec((1, 1, ct), lambda i, j, t: (i, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, tt, ct), lambda i, j, t: (i, t, j)),
            pl.BlockSpec((1, 1, ct), lambda i, j, t: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(power.shape, jnp.float32),
            jax.ShapeDtypeStruct(bp3.shape, jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, ct), jnp.float32)],
        interpret=_interpret(),
    )(power.astype(jnp.float32), bp3.astype(jnp.float32))
    bp_new = bp_new[:, 0, :]
    if pad:
        out = out[:, :, :nchan]
        bp_new = bp_new[:, :nchan]
    return out, bp_new


def _ema_weighted_kernel(pow_ref, w_ref, bp_ref, out_ref, bp_out_ref,
                         bp_scr, *, scale: float, clip_ratio: float,
                         clip_value: float, ntt: int):
    """Weighted/clipped variant (detect_and_normalize3 semantics)."""
    t_idx = pl.program_id(2)
    TT = pow_ref.shape[1]
    # 2-D everywhere (see _ema_kernel note on Mosaic 1-D layouts)
    pblk = pow_ref[0]                      # (TT, CT)
    wcol = w_ref[0]                        # (TT, 1)
    good_t = wcol > 0.0                    # (TT, 1)
    wsafe = jnp.where(good_t, wcol, 1.0)
    pw = jnp.where(good_t, pblk / wsafe, 0.0)
    ngood = jnp.sum(good_t.astype(jnp.float32))
    seed_num = jnp.sum(pw, axis=0, keepdims=True)             # (1, CT)
    seed = jnp.where(ngood > 0, seed_num / jnp.maximum(ngood, 1.0), 1.0)
    bp_in = jnp.where(t_idx == 0, bp_ref[0], bp_scr[:, :])    # (1, CT)
    bp0 = jnp.where(bp_in == 0.0, seed, bp_in)
    # stale-bandpass recovery (matches ops.normalize weighted variants)
    stale = (ngood > 0) & ((seed > 5.0 * bp0) | (seed < 0.2 * bp0))
    bp0 = jnp.where(stale, seed, bp0)

    def body(t, bp):
        # per-row reads via the refs (no dynamic_slice on values)
        w_t = w_ref[0, pl.ds(t, 1), :]                        # (1, 1)
        g = w_t > 0.0                                         # (1, 1)
        p_t = pow_ref[0, pl.ds(t, 1), :] / jnp.where(g, w_t, 1.0)
        p_t = jnp.where(g, p_t, 0.0)                          # (1, CT)
        clipped = p_t > clip_ratio * bp
        update = jnp.logical_and(g, jnp.logical_not(clipped))
        bp_n = jnp.where(update, scale * p_t + (1.0 - scale) * bp, bp)
        val = jnp.where(clipped, clip_value, p_t / bp_n - 1.0)
        out_ref[0, pl.ds(t, 1), :] = jnp.where(g, val, 0.0)
        return bp_n

    bp_f = jax.lax.fori_loop(0, TT, body, bp0)
    bp_scr[:, :] = bp_f

    @pl.when(t_idx == ntt - 1)
    def _():
        bp_out_ref[0] = bp_f


@functools.partial(jax.jit, static_argnames=("scale", "clip_ratio",
                                             "clip_value", "chan_tile",
                                             "time_tile"))
def normalize_ema_weighted_pallas(power: jax.Array, weights: jax.Array,
                                  bp: jax.Array, scale: float,
                                  clip_ratio: float = 11.0,
                                  clip_value: float = 10.0,
                                  chan_tile: int = 512,
                                  time_tile: int = 0):
    """Drop-in for ops.normalize.normalize_ema_weighted — EXACT sequential
    semantics (no fixed-point approximation) in one memory pass."""
    npol, T, nchan = power.shape
    tt, ntt, ct, pad, ntile = _tile_geometry(T, nchan, chan_tile,
                                             time_tile)
    if pad:
        power = jnp.pad(power, ((0, 0), (0, 0), (0, pad)),
                        constant_values=1.0)
        bp = jnp.pad(bp, ((0, 0), (0, pad)), constant_values=1.0)
    bp3 = bp[:, None, :]
    w3 = weights[:, :, None]
    out, bp_new = pl.pallas_call(
        functools.partial(_ema_weighted_kernel, scale=float(scale),
                          clip_ratio=float(clip_ratio),
                          clip_value=float(clip_value), ntt=ntt),
        grid=(npol, ntile, ntt),
        in_specs=[
            pl.BlockSpec((1, tt, ct), lambda i, j, t: (i, t, j)),
            pl.BlockSpec((1, tt, 1), lambda i, j, t: (i, t, 0)),
            pl.BlockSpec((1, 1, ct), lambda i, j, t: (i, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, tt, ct), lambda i, j, t: (i, t, j)),
            pl.BlockSpec((1, 1, ct), lambda i, j, t: (i, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(power.shape, jnp.float32),
            jax.ShapeDtypeStruct(bp3.shape, jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, ct), jnp.float32)],
        interpret=_interpret(),
    )(power.astype(jnp.float32), w3.astype(jnp.float32),
      bp3.astype(jnp.float32))
    bp_new = bp_new[:, 0, :]
    if pad:
        out = out[:, :, :nchan]
        bp_new = bp_new[:, :nchan]
    return out, bp_new
