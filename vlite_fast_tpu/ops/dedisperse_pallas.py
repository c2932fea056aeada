"""Pallas TPU dedispersion: VMEM-tiled two-stage shift-and-sum.

This is the production TPU engine for the heimdall role (DM-trial search,
ref scripts/start_heimdall_single_antenna:21).  The round-1 engines both
had structural costs: the gather engine (ops/dedisperse.dedisperse) faults
the TPU runtime at production sizes (see docs/dedisp_gather_fault.md), and
the Fourier engine pays ~1.7e10 transcendentals per gulp plus a
power-of-two pad (30720+6600 -> 65536, ~1.75x wasted bandwidth).  Here the
natural formulation — integer-shifted adds — runs directly:

* time is folded into (rows, 128) so every value sits in full 8x128
  vector registers; a shift by d becomes a row offset (d // 128, a cheap
  sublane-aligned dynamic slice) plus a lane rotation (d % 128, one
  `pltpu.roll` pair + select);
* stage 1 sums the w channels of each subband at per-channel in-subband
  delays for each of nbatch representative DMs (the dedisp-library
  subband decomposition, same accuracy class as heimdall's dm_tol);
* stage 2 combines the nsub subband series at full DM resolution,
  accumulating output blocks in VMEM across a sequential subband-chunk
  grid axis;
* all index tables ride in SMEM; the filterbank is read from HBM exactly
  once in stage 1 (the grid iterates batches innermost so the resident
  subband block is reused), and the stage-1 intermediate is read once in
  stage 2.

Shifts are exact integers (no phase-ramp approximation), shapes are the
true gulp geometry (no pow2 pad), and there is no take_along_axis
anywhere.  Measured on one TPU v5 lite chip at production geometry
(1024 DM x 4096 chan x 30720-sample gulp): ~9x faster than the Fourier
engine this replaces (see BENCH notes / PARITY.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlite_fast_tpu.ops.dedisperse import DedispPlan

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _shifted_read(read_rows, d, nrows):
    """Read `nrows` folded (row, LANE) rows starting at flat element offset
    `d` (traced int32): rows [d//LANE, ...) lane-rotated by d % LANE.

    read_rows(q) must return the (nrows + 1, LANE) block starting at row
    q.  Returns (nrows, LANE) float32 equal to flat[d : d + nrows*LANE]
    refolded.

    Cost note: ONE wide read + ONE roll + select (4 VPU ops per
    accumulated element incl. the caller's add).  The original funnel
    (two overlapping nrows-reads, each rolled, then select) cost ~6 —
    a substantial share of the engine's VPU work (A/B in
    benchmarks/bench_ddp_tpu.py).
    """
    q = d // LANE
    r = d % LANE
    blk = pltpu.roll(read_rows(q), -r, 1)       # (nrows + 1, LANE)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nrows, LANE), 1)
    return jnp.where(lane < LANE - r, blk[:nrows], blk[1:])


def _stage1_kernel(rel_ref, fb_ref, y_ref, *, nr1: int):
    """One (subband, DM-batch) cell: y[b, s, :] = sum_ch fb[ch, t + rel].

    rel_ref: (1, 1, 1, w) SMEM int32; fb_ref: (w, NRin, LANE) VMEM;
    y_ref: (1, 1, NR1, LANE) VMEM.
    """
    w = fb_ref.shape[0]

    def body(ch, acc):
        read = lambda q: fb_ref[pl.ds(ch, 1), pl.ds(q, nr1 + 1), :][0]
        return acc + _shifted_read(read, rel_ref[0, 0, 0, ch], nr1)

    acc = jax.lax.fori_loop(0, w, body,
                            jnp.zeros((nr1, LANE), jnp.float32))
    y_ref[0, 0] = acc


def _stage2_kernel(subd_ref, y_ref, out_ref, *, nrout: int, per_batch: int,
                   sc: int):
    """One (DM-batch, subband-chunk) cell: accumulate this chunk's subbands
    into the batch's per-DM output rows (out block revisited across the
    sequential subband-chunk grid axis).

    subd_ref: (1, 1, per_batch, sc) SMEM int32; y_ref: (1, sc, NR1, LANE);
    out_ref: (1, per_batch, NROUT, LANE) f32, accumulated in place.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # fori over the batch's DM trials keeps the Mosaic program size
    # constant in per_batch (the tolerance-driven production grid has
    # ~38 trials per batch; unrolling would bloat compile time)
    def dm_body(dm, _):
        def body(s, acc):
            read = lambda q: y_ref[0, pl.ds(s, 1),
                                   pl.ds(q, nrout + 1), :][0]
            return acc + _shifted_read(read, subd_ref[0, 0, dm, s],
                                       nrout)

        acc = jax.lax.fori_loop(0, sc, body,
                                jnp.zeros((nrout, LANE), jnp.float32))
        cur = out_ref[0, pl.ds(dm, 1), :, :][0]
        out_ref[0, pl.ds(dm, 1), :, :] = (cur + acc)[None]
        return 0

    jax.lax.fori_loop(0, per_batch, dm_body, 0)


@functools.partial(jax.jit, static_argnames=("ntime_out", "sub_chunk"))
def dedisperse_pallas_rollsel(fb: jax.Array, plan: DedispPlan,
                              ntime_out: int,
                              sub_chunk: int = 16) -> jax.Array:
    """The round-3 roll+select engine (kept for A/B; see dedisperse_pallas
    for the current default).  fb: (ntime, nchan) float32, ntime >=
    ntime_out + plan.max_delay.  Returns (ndm, ntime_out) float32 DM-time
    plane (channel-summed, zapped channels excluded), identical in
    semantics to ops.dedisperse.dedisperse.
    """
    ntime, nchan = fb.shape
    nsub = plan.nsub
    w = nchan // nsub
    nbatch = plan.rel_delays.shape[0]
    ndm = plan.sub_delays.shape[0]
    per_batch = ndm // nbatch

    nrout = _cdiv(ntime_out, LANE)
    q2max = plan.max_sub_delay // LANE
    nr1 = nrout + q2max + 1
    qmax = plan.rel_delays_max // LANE
    nrin = nr1 + qmax + 1

    # fold: (ntime, nchan) -> channel-major (nchan, NRin, LANE); reads past
    # the valid ntime hit zeros (the same tail semantics as the Fourier
    # engine's zero pad — search discards the invalid tail)
    fbz = fb * plan.chan_weights[None, :]
    pad = nrin * LANE - ntime
    if pad < 0:
        fbz = fbz[:nrin * LANE]
        pad = 0
    fbf = jnp.pad(fbz, ((0, pad), (0, 0))).T.reshape(nchan, nrin, LANE)

    rel = plan.rel_delays.reshape(nbatch, nsub, 1, w).astype(jnp.int32)
    # grid (nsub, nbatch): batch innermost so the fb subband block stays
    # VMEM-resident across all nbatch visits (fb is fetched from HBM once)
    y = pl.pallas_call(
        functools.partial(_stage1_kernel, nr1=nr1),
        grid=(nsub, nbatch),
        in_specs=[
            pl.BlockSpec((1, 1, 1, w), lambda s, b: (b, s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((w, nrin, LANE), lambda s, b: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, nr1, LANE),
                               lambda s, b: (b, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbatch, nsub, nr1, LANE),
                                       jnp.float32),
        interpret=_interpret(),
    )(rel, fbf)

    sc = min(sub_chunk, nsub)
    while nsub % sc:
        sc -= 1
    nsc = nsub // sc
    subd = plan.sub_delays.reshape(nbatch, per_batch, nsub)
    subd = jnp.swapaxes(subd.reshape(nbatch, per_batch, nsc, sc), 1, 2)
    # subd now (nbatch, nsc, per_batch, sc): block (1, 1, per_batch, sc)

    out = pl.pallas_call(
        functools.partial(_stage2_kernel, nrout=nrout,
                          per_batch=per_batch, sc=sc),
        grid=(nbatch, nsc),
        in_specs=[
            pl.BlockSpec((1, 1, per_batch, sc), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sc, nr1, LANE), lambda b, j: (b, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, per_batch, nrout, LANE),
                               lambda b, j: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbatch, per_batch, nrout, LANE),
                                       jnp.float32),
        interpret=_interpret(),
    )(subd.astype(jnp.int32), y)

    subd_k = out.reshape(ndm, nrout * LANE)[:, :ntime_out]
    return subd_k


# ---------------------------------------------------------------------------
# Lane-major overlapped-fold engine (round 5): shifts become plain
# dynamic-row reads
# ---------------------------------------------------------------------------
#
# The roll+select engine above is VPU-bound at ~5 vector ops per
# accumulated element (read + lane-roll + compare + select + add; the
# measured 0.120 s production gulp sits at ~100% of the VPU's add issue
# rate, 6% of HBM).  The fix is a LAYOUT change, not a schedule change:
#
#   fold time LANE-MAJOR with overlap.  Column l of the fold holds the
#   CONTIGUOUS sample range [l*C, l*C + C + margin): X[i, l] =
#   x_flat[l*C + i].  A shift by d <= margin is then X[d : d + C, :] —
#   ONE dynamic sublane-offset read, no roll, no select, no mask.
#
# Stage 1 (in-subband shifts, rel <= rel_delays_max ~ 52 at production)
# drops from ~5 ops to ~2 per accumulated element.  Stage 2's shifts
# (up to max_sub_delay ~ 6600) exceed any affordable margin, so its
# funnel becomes Q = D // C lane-roll + R = D %% C row-offset read; the
# row read would overrun the C-row column, so stage 1 writes each
# column EXTENDED with the head of the next column (rows [C, 2C-1) of
# lane l duplicate rows [0, C-1) of lane l+1) — the same overlap trick
# applied to its own output, trading 2x stage-1 output HBM (cheap, 6%
# HBM util) for a select-free 3-op stage-2 funnel.
#
# BYTE-IDENTICAL to the roll+select engine: every output element is the
# sum of exactly the same f32 values in exactly the same order — only
# the residence of each value moved.  (tests/test_dedisperse.py asserts
# exact equality on CPU interpret; benchmarks/bench_ddp_tpu.py A/Bs the
# engines on chip.)
#
# Ref role: heimdall/dedisp (scripts/start_heimdall_single_antenna:21).


def _stage1_fold_kernel(rel_ref, fb_ref, y_ref, *, ncol: int):
    """One (subband, DM-batch) cell in the lane-major fold.

    rel_ref: (1, 1, 1, w) SMEM int32 in-subband delays;
    fb_ref: (w, ncol + margin, LANE) VMEM lane-major overlapped fold;
    y_ref: (1, 1, 2*ncol - 1, LANE) VMEM — rows [0, ncol) are the
    subband's dedispersed series (column l = samples [l*ncol, ...)),
    rows [ncol, 2*ncol-1) the next-column overlap duplicate.
    """
    w = fb_ref.shape[0]

    def body(ch, acc):
        d = rel_ref[0, 0, 0, ch]
        return acc + fb_ref[pl.ds(ch, 1), pl.ds(d, ncol), :][0]

    acc = jax.lax.fori_loop(0, w, body,
                            jnp.zeros((ncol, LANE), jnp.float32))
    y_ref[0, 0, :ncol] = acc
    # overlap extension: rows [0, ncol-1) of the NEXT lane column.
    # (lane 127's extension wraps to lane 0 — garbage, but only reads
    # past the valid flat range ever see it, and those outputs are
    # discarded by the final [:ntime_out] slice.)  ncol == 1 has no
    # extension rows (static geometry branch).
    if ncol > 1:
        y_ref[0, 0, ncol:] = pltpu.roll(acc, LANE - 1, 1)[:ncol - 1]


def _stage2_fold_kernel(subd_ref, y_ref, out_ref, *, ncol: int,
                        pbc: int, sc: int):
    """One (DM-batch, DM-chunk, subband-chunk) cell: accumulate this
    chunk's subbands into pbc DM trials' output (lane-major fold).

    subd_ref: (1, 1, 1, pbc, sc) SMEM int32; y_ref: (1, sc,
    2*ncol - 1, LANE); out_ref: (1, pbc, ncol, LANE) accumulated in
    place across the sequential subband-chunk grid axis (innermost).
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def dm_body(dm, _):
        def body(s, acc):
            d = subd_ref[0, 0, 0, dm, s]
            q = d // ncol
            r = d % ncol
            blk = y_ref[0, pl.ds(s, 1), pl.ds(r, ncol), :][0]
            return acc + pltpu.roll(blk, -q, 1)

        acc = jax.lax.fori_loop(0, sc, body,
                                jnp.zeros((ncol, LANE), jnp.float32))
        cur = out_ref[0, pl.ds(dm, 1), :, :][0]
        out_ref[0, pl.ds(dm, 1), :, :] = (cur + acc)[None]
        return 0

    jax.lax.fori_loop(0, pbc, dm_body, 0)


def _divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (>= 1)."""
    d = min(cap, n)
    while n % d:
        d -= 1
    return d


# Scoped-VMEM budget for the stage-2 fold blocks.  XLA's scoped-vmem
# limit is 16 MB; the y input and out blocks are double-buffered and
# the kernel body holds an (ncol, LANE) accumulator plus rolls — leave
# headroom.  At production-linear geometry (ncol 328, per_batch 8) the
# proven-fast sc=16 / unchunked-out config costs ~13.4 MB and stays
# selected; the tol-grid geometry (ncol 332, per_batch 38) exceeded
# the limit at 22.8 MB and now splits to pbc=19, sc=8.
_S2_VMEM_BUDGET = 13_800_000


def _stage2_fold_tiles(ncol: int, per_batch: int, nsub: int,
                       sub_chunk: int) -> tuple[int, int]:
    """(pbc, sc): DM-trial and subband chunk sizes fitting the budget."""
    out_cost = lambda p: 2 * p * ncol * LANE * 4
    y_cost = lambda s: 2 * s * (2 * ncol - 1) * LANE * 4
    pbc = per_batch
    while pbc > 1 and out_cost(pbc) > _S2_VMEM_BUDGET // 2:
        pbc = _divisor_leq(per_batch, pbc - 1)
    sc = _divisor_leq(nsub, min(sub_chunk, nsub))
    while sc > 1 and y_cost(sc) > _S2_VMEM_BUDGET - out_cost(pbc):
        sc = _divisor_leq(nsub, sc - 1)
    return pbc, sc


@functools.partial(jax.jit, static_argnames=("ntime_out", "sub_chunk"))
def dedisperse_pallas(fb: jax.Array, plan: DedispPlan, ntime_out: int,
                      sub_chunk: int = 16) -> jax.Array:
    """fb: (ntime, nchan) float32, ntime >= ntime_out + plan.max_delay.
    Returns (ndm, ntime_out) float32 DM-time plane (channel-summed,
    zapped channels excluded), identical in semantics (and bit-exact)
    to ops.dedisperse.dedisperse / dedisperse_pallas_rollsel.

    Production gulp (1024 DM x 4096 chan x 24 s): see module comment —
    the lane-major fold takes the kernel from roll+select (~5 VPU ops
    per accumulated element) to read+add (~2 stage 1, ~3 stage 2).
    """
    ntime, nchan = fb.shape
    nsub = plan.nsub
    w = nchan // nsub
    nbatch = plan.rel_delays.shape[0]
    ndm = plan.sub_delays.shape[0]
    per_batch = ndm // nbatch

    # column length: 128 columns must cover every read the valid outputs
    # make (ntime_out + max_sub_delay samples of stage-1 series)
    ncol = _cdiv(ntime_out + plan.max_sub_delay, LANE)
    margin = int(plan.rel_delays_max)
    ncol_in = ncol + margin

    # ---- lane-major overlapped fold of the zapped filterbank ------------
    # F[ch, i, l] = fbz[l*ncol + i, ch] for i in [0, ncol_in): column l
    # carries its ncol samples PLUS the margin-sample head of the columns
    # after it.  Built from m shifted reshapes (no gather): chunk j holds
    # ft[(l+j)*ncol : (l+j+1)*ncol] for every l at once.
    fbz = fb * plan.chan_weights[None, :]
    m = _cdiv(ncol_in, ncol)
    need = (LANE + m - 1) * ncol
    if ntime < need:
        fbz = jnp.pad(fbz, ((0, need - ntime), (0, 0)))
    else:
        fbz = fbz[:need]
    ft = fbz.T                                   # (nchan, need)
    chunks = [ft[:, j * ncol:(j + LANE) * ncol].reshape(nchan, LANE, ncol)
              for j in range(m)]
    fbf = jnp.concatenate(chunks, axis=2)[:, :, :ncol_in]
    fbf = jnp.swapaxes(fbf, 1, 2)
    # fbf: (nchan, ncol_in, LANE), one XLA relayout pass

    rel = plan.rel_delays.reshape(nbatch, nsub, 1, w).astype(jnp.int32)
    y = pl.pallas_call(
        functools.partial(_stage1_fold_kernel, ncol=ncol),
        grid=(nsub, nbatch),
        in_specs=[
            pl.BlockSpec((1, 1, 1, w), lambda s, b: (b, s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((w, ncol_in, LANE), lambda s, b: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2 * ncol - 1, LANE),
                               lambda s, b: (b, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbatch, nsub, 2 * ncol - 1, LANE),
                                       jnp.float32),
        interpret=_interpret(),
        # nsub < 128 widens the per-subband fb block past the 16 MB
        # default scoped-VMEM limit (w * ncol_in * 128 * 4, double-
        # buffered); the chip has headroom (the megakernel runs at
        # ~30 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rel, fbf)

    pbc, sc = _stage2_fold_tiles(ncol, per_batch, nsub, sub_chunk)
    nsc = nsub // sc
    npbc = per_batch // pbc
    subd = plan.sub_delays.reshape(nbatch, npbc, pbc, nsc, sc)
    subd = jnp.transpose(subd, (0, 1, 3, 2, 4))

    out = pl.pallas_call(
        functools.partial(_stage2_fold_kernel, ncol=ncol, pbc=pbc, sc=sc),
        grid=(nbatch, npbc, nsc),
        in_specs=[
            pl.BlockSpec((1, 1, 1, pbc, sc),
                         lambda b, k, j: (b, k, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sc, 2 * ncol - 1, LANE),
                         lambda b, k, j: (b, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pbc, ncol, LANE),
                               lambda b, k, j: (b * npbc + k, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nbatch * npbc, pbc, ncol, LANE),
                                       jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(subd.astype(jnp.int32), y)

    # refold lane-major -> flat time: dmt[dm, l*ncol + i] = out[dm, i, l]
    dmt = jnp.swapaxes(out.reshape(ndm, ncol, LANE), 1, 2)
    return dmt.reshape(ndm, ncol * LANE)[:, :ntime_out]


def max_vmem_bytes(plan: DedispPlan, nchan: int, ntime_out: int,
                   sub_chunk: int = 16) -> dict:
    """Static VMEM budget of both kernels (for tuning/diagnostics)."""
    nsub = plan.nsub
    w = nchan // nsub
    nbatch = plan.rel_delays.shape[0]
    per_batch = plan.sub_delays.shape[0] // nbatch
    nrout = _cdiv(ntime_out, LANE)
    nr1 = nrout + plan.max_sub_delay // LANE + 1
    nrin = nr1 + plan.rel_delays_max // LANE + 1
    ncol = _cdiv(ntime_out + plan.max_sub_delay, LANE)
    pbc, sc = _stage2_fold_tiles(ncol, per_batch, nsub, sub_chunk)
    return {
        "stage1_fb_block": w * nrin * LANE * 4,
        "stage1_y_block": nr1 * LANE * 4,
        "stage2_y_block": sc * nr1 * LANE * 4,
        "stage2_out_block": pbc * nrout * LANE * 4,
        "stage2_pbc": pbc,
        "stage2_sc": sc,
    }
