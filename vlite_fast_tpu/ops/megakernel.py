"""Full-chain Pallas megakernel for the per-antenna DSP hot loop.

The XLA chain (models/baseband_dsp.process_second) runs at ~7% MXU and
~13% HBM utilization: its cost is materialized intermediates between
XLA fusions (docs/megakernel_plan.md).  This kernel keeps every
intermediate of a 3.125 ms segment in VMEM: the raw uint8 block is read
once from HBM and only the packed 2-bit bytes (plus stats) are written.

Mirrors the role of the reference GPU hot loop — the whole segment
dispatch of process_baseband (ref src/process_baseband.cu:1108-1360:
convertarray -> kurtosis -> cufft R2C -> detect_and_normalize ->
pscrunch -> tscrunch -> sel_and_dig as back-to-back kernel launches) —
as ONE launch per second with the segment loop as the Pallas grid.

Layout design (the part that makes it a TPU program, not a port):

  The Cooley-Tukey rfft (nfft = n1*n2 = 100*125, ops/channelize.py)
  contracts m1 in stage 1 and m2 in stage 2 — on the MXU both must be
  (..., 128) @ (128, ...) dots.  The input is delivered pre-transposed
  (one XLA uint8 pass per second, ~4x cheaper than any f32 relayout) as

      X[(b, m2), m1]   b = pol*ffts_per_seg + t,  (8192, 128) u8/seg
                       m1 padded 100->128 on lanes,
                       m2 padded 125->128 on sublanes (whole b-blocks
                       of 128 sublanes -> every per-b slice is
                       tile-aligned)

  * stage 1 (contract m1) is ONE (8192,128)@(128,128) dot per bf16
    pass — M=8192 keeps the MXU pipeline full;
  * the twiddle is elementwise against (8192,128) constant planes
    (tw tiled across b), no layout change;
  * stage 2 (contract m2) runs per b-block on the tile-aligned
    (128,128) sublane slice, with w2's real and imag columns PACKED
    side-by-side in one (128,128) matrix so each bf16 pass computes
    both products in one full-tile MXU op; pr/pi land in sublane
    halves and the detect folds them with one sublane roll:
        Z = (D_br + sgn * roll(D_bi, 64))^2 ;  P = Z[:64] + Z[64:]
  * the power plane comes out FACTORED as (k2, k1) — which IS linear
    channel order (k = k1 + n1*k2, n1 % 4 == 0), so the 2-bit pack is
    a lane-group matmul and no unfactoring relayout ever happens.

Precision matches the chain default dft_precision='high' with
dft_exact_input semantics: stage 1 = two bf16 passes against a hi/lo
split of the DFT matrix (voltages k/128 are exactly bf16-representable,
ref ops/channelize.matmul_rfft_framed), stage 2 = standard bf16x3
(hi*hi + hi*lo + lo*hi).  Accumulation order differs from XLA's, so
parity is the 2-bit packed-agreement bar (>= 99.99%), asserted on chip.

Stage A (this file's first landing): stage1 + twiddle + stage2 + detect
for one stream, power planes out — parity-tested against an explicit
bf16-emulation oracle on CPU interpret, timed on chip for GO/NO-GO.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlite_fast_tpu.ops import channelize as ch_ops

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class DFTPlanes(NamedTuple):
    """Constant matrices, padded to the kernel's 128-lane layout."""

    w1r_hi: np.ndarray   # (128, 128) stage-1 real plane, bf16-hi part
    w1r_lo: np.ndarray
    w1i_hi: np.ndarray
    w1i_lo: np.ndarray
    twr: np.ndarray      # (nb*128, 128) twiddle planes tiled across b
    twi: np.ndarray
    w2c_hi: np.ndarray   # (128, 128) [w2r | w2i] packed column halves
    w2c_lo: np.ndarray
    n1: int
    n2: int
    n2_out: int
    nb: int              # b = npol * ffts_per_seg


def _hi_lo(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    hi = m.astype(jnp.bfloat16).astype(np.float32)
    lo = (m - hi).astype(jnp.bfloat16).astype(np.float32)
    return hi, lo


@functools.lru_cache(maxsize=4)
def dft_planes(nfft: int, nb: int) -> DFTPlanes:
    """Build the padded constant planes for nfft = n1*n2, nb b-blocks."""
    n1, n2 = ch_ops._ct_split(nfft)
    if n1 > LANE or n2 > LANE:
        raise ValueError(f"CT factors {n1}x{n2} exceed one lane tile")
    w1, tw, w2 = ch_ops._ct_tables(nfft)
    n2_out = nfft // 2 // n1 + 1
    if 2 * n2_out > LANE:
        raise ValueError(f"2*n2_out={2*n2_out} exceeds the packed w2 tile")

    # stage 1: X[(b,m2), m1] @ W1[m1, k1] — pad m1 rows and k1 cols
    w1p = np.zeros((LANE, LANE), np.complex64)
    w1p[:n1, :n1] = w1.T            # W1[m1, k1] = w1[k1, m1] (symmetric,
    #                                 but keep the explicit transpose)
    w1r_hi, w1r_lo = _hi_lo(w1p.real.astype(np.float32))
    w1i_hi, w1i_lo = _hi_lo(w1p.imag.astype(np.float32))

    # twiddle planes: row (b*128 + m2), lane k1 -> tw[k1, m2]
    twp = np.zeros((LANE, LANE), np.complex64)
    twp[:n2, :n1] = tw.T            # [m2, k1]
    twr = np.tile(twp.real.astype(np.float32), (nb, 1))
    twi = np.tile(twp.imag.astype(np.float32), (nb, 1))

    # stage 2: D[j, k1] = sum_m2 W2c[m2, j] B[m2, k1]; columns j<n2_out
    # hold w2r[m2, k2], columns 64+k2 hold w2i[m2, k2]
    w2s = w2[:, :n2_out]            # (n2, n2_out)
    w2c = np.zeros((LANE, LANE), np.float32)
    w2c[:n2, :n2_out] = w2s.real.astype(np.float32)
    w2c[:n2, LANE // 2:LANE // 2 + n2_out] = w2s.imag.astype(np.float32)
    w2c_hi, w2c_lo = _hi_lo(w2c)

    return DFTPlanes(w1r_hi, w1r_lo, w1i_hi, w1i_lo, twr, twi,
                     w2c_hi, w2c_lo, n1, n2, n2_out, nb)


def pretranspose_u8(raw: jax.Array, nfft: int, npol: int,
                    seg_per_sec: int) -> jax.Array:
    """(npol, nsamp) uint8 -> (nseg, nb*128, 128) kernel-layout blocks.

    One XLA uint8 transpose per call (the only whole-input relayout in
    the megakernel path; u8 moves 4x less than the f32 relayouts the
    XLA chain pays per segment).
    """
    n1, n2 = ch_ops._ct_split(nfft)
    npol_, nsamp = raw.shape
    seg_samps = nsamp // seg_per_sec
    ffts = seg_samps // nfft
    # frame sample n = m1*n2 + m2 (decimation in time, channelize.py)
    f = raw.reshape(npol, seg_per_sec, ffts, n1, n2)
    f = jnp.transpose(f, (1, 0, 2, 4, 3))      # (seg, pol, t, m2, m1)
    f = jnp.pad(f, ((0, 0), (0, 0), (0, 0),
                    (0, LANE - n2), (0, LANE - n1)))
    return f.reshape(seg_per_sec, npol * ffts * LANE, LANE)


# ---------------------------------------------------------------------------
# Pallas pretranspose (round 5b): break the 18 ms XLA u8-relayout wall
# ---------------------------------------------------------------------------
#
# bench_pretranspose_tpu.py showed EVERY XLA formulation of the
# (npol, nsamp) -> kernel-layout relayout costs ~18 ms/data-second
# (XLA u8 data movement runs ~19 GB/s effective on this chip) — the
# reason the pretransposed chain_second lost to the natural-layout v2
# despite a faster kernel.  This kernel does the same relayout on the
# MXU instead: read the NATURAL segment block (free reshape, the v2
# trick), then transpose each (P, Q) frame with ONE identity dot
#
#     y = x^T = dot_general(x, I_P, contract dim0 of both)
#
# — exact, because u8 values (<= 255) and converted voltages k/128 - 1
# are bf16-representable, so every bf16 product is a single
# zero-or-value term accumulated in f32.  One MXU tile per frame per
# pol vs the four the v2 stage-1 pays, and HBM moves exactly
# read-once/write-once.  Output is byte-identical to pretranspose_u8
# (out_dtype=uint8) or the converted bf16 voltages (out_dtype=bfloat16,
# skipping the main kernel's convert phase).
#
# Ref: same relayout role as pretranspose_u8 above (the reference keeps
# frames contiguous and lets cuFFT stride instead: src/process_baseband
# .cu:1108-1360; striding is free on a load-coalescing GPU, a relayout
# on a tiled TPU).


def _pretranspose_kernel(u_ref, ident_ref, out_ref, *, npol: int,
                         ffts: int, P: int, Q: int, convert: bool,
                         impl: str):
    """One segment: natural (pol, ffts*P, Q) u8 -> kernel layout
    ((pol*ffts + t)*128 + m2, m1) rows.  impl 'mxu': one identity dot
    per frame (exact — operand values are bf16-representable); 'xlu':
    Mosaic's native (128, 128) transpose (exact at any dtype)."""
    vdt = jnp.float32 if _interpret() else jnp.bfloat16
    ident = ident_ref[...]                       # (P, LANE) f32 eye
    identb = _b(ident)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    for pol in range(npol):
        ui = u_ref[pol, 0].astype(jnp.int32)     # (ffts*P, Q)
        x = ui.astype(jnp.float32)
        if convert:
            x = x * (1.0 / 128.0) - 1.0
            x = jnp.where(ui == 0, 0.0, x)
        # lane-pad once for the whole block (as chain_second_v2 does);
        # the xlu path also row-pads so every frame slice is (128, 128)
        rpad = LANE - P if impl == "xlu" else 0
        x = jnp.pad(x, ((0, rpad), (0, LANE - Q))).astype(vdt)
        for t in range(ffts):
            b = pol * ffts + t
            if impl == "xlu":
                xb = jax.lax.slice(x, (t * P, 0),
                                   (t * P + LANE, LANE))
                y = jax.lax.transpose(xb, (1, 0)).astype(jnp.float32)
                # rows beyond this frame leaked in via the 128-row
                # slice; zero the lanes m1 >= P they transposed into
                y = jnp.where(lane_iota < P, y, 0.0)
            else:
                xb = jax.lax.slice(x, (t * P, 0), ((t + 1) * P, LANE))
                xbb = _b(xb) if _interpret() else xb
                y = _bdot00(xbb, identb)         # (128, 128) f32 = xb^T
            if out_ref.dtype == jnp.uint8:
                # Mosaic has no f32->u8 cast; the i32 hop is supported
                y = y.astype(jnp.int32)
            out_ref[0, pl.ds(b * LANE, LANE)] = y.astype(out_ref.dtype)


def pallas_pretranspose(raw: jax.Array, nfft: int, npol: int,
                        seg_per_sec: int, out_dtype=jnp.uint8,
                        impl: str = "mxu") -> jax.Array:
    """(npol, nsamp) uint8 -> (nseg, nb*128, 128) kernel-layout blocks
    via the per-frame MXU identity-dot transpose (see section comment).

    out_dtype uint8: byte-identical to pretranspose_u8 (raw bytes move).
    out_dtype bfloat16: CONVERTED voltages k/128 - 1 with the u8==0
    zero flag applied (bf16-exact), so the main kernel skips phase 0.
    """
    n1, n2 = ch_ops._ct_split(nfft)
    npol_, nsamp = raw.shape
    seg_samps = nsamp // seg_per_sec
    ffts = seg_samps // nfft
    nb = npol * ffts
    ident = np.zeros((n1, LANE), np.float32)
    ident[:, :n1] = np.eye(n1, dtype=np.float32)
    xs = raw.reshape(npol, seg_per_sec, ffts * n1, n2)
    convert = out_dtype != jnp.uint8
    return pl.pallas_call(
        functools.partial(_pretranspose_kernel, npol=npol, ffts=ffts,
                          P=n1, Q=n2, convert=convert, impl=impl),
        grid=(seg_per_sec,),
        in_specs=[
            pl.BlockSpec((npol, 1, ffts * n1, n2),
                         lambda i: (0, i, 0, 0)),
            pl.BlockSpec((n1, LANE), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb * LANE, LANE),
                               lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (seg_per_sec, nb * LANE, LANE), out_dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs, jnp.asarray(ident))


def _b(v):
    """Cast an MXU operand for one bf16 pass.  On CPU (interpret mode)
    XLA has no bf16 x bf16 dot — round to bf16-representable values but
    compute in f32: products are bit-identical (bf16 multiply of
    bf16-representable values == f32 multiply) and accumulation is f32
    on both backends."""
    if _interpret():
        return v.astype(jnp.bfloat16).astype(jnp.float32)
    return v.astype(jnp.bfloat16)


def _bdot(a, b):
    """bf16-pass dot contracting a's dim1 with b's dim0, f32 out."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _bdot00(a, b):
    """bf16-pass dot contracting dim0 of BOTH operands, f32 out."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _split(v):
    hi = v.astype(jnp.bfloat16)
    lo = _b(v - hi.astype(jnp.float32))
    return _b(hi.astype(jnp.float32)), lo


def _dft_detect_body(x, w1r_hi, w1r_lo, w1i_hi, w1i_lo, twr, twi,
                     w2c_hi, w2c_lo, br_scr, bi_scr, emit, *, nb: int):
    """Shared stage1+twiddle+stage2+detect body.

    x: (nb*128, 128) f32 voltages in kernel layout.  Calls
    emit(b, power) with power (64, 128): the (k2, k1) plane (rows >=
    n2_out and lanes >= n1 are zero).  The fold's garbage half is
    sliced off HERE with lax.slice — a combined `[None, :64, :]`
    getitem at the emit site lowers to an unsupported Mosaic gather.
    """
    xb = _b(x)
    ar = _bdot(xb, w1r_hi) + _bdot(xb, w1r_lo)
    ai = _bdot(xb, w1i_hi) + _bdot(xb, w1i_lo)
    br_scr[...] = ar * twr - ai * twi
    bi_scr[...] = ar * twi + ai * twr

    sgn = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0) < LANE // 2,
        jnp.float32(-1.0), jnp.float32(1.0))

    def body(b, _):
        bb_r = br_scr[pl.ds(b * LANE, LANE), :]
        bb_i = bi_scr[pl.ds(b * LANE, LANE), :]
        rh, rl = _split(bb_r)
        ih, il = _split(bb_i)
        dbr = (_bdot00(w2c_hi, rh) + _bdot00(w2c_hi, rl)
               + _bdot00(w2c_lo, rh))
        dbi = (_bdot00(w2c_hi, ih) + _bdot00(w2c_hi, il)
               + _bdot00(w2c_lo, ih))
        z = dbr + sgn * pltpu.roll(dbi, LANE // 2, 0)
        z = z * z
        z = z + pltpu.roll(z, LANE // 2, 0)
        emit(b, jax.lax.slice(z, (0, 0), (LANE // 2, LANE)))
        return 0

    jax.lax.fori_loop(0, nb, body, 0)


def _stageA_kernel(u_ref, w1rh_ref, w1rl_ref, w1ih_ref, w1il_ref,
                   twr_ref, twi_ref, w2ch_ref, w2cl_ref, out_ref,
                   br_scr, bi_scr, *, nb: int):
    """One segment: u8 convert -> DFT -> detect, power planes out."""
    ui = u_ref[0].astype(jnp.int32)
    x = ui.astype(jnp.float32) * (1.0 / 128.0) - 1.0
    x = jnp.where(ui == 0, 0.0, x)

    def emit(b, p):
        out_ref[0, pl.ds(b, 1)] = p[None]

    _dft_detect_body(
        x, _b(w1rh_ref[...]), _b(w1rl_ref[...]),
        _b(w1ih_ref[...]), _b(w1il_ref[...]),
        twr_ref[...], twi_ref[...],
        _b(w2ch_ref[...]), _b(w2cl_ref[...]),
        br_scr, bi_scr, emit, nb=nb)


@functools.partial(jax.jit, static_argnames=("nfft", "npol",
                                             "seg_per_sec"))
def dft_detect_power(raw: jax.Array, nfft: int, npol: int,
                     seg_per_sec: int) -> jax.Array:
    """Stage-A entry: (npol, nsamp) uint8 -> (nseg, nb, 64, 128) f32
    power planes, factored (k2, k1); linear channel k = k1 + n1*k2.

    Oracle equivalent (up to f32 accumulation order):
    norm_ops.detect(channelize(convert(raw), precision='high',
    exact_bf16_input=True)) refactored to (k2, k1).
    """
    npol_, nsamp = raw.shape
    seg_samps = nsamp // seg_per_sec
    ffts = seg_samps // nfft
    nb = npol * ffts
    pl_ = dft_planes(nfft, nb)
    xs = pretranspose_u8(raw, nfft, npol, seg_per_sec)
    const = lambda i: (0, 0)
    out = pl.pallas_call(
        functools.partial(_stageA_kernel, nb=nb),
        grid=(seg_per_sec,),
        in_specs=[
            pl.BlockSpec((1, nb * LANE, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
        ],
        out_specs=pl.BlockSpec((1, nb, LANE // 2, LANE),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (seg_per_sec, nb, LANE // 2, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nb * LANE, LANE), jnp.float32),
                        pltpu.VMEM((nb * LANE, LANE), jnp.float32)],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs, *(jnp.asarray(p) for p in pl_[:8]))
    return out


# ---------------------------------------------------------------------------
# Stage B: EMA normalize + pscrunch + tscrunch + quantize + pack in VMEM
# ---------------------------------------------------------------------------
#
# The back half of the chain (ops/normalize + ops/quantize; ref
# src/pb_kernels.cu:393-735) runs on the power planes while they are
# still in VMEM:
#
# * the EMA bandpass (one (64,128) factored plane per pol) is carried in
#   scratch ACROSS grid steps (segments) — sequential-exact semantics,
#   seeded per segment from the segment mean where bp==0, identical to
#   the reference's per-chunk seeding (pb_kernels.cu:406-411);
# * pscrunch and tscrunch happen in the same t loop (nested fori:
#   out-sample x nscrunch), so no normalized plane is ever materialized;
# * the 2-bit quantize is three compares; the byte PACK is one
#   (64,128)@(128,32) dot against a constant 4^(k1%4) selector — exact
#   in f32 (values <= 255) — emitting bytes STILL in the factored
#   (k2, byte-in-row) layout.  unfactor_pack_realign() outside turns
#   the (nout, 64, 32) planes into the chain's trimmed byte rows with
#   two u8 shifts (chanmin % 4 realignment); it touches ~6 KB/segment.


def _pack_matrix(n1: int, nbit: int = 2) -> np.ndarray:
    """(128, 32) selector: column j sums lanes 4j..4j+3 scaled 4^(k%4)."""
    per = 8 // nbit
    m = np.zeros((LANE, 32), np.float32)
    for k1 in range(n1):
        m[k1, k1 // per] = float((1 << nbit) ** (k1 % per))
    return m


def _mk_stageB_kernel(u_ref, w1rh_ref, w1rl_ref, w1ih_ref, w1il_ref,
                      twr_ref, twi_ref, w2ch_ref, w2cl_ref, packm_ref,
                      bp_in_ref, out_ref, bp_out_ref,
                      br_scr, bi_scr, pwr_scr, bp_scr, *,
                      nb: int, npol: int, nscrunch: int, nseg: int,
                      scale: float, q0: float, q1: float, q2: float):
    """One segment: convert -> DFT -> detect -> EMA -> pscrunch ->
    tscrunch -> quantize -> pack, plain (unweighted) stream."""
    i = pl.program_id(0)
    tpp = nb // npol                       # spectra per pol per segment
    nout = tpp // nscrunch

    ui = u_ref[0].astype(jnp.int32)
    x = ui.astype(jnp.float32) * (1.0 / 128.0) - 1.0
    x = jnp.where(ui == 0, 0.0, x)

    def emit(b, p):
        pwr_scr[pl.ds(b, 1)] = p[None]

    _dft_detect_body(
        x, _b(w1rh_ref[...]), _b(w1rl_ref[...]),
        _b(w1ih_ref[...]), _b(w1il_ref[...]),
        twr_ref[...], twi_ref[...],
        _b(w2ch_ref[...]), _b(w2cl_ref[...]),
        br_scr, bi_scr, emit, nb=nb)

    # ---- EMA: seed where bp == 0 from this segment's per-pol mean ----
    def seg_mean(p):
        def body(t, acc):
            return acc + pwr_scr[pl.ds(p * tpp + t, 1)][0]
        s = jax.lax.fori_loop(0, tpp, body,
                              jnp.zeros((LANE // 2, LANE), jnp.float32))
        return s * (1.0 / tpp)

    def bp_for(p):
        carried = bp_scr[pl.ds(p, 1)][0]
        fresh = bp_in_ref[pl.ds(p, 1)][0]
        bp = jnp.where(i == 0, fresh, carried)
        seed = seg_mean(p)
        seed = jnp.where(seed == 0.0, 1.0, seed)
        return jnp.where(bp == 0.0, seed, bp)

    bp0 = bp_for(0)
    bp1 = bp_for(1) if npol == 2 else bp0

    rs = jnp.float32(1.0 / np.sqrt(nscrunch))
    ps = jnp.float32(np.sqrt(0.5))

    def out_body(o, carry):
        b0, b1 = carry

        def sub_body(t, c):
            b0, b1, acc = c
            tt = o * nscrunch + t
            p0 = pwr_scr[pl.ds(tt, 1)][0]
            b0n = scale * p0 + (1.0 - scale) * b0
            v = p0 / b0n - 1.0
            if npol == 2:
                p1 = pwr_scr[pl.ds(tpp + tt, 1)][0]
                b1n = scale * p1 + (1.0 - scale) * b1
                v = ps * (v + (p1 / b1n - 1.0))
            else:
                b1n = b1
            return b0n, b1n, acc + v

        b0, b1, acc = jax.lax.fori_loop(
            0, nscrunch, sub_body,
            (b0, b1, jnp.zeros((LANE // 2, LANE), jnp.float32)))
        ts = acc * rs
        lev = ((ts >= q0).astype(jnp.float32)
               + (ts >= q1).astype(jnp.float32)
               + (ts >= q2).astype(jnp.float32))
        packed = jax.lax.dot_general(
            lev, packm_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, pl.ds(o, 1)] = packed[None]
        return b0, b1

    bp0, bp1 = jax.lax.fori_loop(0, nout, out_body, (bp0, bp1))
    bp_scr[pl.ds(0, 1)] = bp0[None]
    if npol == 2:
        bp_scr[pl.ds(1, 1)] = bp1[None]

    @pl.when(i == nseg - 1)
    def _():
        bp_out_ref[pl.ds(0, 1)] = bp0[None]
        if npol == 2:
            bp_out_ref[pl.ds(1, 1)] = bp1[None]


@functools.partial(jax.jit, static_argnames=("nfft", "npol",
                                             "seg_per_sec", "nscrunch",
                                             "scale"))
def chain_second_plain(raw: jax.Array, bp_fact: jax.Array, nfft: int,
                       npol: int, seg_per_sec: int, nscrunch: int,
                       scale: float) -> tuple[jax.Array, jax.Array]:
    """Stage-B entry: one second, plain (rfi_mode=0-equivalent) stream.

    raw: (npol, nsamp) uint8; bp_fact: (npol, 64, 128) FACTORED bandpass
    carry (see bp_to_factored).  Returns (packed planes
    (nseg, nout, 64, 32) f32 byte values, new bp_fact).
    """
    from vlite_fast_tpu import constants as C
    npol_, nsamp = raw.shape
    seg_samps = nsamp // seg_per_sec
    ffts = seg_samps // nfft
    nb = npol * ffts
    nout = ffts // nscrunch
    pl_ = dft_planes(nfft, nb)
    packm = _pack_matrix(pl_.n1)
    xs = pretranspose_u8(raw, nfft, npol, seg_per_sec)
    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    q0, q1, q2 = C.QUANT2_THRESH
    out, bp_new = pl.pallas_call(
        functools.partial(
            _mk_stageB_kernel, nb=nb, npol=npol, nscrunch=nscrunch,
            nseg=seg_per_sec, scale=float(scale),
            q0=float(q0), q1=float(q1), q2=float(q2)),
        grid=(seg_per_sec,),
        in_specs=[
            pl.BlockSpec((1, nb * LANE, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, 32), const),
            pl.BlockSpec((npol, LANE // 2, LANE), const3),
        ],
        out_specs=[
            pl.BlockSpec((1, nout, LANE // 2, 32),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((npol, LANE // 2, LANE), const3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seg_per_sec, nout, LANE // 2, 32),
                                 jnp.float32),
            jax.ShapeDtypeStruct((npol, LANE // 2, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),
            pltpu.VMEM((nb, LANE // 2, LANE), jnp.float32),
            pltpu.VMEM((npol, LANE // 2, LANE), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs, *(jnp.asarray(p) for p in pl_[:8]), jnp.asarray(packm),
      bp_fact)
    return out, bp_new


def bp_to_factored(bp: jax.Array, nfft: int) -> jax.Array:
    """(npol, nchan) linear bandpass -> (npol, 64, 128) factored (k2, k1)
    plane (k = k1 + n1*k2); pad entries get 1.0 (EMA-divide-safe)."""
    n1, _ = ch_ops._ct_split(nfft)
    npol, nchan = bp.shape
    n2o = nfft // 2 // n1 + 1
    flat = jnp.concatenate(
        [bp, jnp.full((npol, n2o * n1 - nchan), 1.0, bp.dtype)], axis=1)
    f = flat.reshape(npol, n2o, n1)
    f = jnp.pad(f, ((0, 0), (0, LANE // 2 - n2o), (0, LANE - n1)),
                constant_values=1.0)
    return f


def bp_from_factored(bpf: jax.Array, nfft: int, nchan: int) -> jax.Array:
    """Inverse of bp_to_factored."""
    n1, _ = ch_ops._ct_split(nfft)
    n2o = nfft // 2 // n1 + 1
    return bpf[:, :n2o, :n1].reshape(bpf.shape[0], -1)[:, :nchan]


def unfactor_pack_realign(planes: jax.Array, nfft: int, chanmin: int,
                          chanmax: int, nbit: int = 2) -> jax.Array:
    """(nseg, nout, 64, 32) f32 packed byte planes -> (nseg*nout,
    nbytes_out) uint8 rows in the chain's sel_and_dig layout.

    Two vectorized u8 shifts realign the channel-trim offset
    (chanmin % samples-per-byte); touches only the packed bytes
    (~6 KB/segment), never the unpacked levels.
    """
    n1, _ = ch_ops._ct_split(nfft)
    per = 8 // nbit
    bpr = n1 // per                     # bytes per k2 row
    nseg, nout, half, _ = planes.shape
    b = planes[:, :, :, :bpr].astype(jnp.int32)
    b = b.reshape(nseg * nout, half * bpr)   # linear channel-byte order
    lo = chanmin // per
    r = chanmin % per
    if r == 0:
        out = b[:, lo:chanmax // per + 1]
    else:
        sh = nbit * r
        cur = b[:, lo:lo + (chanmax - chanmin + 1) // per]
        nxt = b[:, lo + 1:lo + 1 + (chanmax - chanmin + 1) // per]
        out = ((cur >> sh) | (nxt << (8 - sh))) & 0xFF
    return out.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Stage C: the RFI front + weighted (kurtosis) stream — full dual-stream
# chain in one launch (rfi_mode 0/1/2)
# ---------------------------------------------------------------------------
#
# The kurtosis window structure maps onto the kernel layout without any
# relayout: window w of an fft block = m1 lanes [rw*w, rw*(w+1)) x all
# m2 sublanes of that block (rw = nkurto // n2, whole m1-rows per
# window — the framed-front divisibility rule, models/baseband_dsp.py
# use_framed_front).  So the window moments are
#   (a) a per-block sublane reduction  — reshape (nb,128,128).sum(1),
#   (b) a lane-group sum               — one (64,128)@(128,32) dot
# and the D'Agostino gates / block stats run on tiny (64, 32) planes
# (windows on lanes, b on sublanes; pol-combined max = one sublane
# roll).  The mask expands back with one (64,32)@(32,128) dot + a
# sublane broadcast — matmuls with constant 0/1 selectors instead of
# the reference's per-thread scatter (ref src/pb_kernels.cu:35-318).
#
# The weighted EMA / pscrunch_weights / tscrunch_weights semantics are
# detect_and_normalize3 + the weighted scrunches (pb_kernels.cu:431-630)
# with per-(pol,t) scalar weights read back from a (64,1) VMEM scratch.


def _group_matrices(n1: int, rw: int) -> tuple[np.ndarray, np.ndarray]:
    """(G4 (128, 32), E (32, 128)): lane-group sum and its expansion.
    G4[m1, m1//rw] = 1 for m1 < n1;  E[w, m1] = 1 iff m1//rw == w."""
    nw = n1 // rw
    g4 = np.zeros((LANE, 32), np.float32)
    e = np.zeros((32, LANE), np.float32)
    for m1 in range(n1):
        g4[m1, m1 // rw] = 1.0
        e[m1 // rw, m1] = 1.0
    if nw > 32:
        raise ValueError(f"windows per block {nw} > 32")
    return g4, e


def _hdot(a, b):
    """Exact-f32 dot (HIGHEST precision) contracting a.dim1 x b.dim0."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _bc2f(v):
    """float (1, 1) -> (LANE//2, LANE): lane broadcast, then a
    pltpu.repeat over sublanes.  A single (1,1)->(64,128)
    broadcast_in_dim is 'Broadcast in both sublanes and lanes' —
    unimplemented in the Mosaic TPU backend — and two chained
    broadcast_in_dims canonicalize back into one, so the sublane step
    must be an op the folder cannot merge."""
    row = jax.lax.broadcast_in_dim(v, (1, LANE), (0, 1))
    if _interpret():
        return jnp.broadcast_to(row, (LANE // 2, LANE))
    return pltpu.repeat(row, LANE // 2, 0)


def _bc2b(v):
    """bool (1, 1) -> (LANE//2, LANE) via the float two-step path
    (i1-vector broadcasts are flakier than f32 in Mosaic)."""
    return _bc2f(v.astype(jnp.float32)) > 0.0


def _full_kernel(u_ref, w1rh_ref, w1rl_ref, w1ih_ref, w1il_ref,
                 twr_ref, twi_ref, w2ch_ref, w2cl_ref, packm_ref,
                 g4_ref, e_ref, bp_in_ref,
                 outp_ref, outk_ref, w_ref, dag_ref, bp_out_ref,
                 br_scr, bi_scr, pwra_scr, pwrb_scr, bp_scr, w_scr, *,
                 nb: int, npol: int, nscrunch: int, nseg: int, nw: int,
                 rfi_mode: int, scale: float,
                 q0: float, q1: float, q2: float,
                 dag_thresh: float, dag_fb_thresh: float, dag_inf: float,
                 kf: dict, kb: dict, clip_ratio: float, clip_value: float,
                 min_weight: float):
    """One segment of the full chain (see module comment)."""
    from vlite_fast_tpu.ops.rfi_pallas import _ts

    i = pl.program_id(0)
    tpp = nb // npol
    nout = tpp // nscrunch
    has_plain = rfi_mode != 1
    has_kur = rfi_mode != 0

    if u_ref.dtype == jnp.uint8:
        ui = u_ref[0].astype(jnp.int32)
        x = ui.astype(jnp.float32) * (1.0 / 128.0) - 1.0
        x = jnp.where(ui == 0, 0.0, x)
    else:
        # pallas_pretranspose(out_dtype=bf16) already converted and
        # zero-flagged; voltages k/128 - 1 are bf16-exact, so this is
        # byte-identical to the u8 phase 0
        x = u_ref[0].astype(jnp.float32)

    consts = (_b(w1rh_ref[...]), _b(w1rl_ref[...]),
              _b(w1ih_ref[...]), _b(w1il_ref[...]),
              twr_ref[...], twi_ref[...],
              _b(w2ch_ref[...]), _b(w2cl_ref[...]))

    # ---- RFI front: window moments -> gates -> weights -> mask -------
    if has_kur:
        x2 = x * x
        s2 = x2.reshape(nb, LANE, LANE).sum(axis=1)        # (nb, 128)
        s4 = (x2 * x2).reshape(nb, LANE, LANE).sum(axis=1)
        g4 = g4_ref[...]
        nsamp_w = jnp.float32(1.0)  # per-window sample count via rw*n2:
        # every window sums rw m1-lanes x n2 live sublanes; zeros from
        # the m2/m1 padding do not perturb the sums, and the divisor is
        # the true nkurto (passed via kf['nkurto'])
        inv_n = jnp.float32(1.0 / kf["n"])
        m2 = _hdot(s2, g4) * inv_n                         # (nb, 32)
        m4 = _hdot(s4, g4) * inv_n
        kur = jnp.where(m2 == 0.0, 0.0,
                        m4 / jnp.where(m2 == 0.0, 1.0, m2 * m2))
        ts = _ts(kur, kf, dag_inf)
        dag = jnp.maximum(ts, pltpu.roll(ts, tpp, 0)) if npol == 2 else ts
        fine_good = dag < dag_thresh
        lane_ok = jax.lax.broadcasted_iota(jnp.int32, (nb, 32), 1) < nw
        fine_good = jnp.logical_and(fine_good, lane_ok)
        if dag_fb_thresh > 0:
            wt = fine_good.astype(jnp.float32)
            wsum = jnp.sum(wt, axis=1, keepdims=True)      # (nb, 1)
            psum = jnp.sum(wt * m2, axis=1, keepdims=True)
            qsum = jnp.sum(wt * kur * m2 * m2, axis=1, keepdims=True)
            good_b = wsum > 0
            pblk = jnp.where(good_b,
                             psum / jnp.where(good_b, wsum, 1.0), 0.0)
            kblk = jnp.where(good_b,
                             qsum / jnp.where(good_b, wsum, 1.0)
                             / jnp.where(good_b, pblk * pblk, 1.0), 0.0)
            tsb = _ts(kblk, kb, dag_inf)
            dfb = jnp.maximum(tsb, pltpu.roll(tsb, tpp, 0)) \
                if npol == 2 else tsb
            gate = jnp.logical_and(fine_good, dfb < dag_fb_thresh)
        else:
            gate = fine_good
        g = gate.astype(jnp.float32)
        w_col = jnp.sum(g, axis=1, keepdims=True) * (1.0 / nw)
        w_scr[...] = w_col
        w_ref[0] = w_col
        dflag = jnp.where(lane_ok,
                          (dag >= dag_thresh).astype(jnp.float32), 0.0)
        dfrac = jnp.sum(
            jnp.sum(dflag, axis=1, keepdims=True), axis=0,
            keepdims=True) * (1.0 / (nw * nb))
        # (1, 1, LANE) broadcast: the dag output block must keep its
        # last-two dims equal to the array's (Mosaic tiling rule); the
        # wrapper reads lane 0
        dag_ref[...] = jnp.broadcast_to(dfrac[None], (1, 1, LANE))
        gm = _hdot(g, e_ref[...])                          # (nb, 128) 0/1
        mask = jnp.broadcast_to(gm[:, None, :],
                                (nb, LANE, LANE)).reshape(nb * LANE, LANE)
        x_kur = x * mask
    else:
        w_ref[0] = jnp.ones((nb, 1), jnp.float32)
        dag_ref[...] = jnp.zeros((1, 1, LANE), jnp.float32)

    # ---- DFT + detect into per-stream power scratch -------------------
    if has_plain:
        def emit_a(b, p):
            pwra_scr[pl.ds(b, 1)] = p[None]
        _dft_detect_body(x, *consts, br_scr, bi_scr, emit_a, nb=nb)
    if has_kur:
        def emit_b(b, p):
            pwrb_scr[pl.ds(b, 1)] = p[None]
        _dft_detect_body(x_kur, *consts, br_scr, bi_scr, emit_b, nb=nb)

    packm = packm_ref[...]
    rs = jnp.float32(1.0 / np.sqrt(nscrunch))
    ps = jnp.float32(np.sqrt(0.5))

    def quant_pack(ts_plane):
        lev = ((ts_plane >= q0).astype(jnp.float32)
               + (ts_plane >= q1).astype(jnp.float32)
               + (ts_plane >= q2).astype(jnp.float32))
        return jax.lax.dot_general(
            lev, packm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def load_bp(slot):
        carried = bp_scr[pl.ds(slot, 1)][0]
        fresh = bp_in_ref[pl.ds(slot, 1)][0]
        return jnp.where(i == 0, fresh, carried)

    # ---- plain stream: EMA + pscrunch + tscrunch + pack ---------------
    if has_plain:
        def seg_mean(p):
            def body(t, acc):
                return acc + pwra_scr[pl.ds(p * tpp + t, 1)][0]
            s = jax.lax.fori_loop(
                0, tpp, body, jnp.zeros((LANE // 2, LANE), jnp.float32))
            return s * (1.0 / tpp)

        def bp_for(p):
            bp = load_bp(p)
            seed = seg_mean(p)
            seed = jnp.where(seed == 0.0, 1.0, seed)
            return jnp.where(bp == 0.0, seed, bp)

        bp0 = bp_for(0)
        bp1 = bp_for(1) if npol == 2 else bp0

        def out_body(o, carry):
            b0, b1 = carry

            def sub(t, c):
                b0, b1, acc = c
                tt = o * nscrunch + t
                p0 = pwra_scr[pl.ds(tt, 1)][0]
                b0n = scale * p0 + (1.0 - scale) * b0
                v = p0 / b0n - 1.0
                if npol == 2:
                    p1 = pwra_scr[pl.ds(tpp + tt, 1)][0]
                    b1n = scale * p1 + (1.0 - scale) * b1
                    v = ps * (v + (p1 / b1n - 1.0))
                else:
                    b1n = b1
                return b0n, b1n, acc + v

            b0, b1, acc = jax.lax.fori_loop(
                0, nscrunch, sub,
                (b0, b1, jnp.zeros((LANE // 2, LANE), jnp.float32)))
            outp_ref[0, pl.ds(o, 1)] = quant_pack(acc * rs)[None]
            return b0, b1

        bp0, bp1 = jax.lax.fori_loop(0, nout, out_body, (bp0, bp1))
        bp_scr[pl.ds(0, 1)] = bp0[None]
        if npol == 2:
            bp_scr[pl.ds(1, 1)] = bp1[None]

    # ---- kurtosis stream: weighted EMA + weighted scrunches + pack ----
    if has_kur:
        koff = npol          # bp slots [npol, 2*npol) hold the kur carry

        def kseed(p):
            def body(t, c):
                s, ng = c
                w = w_scr[pl.ds(p * tpp + t, 1)]           # (1, 1)
                gsc = (w > 0.0).astype(jnp.float32)
                # gated 1/w as a (1,1) value, broadcast in two legal
                # steps (zero when the window is fully flagged, so the
                # gsc factor is already folded in)
                inv = jnp.where(w > 0.0,
                                1.0 / jnp.where(w > 0.0, w, 1.0), 0.0)
                pw = pwrb_scr[pl.ds(p * tpp + t, 1)][0] * _bc2f(inv)
                return s + pw, ng + gsc
            s, ng = jax.lax.fori_loop(
                0, tpp, body,
                (jnp.zeros((LANE // 2, LANE), jnp.float32),
                 jnp.zeros((1, 1), jnp.float32)))
            seed = jnp.where(_bc2b(ng > 0),
                             s * _bc2f(1.0 / jnp.maximum(ng, 1.0)), 1.0)
            return seed, ng

        def kbp_for(p):
            bp = load_bp(koff + p)
            seed, ng = kseed(p)
            bp = jnp.where(bp == 0.0, seed, bp)
            stale = jnp.logical_and(
                _bc2b(ng > 0),
                jnp.logical_or(seed > 5.0 * bp, seed < 0.2 * bp))
            return jnp.where(stale, seed, bp)

        kb0 = kbp_for(0)
        kb1 = kbp_for(1) if npol == 2 else kb0

        def kema_step(bp, p, w):
            """detect_and_normalize3 one step: returns (bp', v)."""
            gok = w > 0.0                                  # (1, 1)
            inv = jnp.where(gok, 1.0 / jnp.where(gok, w, 1.0), 0.0)
            gokp = _bc2b(gok)                              # (64, 128)
            pw = p * _bc2f(inv)             # zero when the gate is off
            clipped = pw > clip_ratio * bp
            update = jnp.logical_and(gokp, jnp.logical_not(clipped))
            bpn = jnp.where(update, scale * pw + (1.0 - scale) * bp, bp)
            v = jnp.where(gokp,
                          jnp.where(clipped, clip_value, pw / bpn - 1.0),
                          0.0)
            return bpn, v

        def kout_body(o, carry):
            b0, b1 = carry

            def sub(t, c):
                b0, b1, acc, cnt, wsum = c
                tt = o * nscrunch + t
                w0 = w_scr[pl.ds(tt, 1)]
                b0n, v0 = kema_step(b0, pwrb_scr[pl.ds(tt, 1)][0], w0)
                if npol == 2:
                    w1 = w_scr[pl.ds(tpp + tt, 1)]
                    b1n, v1 = kema_step(b1, pwrb_scr[pl.ds(tpp + tt, 1)][0],
                                        w1)
                    g0 = w0 >= min_weight
                    g1 = w1 >= min_weight
                    both = jnp.logical_and(g0, g1)
                    v = jnp.where(_bc2b(both), ps * (v0 + v1),
                                  v0 * _bc2f(g0.astype(jnp.float32))
                                  + v1 * _bc2f(g1.astype(jnp.float32)))
                    wp = jnp.where(both, 0.5 * (w0 + w1),
                                   w0 * g0.astype(jnp.float32)
                                   + w1 * g1.astype(jnp.float32))
                else:
                    b1n, v, wp = b1, v0, w0
                # tscrunch_weights accumulation (pb_kernels.cu:591-630)
                gt = (wp >= min_weight).astype(jnp.float32)   # (1, 1)
                wg = wp * gt
                return (b0n, b1n, acc + _bc2f(wg) * v, cnt + gt,
                        wsum + wg)

            z = jnp.zeros((1, 1), jnp.float32)
            b0, b1, acc, cnt, wsum = jax.lax.fori_loop(
                0, nscrunch, sub,
                (b0, b1, jnp.zeros((LANE // 2, LANE), jnp.float32), z, z))
            ok = (wsum * (1.0 / nscrunch)) >= min_weight   # (1, 1)
            ts_plane = jnp.where(
                _bc2b(ok),
                acc * _bc2f(1.0 / jnp.sqrt(jnp.maximum(cnt, 1.0))), 0.0)
            outk_ref[0, pl.ds(o, 1)] = quant_pack(ts_plane)[None]
            return b0, b1

        kb0, kb1 = jax.lax.fori_loop(0, nout, kout_body, (kb0, kb1))
        bp_scr[pl.ds(koff, 1)] = kb0[None]
        if npol == 2:
            bp_scr[pl.ds(koff + 1, 1)] = kb1[None]

    @pl.when(i == nseg - 1)
    def _():
        bp_out_ref[...] = bp_scr[...]


@functools.partial(jax.jit, static_argnames=(
    "nfft", "npol", "seg_per_sec", "nscrunch", "nkurto", "rfi_mode",
    "scale", "dag_thresh", "dag_fb_thresh", "pretranspose"))
def chain_second(raw: jax.Array, bp_fact: jax.Array, nfft: int,
                 npol: int, seg_per_sec: int, nscrunch: int,
                 nkurto: int, rfi_mode: int, scale: float,
                 dag_thresh: float, dag_fb_thresh: float,
                 pretranspose: str = "xla"):
    """Full-chain megakernel: one second, rfi_mode 0/1/2.

    raw: (npol, nsamp) uint8.  bp_fact: (2*npol, 64, 128) factored
    bandpass carries — slots [0, npol) plain stream, [npol, 2*npol)
    kurtosis stream (see bp_to_factored).

    pretranspose: 'xla' (the ~18 ms/data-s XLA u8 relayout), 'pallas'
    (MXU identity-dot relayout, u8 blocks — byte-identical input), or
    'pallas_bf16' (same, shipping converted bf16 voltages so the main
    kernel skips phase 0).  All three produce byte-identical outputs.

    Returns (plain planes (nseg, nout, 64, 32) f32, kur planes same,
    weights (nseg, nb, 1) f32 — rows are b = pol*ffts + t, identical
    across pol halves — dag_frac (nseg, 1), new bp_fact).
    """
    from vlite_fast_tpu import constants as C
    npol_, nsamp = raw.shape
    seg_samps = nsamp // seg_per_sec
    ffts = seg_samps // nfft
    nb = npol * ffts
    nout = ffts // nscrunch
    pl_ = dft_planes(nfft, nb)
    n1, n2 = pl_.n1, pl_.n2
    if nkurto % n2 or nfft % nkurto:
        raise ValueError("megakernel needs nkurto % n2 == 0 (framed rule)")
    rw = nkurto // n2
    nw = n1 // rw
    g4m, em = _group_matrices(n1, rw)
    kf = dict(C.dagostino_constants(nkurto))
    kf["n"] = float(nkurto)
    kb = dict(C.dagostino_constants(nfft))
    packm = _pack_matrix(n1)
    if pretranspose == "xla":
        xs = pretranspose_u8(raw, nfft, npol, seg_per_sec)
    else:
        odt = jnp.bfloat16 if pretranspose == "pallas_bf16" else jnp.uint8
        xs = pallas_pretranspose(raw, nfft, npol, seg_per_sec,
                                 out_dtype=odt)
    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    q0, q1, q2 = C.QUANT2_THRESH
    outs = pl.pallas_call(
        functools.partial(
            _full_kernel, nb=nb, npol=npol, nscrunch=nscrunch,
            nseg=seg_per_sec, nw=nw, rfi_mode=rfi_mode,
            scale=float(scale), q0=float(q0), q1=float(q1), q2=float(q2),
            dag_thresh=float(dag_thresh),
            dag_fb_thresh=float(dag_fb_thresh),
            dag_inf=float(C.DAG_INF), kf=kf, kb=kb,
            clip_ratio=float(C.BP_CLIP_RATIO),
            clip_value=float(C.BP_CLIP_VALUE),
            min_weight=float(C.MIN_WEIGHT)),
        grid=(seg_per_sec,),
        in_specs=[
            pl.BlockSpec((1, nb * LANE, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, 32), const),
            pl.BlockSpec((LANE, 32), const),
            pl.BlockSpec((32, LANE), const),
            pl.BlockSpec((2 * npol, LANE // 2, LANE), const3),
        ],
        out_specs=[
            pl.BlockSpec((1, nout, LANE // 2, 32),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nout, LANE // 2, 32),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nb, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((2 * npol, LANE // 2, LANE), const3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seg_per_sec, nout, LANE // 2, 32),
                                 jnp.float32),
            jax.ShapeDtypeStruct((seg_per_sec, nout, LANE // 2, 32),
                                 jnp.float32),
            jax.ShapeDtypeStruct((seg_per_sec, nb, 1), jnp.float32),
            jax.ShapeDtypeStruct((seg_per_sec, 1, LANE), jnp.float32),
            jax.ShapeDtypeStruct((2 * npol, LANE // 2, LANE),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),
            pltpu.VMEM((nb, LANE // 2, LANE), jnp.float32),
            pltpu.VMEM((nb, LANE // 2, LANE), jnp.float32),
            pltpu.VMEM((2 * npol, LANE // 2, LANE), jnp.float32),
            pltpu.VMEM((nb, 1), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs, *(jnp.asarray(p) for p in pl_[:8]), jnp.asarray(packm),
      jnp.asarray(g4m), jnp.asarray(em), bp_fact)
    pp, kk, w, dag3, bp_new = outs
    return pp, kk, w, dag3[:, 0, :1], bp_new


def dft_detect_oracle(raw: np.ndarray, nfft: int, npol: int,
                      seg_per_sec: int) -> np.ndarray:
    """Explicit bf16-emulation oracle of dft_detect_power (plain jnp,
    same math and padding; dot order may differ by backend — compare
    with a small relative tolerance)."""
    npol_, nsamp = raw.shape
    seg_samps = nsamp // seg_per_sec
    ffts = seg_samps // nfft
    nb = npol * ffts
    pl_ = dft_planes(nfft, nb)
    xs = pretranspose_u8(jnp.asarray(raw), nfft, npol, seg_per_sec)
    ui = xs.astype(jnp.int32)
    x = ui.astype(jnp.float32) * (1.0 / 128.0) - 1.0
    x = _b(jnp.where(ui == 0, 0.0, x))
    f32 = lambda m: jnp.asarray(m)
    bf = lambda m: _b(jnp.asarray(m))
    dot = lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ar = dot(x, bf(pl_.w1r_hi)) + dot(x, bf(pl_.w1r_lo))
    ai = dot(x, bf(pl_.w1i_hi)) + dot(x, bf(pl_.w1i_lo))
    br = ar * f32(pl_.twr)[None]
    br = br - ai * f32(pl_.twi)[None]
    bi = ar * f32(pl_.twi)[None] + ai * f32(pl_.twr)[None]
    nseg = xs.shape[0]
    br = br.reshape(nseg, nb, LANE, LANE)
    bi = bi.reshape(nseg, nb, LANE, LANE)

    def hl(v):
        hi = v.astype(jnp.bfloat16)
        return (_b(hi.astype(jnp.float32)),
                _b(v - hi.astype(jnp.float32)))

    w2h, w2l = bf(pl_.w2c_hi), bf(pl_.w2c_lo)
    dot2 = lambda w, b: jax.lax.dot_general(
        w, b, (((0,), (2,)), ((), ())),
        preferred_element_type=jnp.float32)   # (j, nseg, nb, k1)
    rh, rl = hl(br)
    ih, il = hl(bi)
    dbr = dot2(w2h, rh) + dot2(w2h, rl) + dot2(w2l, rh)
    dbi = dot2(w2h, ih) + dot2(w2h, il) + dot2(w2l, ih)
    dbr = jnp.moveaxis(dbr, 0, -2)            # (nseg, nb, j, k1)
    dbi = jnp.moveaxis(dbi, 0, -2)
    pr = dbr[:, :, :LANE // 2] - dbi[:, :, LANE // 2:]
    pi = dbr[:, :, LANE // 2:] + dbi[:, :, :LANE // 2]
    return np.asarray(pr * pr + pi * pi)


# ---------------------------------------------------------------------------
# Natural-layout megakernel (round 5): the pretranspose is the wall
# ---------------------------------------------------------------------------
#
# The kernel above is fed by an XLA u8 pretranspose that measures
# 17.9 ms/data-second on chip — as long as the whole kernel's compute —
# and the sweep in benchmarks/bench_pretranspose_tpu.py shows EVERY XLA
# formulation of the relayout (pad-only included) costs ~18 ms: XLA u8
# data movement runs ~30x off HBM speed of light here.  So this variant
# eliminates the prologue entirely by running the SAME Cooley-Tukey
# factorization in the array's NATURAL layout:
#
#   raw (npol, nsamp) --free reshape--> (npol, nseg, ffts*P, Q)
#   frame sample n = p*Q + q,  P, Q = _ct_split(nfft) = (100, 125)
#
#   X[kA + P*kB] = sum_q W_N^{q kA} W_Q^{q kB} S[kA, q]
#   S[kA, q]     = sum_p W_P[p, kA] x[p, q]
#
# identical math to the kernel above (kA = k1, kB = k2, same w1/w2c
# constant matrices, twiddle un-tiled) with the two MXU stages' roles
# SWAPPED: stage 1 is now a per-frame aT.b dot contracting the sublane
# dim (4 small (128,128) dots per frame per stream), while stage 2 —
# previously 6 small dots per frame — becomes 6 BIG (nb*128, 128) dots
# per stream for the whole segment.  Net per segment: 512 small + 12 big
# dots (vs 768 small + 8 big + the 18 ms XLA prologue).
#
# Every downstream plane is the TRANSPOSE of the old kernel's: power
# planes (kA, kB) = (128, 64)-shaped instead of (64, 128), packed byte
# planes (g, kB) with byte c = g + (P/4)*kB — the identical byte
# semantics, so bp_to_factored / unfactor_pack_realign are reused via a
# single tiny swapaxes.
#
# RFI front in this layout: a kurtosis window is rw = nkurto/Q
# CONSECUTIVE p-rows x all q lanes.  Window moments come from rw-1
# sublane roll-adds (valid at rw-aligned rows), the D'Agostino gates run
# on (128, 1) columns (garbage at unaligned rows, masked off), the
# dual-pol pairing is a max of the two pols' columns inside the same
# t-iteration, and the per-row mask is a log2(rw)-step roll forward-fill
# — no gather, no transpose, no group matrices.
#
# Ref: same role as above (src/process_baseband.cu:1108-1360).


def natural_blocks(raw: jax.Array, nfft: int, npol: int,
                   seg_per_sec: int) -> jax.Array:
    """(npol, nsamp) u8 -> (npol, nseg, ffts*P, Q): a FREE row-major
    reshape (no transpose, no pad — the whole point of this variant)."""
    P, Q = ch_ops._ct_split(nfft)
    return raw.reshape(npol, seg_per_sec, -1, Q)


class DFTPlanesV2(NamedTuple):
    w1cat: np.ndarray    # (128, 512) stage-1 planes [p, kA] packed
                         # [re_hi | re_lo | im_hi | im_lo] so the four
                         # bf16 passes per frame are ONE MXU dot (the
                         # 256-small-dots/segment stage-1 measured
                         # 216 ns/dot; lane-concatenation quarters the
                         # op count at identical products + add order)
    twr: np.ndarray      # (128, 128) twiddle [kA, q] (un-tiled; the
                         # wrapper tiles it (nb*128, 128) for the
                         # whole-array stage-2 application)
    twi: np.ndarray
    w2c_hi: np.ndarray   # (128, 128) [w2r | w2i] packed halves [q, kB]
    w2c_lo: np.ndarray
    P: int
    Q: int
    kb_out: int


@functools.lru_cache(maxsize=4)
def dft_planes_v2(nfft: int) -> DFTPlanesV2:
    P, Q = ch_ops._ct_split(nfft)
    if P > LANE or Q > LANE:
        raise ValueError(f"CT factors {P}x{Q} exceed one lane tile")
    w1, tw, w2 = ch_ops._ct_tables(nfft)
    kb_out = nfft // 2 // P + 1
    if 2 * kb_out > LANE:
        raise ValueError(f"2*kb_out={2*kb_out} exceeds the packed w2 tile")
    w1p = np.zeros((LANE, LANE), np.complex64)
    w1p[:P, :P] = w1.T                       # [p, kA] (symmetric)
    w1r_hi, w1r_lo = _hi_lo(w1p.real.astype(np.float32))
    w1i_hi, w1i_lo = _hi_lo(w1p.imag.astype(np.float32))
    w1cat = np.concatenate([w1r_hi, w1r_lo, w1i_hi, w1i_lo], axis=1)
    twp = np.zeros((LANE, LANE), np.complex64)
    twp[:P, :Q] = tw                         # [kA, q] directly
    twr = twp.real.astype(np.float32)
    twi = twp.imag.astype(np.float32)
    w2s = w2[:, :kb_out]
    w2c = np.zeros((LANE, LANE), np.float32)
    w2c[:Q, :kb_out] = w2s.real.astype(np.float32)
    w2c[:Q, LANE // 2:LANE // 2 + kb_out] = w2s.imag.astype(np.float32)
    w2c_hi, w2c_lo = _hi_lo(w2c)
    return DFTPlanesV2(w1cat, twr, twi, w2c_hi, w2c_lo, P, Q, kb_out)


def _bcpf(v, rows):
    """float (1, 1) -> (rows, 64) Mosaic-legally (see _bc2f)."""
    row = jax.lax.broadcast_in_dim(v, (1, LANE // 2), (0, 1))
    if _interpret():
        return jnp.broadcast_to(row, (rows, LANE // 2))
    return pltpu.repeat(row, rows, 0)


def _bcpb(v, rows):
    return _bcpf(v.astype(jnp.float32), rows) > 0.0


def _full_kernel_v2(u_ref, w1cat_ref,
                    twrt_ref, twit_ref, w2ch_ref, w2cl_ref, packm_ref,
                    bp_in_ref,
                    outp_ref, outk_ref, w_ref, dag_ref, bp_out_ref,
                    sra_scr, sia_scr, srb_scr, sib_scr,
                    pwra_scr, pwrb_scr, bp_scr, w_scr, *,
                    nb: int, npol: int, ffts: int, P: int, Q: int,
                    nscrunch: int, nseg: int, rw: int, nw: int,
                    rfi_mode: int, scale: float,
                    q0: float, q1: float, q2: float,
                    dag_thresh: float, dag_fb_thresh: float,
                    dag_inf: float, kf: dict, kb: dict,
                    clip_ratio: float, clip_value: float,
                    min_weight: float, debug_stop: int = 99):
    """One segment of the natural-layout chain (see section comment).

    debug_stop (perf triage only): 1 = stop after stage 1, 2 = stop
    after stage 2 — downstream outputs are left unwritten (garbage)."""
    from vlite_fast_tpu.ops.rfi_pallas import _ts

    i = pl.program_id(0)
    tpp = ffts                       # spectra per pol per segment
    nout = tpp // nscrunch
    has_plain = rfi_mode != 1
    has_kur = rfi_mode != 0
    half = LANE // 2

    # ---- phase 0: convert + pad every frame into voltage scratch ------
    # u8 refs tile (32, 128); frame rows t*P are not tile-aligned, so
    # slice the frames STATICALLY from the whole-block value and write
    # 128-row-aligned padded frames the dynamic loops below can read.
    # Stored bf16 on chip: voltages k/128 are bf16-EXACT (the
    # dft_exact_input property), so this halves the stage-1 loop's
    # vreg traffic and removes its per-iteration cast.
    vdt = jnp.float32 if _interpret() else jnp.bfloat16
    x_alls = []
    for pol in range(npol):
        ui = u_ref[pol, 0].astype(jnp.int32)           # (ffts*P, Q)
        x_all = ui.astype(jnp.float32) * (1.0 / 128.0) - 1.0
        x_all = jnp.where(ui == 0, 0.0, x_all)
        # lane-pad ONCE for the whole block; frames are then pure row
        # slices with NO per-frame pad (the per-frame (100,125)->
        # (128,128) pad-concat was a relayout on every frame)
        x_all = jnp.pad(x_all, ((0, 0), (0, LANE - Q)))
        x_alls.append(x_all.astype(vdt))

    def frame(pol, t):
        """Frame (pol, t) as a (P, 128) voltage value — STATIC row
        slices of the whole-block converted values (a VMEM scratch
        roundtrip here measured ~730 ns per frame READ; value slices
        are register-local).  Rows are NOT padded to 128: the stage-1
        contraction runs at K=P against the P valid rows of w1cat
        (its rows >= P are zero, so the products are identical)."""
        return jax.lax.slice(x_alls[pol], (t * P, 0),
                             ((t + 1) * P, LANE))

    # restrict the stage-1 constant to the P valid contraction rows so
    # unpadded (P, 128) frames feed the dot directly
    w1cat = _b(jax.lax.slice(w1cat_ref[...], (0, 0), (P, 4 * LANE)))
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    aligned = (row_iota % rw == 0)

    def stage1(xb, sr_scr, si_scr, b):
        # on chip xb is already bf16 (phase 0); interpret keeps f32 and
        # rounds here so CPU products match the chip bit-for-bit
        xbb = _b(xb) if _interpret() else xb
        z = _bdot00(w1cat, xbb)                # (512, q): 4 passes, 1 op
        ar = jax.lax.slice(z, (0, 0), (LANE, LANE)) \
            + jax.lax.slice(z, (LANE, 0), (2 * LANE, LANE))
        ai = jax.lax.slice(z, (2 * LANE, 0), (3 * LANE, LANE)) \
            + jax.lax.slice(z, (3 * LANE, 0), (4 * LANE, LANE))
        # twiddle hoisted: stage 2 applies it whole-array (the per-b
        # 6-op (128,128) twiddle dominated the loop's fixed cost)
        sr_scr[pl.ds(b * LANE, LANE)] = ar
        si_scr[pl.ds(b * LANE, LANE)] = ai

    def win_stats(xb):
        """(s2, s4) window-moment columns (LANE, 1), valid at rw-aligned
        rows only (sublane roll-adds + lane reduction)."""
        xb = xb.astype(jnp.float32)
        x2 = xb * xb
        x4 = x2 * x2
        s2 = x2
        s4 = x4
        for sh in range(1, rw):
            # pltpu.roll wants non-negative shifts: -sh == P - sh here
            # (rolls act on the P-row frames; aligned window rows
            # r <= P-rw never read wrapped rows)
            s2 = s2 + pltpu.roll(x2, P - sh, 0)
            s4 = s4 + pltpu.roll(x4, P - sh, 0)
        return (jnp.sum(s2, axis=1, keepdims=True),
                jnp.sum(s4, axis=1, keepdims=True))

    def gates_for(ts_col, s2_cols, kur_cols):
        """fine gate + block-stat fallback -> (gate col (LANE,1) at
        aligned rows, weight (1,1))."""
        fine_good = jnp.logical_and(ts_col < dag_thresh, aligned)
        if dag_fb_thresh > 0:
            wt = fine_good.astype(jnp.float32)
            wsum = jnp.sum(wt, axis=0, keepdims=True)[:1]     # (1, 1)
            psum = jnp.sum(wt * s2_cols, axis=0, keepdims=True)[:1]
            qsum = jnp.sum(wt * kur_cols * s2_cols * s2_cols,
                           axis=0, keepdims=True)[:1]
            good_b = wsum > 0
            pblk = jnp.where(good_b,
                             psum / jnp.where(good_b, wsum, 1.0), 0.0)
            kblk = jnp.where(good_b,
                             qsum / jnp.where(good_b, wsum, 1.0)
                             / jnp.where(good_b, pblk * pblk, 1.0), 0.0)
            tsb = _ts(kblk, kb, dag_inf)                      # (1, 1)
            return fine_good, tsb
        return fine_good, None

    inv_n = jnp.float32(1.0 / kf["n"])

    def t_body(t, dag_acc):
        # ---- RFI front: both pols' window moments -> shared gates ----
        xbs = [frame(pol, t) for pol in range(npol)]
        if has_kur:
            cols = []
            for xb in xbs:
                s2, s4 = win_stats(xb)
                m2 = s2 * inv_n
                m4 = s4 * inv_n
                kur = jnp.where(m2 == 0.0, 0.0,
                                m4 / jnp.where(m2 == 0.0, 1.0, m2 * m2))
                cols.append((_ts(kur, kf, dag_inf), m2, kur))
            ts_col = cols[0][0]
            if npol == 2:
                ts_col = jnp.maximum(ts_col, cols[1][0])
            fine0, tsb0 = gates_for(ts_col, cols[0][1], cols[0][2])
            if dag_fb_thresh > 0:
                tsb = tsb0
                if npol == 2:
                    _, tsb1 = gates_for(ts_col, cols[1][1], cols[1][2])
                    tsb = jnp.maximum(tsb, tsb1)
                gate = jnp.logical_and(
                    fine0, _bcpb(tsb < dag_fb_thresh, P)[:, :1])
            else:
                gate = fine0
            g = gate.astype(jnp.float32)                      # (LANE, 1)
            w11 = jnp.sum(g, axis=0, keepdims=True)[:1] * (1.0 / nw)
            for pol in range(npol):
                w_scr[pl.ds(pol * tpp + t, 1)] = w11
                w_ref[0, pl.ds(pol * tpp + t, 1)] = w11
            dflag = jnp.where(aligned,
                              (ts_col >= dag_thresh).astype(jnp.float32),
                              0.0)
            dag_acc = dag_acc + jnp.sum(dflag, axis=0,
                                        keepdims=True)[:1] * (1.0 / nw)
            # forward-fill the gate down each rw-row window
            mask = g
            sh = 1
            while sh < rw:
                mask = jnp.where(row_iota % (2 * sh) >= sh,
                                 pltpu.roll(mask, sh, 0), mask)
                sh *= 2
        # ---- stage 1 + twiddle for both streams ----------------------
        for pol in range(npol):
            b = pol * tpp + t
            xb = xbs[pol]
            if has_plain:
                stage1(xb, sra_scr, sia_scr, b)
            if has_kur:
                stage1(xb * mask.astype(xb.dtype), srb_scr, sib_scr, b)
        return dag_acc

    # statically unrolled: every conv/sr/si access gets a compile-time
    # offset (dynamic-offset VMEM access was the loop's fixed cost)
    dag_acc = jnp.zeros((1, 1), jnp.float32)
    for _t in range(tpp):
        dag_acc = t_body(_t, dag_acc)
    if has_kur:
        dag_ref[...] = jnp.broadcast_to(
            (dag_acc * (1.0 / tpp))[None], (1, 1, LANE))
    else:
        w_ref[0] = jnp.ones((nb, 1), jnp.float32)
        dag_ref[...] = jnp.zeros((1, 1, LANE), jnp.float32)

    if debug_stop < 2:
        return
    # ---- stage 2: batched big dots + detect fold per stream -----------
    w2ch = _b(w2ch_ref[...])
    w2cl = _b(w2cl_ref[...])
    sgn = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (nb * LANE, LANE), 1) < half,
        jnp.float32(-1.0), jnp.float32(1.0))

    twr_t = twrt_ref[...]                    # (nb*128, 128) tiled
    twi_t = twit_ref[...]

    def stage2(sr_scr, si_scr, pwr_scr):
        ar = sr_scr[...]
        ai = si_scr[...]
        sr = ar * twr_t - ai * twi_t
        si = ar * twi_t + ai * twr_t
        rh, rl = _split(sr)
        ih, il = _split(si)
        A = _bdot(rh, w2ch) + _bdot(rh, w2cl) + _bdot(rl, w2ch)
        B = _bdot(ih, w2ch) + _bdot(ih, w2cl) + _bdot(il, w2ch)
        z = A + sgn * pltpu.roll(B, half, 1)
        z = z * z
        z = z + pltpu.roll(z, half, 1)
        p = jax.lax.slice(z, (0, 0), (nb * LANE, half))
        pwr_scr[...] = p.reshape(nb, LANE, half)

    if has_plain:
        stage2(sra_scr, sia_scr, pwra_scr)
    if has_kur:
        stage2(srb_scr, sib_scr, pwrb_scr)

    if debug_stop < 3:
        return
    # ---- EMA + scrunches + quantize + pack (planes are (128, 64)) ----
    packm = packm_ref[...]
    rs = jnp.float32(1.0 / np.sqrt(nscrunch))
    ps = jnp.float32(np.sqrt(0.5))

    def quant_pack(ts_plane):
        lev = ((ts_plane >= q0).astype(jnp.float32)
               + (ts_plane >= q1).astype(jnp.float32)
               + (ts_plane >= q2).astype(jnp.float32))
        return jax.lax.dot_general(
            packm, lev, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (32, 64)

    def load_bp(slot):
        carried = bp_scr[pl.ds(slot, 1)][0]
        fresh = bp_in_ref[pl.ds(slot, 1)][0]
        return jnp.where(i == 0, fresh, carried)

    if has_plain:
        def seg_mean(p):
            def body(t, acc):
                return acc + pwra_scr[pl.ds(p * tpp + t, 1)][0]
            s = jax.lax.fori_loop(
                0, tpp, body, jnp.zeros((LANE, half), jnp.float32))
            return s * (1.0 / tpp)

        def bp_for(p):
            bp = load_bp(p)
            seed = seg_mean(p)
            seed = jnp.where(seed == 0.0, 1.0, seed)
            return jnp.where(bp == 0.0, seed, bp)

        bp0 = bp_for(0)
        bp1 = bp_for(1) if npol == 2 else bp0

        def out_body(o, carry):
            b0, b1 = carry

            def sub(t, c):
                b0, b1, acc = c
                tt = o * nscrunch + t
                p0 = pwra_scr[pl.ds(tt, 1)][0]
                b0n = scale * p0 + (1.0 - scale) * b0
                v = p0 / b0n - 1.0
                if npol == 2:
                    p1 = pwra_scr[pl.ds(tpp + tt, 1)][0]
                    b1n = scale * p1 + (1.0 - scale) * b1
                    v = ps * (v + (p1 / b1n - 1.0))
                else:
                    b1n = b1
                return b0n, b1n, acc + v

            b0, b1, acc = jax.lax.fori_loop(
                0, nscrunch, sub,
                (b0, b1, jnp.zeros((LANE, half), jnp.float32)))
            outp_ref[0, pl.ds(o, 1)] = quant_pack(acc * rs)[None]
            return b0, b1

        bp0, bp1 = jax.lax.fori_loop(0, nout, out_body, (bp0, bp1))
        bp_scr[pl.ds(0, 1)] = bp0[None]
        if npol == 2:
            bp_scr[pl.ds(1, 1)] = bp1[None]

    if has_kur:
        koff = npol

        def kseed(p):
            def body(t, c):
                s, ng = c
                w = w_scr[pl.ds(p * tpp + t, 1)]
                gsc = (w > 0.0).astype(jnp.float32)
                inv = jnp.where(w > 0.0,
                                1.0 / jnp.where(w > 0.0, w, 1.0), 0.0)
                pw = pwrb_scr[pl.ds(p * tpp + t, 1)][0] * _bcpf(inv, LANE)
                return s + pw, ng + gsc
            s, ng = jax.lax.fori_loop(
                0, tpp, body,
                (jnp.zeros((LANE, half), jnp.float32),
                 jnp.zeros((1, 1), jnp.float32)))
            seed = jnp.where(_bcpb(ng > 0, LANE),
                             s * _bcpf(1.0 / jnp.maximum(ng, 1.0), LANE),
                             1.0)
            return seed, ng

        def kbp_for(p):
            bp = load_bp(koff + p)
            seed, ng = kseed(p)
            bp = jnp.where(bp == 0.0, seed, bp)
            stale = jnp.logical_and(
                _bcpb(ng > 0, LANE),
                jnp.logical_or(seed > 5.0 * bp, seed < 0.2 * bp))
            return jnp.where(stale, seed, bp)

        kb0 = kbp_for(0)
        kb1 = kbp_for(1) if npol == 2 else kb0

        def kema_step(bp, p, w):
            gok = w > 0.0
            inv = jnp.where(gok, 1.0 / jnp.where(gok, w, 1.0), 0.0)
            gokp = _bcpb(gok, LANE)
            pw = p * _bcpf(inv, LANE)
            clipped = pw > clip_ratio * bp
            update = jnp.logical_and(gokp, jnp.logical_not(clipped))
            bpn = jnp.where(update, scale * pw + (1.0 - scale) * bp, bp)
            v = jnp.where(gokp,
                          jnp.where(clipped, clip_value, pw / bpn - 1.0),
                          0.0)
            return bpn, v

        def kout_body(o, carry):
            b0, b1 = carry

            def sub(t, c):
                b0, b1, acc, cnt, wsum = c
                tt = o * nscrunch + t
                w0 = w_scr[pl.ds(tt, 1)]
                b0n, v0 = kema_step(b0, pwrb_scr[pl.ds(tt, 1)][0], w0)
                if npol == 2:
                    w1 = w_scr[pl.ds(tpp + tt, 1)]
                    b1n, v1 = kema_step(b1,
                                        pwrb_scr[pl.ds(tpp + tt, 1)][0],
                                        w1)
                    g0 = w0 >= min_weight
                    g1 = w1 >= min_weight
                    both = jnp.logical_and(g0, g1)
                    v = jnp.where(_bcpb(both, LANE), ps * (v0 + v1),
                                  v0 * _bcpf(g0.astype(jnp.float32), LANE)
                                  + v1 * _bcpf(g1.astype(jnp.float32),
                                               LANE))
                    wp = jnp.where(both, 0.5 * (w0 + w1),
                                   w0 * g0.astype(jnp.float32)
                                   + w1 * g1.astype(jnp.float32))
                else:
                    b1n, v, wp = b1, v0, w0
                gt = (wp >= min_weight).astype(jnp.float32)
                wg = wp * gt
                return (b0n, b1n, acc + _bcpf(wg, LANE) * v, cnt + gt,
                        wsum + wg)

            z = jnp.zeros((1, 1), jnp.float32)
            b0, b1, acc, cnt, wsum = jax.lax.fori_loop(
                0, nscrunch, sub,
                (b0, b1, jnp.zeros((LANE, half), jnp.float32), z, z))
            ok = (wsum * (1.0 / nscrunch)) >= min_weight
            ts_plane = jnp.where(
                _bcpb(ok, LANE),
                acc * _bcpf(1.0 / jnp.sqrt(jnp.maximum(cnt, 1.0)), LANE),
                0.0)
            outk_ref[0, pl.ds(o, 1)] = quant_pack(ts_plane)[None]
            return b0, b1

        kb0, kb1 = jax.lax.fori_loop(0, nout, kout_body, (kb0, kb1))
        bp_scr[pl.ds(koff, 1)] = kb0[None]
        if npol == 2:
            bp_scr[pl.ds(koff + 1, 1)] = kb1[None]

    @pl.when(i == nseg - 1)
    def _():
        bp_out_ref[...] = bp_scr[...]


@functools.partial(jax.jit, static_argnames=(
    "nfft", "npol", "seg_per_sec", "nscrunch", "nkurto", "rfi_mode",
    "scale", "dag_thresh", "dag_fb_thresh", "debug_stop"))
def chain_second_v2(raw: jax.Array, bp_fact: jax.Array, nfft: int,
                    npol: int, seg_per_sec: int, nscrunch: int,
                    nkurto: int, rfi_mode: int, scale: float,
                    dag_thresh: float, dag_fb_thresh: float,
                    debug_stop: int = 99):
    """Natural-layout full-chain megakernel (see section comment).

    Same contract as chain_second, with TRANSPOSED planes: bp_fact is
    (2*npol, 128, 64) [kA, kB] (bp_to_factored_v2); returns plain/kur
    packed planes (nseg, nout, 32, 64) [g, kB], weights (nseg, nb, 1),
    dag_frac (nseg, 1), new bp_fact.  No XLA prologue: the input is a
    free reshape of the raw second.
    """
    from vlite_fast_tpu import constants as C
    npol_, nsamp = raw.shape
    seg_samps = nsamp // seg_per_sec
    ffts = seg_samps // nfft
    nb = npol * ffts
    nout = ffts // nscrunch
    pl_ = dft_planes_v2(nfft)
    P, Q = pl_.P, pl_.Q
    rw = nkurto // Q
    nw = nfft // nkurto
    if nkurto % Q or P % rw or rw & (rw - 1):
        raise ValueError("megakernel v2 needs nkurto % Q == 0, "
                         "P % rw == 0, rw a power of two")
    kf = dict(C.dagostino_constants(nkurto))
    kf["n"] = float(nkurto)
    kb = dict(C.dagostino_constants(nfft))
    packm = np.ascontiguousarray(_pack_matrix(P).T)       # (32, 128)
    xs = natural_blocks(raw, nfft, npol, seg_per_sec)
    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    const4 = lambda i: (0, i, 0, 0)
    q0, q1, q2 = C.QUANT2_THRESH
    half = LANE // 2
    outs = pl.pallas_call(
        functools.partial(
            _full_kernel_v2, nb=nb, npol=npol, ffts=ffts, P=P, Q=Q,
            nscrunch=nscrunch, nseg=seg_per_sec, rw=rw, nw=nw,
            rfi_mode=rfi_mode, scale=float(scale),
            q0=float(q0), q1=float(q1), q2=float(q2),
            dag_thresh=float(dag_thresh),
            dag_fb_thresh=float(dag_fb_thresh),
            dag_inf=float(C.DAG_INF), kf=kf, kb=kb,
            clip_ratio=float(C.BP_CLIP_RATIO),
            clip_value=float(C.BP_CLIP_VALUE),
            min_weight=float(C.MIN_WEIGHT), debug_stop=debug_stop),
        grid=(seg_per_sec,),
        in_specs=[
            pl.BlockSpec((npol, 1, ffts * P, Q), const4),
            pl.BlockSpec((LANE, 4 * LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((32, LANE), const),
            pl.BlockSpec((2 * npol, LANE, half), const3),
        ],
        out_specs=[
            pl.BlockSpec((1, nout, 32, half), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nout, 32, half), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nb, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((2 * npol, LANE, half), const3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seg_per_sec, nout, 32, half),
                                 jnp.float32),
            jax.ShapeDtypeStruct((seg_per_sec, nout, 32, half),
                                 jnp.float32),
            jax.ShapeDtypeStruct((seg_per_sec, nb, 1), jnp.float32),
            jax.ShapeDtypeStruct((seg_per_sec, 1, LANE), jnp.float32),
            jax.ShapeDtypeStruct((2 * npol, LANE, half), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),   # sr plain
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),   # si plain
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),   # sr kur
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),   # si kur
            pltpu.VMEM((nb, LANE, half), jnp.float32),    # pwr plain
            pltpu.VMEM((nb, LANE, half), jnp.float32),    # pwr kur
            pltpu.VMEM((2 * npol, LANE, half), jnp.float32),
            pltpu.VMEM((nb, 1), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs, jnp.asarray(pl_.w1cat),
      jnp.asarray(np.tile(pl_.twr, (nb, 1))),
      jnp.asarray(np.tile(pl_.twi, (nb, 1))),
      jnp.asarray(pl_.w2c_hi), jnp.asarray(pl_.w2c_lo),
      jnp.asarray(packm), bp_fact)
    pp, kk, w, dag3, bp_new = outs
    return pp, kk, w, dag3[:, 0, :1], bp_new


# ---------------------------------------------------------------------------
# v4: both MXU stages batched (round 5b) — per-frame work becomes
# per-plane XLU transposes
# ---------------------------------------------------------------------------
#
# v1 batches stage 1 (one (nb*128, 128) dot) but pays 6 small dots per
# b-block in stage 2; v2 batches stage 2 but pays 4 per-frame dots in
# stage 1 (the measured ~30 ms/data-s floor).  The missing piece is a
# LAYOUT BRIDGE between the two batched stages: stage 1's output rows
# are (b, m2) with k1 on lanes, stage 2 wants rows (b, k1) with m2 on
# lanes — a per-b (128, 128) transpose.  Mosaic lowers lax.transpose of
# an f32 (128, 128) tile natively (no MXU pass, exact at f32 — unlike
# an identity-dot route, which would need hi/lo pairs to stay exact and
# would tie the cost it displaces).  So:
#
#   stage 1: ONE (nb*128, 128) @ (128, 512) dot per stream (the four
#            bf16 passes lane-concatenated, exactly v1's products);
#   bridge : 2 XLU transposes per b per stream (ar, ai);
#   stage 2 + EMA/scrunch/quantize/pack: chain_second_v2's batched code
#            verbatim (identical layouts from here on).
#
# Input is the kernel layout from pallas_pretranspose (u8 or bf16) —
# no XLA prologue.  Outputs are v2-layout planes (the v2 helpers
# apply).  Ref: same role as above (src/process_baseband.cu:1108-1360).


def _full_kernel_v4(u_ref, w1cols_ref, twrt_ref, twit_ref,
                    w2ch_ref, w2cl_ref, packm_ref, g4_ref, e_ref,
                    bp_in_ref,
                    outp_ref, outk_ref, w_ref, dag_ref, bp_out_ref,
                    sra_scr, sia_scr, srb_scr, sib_scr,
                    pwra_scr, pwrb_scr, bp_scr, w_scr, *,
                    nb: int, npol: int, nscrunch: int, nseg: int,
                    nw: int, rfi_mode: int, scale: float,
                    q0: float, q1: float, q2: float,
                    dag_thresh: float, dag_fb_thresh: float,
                    dag_inf: float, kf: dict, kb: dict,
                    clip_ratio: float, clip_value: float,
                    min_weight: float, P: int = 0, Q: int = 0,
                    debug_stop: int = 99):
    """One segment: v1 front + XLU bridge + v2 back (section comment).

    P, Q nonzero => FUSED relayout: u_ref is the NATURAL (npol, 1,
    ffts*P, Q) block and phase 0 transposes each frame into the kernel
    layout in-register — no HBM round-trip of the relayout product
    (measured ~17 ms/data-s for the standalone producer regardless of
    transpose engine: the cost is the store+reload, not the tiles).

    debug_stop (perf triage): 1 = stop after stage 1 + bridge, 2 = stop
    after stage 2 — downstream outputs left unwritten (garbage)."""
    from vlite_fast_tpu.ops.rfi_pallas import _ts

    i = pl.program_id(0)
    tpp = nb // npol
    nout = tpp // nscrunch
    has_plain = rfi_mode != 1
    has_kur = rfi_mode != 0
    half = LANE // 2

    if P:
        # ---- fused phase 0: natural block -> kernel layout ----------
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
        blocks = []
        for pol in range(npol):
            ui = u_ref[pol, 0].astype(jnp.int32)     # (ffts*P, Q)
            xv = ui.astype(jnp.float32) * (1.0 / 128.0) - 1.0
            xv = jnp.where(ui == 0, 0.0, xv)
            xv = jnp.pad(xv, ((0, LANE - P), (0, LANE - Q)))
            for t in range(tpp):
                xb = jax.lax.slice(xv, (t * P, 0), (t * P + LANE, LANE))
                y = jax.lax.transpose(xb, (1, 0))
                blocks.append(jnp.where(lane_iota < P, y, 0.0))
        x = jnp.concatenate(blocks, axis=0)          # (nb*128, 128)
    elif u_ref.dtype == jnp.uint8:
        ui = u_ref[0].astype(jnp.int32)
        x = ui.astype(jnp.float32) * (1.0 / 128.0) - 1.0
        x = jnp.where(ui == 0, 0.0, x)
    else:
        x = u_ref[0].astype(jnp.float32)

    # ---- RFI front: identical to _full_kernel (v1 layout) ------------
    if has_kur:
        x2 = x * x
        s2 = x2.reshape(nb, LANE, LANE).sum(axis=1)        # (nb, 128)
        s4 = (x2 * x2).reshape(nb, LANE, LANE).sum(axis=1)
        g4 = g4_ref[...]
        inv_n = jnp.float32(1.0 / kf["n"])
        m2 = _hdot(s2, g4) * inv_n                         # (nb, 32)
        m4 = _hdot(s4, g4) * inv_n
        kur = jnp.where(m2 == 0.0, 0.0,
                        m4 / jnp.where(m2 == 0.0, 1.0, m2 * m2))
        ts = _ts(kur, kf, dag_inf)
        dag = jnp.maximum(ts, pltpu.roll(ts, tpp, 0)) if npol == 2 else ts
        fine_good = dag < dag_thresh
        lane_ok = jax.lax.broadcasted_iota(jnp.int32, (nb, 32), 1) < nw
        fine_good = jnp.logical_and(fine_good, lane_ok)
        if dag_fb_thresh > 0:
            wt = fine_good.astype(jnp.float32)
            wsum = jnp.sum(wt, axis=1, keepdims=True)      # (nb, 1)
            psum = jnp.sum(wt * m2, axis=1, keepdims=True)
            qsum = jnp.sum(wt * kur * m2 * m2, axis=1, keepdims=True)
            good_b = wsum > 0
            pblk = jnp.where(good_b,
                             psum / jnp.where(good_b, wsum, 1.0), 0.0)
            kblk = jnp.where(good_b,
                             qsum / jnp.where(good_b, wsum, 1.0)
                             / jnp.where(good_b, pblk * pblk, 1.0), 0.0)
            tsb = _ts(kblk, kb, dag_inf)
            dfb = jnp.maximum(tsb, pltpu.roll(tsb, tpp, 0)) \
                if npol == 2 else tsb
            gate = jnp.logical_and(fine_good, dfb < dag_fb_thresh)
        else:
            gate = fine_good
        g = gate.astype(jnp.float32)
        w_col = jnp.sum(g, axis=1, keepdims=True) * (1.0 / nw)
        w_scr[...] = w_col
        w_ref[0] = w_col
        dflag = jnp.where(lane_ok,
                          (dag >= dag_thresh).astype(jnp.float32), 0.0)
        dfrac = jnp.sum(
            jnp.sum(dflag, axis=1, keepdims=True), axis=0,
            keepdims=True) * (1.0 / (nw * nb))
        dag_ref[...] = jnp.broadcast_to(dfrac[None], (1, 1, LANE))
        gm = _hdot(g, e_ref[...])                          # (nb, 128)
        mask = jnp.broadcast_to(gm[:, None, :],
                                (nb, LANE, LANE)).reshape(nb * LANE, LANE)
        x_kur = x * mask
    else:
        w_ref[0] = jnp.ones((nb, 1), jnp.float32)
        dag_ref[...] = jnp.zeros((1, 1, LANE), jnp.float32)

    # ---- stage 1 (one dot/stream) + XLU bridge into v2 layout --------
    w1cols = _b(w1cols_ref[...])                 # (128, 512)

    def stage1_t(xs_, sr_scr, si_scr):
        z = _bdot(_b(xs_), w1cols)               # (nb*128, 512)
        ar = jax.lax.slice(z, (0, 0), (nb * LANE, LANE)) \
            + jax.lax.slice(z, (0, LANE), (nb * LANE, 2 * LANE))
        ai = jax.lax.slice(z, (0, 2 * LANE), (nb * LANE, 3 * LANE)) \
            + jax.lax.slice(z, (0, 3 * LANE), (nb * LANE, 4 * LANE))
        for b in range(nb):
            ab = jax.lax.slice(ar, (b * LANE, 0), ((b + 1) * LANE, LANE))
            sr_scr[pl.ds(b * LANE, LANE)] = jax.lax.transpose(ab, (1, 0))
            ab = jax.lax.slice(ai, (b * LANE, 0), ((b + 1) * LANE, LANE))
            si_scr[pl.ds(b * LANE, LANE)] = jax.lax.transpose(ab, (1, 0))

    if has_plain:
        stage1_t(x, sra_scr, sia_scr)
    if has_kur:
        stage1_t(x_kur, srb_scr, sib_scr)

    if debug_stop < 2:
        return
    # ---- stage 2 + detect: chain_second_v2's batched code ------------
    w2ch = _b(w2ch_ref[...])
    w2cl = _b(w2cl_ref[...])
    sgn = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (nb * LANE, LANE), 1) < half,
        jnp.float32(-1.0), jnp.float32(1.0))
    twr_t = twrt_ref[...]
    twi_t = twit_ref[...]

    def stage2(sr_scr, si_scr, pwr_scr):
        ar = sr_scr[...]
        ai = si_scr[...]
        sr = ar * twr_t - ai * twi_t
        si = ar * twi_t + ai * twr_t
        rh, rl = _split(sr)
        ih, il = _split(si)
        A = _bdot(rh, w2ch) + _bdot(rh, w2cl) + _bdot(rl, w2ch)
        B = _bdot(ih, w2ch) + _bdot(ih, w2cl) + _bdot(il, w2ch)
        z = A + sgn * pltpu.roll(B, half, 1)
        z = z * z
        z = z + pltpu.roll(z, half, 1)
        p = jax.lax.slice(z, (0, 0), (nb * LANE, half))
        pwr_scr[...] = p.reshape(nb, LANE, half)

    if has_plain:
        stage2(sra_scr, sia_scr, pwra_scr)
    if has_kur:
        stage2(srb_scr, sib_scr, pwrb_scr)

    if debug_stop < 3:
        return
    # ---- EMA + scrunches + quantize + pack: v2's code verbatim -------
    packm = packm_ref[...]
    rs = jnp.float32(1.0 / np.sqrt(nscrunch))
    ps = jnp.float32(np.sqrt(0.5))

    def quant_pack(ts_plane):
        lev = ((ts_plane >= q0).astype(jnp.float32)
               + (ts_plane >= q1).astype(jnp.float32)
               + (ts_plane >= q2).astype(jnp.float32))
        return jax.lax.dot_general(
            packm, lev, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (32, 64)

    def load_bp(slot):
        carried = bp_scr[pl.ds(slot, 1)][0]
        fresh = bp_in_ref[pl.ds(slot, 1)][0]
        return jnp.where(i == 0, fresh, carried)

    if has_plain:
        def seg_mean(p):
            def body(t, acc):
                return acc + pwra_scr[pl.ds(p * tpp + t, 1)][0]
            s = jax.lax.fori_loop(
                0, tpp, body, jnp.zeros((LANE, half), jnp.float32))
            return s * (1.0 / tpp)

        def bp_for(p):
            bp = load_bp(p)
            seed = seg_mean(p)
            seed = jnp.where(seed == 0.0, 1.0, seed)
            return jnp.where(bp == 0.0, seed, bp)

        bp0 = bp_for(0)
        bp1 = bp_for(1) if npol == 2 else bp0

        def out_body(o, carry):
            b0, b1 = carry

            def sub(t, c):
                b0, b1, acc = c
                tt = o * nscrunch + t
                p0 = pwra_scr[pl.ds(tt, 1)][0]
                b0n = scale * p0 + (1.0 - scale) * b0
                v = p0 / b0n - 1.0
                if npol == 2:
                    p1 = pwra_scr[pl.ds(tpp + tt, 1)][0]
                    b1n = scale * p1 + (1.0 - scale) * b1
                    v = ps * (v + (p1 / b1n - 1.0))
                else:
                    b1n = b1
                return b0n, b1n, acc + v

            b0, b1, acc = jax.lax.fori_loop(
                0, nscrunch, sub,
                (b0, b1, jnp.zeros((LANE, half), jnp.float32)))
            outp_ref[0, pl.ds(o, 1)] = quant_pack(acc * rs)[None]
            return b0, b1

        bp0, bp1 = jax.lax.fori_loop(0, nout, out_body, (bp0, bp1))
        bp_scr[pl.ds(0, 1)] = bp0[None]
        if npol == 2:
            bp_scr[pl.ds(1, 1)] = bp1[None]

    if has_kur:
        koff = npol

        def kseed(p):
            def body(t, c):
                s, ng = c
                w = w_scr[pl.ds(p * tpp + t, 1)]
                gsc = (w > 0.0).astype(jnp.float32)
                inv = jnp.where(w > 0.0,
                                1.0 / jnp.where(w > 0.0, w, 1.0), 0.0)
                pw = pwrb_scr[pl.ds(p * tpp + t, 1)][0] * _bcpf(inv, LANE)
                return s + pw, ng + gsc
            s, ng = jax.lax.fori_loop(
                0, tpp, body,
                (jnp.zeros((LANE, half), jnp.float32),
                 jnp.zeros((1, 1), jnp.float32)))
            seed = jnp.where(_bcpb(ng > 0, LANE),
                             s * _bcpf(1.0 / jnp.maximum(ng, 1.0), LANE),
                             1.0)
            return seed, ng

        def kbp_for(p):
            bp = load_bp(koff + p)
            seed, ng = kseed(p)
            bp = jnp.where(bp == 0.0, seed, bp)
            stale = jnp.logical_and(
                _bcpb(ng > 0, LANE),
                jnp.logical_or(seed > 5.0 * bp, seed < 0.2 * bp))
            return jnp.where(stale, seed, bp)

        kb0 = kbp_for(0)
        kb1 = kbp_for(1) if npol == 2 else kb0

        def kema_step(bp, p, w):
            gok = w > 0.0
            inv = jnp.where(gok, 1.0 / jnp.where(gok, w, 1.0), 0.0)
            gokp = _bcpb(gok, LANE)
            pw = p * _bcpf(inv, LANE)
            clipped = pw > clip_ratio * bp
            update = jnp.logical_and(gokp, jnp.logical_not(clipped))
            bpn = jnp.where(update, scale * pw + (1.0 - scale) * bp, bp)
            v = jnp.where(gokp,
                          jnp.where(clipped, clip_value, pw / bpn - 1.0),
                          0.0)
            return bpn, v

        def kout_body(o, carry):
            b0, b1 = carry

            def sub(t, c):
                b0, b1, acc, cnt, wsum = c
                tt = o * nscrunch + t
                w0 = w_scr[pl.ds(tt, 1)]
                b0n, v0 = kema_step(b0, pwrb_scr[pl.ds(tt, 1)][0], w0)
                if npol == 2:
                    w1 = w_scr[pl.ds(tpp + tt, 1)]
                    b1n, v1 = kema_step(b1,
                                        pwrb_scr[pl.ds(tpp + tt, 1)][0],
                                        w1)
                    g0 = w0 >= min_weight
                    g1 = w1 >= min_weight
                    both = jnp.logical_and(g0, g1)
                    v = jnp.where(_bcpb(both, LANE), ps * (v0 + v1),
                                  v0 * _bcpf(g0.astype(jnp.float32), LANE)
                                  + v1 * _bcpf(g1.astype(jnp.float32),
                                               LANE))
                    wp = jnp.where(both, 0.5 * (w0 + w1),
                                   w0 * g0.astype(jnp.float32)
                                   + w1 * g1.astype(jnp.float32))
                else:
                    b1n, v, wp = b1, v0, w0
                gt = (wp >= min_weight).astype(jnp.float32)
                wg = wp * gt
                return (b0n, b1n, acc + _bcpf(wg, LANE) * v, cnt + gt,
                        wsum + wg)

            z = jnp.zeros((1, 1), jnp.float32)
            b0, b1, acc, cnt, wsum = jax.lax.fori_loop(
                0, nscrunch, sub,
                (b0, b1, jnp.zeros((LANE, half), jnp.float32), z, z))
            ok = (wsum * (1.0 / nscrunch)) >= min_weight
            ts_plane = jnp.where(
                _bcpb(ok, LANE),
                acc * _bcpf(1.0 / jnp.sqrt(jnp.maximum(cnt, 1.0)), LANE),
                0.0)
            outk_ref[0, pl.ds(o, 1)] = quant_pack(ts_plane)[None]
            return b0, b1

        kb0, kb1 = jax.lax.fori_loop(0, nout, kout_body, (kb0, kb1))
        bp_scr[pl.ds(koff, 1)] = kb0[None]
        if npol == 2:
            bp_scr[pl.ds(koff + 1, 1)] = kb1[None]

    @pl.when(i == nseg - 1)
    def _():
        bp_out_ref[...] = bp_scr[...]


@functools.partial(jax.jit, static_argnames=(
    "nfft", "npol", "seg_per_sec", "nscrunch", "nkurto", "rfi_mode",
    "scale", "dag_thresh", "dag_fb_thresh", "pre_dtype", "pre_impl",
    "debug_stop"))
def chain_second_v4(raw: jax.Array, bp_fact: jax.Array, nfft: int,
                    npol: int, seg_per_sec: int, nscrunch: int,
                    nkurto: int, rfi_mode: int, scale: float,
                    dag_thresh: float, dag_fb_thresh: float,
                    pre_dtype: str = "u8", pre_impl: str = "mxu",
                    debug_stop: int = 99):
    """Both-stages-batched megakernel (see section comment).

    Same contract as chain_second_v2 (v2-layout bp_fact and outputs);
    input relayout via pallas_pretranspose (pre_dtype 'u8'|'bf16',
    pre_impl 'mxu'|'xlu').  Parity bar vs v1/v2: identical products,
    f32 accumulation grouping differs only inside dots (2-bit packed
    agreement ~1; weights/dag exact).
    """
    from vlite_fast_tpu import constants as C
    npol_, nsamp = raw.shape
    seg_samps = nsamp // seg_per_sec
    ffts = seg_samps // nfft
    nb = npol * ffts
    nout = ffts // nscrunch
    pl1 = dft_planes(nfft, nb)
    n1, n2 = pl1.n1, pl1.n2
    if nkurto % n2 or nfft % nkurto:
        raise ValueError("megakernel4 needs nkurto % n2 == 0")
    rw = nkurto // n2
    nw = n1 // rw
    g4m, em = _group_matrices(n1, rw)
    kf = dict(C.dagostino_constants(nkurto))
    kf["n"] = float(nkurto)
    kb = dict(C.dagostino_constants(nfft))
    pl2 = dft_planes_v2(nfft)
    w1cols = np.concatenate([pl1.w1r_hi, pl1.w1r_lo,
                             pl1.w1i_hi, pl1.w1i_lo], axis=1)
    packm = np.ascontiguousarray(_pack_matrix(n1).T)       # (32, 128)
    odt = jnp.bfloat16 if pre_dtype == "bf16" else jnp.uint8
    xs = pallas_pretranspose(raw, nfft, npol, seg_per_sec,
                             out_dtype=odt, impl=pre_impl)
    const = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    q0, q1, q2 = C.QUANT2_THRESH
    half = LANE // 2
    outs = pl.pallas_call(
        functools.partial(
            _full_kernel_v4, nb=nb, npol=npol, nscrunch=nscrunch,
            nseg=seg_per_sec, nw=nw, rfi_mode=rfi_mode,
            scale=float(scale), q0=float(q0), q1=float(q1), q2=float(q2),
            dag_thresh=float(dag_thresh),
            dag_fb_thresh=float(dag_fb_thresh),
            dag_inf=float(C.DAG_INF), kf=kf, kb=kb,
            clip_ratio=float(C.BP_CLIP_RATIO),
            clip_value=float(C.BP_CLIP_VALUE),
            min_weight=float(C.MIN_WEIGHT), debug_stop=debug_stop),
        grid=(seg_per_sec,),
        in_specs=[
            pl.BlockSpec((1, nb * LANE, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((LANE, 4 * LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((nb * LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((LANE, LANE), const),
            pl.BlockSpec((32, LANE), const),
            pl.BlockSpec((LANE, 32), const),
            pl.BlockSpec((32, LANE), const),
            pl.BlockSpec((2 * npol, LANE, half), const3),
        ],
        out_specs=[
            pl.BlockSpec((1, nout, 32, half), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nout, 32, half), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, nb, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, LANE), lambda i: (i, 0, 0)),
            pl.BlockSpec((2 * npol, LANE, half), const3),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seg_per_sec, nout, 32, half),
                                 jnp.float32),
            jax.ShapeDtypeStruct((seg_per_sec, nout, 32, half),
                                 jnp.float32),
            jax.ShapeDtypeStruct((seg_per_sec, nb, 1), jnp.float32),
            jax.ShapeDtypeStruct((seg_per_sec, 1, LANE), jnp.float32),
            jax.ShapeDtypeStruct((2 * npol, LANE, half), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),   # sr plain
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),   # si plain
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),   # sr kur
            pltpu.VMEM((nb * LANE, LANE), jnp.float32),   # si kur
            pltpu.VMEM((nb, LANE, half), jnp.float32),    # pwr plain
            pltpu.VMEM((nb, LANE, half), jnp.float32),    # pwr kur
            pltpu.VMEM((2 * npol, LANE, half), jnp.float32),
            pltpu.VMEM((nb, 1), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(xs, jnp.asarray(w1cols),
      jnp.asarray(np.tile(pl2.twr, (nb, 1))),
      jnp.asarray(np.tile(pl2.twi, (nb, 1))),
      jnp.asarray(pl2.w2c_hi), jnp.asarray(pl2.w2c_lo),
      jnp.asarray(packm), jnp.asarray(g4m), jnp.asarray(em), bp_fact)
    pp, kk, w, dag3, bp_new = outs
    return pp, kk, w, dag3[:, 0, :1], bp_new


def bp_to_factored_v2(bp: jax.Array, nfft: int) -> jax.Array:
    """(npol, nchan) -> (npol, 128, 64) [kA, kB] plane: the transpose
    of bp_to_factored's [kB, kA] plane (identical channel mapping
    k = kA + P*kB)."""
    return jnp.swapaxes(bp_to_factored(bp, nfft), -1, -2)


def bp_from_factored_v2(bpf: jax.Array, nfft: int, nchan: int) -> jax.Array:
    return bp_from_factored(jnp.swapaxes(bpf, -1, -2), nfft, nchan)


def unfactor_pack_realign_v2(planes: jax.Array, nfft: int, chanmin: int,
                             chanmax: int) -> jax.Array:
    """v2 packed planes (nseg, nout, 32, 64) [g, kB] -> (nsamps, nbytes)
    uint8: byte c = g + (P/4)*kB is the identical byte semantics of the
    original kernel's [kB, g] planes, so one tiny swapaxes reuses the
    whole realign path."""
    return unfactor_pack_realign(jnp.swapaxes(planes, -1, -2), nfft,
                                 chanmin, chanmax)
