"""Fused Pallas RFI front-end: uint8 convert + kurtosis window stats +
D'Agostino gates + mask, in ONE kernel pass.

MEASURED OUTCOME (TPU v5 lite, production geometry, in-chain A/B with
byte-identical outputs): the fused kernel is ~10% SLOWER than the XLA
graph form (rfi_mode=2: 65-67 vs 59-63 ms per data-second; mode 1:
47-49 vs 44-46).  The hypothesis it tested — that the ~16 ms/s cost of
the stage (mode1 minus mode0) is per-kernel-launch overhead a single
fused launch would reclaim — is WRONG: XLA's fusion of
convert+stats+mask into the surrounding chain beats the hand-fused
single pass (whose uint8->int32->f32 load path and per-tile DMA grid
add more than the launches save).  Same shape of result as the
one-pass Pallas EMA (ops/pallas_kernels.py).  The default therefore
stays cfg.rfi_impl='xla'; this kernel remains available ('pallas'),
parity-tested, as the measured record and for future hardware.

Design notes (what the kernel does in its one pass): reads the raw
uint8 voltages once, writes the masked float32 voltages once, every
intermediate (window stats, TS, block stats, gates) in registers/VMEM.

Semantics mirror ops/kurtosis.rfi_excise exactly (same formulas, same
constants from constants.dagostino_constants; ref src/pb_kernels.cu:
35-318):

  x = u/128 - 1 (u==0 stays 0)                        [convertarray]
  m2, m4 per nkurto window -> kur = m4/m2^2           [kurtosis]
  dag = D'Agostino TS(kur, nkurto), pol-combined max  [compute_dagostino]
  block stats over wpf windows, zero-weighting
    already-flagged windows -> kur_b                  [block_kurtosis]
  dag_fb = TS(kur_b, nfft)                            [compute_dagostino2]
  gate = dag < thresh  [AND dag_fb < fb_thresh]       [apply_kurtosis +
  masked = x * gate; weights = mean(gate) per block    the live dag_fb
                                                       gate]

f32 reduction order inside a window differs from XLA's, so windows with
TS within ~1 ulp of the threshold can flag differently — parity is
defined as flag agreement (tests assert == on clean synthetic data and
>=99.9% agreement near threshold), per SURVEY.md section 7
"Exactness of statistics".

Tile layout: windows on the sublane axis (WT per tile, a multiple of
both 8 and windows-per-fft so whole FFT blocks stay in-tile), the
nkurto samples of each window on lanes (block last dim == array dim —
the Mosaic full-dimension exception).  Stats outputs are (nwin, npol)
so their last dim is the full array dim.  uint8 loads cast via int32
(Mosaic has no u8->f32 cast and no u8 vector compare).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vlite_fast_tpu import constants as C


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ts(kur, k: dict, dag_inf: float):
    """D'Agostino TS of a kurtosis array (ops/kurtosis.dagostino_ts
    without the pol reduction).

    Mosaic has no cbrt primitive; since the cube root only matters where
    t > 0 (t <= 0 maps to DAG_INF), compute it as exp(log(t)/3) on a
    positivity-guarded argument.  Differs from XLA's cbrt by <=2 ulp —
    flags flip only for TS within ~1e-6 of the threshold (the f32
    reduction-order caveat of SURVEY.md section 7 already covers this).
    """
    t = (1.0 - 2.0 / k["A"]) / (1.0 + (kur - 3.0 - k["mu1"]) * k["Z2_3"])
    cb = jnp.exp(jnp.log(jnp.where(t > 0, t, 1.0)) * (1.0 / 3.0))
    dag = jnp.abs(k["Z2_1"] * (k["Z2_2"] - cb))
    dag = jnp.where(t > 0, dag, dag_inf)
    return jnp.where(kur == 0.0, dag_inf, dag)


def _front_kernel(u_ref, masked_ref, dagt_ref, wt_ref, *,
                  wpf: int, dag_thresh: float,
                  dag_fb_thresh: float, kf: dict, kb: dict,
                  dag_inf: float):
    """One (window-tile) cell: WT windows x nkurto samples, both pols."""
    npol = u_ref.shape[0]
    WT = u_ref.shape[1]
    ui = u_ref[...].astype(jnp.int32)              # (npol, WT, nkurto)
    x = ui.astype(jnp.float32) * (1.0 / 128.0) - 1.0
    x = jnp.where(ui == 0, 0.0, x)
    x2 = x * x
    m2 = jnp.mean(x2, axis=-1)                     # (npol, WT)
    m4 = jnp.mean(x2 * x2, axis=-1)
    kur = jnp.where(m2 == 0.0, 0.0,
                    m4 / jnp.where(m2 == 0.0, 1.0, m2 * m2))
    dag = jnp.max(_ts(kur, kf, dag_inf), axis=0)   # (WT,) pol-combined
    fine_good = dag < dag_thresh                   # (WT,)

    if dag_fb_thresh > 0:
        # block stats over wpf-window FFT blocks (whole blocks per tile)
        nblk = WT // wpf
        wt3 = jnp.broadcast_to(fine_good.astype(jnp.float32),
                               (npol, WT)).reshape(npol, nblk, wpf)
        p3 = m2.reshape(npol, nblk, wpf)
        q3 = kur.reshape(npol, nblk, wpf)
        wsum = jnp.sum(wt3, axis=-1)               # (npol, nblk)
        psum = jnp.sum(wt3 * p3, axis=-1)
        qsum = jnp.sum(wt3 * q3 * p3 * p3, axis=-1)
        good_b = wsum > 0
        pblk = jnp.where(good_b,
                         psum / jnp.where(good_b, wsum, 1.0), 0.0)
        kblk = jnp.where(good_b,
                         qsum / jnp.where(good_b, wsum, 1.0)
                         / jnp.where(good_b, pblk * pblk, 1.0), 0.0)
        dag_fb = jnp.max(_ts(kblk, kb, dag_inf), axis=0)    # (nblk,)
        keep = dag_fb < dag_fb_thresh
        gate = jnp.logical_and(
            fine_good.reshape(nblk, wpf), keep[:, None]).reshape(WT)
    else:
        gate = fine_good

    g = gate.astype(jnp.float32)
    masked_ref[...] = x * g[None, :, None]
    dagt_ref[...] = dag[:, None]
    wt_ref[...] = jnp.broadcast_to(g[:, None], (WT, npol))


# NB deliberately NOT @jax.jit: an inner jit's closed_call nested inside
# the chain's lax.scan trips an MLIR lowering-cache KeyError on this
# backend (same family as the round-1 Mosaic nested-scan bug); as a
# plain traced function the kernel inlines fine.
def rfi_front(u: jax.Array, nkurto: int, nfft: int,
              dag_thresh: float = C.DAG_THRESH,
              dag_fb_thresh: float = C.DAG_FB_THRESH):
    """(npol, nsamp) uint8 -> (masked f32 (npol, nsamp),
    weights (npol, nblk), dag (nwin,)).

    Drop-in for convert_uint8 + rfi_excise's (masked, weights, dag)
    triple in the streaming chain (the pow_w/kur_w/dag_fb diagnostics of
    the XLA path are not produced — the chain does not consume them).
    """
    npol, nsamp = u.shape
    nwin = nsamp // nkurto
    wpf = nfft // nkurto
    nblk = nwin // wpf
    # tile: whole FFT blocks, sublane-aligned, <=512 windows
    base = wpf * 8 // math.gcd(wpf, 8)          # lcm(wpf, 8)
    wt_tile = base
    while wt_tile * 2 <= min(nwin, 512) and nwin % (wt_tile * 2) == 0:
        wt_tile *= 2
    if nwin % wt_tile:
        raise ValueError(f"nwin {nwin} not tileable by lcm(wpf,8)={base}")
    kf = C.dagostino_constants(nkurto)
    kb = C.dagostino_constants(nfft)
    kern = functools.partial(
        _front_kernel, wpf=wpf,
        dag_thresh=float(dag_thresh),
        dag_fb_thresh=float(dag_fb_thresh), kf=kf, kb=kb,
        dag_inf=float(C.DAG_INF))
    u3 = u.reshape(npol, nwin, nkurto)
    masked, dagt, wt = pl.pallas_call(
        kern,
        grid=(nwin // wt_tile,),
        in_specs=[pl.BlockSpec((npol, wt_tile, nkurto),
                               lambda i: (0, i, 0))],
        out_specs=[pl.BlockSpec((npol, wt_tile, nkurto),
                                lambda i: (0, i, 0)),
                   pl.BlockSpec((wt_tile, 1), lambda i: (i, 0)),
                   pl.BlockSpec((wt_tile, npol), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((npol, nwin, nkurto), jnp.float32),
                   jax.ShapeDtypeStruct((nwin, 1), jnp.float32),
                   jax.ShapeDtypeStruct((nwin, npol), jnp.float32)],
        interpret=_interpret(),
    )(u3)
    weights = jnp.mean(wt.T.reshape(npol, nblk, wpf), axis=-1)
    return masked.reshape(npol, nsamp), weights, dagt[:, 0]
