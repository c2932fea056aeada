"""Gulp-based single-pulse search engine (the heimdall_stream role).

Drives ops.dedisperse over a streaming filterbank in overlapping gulps,
producing Candidate records compatible with the coincidencer
(runtime/trigger.py).  Ref invocation being replaced:
scripts/start_heimdall_single_antenna:21 (-nsamps_gulp 30720 -dm 2 1000
-boxcar_max 64 -zap_chans ... -coincidencer host:27555).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from vlite_fast_tpu.config import SearchConfig
from vlite_fast_tpu.ops import dedisperse as dd


def resolve_engine(engine: str) -> str:
    """'auto' -> the Pallas shift-and-sum on TPU (the production engine,
    0.18 s vs 0.90 s Fourier per 24 s gulp, ops/dedisperse_pallas.py),
    the gather subband engine elsewhere (CPU tests: XLA gathers are fine
    off-TPU and avoid Pallas interpret-mode overhead)."""
    if engine != "auto":
        return engine
    import jax
    return "pallas" if jax.default_backend() == "tpu" else "subband"


def boxcar_widths(boxcar_max: int) -> tuple:
    w, out = 1, []
    while w <= boxcar_max:
        out.append(w)
        w *= 2
    return tuple(out)


class SinglePulseSearch:
    """One beam's search engine.  Stateless across gulps except the plan."""

    def __init__(self, scfg: SearchConfig, tsamp: float,
                 freqs_mhz: np.ndarray, nsub: int = 0, nbatch: int = 0):
        self.scfg = scfg
        self.tsamp = float(tsamp)
        self.freqs_mhz = np.asarray(freqs_mhz)
        self.dms = dd.dm_grid(scfg.dm_min, scfg.dm_max, scfg.ndm)
        self.widths = boxcar_widths(scfg.boxcar_max)
        self.plan = dd.make_plan(self.dms, self.freqs_mhz, self.tsamp,
                                 nsub=nsub or scfg.nsub,
                                 nbatch=nbatch or scfg.nbatch,
                                 zap_ranges=scfg.zap_ranges)

    @property
    def overlap(self) -> int:
        """Lookahead samples a gulp needs beyond its own span (the max DM
        delay across the band — heimdall's gulp overlap)."""
        return self.plan.max_delay

    def snr_cube(self, fb_block: np.ndarray) -> jnp.ndarray:
        """(gulp+overlap, nchan) float32 -> (nwidth, ndm, gulp) S/N."""
        fb = jnp.asarray(fb_block, dtype=jnp.float32)
        ntime_out = fb.shape[0] - self.plan.max_delay
        engine = resolve_engine(self.scfg.engine)
        if engine == "pallas":
            from vlite_fast_tpu.ops import dedisperse_pallas as ddp
            dmt = ddp.dedisperse_pallas(fb, self.plan, ntime_out)
        elif engine == "fourier":
            dmt = dd.dedisperse_fourier(fb, self.plan, ntime_out)
        else:
            dmt = dd.dedisperse(fb, self.plan, ntime_out)
        return dd.boxcar_snr(dmt, self.plan.nchan_eff, self.widths)

    def search_gulp(self, fb_block: np.ndarray,
                    t_offset: int = 0) -> List[dd.Candidate]:
        """Search one gulp.  Blocks are zero-padded to the standard
        (gulp + overlap) length so every gulp — including ragged stream
        tails — reuses ONE compiled program (a fresh shape would cost a
        multi-minute TPU compile mid-observation)."""
        full = self.scfg.gulp_samps + self.overlap
        nvalid = fb_block.shape[0] - self.overlap
        if fb_block.shape[0] < full:
            pad = np.zeros((full - fb_block.shape[0], fb_block.shape[1]),
                           fb_block.dtype)
            fb_block = np.concatenate([fb_block, pad], axis=0)
        snr = np.asarray(self.snr_cube(fb_block))
        cands = dd.find_candidates(
            snr, self.dms, self.tsamp, thresh=self.scfg.snr_thresh,
            widths=self.widths, t_offset=t_offset,
            max_cands=self.scfg.max_candidates)
        # drop anything detected inside the zero padding
        limit = t_offset + nvalid
        return [c for c in cands if c.peak_idx < limit]

    def search_stream(self, fb: np.ndarray) -> List[dd.Candidate]:
        """Search a long (ntime, nchan) filterbank in overlapping gulps."""
        gulp = self.scfg.gulp_samps
        cands: List[dd.Candidate] = []
        t = 0
        ntime = fb.shape[0]
        while t < ntime:
            block = fb[t:t + gulp + self.overlap]
            if block.shape[0] <= self.overlap + max(self.widths):
                break
            # pad the ragged tail so compiled shapes stay static per gulp len
            cands.extend(self.search_gulp(block, t_offset=t))
            t += gulp
        return cands


def filterbank_from_packed(packed: np.ndarray, nbit: int,
                           nchanout: int) -> np.ndarray:
    """Unpack a quantized filterbank block (time, bytes) -> (time, chan)
    float, recentered so noise is ~zero-mean (undo quantizer offsets).

    The 2-bit mapping uses the expectations of the chi^2_16-optimized
    levels; for search purposes a linear re-map of level -> value suffices
    (same as heimdall reading 2-bit sigproc data).
    """
    from vlite_fast_tpu.ops.quantize import unpack_bits
    lev = np.asarray(unpack_bits(jnp.asarray(packed), nbit)).astype(np.float32)
    lev = lev.reshape(packed.shape[0], -1)[:, :nchanout]
    if nbit == 2:
        # approximate inverse of the 2-bit thresholds: level centroids of a
        # unit normal cut at (-0.6109, 0.3970, 1.4050)
        centroids = np.array([-1.24, -0.098, 0.85, 1.94], np.float32)
        return centroids[lev.astype(np.int32)]
    if nbit == 4:
        return (lev - 7.5) * np.float32(0.3188)
    return (lev - 127.5) * np.float32(0.02957)
