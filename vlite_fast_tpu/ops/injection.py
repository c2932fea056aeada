"""FRB injection into the channelized data (production-path signal test).

Ref: set_frb_delays + inject_frb (src/pb_kernels.cu:338-391) and the arming
logic at src/process_baseband.cu:1098-1102,1231-1251: every 60 s an FRB at
DM 80, 2 ms width, amplitude 1.05 is swept through the band by multiplying
the FFT output inside the dispersed time-channel track; recovered downstream
at single-antenna S/N 25-30.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def frb_delays(nchan: int, dm: float, spectra_per_sec: float,
               freq_top_ghz: float = 0.384,
               bandwidth_ghz: float = 0.064) -> np.ndarray:
    """Dispersion delay per channel in spectra (ref src/pb_kernels.cu:338-346).

    delay_i = 4.15e-3 * dm * spectra_per_sec * (f_i^-2 - f_top^-2), with
    f_i = f_top - i*bw/nchan [GHz].
    """
    i = np.arange(nchan, dtype=np.float64)
    freq = freq_top_ghz - (i * bandwidth_ghz) / nchan
    scale = 4.15e-3 * dm * spectra_per_sec
    return (scale / (freq * freq) - scale / (freq_top_ghz ** 2)).astype(
        np.float32)


def inject_frb(fft_out: jax.Array, delays: jax.Array, nfft_since_frb,
               frb_width_spectra: float, frb_amp: float) -> jax.Array:
    """Multiply the dispersed track by frb_amp (ref src/pb_kernels.cu:348-391).

    fft_out: (npol, nspec, nchan) complex; delays: (nchan,) in spectra;
    nfft_since_frb: spectra elapsed since the burst's top-of-band arrival
    (may be a traced scalar).  The track in this chunk spans, per channel,
    spectra [floor(d+0.5), floor(d+width+0.5)] - nfft_since_frb, inclusive.
    """
    npol, nspec, nchan = fft_out.shape
    lo = jnp.floor(delays + 0.5).astype(jnp.int32) - nfft_since_frb
    hi = jnp.floor(delays + frb_width_spectra + 0.5).astype(
        jnp.int32) - nfft_since_frb
    t = jnp.arange(nspec, dtype=jnp.int32)[:, None]        # (nspec, 1)
    mask = (t >= lo[None, :]) & (t <= hi[None, :])         # (nspec, nchan)
    amp = jnp.where(mask, jnp.float32(frb_amp), jnp.float32(1.0))
    return fft_out * amp[None, :, :]
