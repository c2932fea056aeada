"""Channelization: batched real FFT filterbank (+ WOLA polyphase variant).

The reference channelizes with batched cuFFT R2C plans of NFFT=12500 points,
2048 transforms per 100 ms chunk (src/process_baseband.cu:593-598,1222-1224).
Here the transform is jnp.fft.rfft over a reshaped (npol, nspec, nfft) block,
which XLA lowers to its native TPU FFT.  12500 = 2^2 * 5^5 is a smooth size.

The polyphase (weighted overlap-add) variant mirrors the offline
polyphase_filterbank in the reference analysis code
(analysis/baseband.py:1207-1238) and gives the sharper channel response used
for parity configs; it costs one extra elementwise multiply + tap sum.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def channelize(x: jax.Array, nfft: int) -> jax.Array:
    """(npol, nsamp) real voltages -> (npol, nspec, nchan) complex spectra.

    nchan = nfft//2 + 1; spectrum s covers samples [s*nfft, (s+1)*nfft).
    """
    npol, nsamp = x.shape
    frames = x.reshape(npol, nsamp // nfft, nfft)
    return jnp.fft.rfft(frames, axis=-1)


@lru_cache(maxsize=8)
def _pfb_window(ntap: int, nfft: int) -> np.ndarray:
    """Sinc-Hamming prototype filter, normalized so white-noise power is
    preserved (sum of squares = ntap*nfft / nfft)."""
    n = ntap * nfft
    t = (np.arange(n) - n / 2 + 0.5) / nfft
    w = np.sinc(t) * np.hamming(n)
    w *= np.sqrt(n / np.sum(w ** 2))
    return w.astype(np.float32)


def polyphase_channelize(x: jax.Array, nfft: int, ntap: int = 4) -> jax.Array:
    """WOLA polyphase filterbank (ref analysis/baseband.py:1207-1238).

    x: (npol, nsamp); output (npol, nspec, nchan) where
    nspec = nsamp//nfft - (ntap - 1): each spectrum consumes ntap*nfft
    samples advanced by nfft.
    """
    npol, nsamp = x.shape
    nspec_raw = nsamp // nfft
    nspec = nspec_raw - (ntap - 1)
    win = jnp.asarray(_pfb_window(ntap, nfft))
    frames = x.reshape(npol, nspec_raw, nfft)
    # gather ntap consecutive frames per output spectrum: (npol,nspec,ntap,nfft)
    idx = jnp.arange(nspec)[:, None] + jnp.arange(ntap)[None, :]
    taps = frames[:, idx, :]
    wola = jnp.sum(taps * win.reshape(ntap, nfft), axis=2)
    return jnp.fft.rfft(wola, axis=-1)
