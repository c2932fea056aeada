"""TDOA event localization from per-baseline delays.

The loc_step2/loc_step3 role of the reference (analysis/loc_step2.py:19+,
loc_step3.py:25-320): measure per-baseline arrival-time differences of a
dedispersed pulse, then chi^2-fit a sky direction on a grid with zoom.
The reference grids on healpix; here a plain (az, el) plane-wave grid with
iterative zoom — no healpy dependency — which is equivalent for the
single-source TDOA problem.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

C_LIGHT = 299_792_458.0


def direction_unit(az: np.ndarray, el: np.ndarray) -> np.ndarray:
    """(az, el) radians -> unit vector(s), ENU convention."""
    az, el = np.broadcast_arrays(az, el)
    return np.stack([np.cos(el) * np.sin(az),
                     np.cos(el) * np.cos(az),
                     np.sin(el)], axis=-1)


def expected_delays(positions: np.ndarray, pairs: Sequence[Tuple[int, int]],
                    s_hat: np.ndarray) -> np.ndarray:
    """Plane-wave arrival-time differences t_i - t_j for each baseline
    (i, j).  A wavefront from direction s_hat reaches antenna r at
    t(r) = t0 - r.s_hat/c (antennas closer to the source receive
    EARLIER), so tau_ij = (r_j - r_i) . s_hat / c — matching what
    analysis.baseband.baseline_delay(a=i, b=j) measures.  The opposite
    sign converges the TDOA fit on the MIRRORED azimuth (az_true + pi;
    verified numerically on a physically-encoded plane wave).
    s_hat may be (..., 3)."""
    d = np.stack([positions[j] - positions[i] for i, j in pairs])  # (nb, 3)
    return np.einsum("bk,...k->...b", d, s_hat) / C_LIGHT


@dataclass
class TDOAFit:
    az: float
    el: float
    chi2: float
    chi2_map: np.ndarray
    az_grid: np.ndarray
    el_grid: np.ndarray


def fit_tdoa(positions: np.ndarray, pairs: Sequence[Tuple[int, int]],
             delays: np.ndarray, sigma: float = 100e-9,
             clock_offsets: Optional[np.ndarray] = None,
             n_grid: int = 64, n_zoom: int = 3) -> TDOAFit:
    """Grid + zoom chi^2 fit of the arrival direction
    (ref analysis/loc_step3.py:25-320 healpix grid + zoom, including the
    per-antenna clock-delay correction).

    positions: (nant, 3) meters; delays: (nbaseline,) seconds for `pairs`;
    clock_offsets: optional (nant,) seconds subtracted as
    tau_ij -> tau_ij - (c_i - c_j).
    """
    delays = np.asarray(delays, np.float64)
    if clock_offsets is not None:
        corr = np.array([clock_offsets[i] - clock_offsets[j]
                         for i, j in pairs])
        delays = delays - corr
    az_lo, az_hi = 0.0, 2 * np.pi
    el_lo, el_hi = 0.0, np.pi / 2
    best = (0.0, 0.0, np.inf)
    chi2_map = None
    azg = elg = None
    for _ in range(n_zoom):
        azg = np.linspace(az_lo, az_hi, n_grid)
        elg = np.linspace(el_lo, el_hi, n_grid)
        AZ, EL = np.meshgrid(azg, elg, indexing="ij")
        s = direction_unit(AZ, EL)                       # (n, n, 3)
        model = expected_delays(positions, pairs, s)     # (n, n, nb)
        chi2_map = (((model - delays) / sigma) ** 2).sum(axis=-1)
        k = np.unravel_index(np.argmin(chi2_map), chi2_map.shape)
        best = (float(AZ[k]), float(EL[k]), float(chi2_map[k]))
        daz = (az_hi - az_lo) / n_grid * 4
        dele = (el_hi - el_lo) / n_grid * 4
        az_lo, az_hi = best[0] - daz, best[0] + daz
        el_lo, el_hi = max(0.0, best[1] - dele), min(np.pi / 2,
                                                     best[1] + dele)
    return TDOAFit(az=best[0], el=best[1], chi2=best[2],
                   chi2_map=chi2_map, az_grid=azg, el_grid=elg)


def refine_dm(fb: np.ndarray, tsamp: float, freqs_mhz: np.ndarray,
              dm_grid: np.ndarray) -> Tuple[float, np.ndarray]:
    """Pulse/DM refinement on a filterbank block: pick the DM maximizing the
    peak dedispersed S/N (ref analysis/loc_step0.py:44-176)."""
    from vlite_fast_tpu.ops import dedisperse as dd
    delays = dd.delay_table(np.asarray(dm_grid), freqs_mhz, tsamp)
    ntime_out = fb.shape[0] - int(delays.max())
    prof = dd.dedisperse_reference(fb.astype(np.float32), delays, ntime_out)
    snr = (prof.max(axis=1) - np.median(prof, axis=1)) / (
        prof.std(axis=1) + 1e-12)
    return float(dm_grid[int(np.argmax(snr))]), snr
