"""Host-runtime coadd-stream search (VERDICT round-1 item 2).

The reference searches the coadded filterbank via agdadacoadd +
agtriggerhook (ref scripts/start_coadd:19-57, scripts/start_process:21) —
the sqrt(N) sensitivity multiplier.  These tests prove the ArrayPipeline
equivalent: a pulse injected at per-antenna S/N ~4 (below the per-beam
candidate threshold) must be recovered from the 8-antenna coadded stream
and raise a trigger, with no single beam triggering on its own.
"""

import numpy as np
import pytest

from vlite_fast_tpu.config import (AntennaConfig, ArrayConfig,
                                   PipelineConfig, SearchConfig,
                                   TriggerConfig)
from vlite_fast_tpu.models import synthesis
from vlite_fast_tpu.runtime.control import ObservationDocument
from vlite_fast_tpu.runtime.pipeline import COADD_BEAM, ArrayPipeline

NANT = 8
DM = 300.0
TOBS = 2
AMP = 0.088   # tuned: per-antenna peak S/N ~3-5, coadd ~ sqrt(8)x that


def make_acfg():
    return ArrayConfig(
        antennas=tuple(AntennaConfig(station_id=i + 1, name=f"ea{i+1:02d}")
                       for i in range(NANT)),
        pipeline=PipelineConfig.tiny(freq_top_mhz=320.5, bandwidth_mhz=0.5),
        search=SearchConfig(dm_min=0.0, dm_max=600.0, ndm=61,
                            gulp_samps=512, boxcar_max=16, zap_ranges=(),
                            snr_thresh=6.0),
        trigger=TriggerConfig(snr_thresh=7.5, coadd_snr_thresh=7.5,
                              min_beams=2, min_dm=20.0))


def ant_seconds(cfg, seed):
    synth = synthesis.SynthConfig(
        tobs=float(TOBS), dm=DM, pulse_period=0.05, skip_period=16,
        amp=AMP, seed=seed, sample_rate=cfg.sample_rate,
        freq_bot_mhz=320.0, bandwidth_mhz=0.5, buflen=250_000)
    samples, _ = synthesis.generate_baseband(synth)
    return [(1.6e9 + s, samples[:, s * cfg.sample_rate:
                                (s + 1) * cfg.sample_rate])
            for s in range(TOBS)]


@pytest.fixture(scope="module")
def array_run():
    acfg = make_acfg()
    ap = ArrayPipeline(acfg, out_dir="/tmp/vfast_coaddrt", keep_rings=False)
    od = ObservationDocument(name="COADDTEST", ra=1.0, dec=0.5,
                             scan_no=1, start_time=1.6e9)
    per_ant = {a.station_id: ant_seconds(acfg.pipeline, 100 + i)
               for i, a in enumerate(acfg.antennas)}
    result = ap.run_observation(per_ant, od)
    ap.close()
    return acfg, result


def test_no_single_beam_trigger(array_run):
    """Per-antenna S/N ~4: no beam may produce a trigger-grade candidate."""
    _, result = array_run
    for sid, prod in result["products"].items():
        for c in prod.candidates:
            assert c.snr < 7.5, (sid, c)


def test_coadd_recovers_weak_pulse(array_run):
    """The 8-antenna coadd must find the pulse at the injected DM."""
    _, result = array_run
    cands = result["coadd_candidates"]
    assert cands, "coadd search found nothing"
    best = max(cands, key=lambda c: c.snr)
    assert best.snr > 7.5
    assert abs(best.dm - DM) < 100.0


def test_coadd_candidate_raises_trigger(array_run):
    """The coadd candidate must pass the trigger plane (agtriggerhook
    semantics: no min_beams cut for the coadded stream)."""
    _, result = array_run
    assert result["triggers"], "no trigger from the coadd stream"
    t = max(result["triggers"], key=lambda t: t.sn)
    assert t.sn > 7.5
    assert abs(t.dm - DM) < 100.0


class TestCoaddTapResync:
    """ADVICE r2: CoaddSearcher.tap must verify lockstep via the offset,
    zero-filling gaps and dropping duplicates instead of silently summing
    misaligned time ranges."""

    def _searcher(self):
        from vlite_fast_tpu.config import PipelineConfig, SearchConfig
        from vlite_fast_tpu.runtime.pipeline import CoaddSearcher
        cfg = PipelineConfig.tiny()
        scfg = SearchConfig.tiny(gulp_samps=1 << 20)  # never auto-search
        return cfg, CoaddSearcher([0, 1], cfg, scfg)

    def _blk(self, cfg, n, byte=0xFF):
        import numpy as np
        return np.full((n, cfg.nchanout * cfg.nbit // 8), byte, np.uint8)

    def test_gap_zero_filled(self):
        import numpy as np
        cfg, cs = self._searcher()
        n = 32
        b = self._blk(cfg, n)
        cs.tap(0, 0, b)
        cs.tap(1, 0, b)
        assert cs._co.total == n
        cs.tap(0, n, b)
        cs.tap(1, 2 * n, b)       # station 1 dropped [n, 2n)
        cs.tap(0, 2 * n, b)
        assert cs._co.total == 3 * n
        full = np.asarray(cs._co.window(0, n), np.float32)
        gap = np.asarray(cs._co.window(n, 2 * n), np.float32)
        # the gap region sums one stream instead of two: half the power
        assert np.allclose(gap, full / 2, atol=1e-3)
        tail = np.asarray(cs._co.window(2 * n, 3 * n), np.float32)
        assert np.allclose(tail, full, atol=1e-3)

    def test_duplicate_dropped(self):
        cfg, cs = self._searcher()
        n = 32
        b = self._blk(cfg, n)
        cs.tap(0, 0, b)
        cs.tap(1, 0, b)
        cs.tap(1, 0, b)           # full re-delivery: must be dropped
        assert cs._co.total == n
        assert not cs._pending[1]
        cs.tap(0, n, b)
        cs.tap(1, n, b)           # lockstep resumes cleanly
        assert cs._co.total == 2 * n

    def test_partial_overlap_trimmed(self):
        cfg, cs = self._searcher()
        n = 32
        b = self._blk(cfg, n)
        cs.tap(0, 0, b)
        cs.tap(1, 0, b)
        # station 1 re-sends the last half second plus new data
        cs.tap(1, n // 2, b)      # covers [n/2, 3n/2): keep [n, 3n/2)
        cs.tap(0, n, self._blk(cfg, n // 2))
        assert cs._co.total == n + n // 2
