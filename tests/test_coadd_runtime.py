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
