"""Station daemon integration: leader commands -> replay observation ->
candidates shipped to the coincidencer -> trigger fanout -> voltage dump.
The whole multi-process topology of the reference in one test
(SURVEY.md section 4: multi-node test without the VLA, via fake ODs)."""

import os
import time

import numpy as np
import pytest

from vlite_fast_tpu.config import (PipelineConfig, SearchConfig,
                                   TriggerConfig)
from vlite_fast_tpu.models import synthesis
from vlite_fast_tpu.runtime.candidate_server import CoincidencerServer
from vlite_fast_tpu.runtime.control import Command, ObservationDocument
from vlite_fast_tpu.runtime.station_main import StationDaemon
from vlite_fast_tpu.runtime.trigger import TriggerSender
from vlite_fast_tpu.utils import vdif


@pytest.fixture(scope="module")
def synth_vdif(tmp_path_factory):
    d = tmp_path_factory.mktemp("vdif")
    cfg = synthesis.SynthConfig(
        tobs=2.0, dm=300.0, pulse_period=0.05, skip_period=16, amp=0.4,
        seed=21, sample_rate=1_000_000, freq_bot_mhz=320.0,
        bandwidth_mhz=0.5, buflen=250_000)
    stream, info = synthesis.generate_vdif(cfg, ref_epoch=40,
                                           start_second=1000, station_id=7)
    path = d / "obs.vdif"
    stream.tofile(path)
    return str(path)


def test_full_topology(synth_vdif, tmp_path):
    cfg = PipelineConfig.tiny(freq_top_mhz=320.5, bandwidth_mhz=0.5)
    scfg = SearchConfig(dm_min=0.0, dm_max=600.0, ndm=60, gulp_samps=512,
                        boxcar_max=16, zap_ranges=(), snr_thresh=6.0)
    triggers_seen = []

    # coincidencer + trigger fanout (leader side)
    tx = TriggerSender([("127.0.0.1", 37913)])

    def on_trigger(t):
        triggers_seen.append(t)
        tx.send(t)

    srv = CoincidencerServer(port=37914, tsamp=cfg.tsamp,
                             tcfg=TriggerConfig(min_dm=100.0),
                             on_trigger=on_trigger)
    daemons = []
    try:
        for sid in (1, 2):
            daemons.append(StationDaemon(
                sid, cfg, scfg, str(tmp_path / f"st{sid}"),
                command_port=None, coincidencer=("127.0.0.1", 37914),
                trigger_port=37913 if sid == 1 else None))

        from vlite_fast_tpu.runtime.capture import replay_file
        od = ObservationDocument(name="pulse", scan_no=2,
                                 start_time=0.0)
        for d in daemons:
            secs = ((s, b) for s, b, _ in
                    replay_file(synth_vdif, sample_rate=cfg.sample_rate))
            prod = d.run_observation(secs, od)
            assert prod.seconds == 2
            assert len(prod.candidates) >= 1

        deadline = time.time() + 20
        while not triggers_seen and time.time() < deadline:
            time.sleep(0.05)
        assert triggers_seen, "coincidencer produced no trigger"
        t = triggers_seen[0]
        assert abs(t.dm - 300.0) < 75.0

        # station 1's trigger listener should have dumped voltages
        deadline = time.time() + 20
        dump_dir = str(tmp_path / "st1" / "dumps")
        while time.time() < deadline:
            if os.path.isdir(dump_dir) and os.listdir(dump_dir):
                break
            time.sleep(0.1)
        files = os.listdir(dump_dir)
        assert files, "no voltage dump written"
        # the dump must settle to whole ring slots (the dumper may still
        # be writing when the directory first becomes non-empty)
        path = os.path.join(dump_dir, files[0])
        sec_bytes = cfg.npol_in * cfg.sample_rate
        deadline = time.time() + 20
        while time.time() < deadline:
            sz = os.path.getsize(path)
            if sz > 0 and sz % sec_bytes == 0:
                time.sleep(0.2)
                if os.path.getsize(path) == sz:
                    break
            time.sleep(0.1)
        raw = np.fromfile(path, np.uint8)
        assert raw.size % sec_bytes == 0 and raw.size > 0
    finally:
        for d in daemons:
            d.shutdown()
        srv.close()
        tx.close()
