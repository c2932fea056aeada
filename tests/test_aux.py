"""Aux subsystem tests: VLA XML parsing, dump unwrap, watchdog, recorder,
waterfall, CLI."""

import json
import subprocess
import sys

import numpy as np
import pytest

from vlite_fast_tpu import constants as C
from vlite_fast_tpu.analysis import unwrap as uw
from vlite_fast_tpu.analysis import waterfall as wfm
from vlite_fast_tpu.runtime import vla_xml, watchdog, recorder
from vlite_fast_tpu.utils import vdif


OBS_XML = """<?xml version="1.0"?>
<Observation datasetId="X_osro.57889" configId="cfg-1"
             startTime="57889.12345">
  <name>J0534+2200</name>
  <ra>1.4596748</ra>
  <dec>0.3842255</dec>
  <scanNo>5</scanNo>
  <subscanNo>1</subscanNo>
  <intent>OBSERVE_TARGET</intent>
</Observation>"""

FINISH_XML = OBS_XML.replace("OBSERVE_TARGET", "FINISH")

ANTPROP_XML = """<?xml version="1.0"?>
<AntennaPropertyTable creation="57889.1" datasetID="X1"
                      configuration="B">
  <AntennaProperties name="ea05">
    <X>-1601.2</X><Y>480.1</Y><Z>12.5</Z><axisOffset>2.1</axisOffset>
  </AntennaProperties>
  <AntennaProperties name="ea12">
    <X>93.9</X><Y>-210.0</Y><Z>3.3</Z><axisOffset>2.0</axisOffset>
  </AntennaProperties>
  <eopday><epoch>57889</epoch><tai_utc>37.0</tai_utc>
    <ut1_utc>0.41</ut1_utc><x_pole>0.1</x_pole><y_pole>0.3</y_pole>
  </eopday>
</AntennaPropertyTable>"""

ALERT_XML = """<EVLAMessage location="ea07-fe" timestamp="57889.5">
  <device name="frontend"><monitor name="lowTemp" alert="1"/></device>
</EVLAMessage>"""


class TestVlaXml:
    def test_obs(self):
        od = vla_xml.parse_obs_document(OBS_XML)
        assert od.name == "J0534+2200"
        assert abs(od.ra - 1.4596748) < 1e-9
        assert od.scan_no == 5 and od.subscan_no == 1
        assert od.datasetId == "X_osro.57889"
        assert not od.finishes

    def test_finish_intent(self):
        assert vla_xml.parse_obs_document(FINISH_XML).finishes

    def test_antprop(self):
        ap = vla_xml.parse_antprop_document(ANTPROP_XML)
        assert ap.array_configuration == "B"
        assert set(ap.antennas) == {5, 12}
        assert ap.antennas[5].X == -1601.2
        assert ap.eops[0].mjd == 57889
        assert ap.eops[0].tai_utc == 37.0

    def test_alert(self):
        al = vla_xml.parse_alert_document(ALERT_XML)
        assert al.vla_ant == 7
        assert al.location_suffix == "fe"
        assert al.device_name == "frontend"
        assert al.alert_state == 1

    def test_dispatch(self):
        assert vla_xml.parse_scaninfo(OBS_XML).name == "J0534+2200"
        assert 5 in vla_xml.parse_scaninfo(ANTPROP_XML).antennas
        assert vla_xml.parse_scaninfo(ALERT_XML).vla_ant == 7
        with pytest.raises(ValueError):
            vla_xml.parse_scaninfo("<Bogus/>")


class TestUnwrap:
    def _stream(self, rate=50_000, nsec=3, start=100):
        samples = np.random.default_rng(0).integers(
            1, 255, (2, rate * nsec), dtype=np.uint8)
        return vdif.streams_to_frames(samples, 40, start,
                                      sample_rate=rate), rate

    def test_clean(self):
        raw, rate = self._stream()
        rep = uw.find_discontinuity(raw, frames_per_sec=rate // 5000)
        assert rep.clean and rep.discontinuities == (0, 0)

    def test_wrap_detect_and_fix(self):
        raw, rate = self._stream()
        fps = rate // 5000
        # simulate a dump that started mid-ring AND lost a few frames at
        # the overwrite boundary (a pure whole-period rotation is cyclic
        # in frame numbers and genuinely invisible to db_unwrap too)
        a = C.VDIF_FRAME_BYTES
        cut = 13 * a
        wrapped = np.concatenate([raw[cut:], raw[6 * a:cut]])
        rep = uw.find_discontinuity(wrapped, frames_per_sec=fps)
        assert not rep.clean and not rep.corrupted
        assert rep.discontinuities == (1, 1)
        fixed = uw.unwrap(wrapped, rep)
        rep2 = uw.find_discontinuity(fixed, frames_per_sec=fps)
        assert rep2.clean

    def test_corrupt_raises(self):
        raw, rate = self._stream()
        fps = rate // 5000
        a = C.VDIF_FRAME_BYTES
        mangled = np.concatenate([raw[: 4 * a], raw[8 * a: 12 * a],
                                  raw[16 * a: 20 * a], raw[24 * a:]])
        rep = uw.find_discontinuity(mangled, frames_per_sec=fps)
        assert rep.corrupted
        with pytest.raises(ValueError):
            uw.unwrap(mangled, rep)


class TestWatchdog:
    def test_escalating_counter(self):
        c = watchdog.EscalatingCounter("skips", warn=3, abort=6)
        assert c.add() is None
        assert c.add(2) == "warn"
        assert c.add() is None       # warned once
        assert c.add(2) == "abort"
        c.reset()
        assert c.count == 0 and not c.warned

    def test_stall_detector(self):
        s = watchdog.StallDetector(timeout=10.0)
        s.beat("capture", now=0.0)
        s.beat("dsp", now=5.0)
        assert s.check(now=9.0) == []
        assert s.check(now=12.0) == ["capture"]
        assert set(s.check(now=20.0)) == {"capture", "dsp"}


class TestRecorder:
    def test_periodic(self):
        trigs = list(recorder.periodic_triggers(100.0, interval=2.0,
                                                duration=1.0, count=3))
        assert [t.t0 for t in trigs] == [100.0, 102.0, 104.0]
        assert all(t.t1 - t.t0 == 1.0 for t in trigs)

    def test_run_recorder(self):
        seen = []
        n = recorder.run_recorder(seen.append, interval=0.5, count=4)
        assert n == 4 and len(seen) == 4


class TestWaterfall:
    def test_downsample(self):
        d = np.arange(64 * 32, dtype=np.float32).reshape(64, 32)
        w = wfm.downsample(d, max_time=16, max_chan=8)
        assert w.shape == (16, 8)
        assert abs(w.mean() - d.mean()) < 1e-3

    def test_png(self, tmp_path):
        wf = np.random.default_rng(0).standard_normal((100, 50))
        out = wfm.render_png(wf, {"tsamp": 0.1, "fch1": 384.0,
                                  "foff": -0.1, "source": "test"},
                             str(tmp_path / "wf.png"))
        import os
        assert os.path.getsize(out) > 1000


class TestCLI:
    def test_synth_and_unwrap(self, tmp_path):
        out = tmp_path / "synth.vdif"
        from vlite_fast_tpu import cli
        cli.main(["synth", "-t", "0.5", "-d", "0", "-p", "0.1",
                  "--rate", "1000000", "--bandwidth", "0.5",
                  "--buflen", "250000", "-o", str(out)])
        assert out.stat().st_size > 100_000
        cli.main(["unwrap", str(out)])
