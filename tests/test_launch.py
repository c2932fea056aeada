"""One-command array launcher smoke test (VERDICT round-1 item 9).

`vlite-fast launch array.json --fake` must bring up the leader
(command bus + coincidencer + trigger fanout) and N REAL station-daemon
subprocesses, run a FAKE_START observation end-to-end over real sockets
(the writer.c:195-214 no-VLA path), and produce: per-beam .fil products,
a cross-beam coincidence trigger, and voltage dumps.
"""

import glob
import json
import os

import numpy as np
import pytest

from vlite_fast_tpu import cli
from vlite_fast_tpu.config import (AntennaConfig, ArrayConfig,
                                   PipelineConfig, SearchConfig,
                                   TriggerConfig)
from vlite_fast_tpu.models import synthesis


@pytest.mark.slow
def test_launch_fake_observation(tmp_path, capsys):
    # --- synthesize each antenna's replay file (common pulse, own noise)
    cfgp = PipelineConfig.tiny(freq_top_mhz=320.5, bandwidth_mhz=0.5)
    sources = []
    for k in range(2):
        s = synthesis.SynthConfig(
            tobs=2.0, dm=300.0, pulse_period=0.05, skip_period=16,
            amp=0.4, seed=21 + k, sample_rate=cfgp.sample_rate,
            freq_bot_mhz=320.0, bandwidth_mhz=0.5, buflen=250_000)
        stream, _ = synthesis.generate_vdif(s, ref_epoch=40,
                                            start_second=100,
                                            station_id=k + 1)
        path = tmp_path / f"ant{k + 1}.vdif"
        stream.tofile(path)
        sources.append(f"file:{path}")

    acfg = ArrayConfig(
        antennas=(
            AntennaConfig(station_id=1, name="ea01", source=sources[0]),
            AntennaConfig(station_id=2, name="ea02", source=sources[1])),
        pipeline=cfgp,
        search=SearchConfig(dm_min=0.0, dm_max=600.0, ndm=61,
                            gulp_samps=512, boxcar_max=16, zap_ranges=(),
                            snr_thresh=6.0, dm_grid_mode="linear"),
        trigger=TriggerConfig(snr_thresh=7.5, min_beams=2, min_dm=20.0),
        command_port=22101, coincidencer_port=22155,
        trigger_port_base=22200)
    cfg_path = tmp_path / "array.json"
    acfg.save(str(cfg_path))

    out = str(tmp_path / "products")
    cli.main(["launch", str(cfg_path), "--out-dir", out, "--fake",
              "--fake-duration", "150", "--startup-timeout", "120",
              "--platform", "cpu"])
    printed = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(printed[-1])
    assert summary["stations"] == 2
    assert summary["triggers"] >= 1

    fils = glob.glob(os.path.join(out, "*.fil"))
    # rfi_mode=2 writes BOTH streams per beam (excised + _plain, the
    # reference's -r 2 dual product)
    assert len(fils) == 4
    assert len([f for f in fils if f.endswith("_plain.fil")]) == 2
    dumps = glob.glob(os.path.join(out, "dumps", "*.vdif"))
    assert len(dumps) >= 2                      # both stations dumped
    for d in dumps:
        assert os.path.getsize(d) > 0


def test_launch_print_remote_plan(tmp_path, capsys):
    """AntennaConfig.host + `launch --print-remote` emit the ssh fan-out
    plan (the scripts/launch:5-12 + config/hosts role) without spawning
    anything."""
    acfg = ArrayConfig(
        antennas=(
            AntennaConfig(station_id=1, name="ea01", host="vd01",
                          source="udp:20000"),
            AntennaConfig(station_id=2, name="ea02",   # local: not planned
                          source="udp:20001"),
            AntennaConfig(station_id=3, name="ea03", host="vd03",
                          source="udp:20002")),
        pipeline=PipelineConfig.tiny(),
        search=SearchConfig.tiny(),
        trigger=TriggerConfig(),
        command_port=24101, coincidencer_port=24155,
        trigger_port_base=24200)
    cfg_path = tmp_path / "array.json"
    acfg.save(str(cfg_path))
    # round trip keeps the host column
    assert ArrayConfig.load(str(cfg_path)).antennas[0].host == "vd01"
    cli.main(["launch", str(cfg_path), "--out-dir", str(tmp_path),
              "--print-remote", "--leader-addr", "10.0.0.9"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l]
    assert len(lines) == 2
    assert lines[0].startswith("ssh vd01 nohup python3 -m "
                               "vlite_fast_tpu.runtime.station_main")
    assert "--leader 10.0.0.9" in lines[0]
    assert f"--coincidencer 10.0.0.9:24155" in lines[0]
    assert "--station 3" in lines[1] and "ssh vd03" in lines[1]
    assert "--trigger-port 24203" in lines[1]


@pytest.mark.slow
def test_launch_remote_plan_candidate_shipping(tmp_path, capsys):
    """VERDICT r2 item 7: a 2-'host' launch with candidate shipping over
    real sockets via the --print-remote path.  The 'remote' station is
    started from the EXACT command line the ssh fan-out plan emits (ssh
    prefix + shell redirects stripped, running locally — this environment
    has no second machine), the leader binds wildcard as it would for a
    real remote array, and a cross-beam coincidence trigger must flow:
    station candidates -> leader coincidencer (TCP) -> trigger fanout
    (UDP) -> both stations' dumpers."""
    import shlex
    import subprocess
    import sys as _sys
    import time as _t

    from vlite_fast_tpu.runtime.leader_main import Leader

    cfgp = PipelineConfig.tiny(freq_top_mhz=320.5, bandwidth_mhz=0.5)
    sources = []
    for k in range(2):
        s = synthesis.SynthConfig(
            tobs=2.0, dm=300.0, pulse_period=0.05, skip_period=16,
            amp=0.4, seed=31 + k, sample_rate=cfgp.sample_rate,
            freq_bot_mhz=320.0, bandwidth_mhz=0.5, buflen=250_000)
        stream, _ = synthesis.generate_vdif(s, ref_epoch=40,
                                            start_second=100,
                                            station_id=k + 1)
        path = tmp_path / f"ant{k + 1}.vdif"
        stream.tofile(path)
        sources.append(f"file:{path}")

    acfg = ArrayConfig(
        antennas=(
            AntennaConfig(station_id=1, name="ea01", source=sources[0]),
            AntennaConfig(station_id=2, name="ea02", host="vd02",
                          source=sources[1])),
        pipeline=cfgp,
        search=SearchConfig(dm_min=0.0, dm_max=600.0, ndm=61,
                            gulp_samps=512, boxcar_max=16, zap_ranges=(),
                            snr_thresh=6.0, dm_grid_mode="linear"),
        trigger=TriggerConfig(snr_thresh=7.5, min_beams=2, min_dm=20.0),
        command_port=26101, coincidencer_port=26155,
        trigger_port_base=26200)
    cfg_path = tmp_path / "array.json"
    acfg.save(str(cfg_path))
    out = str(tmp_path / "products")

    # 1. capture the fan-out plan for the remote station
    cli.main(["launch", str(cfg_path), "--out-dir", out,
              "--print-remote", "--leader-addr", "127.0.0.1",
              "--platform", "cpu"])
    plan = [l for l in capsys.readouterr().out.splitlines() if l]
    assert len(plan) == 1 and plan[0].startswith("ssh vd02 nohup ")
    # 2. the command a real deployment would run on vd02, executed here:
    #    strip `ssh vd02 nohup`, drop the shell-redirect tail, keep argv
    toks = shlex.split(plan[0])[3:]
    toks = [t for t in toks if t not in ("</dev/null", ">/dev/null",
                                         "2>&1", "&")]
    assert toks[0] == "python3"
    remote_cmd = [_sys.executable] + toks[1:]

    leader = Leader(acfg, out)
    procs = []
    try:
        # leader is wired for a remote array: wildcard bind + per-host
        # trigger fanout (the remote row resolves to vd02 -> unreachable
        # from here, so point it back at loopback for the socket test)
        assert leader.coincidencer._srv.getsockname()[0] == "0.0.0.0"
        assert leader.sender.endpoints[1][0] == "vd02"
        leader.sender.endpoints[1] = ("127.0.0.1",
                                      leader.sender.endpoints[1][1])
        procs.append(subprocess.Popen(remote_cmd))
        procs.append(subprocess.Popen(
            [_sys.executable, "-m", "vlite_fast_tpu.runtime.station_main",
             "--station", "1", "--config", str(cfg_path),
             "--source", sources[0], "--out-dir", out,
             "--leader", "127.0.0.1",
             "--command-port", str(acfg.command_port),
             "--coincidencer", f"127.0.0.1:{acfg.coincidencer_port}",
             "--trigger-port", str(acfg.trigger_port_base + 1),
             "--platform", "cpu"]))
        assert leader.wait_for_stations(2, timeout=120)
        leader.fake_observation()
        deadline = _t.time() + 150
        while _t.time() < deadline:
            if leader.coincidencer.triggers:
                _t.sleep(3.0)
                break
            _t.sleep(0.5)
        leader.stop_observation()
        _t.sleep(2.0)
    finally:
        leader.shutdown()
        for pr in procs:
            try:
                pr.wait(timeout=15)
            except subprocess.TimeoutExpired:
                pr.terminate()
                try:
                    pr.wait(timeout=5)
                except subprocess.TimeoutExpired:
                    pr.kill()

    # the coincidence required BOTH beams (min_beams=2), so candidates
    # from the plan-launched station crossed the TCP socket
    assert len(leader.coincidencer.triggers) >= 1
    dumps = glob.glob(os.path.join(out, "dumps", "*.vdif"))
    assert len(dumps) >= 2
    for d in dumps:
        assert os.path.getsize(d) > 0


def test_leader_binds_wildcard_for_remote_arrays(tmp_path):
    """With any remote antenna host, the leader's command bus and
    coincidencer must bind 0.0.0.0 (remote stations dial in) and trigger
    fanout must target each station's own host."""
    from vlite_fast_tpu.runtime.leader_main import Leader
    acfg = ArrayConfig(
        antennas=(AntennaConfig(1, "ea01", host="vd01"),
                  AntennaConfig(2, "ea02")),             # local
        pipeline=PipelineConfig.tiny(), search=SearchConfig.tiny(),
        trigger=TriggerConfig(),
        command_port=25101, coincidencer_port=25155,
        trigger_port_base=25200)
    led = Leader(acfg, str(tmp_path))
    try:
        assert led.messenger.bus._server.getsockname()[0] == "0.0.0.0"
        assert led.coincidencer._srv.getsockname()[0] == "0.0.0.0"
        assert led.sender.endpoints == [("vd01", 25201),
                                        ("127.0.0.1", 25202)]
    finally:
        led.shutdown()

    # all-local arrays stay on loopback (no open wildcard ports)
    acfg2 = ArrayConfig(
        antennas=(AntennaConfig(1, "ea01"), AntennaConfig(2, "ea02")),
        pipeline=PipelineConfig.tiny(), search=SearchConfig.tiny(),
        trigger=TriggerConfig(),
        command_port=25111, coincidencer_port=25156,
        trigger_port_base=25300)
    led2 = Leader(acfg2, str(tmp_path))
    try:
        assert led2.messenger.bus._server.getsockname()[0] == "127.0.0.1"
    finally:
        led2.shutdown()
