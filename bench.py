"""Headline benchmark: MEASURED full-stack antennas/chip.

Round-1 composed the headline from separately-timed DSP and search stages;
this version times the integrated per-antenna loop end-to-end — device DSP
chain (unpack+kurtosis+FFT+normalize+scrunch+2-bit), drain, incremental
gulp unpack, Pallas dedispersion search, boxcar S/N, and host candidate
extraction — through StationPipeline.feed_second with an injected FRB
(ref process_baseband.cu:1461-1481 RT margin), and reports the measured
candidate latency (ref src/trigger.py:164-166 documents 40-50 s for the
reference, gulp-bound).

Input seconds are pre-staged on device: the tunneled dev TPU's host->device
link (~30-60 MB/s) is not representative of production PCIe; the host-side
capture+ring path is measured separately (tests/test_capture_rate soak:
~250k frames/s ~ 4.9x the 51,200 frames/s wire rate).

vs_baseline: 1.0 = one antenna real-time on one device (the reference needs
one GPU per antenna); N = N antennas' full stack per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Backend-outage hardening: the tunneled axon TPU goes UNAVAILABLE for
# stretches (init blocks minutes then raises) — the round-2 capture was
# voided exactly this way.  Probe the backend in a SUBPROCESS with a
# bounded retry/backoff budget before committing the real run, so a
# recoverable outage costs minutes, not the round.
PROBE_TIMEOUT_S = int(os.environ.get("VFAST_BENCH_PROBE_TIMEOUT", "300"))
PROBE_BUDGET_S = int(os.environ.get("VFAST_BENCH_PROBE_BUDGET", "900"))
PROBE_BACKOFF_S = 60


def _backend_probe() -> str:
    """One subprocess probe: 'ok' (device visible), 'down' (init raised),
    or 'blocked' (init hung past the timeout).

    A hung probe gets SIGTERM + a grace period, NEVER an immediate
    SIGKILL: killing a client mid-device-acquisition leaves a stale
    tunnel lease that blocks the next client for many minutes — the
    exact stall the retry loop exists to survive."""
    p = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; assert len(jax.devices()) > 0"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        rc = p.wait(timeout=PROBE_TIMEOUT_S)
        return "ok" if rc == 0 else "down"
    except subprocess.TimeoutExpired:
        p.terminate()                 # graceful: lets jax release the lease
        try:
            p.wait(timeout=30)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
        return "blocked"


def wait_for_backend() -> None:
    """Retry the probe with backoff until it passes or the budget runs
    out; on exhaustion still fall through to the real attempt (nothing
    is lost vs failing immediately, and init may yet succeed).  A probe
    that HANGS (vs raising) means the backend is in its blocking-init
    mode — stop probing immediately and let the real run do the one
    long wait, instead of stacking more clients onto the lease."""
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        state = _backend_probe()
        if state == "ok":
            if attempt > 1:
                print(f"bench: backend up after {attempt} probes "
                      f"({time.monotonic() - t0:.0f}s)", file=sys.stderr)
            return
        if state == "blocked":
            print("bench: backend init is blocking (probe hung "
                  f"{PROBE_TIMEOUT_S}s); proceeding to the real run's "
                  "single long wait", file=sys.stderr)
            return
        waited = time.monotonic() - t0
        if waited >= PROBE_BUDGET_S:
            print(f"bench: backend probe budget exhausted "
                  f"({waited:.0f}s, {attempt} attempts); attempting the "
                  "run anyway", file=sys.stderr)
            return
        print(f"bench: backend unavailable (probe {attempt}); retrying "
              f"in {PROBE_BACKOFF_S}s", file=sys.stderr)
        time.sleep(PROBE_BACKOFF_S)


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the Pallas search kernel costs ~6 min to
    # compile once per geometry; cache it across bench invocations
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from vlite_fast_tpu.config import PipelineConfig, SearchConfig
    from vlite_fast_tpu.models import baseband_dsp as dsp
    from vlite_fast_tpu.runtime.control import ObservationDocument
    from vlite_fast_tpu.runtime.pipeline import StationPipeline

    dev = jax.devices()[0]
    cfg = PipelineConfig(inject_frb=True)  # reference geometry, rfi_mode 2
    # linear 1024-trial grid: comparable round-over-round and with the
    # round-1 baseline.  Production default is the tolerance-driven grid
    # (dm_grid_mode='tol', ~4.9k trials at dm_tol=1.25 — heimdall
    # semantics); searching it costs ~4.8x this gulp time, still >>RT.
    scfg = SearchConfig(dm_grid_mode="linear")  # DM 2-1000 x1024, 24 s

    # --- stage inputs on device (see module docstring) -------------------
    rng = np.random.default_rng(0)
    staged = []
    for k in range(3):
        raw_np = np.clip(rng.standard_normal(
            (cfg.npol_in, cfg.sample_rate)) / 0.05914 + 128.5,
            0, 255).astype(np.uint8)
        staged.append(jax.device_put(raw_np, dev))

    # --- raw DSP-chain rate (the round-1 metric, kept for comparison) ----
    state = jax.device_put(dsp.init_state(cfg), dev)
    arm = jnp.bool_(False)
    out, st = dsp.process_second(cfg, staged[0], state, arm)
    _ = np.asarray(out.packed_kur)          # host fetch = hard sync
    t0 = time.perf_counter()
    for i in range(10):
        out, st = dsp.process_second(cfg, staged[i % 3], st, arm)
    _ = np.asarray(out.packed_kur)
    _ = np.asarray(st.bp_kur)
    dsp_rt = 10 / (time.perf_counter() - t0)

    # the injection-free twin the pipeline actually dispatches outside
    # the ~2 s post-arm window (58 of every 60 s; host-side gating in
    # StationPipeline.feed_second).  Mirrors the pipeline's resolution:
    # on TPU, twin_chain_impl='auto' adopts the natural-layout
    # megakernel (chain_impl='megakernel2', 1.21x the XLA chain)
    import dataclasses
    twin_impl = dsp.resolve_twin_impl(cfg)
    cfg_off = dataclasses.replace(cfg, inject_frb=False,
                                  chain_impl=twin_impl)
    st2 = jax.device_put(dsp.init_state(cfg_off), dev)
    out2, st2 = dsp.process_second(cfg_off, staged[0], st2, arm)
    _ = np.asarray(out2.packed_kur)
    t0 = time.perf_counter()
    for i in range(10):
        out2, st2 = dsp.process_second(cfg_off, staged[i % 3], st2, arm)
    _ = np.asarray(out2.packed_kur)
    _ = np.asarray(st2.bp_kur)
    dsp_rt_gated = 10 / (time.perf_counter() - t0)

    # ON-TPU A/B assertion (ADVICE r3 #2): both loops ran the identical
    # un-armed input sequence.  When the twin runs the SAME chain_impl
    # the agreement must be BYTE-exact (the original host-gating
    # invariant); when the twin is the megakernel its EMA is
    # sequential-exact rather than the chain's closed-form 'matmul', so
    # the contract is the kernel's parity bar: >= 99.99% of 2-bit
    # levels (measured 99.9989%, bench_megakernel_full_tpu.py).
    # Compared on device; only the fraction crosses the tunnel.
    from vlite_fast_tpu.ops import quantize as q_ops
    lev_a = q_ops.unpack_bits(out.packed_kur, 2).astype(jnp.int32)
    lev_b = q_ops.unpack_bits(out2.packed_kur, 2).astype(jnp.int32)
    twin_agreement = float(jnp.mean((lev_a == lev_b).astype(jnp.float32)))
    twin_parity = twin_agreement == 1.0
    bar = 1.0 if twin_impl == cfg.chain_impl else 0.9999
    if twin_agreement < bar:
        raise AssertionError(
            f"injection-armed program and injection-free twin "
            f"({twin_impl}) agree on only {twin_agreement:.6f} of 2-bit "
            f"levels (bar {bar}) — host gating (pipeline.feed_second) "
            "is unsound")

    # blended steady-state rate (VERDICT r4 #9): the armed (slower)
    # program runs inject_window_seconds of every INJECT_PERIOD_S; a
    # production margin calculation needs the weighted harmonic blend,
    # not the injection-free headline alone
    from vlite_fast_tpu import constants as Cst
    f_armed = dsp.inject_window_seconds(cfg) / Cst.INJECT_PERIOD_S
    dsp_rt_blended = 1.0 / (f_armed / dsp_rt
                            + (1.0 - f_armed) / dsp_rt_gated)

    # --- utilization grounding (VERDICT r2 #9): measured FLOP/s and HBM
    # GB/s against the v5e peaks, so the RT factors map to hardware ----
    from vlite_fast_tpu.utils import perf
    dft = perf.dft_flops_per_data_second(cfg)
    chain_bytes = perf.chain_hbm_bytes_per_data_second(cfg)
    # one antenna-second of chain work per 1/dsp_rt wall seconds:
    dsp_hw_tflops = dft["hw_bf16_flops"] * dsp_rt / 1e12
    dsp_hbm_gbps = chain_bytes * dsp_rt / 1e9

    # Pallas dedispersion engine alone (the search hot kernel): same
    # geometry as the integrated loop's gulp program (cache-warm)
    from vlite_fast_tpu.models import search as search_mod
    from vlite_fast_tpu.ops import dedisperse_pallas as ddp
    eng = search_mod.SinglePulseSearch(scfg, cfg.tsamp, cfg.freqs_mhz())
    full = scfg.gulp_samps + eng.overlap
    fb_gulp = jax.device_put(
        rng.standard_normal((full, cfg.nchanout)).astype(np.float32), dev)
    ntime_out = full - eng.plan.max_delay
    dmt = ddp.dedisperse_pallas(fb_gulp, eng.plan, ntime_out)
    _ = float(jnp.sum(dmt))                 # host fetch = hard sync
    t0 = time.perf_counter()
    for _i in range(3):
        dmt = ddp.dedisperse_pallas(fb_gulp, eng.plan, ntime_out)
    _ = float(jnp.sum(dmt))
    dedisp_s = (time.perf_counter() - t0) / 3
    dcost = perf.dedisp_pallas_cost(eng.plan, cfg.nchanout, ntime_out)
    dedisp_hbm_gbps = dcost["hbm_bytes"] / dedisp_s / 1e9

    # --- integrated loop: StationPipeline with live gulp search ----------
    pipe = StationPipeline(1, cfg, scfg, out_dir="/tmp/vfast_bench",
                           keep_ring=False, write_cands=False)
    od = ObservationDocument(name="BENCH", start_time=1.7e9)
    n_sec = 40  # > one full gulp + overlap (~33 s) so the search runs hot
    # warmup observation compiles every step (DSP reused; search compiles
    # on the first completed gulp)
    pipe.begin_observation(od, write_fil=False)
    for s in range(n_sec):
        pipe.feed_second(1.7e9 + s, staged[s % 3])
    pipe.end_observation()

    # count gulps searched during the timed window (needed to derive the
    # tol-grid integrated number by search-cost substitution below)
    n_gulps = 0

    def _counted(orig):
        def f(*a, **k):
            nonlocal n_gulps
            n_gulps += 1
            return orig(*a, **k)
        return f
    pipe.search.search_gulp_device = _counted(pipe.search.search_gulp_device)
    pipe.search.search_gulp_packed = _counted(pipe.search.search_gulp_packed)

    pipe.begin_observation(od, write_fil=False)
    feed_times = {}
    cand_latency_wall = None
    cand_latency_data = None
    t0 = time.perf_counter()
    for s in range(n_sec):
        feed_times[s] = time.perf_counter()
        new = pipe.feed_second(1.7e9 + s, staged[s % 3])
        if new and cand_latency_wall is None:
            best = max(new, key=lambda c: c.snr)
            pulse_sec = int(best.peak_time)  # data-seconds from obs start
            cand_latency_wall = time.perf_counter() - feed_times.get(
                min(pulse_sec, s), t0)
            # gulp-bound latency in DATA time: the pipeline records it as
            # (end of the searched window incl. overlap) - pulse time —
            # deriving it from the post-advance _searched_to understated
            # the latency by the DM-1000 overlap (~12 s), the number ring
            # depth must be sized against
            cand_latency_data = pipe.metrics.get(
                "vfast_cand_latency_data_s")
    prod = pipe.end_observation()
    wall = time.perf_counter() - t0
    integrated_rt = n_sec / wall
    pipe.close()

    # --- PRODUCTION tol-grid integrated number (VERDICT r4 #5): time the
    # full device gulp program (dequantize -> Pallas dedisp -> boxcar ->
    # banded top-k -> host decode) on the heimdall -dm_tol grid (~4.9k
    # trials, the production default) and on the linear 1024-trial grid,
    # then substitute the per-gulp cost difference into the measured
    # integrated wall time.  Guarded: a tol-grid failure (compile/HBM)
    # must not void the headline.
    gulp_lin_s = gulp_tol_s = value_tolgrid = tol_trials = None
    try:
        def time_gulp(sps):
            eng_g = search_mod.SinglePulseSearch(sps, cfg.tsamp,
                                                 cfg.freqs_mhz())
            nbytes = cfg.npol_out * cfg.nchanout * cfg.nbit // 8
            full_g = sps.gulp_samps + eng_g.overlap
            pk = jax.device_put(rng.integers(
                0, 256, (full_g, nbytes), dtype=np.uint8), dev)
            eng_g.search_gulp_device(pk, cfg.nbit, 0, sps.gulp_samps)
            t = time.perf_counter()
            for _i in range(3):
                eng_g.search_gulp_device(pk, cfg.nbit, 0, sps.gulp_samps)
            return (time.perf_counter() - t) / 3, len(eng_g.dms)
        gulp_lin_s, _ = time_gulp(scfg)
        scfg_tol = SearchConfig()           # production default: tol grid
        gulp_tol_s, tol_trials = time_gulp(scfg_tol)
        value_tolgrid = n_sec / (wall + n_gulps * (gulp_tol_s - gulp_lin_s))
    except Exception as exc:
        print(f"bench: tol-grid timing failed ({exc!r}); reporting the "
              "linear headline only", file=sys.stderr)

    print(json.dumps({
        "metric": "measured full-stack antennas/chip (StationPipeline: "
                  "DSP + drain + Pallas dedisp search + candidates, "
                  "injected FRB recovered)",
        "value": round(integrated_rt, 3),
        "unit": "antennas per chip (x real-time, integrated loop)",
        "vs_baseline": round(integrated_rt, 3),
        "dsp_only_rt_factor": round(dsp_rt, 3),
        "dsp_only_rt_factor_gated": round(dsp_rt_gated, 3),
        "dsp_only_rt_factor_blended": round(dsp_rt_blended, 3),
        "twin_byte_parity": twin_parity,
        "twin_agreement": round(twin_agreement, 6),
        "twin_chain_impl": twin_impl,
        "value_tolgrid": None if value_tolgrid is None
        else round(value_tolgrid, 3),
        "tolgrid_trials": tol_trials,
        "gulp_lin_s": None if gulp_lin_s is None else round(gulp_lin_s, 4),
        "gulp_tol_s": None if gulp_tol_s is None else round(gulp_tol_s, 4),
        "gulps_searched": n_gulps,
        "seconds_processed": n_sec,
        "wall_s": round(wall, 3),
        "candidates": len(prod.candidates),
        "best_snr": round(max((c.snr for c in prod.candidates),
                              default=0.0), 2),
        "cand_latency_wall_s": None if cand_latency_wall is None
        else round(cand_latency_wall, 3),
        "cand_latency_data_s": None if cand_latency_data is None
        else round(cand_latency_data, 2),
        "search_engine": "pallas",
        # hardware-utilization grounding (vs one v5e chip's peaks:
        # 197 bf16 TFLOP/s MXU, 819 GB/s HBM; utils/perf.py)
        "dsp_hw_bf16_tflops": round(dsp_hw_tflops, 2),
        "dsp_mxu_util_pct": round(
            100 * dsp_hw_tflops / perf.V5E_BF16_TFLOPS, 2),
        "dsp_hbm_gbps_min": round(dsp_hbm_gbps, 1),
        "dsp_hbm_util_pct_min": round(
            100 * dsp_hbm_gbps / perf.V5E_HBM_GBPS, 1),
        "dedisp_gulp_s": round(dedisp_s, 4),
        "dedisp_hbm_gbps": round(dedisp_hbm_gbps, 1),
        "dedisp_hbm_util_pct": round(
            100 * dedisp_hbm_gbps / perf.V5E_HBM_GBPS, 1),
        "dedisp_gadds_per_s": round(dcost["adds"] / dedisp_s / 1e9, 1),
        "dedisp_sol_hbm_s": round(dcost["sol_hbm_s"], 4),
        "device": str(dev),
    }))


if __name__ == "__main__":
    wait_for_backend()
    try:
        main()
    except Exception as exc:  # one re-exec on a transient backend raise:
        # in-process backend state is poisoned after a failed init, so a
        # fresh interpreter is the only safe retry
        transient = any(s in repr(exc) for s in
                        ("UNAVAILABLE", "Unable to initialize",
                         "DEADLINE_EXCEEDED"))
        if transient and not os.environ.get("VFAST_BENCH_RETRIED"):
            print(f"bench: transient backend failure ({exc!r}); "
                  "re-probing and re-executing once", file=sys.stderr)
            env = dict(os.environ, VFAST_BENCH_RETRIED="1")
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)], env)
        raise
