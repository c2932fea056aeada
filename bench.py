"""Headline benchmark: real-time factor of the full per-antenna DSP chain.

Runs the reference geometry (2 pol x 128 Msamp/s, NFFT 12500, kurtosis RFI
excision, dual-stream normalize/scrunch/2-bit quantize — the work
process_baseband must finish in <1 s per second of data per antenna,
BASELINE.md "Real-time requirement") on one chip and reports seconds of
baseband processed per wall-clock second.

vs_baseline: 1.0 = one antenna real-time on one device (the reference needs
one GPU per antenna); N = N antennas' baseband per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vlite_fast_tpu.config import PipelineConfig
    from vlite_fast_tpu.models import baseband_dsp as dsp

    seconds_per_iter = 1
    iters = 5
    cfg = PipelineConfig()          # full reference geometry, rfi_mode 2
    dev = jax.devices()[0]

    rng = np.random.default_rng(0)
    raw_np = np.clip(
        rng.standard_normal((cfg.npol_in, cfg.sample_rate)) / 0.05914 + 128.5,
        0, 255).astype(np.uint8)
    raw = jax.device_put(raw_np, dev)
    state = jax.device_put(dsp.init_state(cfg), dev)
    arm = jnp.bool_(False)

    # warmup/compile
    out, st = dsp.process_second(cfg, raw, state, arm)
    _ = np.asarray(out.packed_kur)  # host fetch = hard sync

    t0 = time.perf_counter()
    for _ in range(iters):
        out, st = dsp.process_second(cfg, raw, st, arm)
    # block_until_ready alone proved unreliable over the tunneled device;
    # a host fetch of the final outputs is an unambiguous barrier
    _ = np.asarray(out.packed_kur)
    _ = np.asarray(st.bp_kur)
    dt = time.perf_counter() - t0

    data_seconds = iters * seconds_per_iter
    rt_factor = data_seconds / dt
    samples_per_s = rt_factor * cfg.npol_in * cfg.sample_rate

    # --- search engine: one production gulp (24 s, 1024 DM, 4096 chan) ---
    search_fields = {}
    try:
        import jax.numpy as jnp

        from vlite_fast_tpu import constants as Cst
        from vlite_fast_tpu.config import SearchConfig
        from vlite_fast_tpu.ops import dedisperse as dd

        scfg = SearchConfig()
        freqs = Cst.channel_freqs_mhz()[Cst.CHANMIN:Cst.CHANMAX + 1]
        dms = dd.dm_grid(scfg.dm_min, scfg.dm_max, scfg.ndm)
        plan = dd.make_plan(dms, freqs, cfg.tsamp, nsub=128, nbatch=128,
                            zap_ranges=scfg.zap_ranges)
        rng2 = np.random.default_rng(1)
        fb = jax.device_put(rng2.standard_normal(
            (scfg.gulp_samps + plan.max_delay, Cst.NCHANOUT)
        ).astype(np.float32), dev)
        out = dd.dedisperse_fourier(fb, plan, scfg.gulp_samps)
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        out = dd.dedisperse_fourier(fb, plan, scfg.gulp_samps)
        _ = float(jnp.sum(out))
        gulp_dt = time.perf_counter() - t0
        gulp_data_s = scfg.gulp_samps * cfg.tsamp
        search_fields = {
            "search_gulp_wall_s": round(gulp_dt, 3),
            "search_rt_factor": round(gulp_data_s / gulp_dt, 2),
        }
        # combined full-stack budget per antenna per chip
        per_ant = dt / data_seconds + gulp_dt / gulp_data_s
        search_fields["full_stack_antennas_per_chip"] = round(1 / per_ant, 2)
    except Exception as e:  # keep the headline line printing regardless
        search_fields = {"search_error": str(e)[:120]}

    print(json.dumps({
        "metric": "baseband DSP real-time factor (antennas/chip, full "
                  "chain: unpack+kurtosis+FFT+normalize+scrunch+2bit)",
        "value": round(rt_factor, 3),
        "unit": "x real-time per chip",
        "vs_baseline": round(rt_factor, 3),
        "samples_per_second": samples_per_s,
        "seconds_processed": data_seconds,
        "wall_s": round(dt, 3),
        "device": str(dev),
        **search_fields,
    }))


if __name__ == "__main__":
    main()
