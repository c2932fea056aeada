"""Segment-size sweep: seg_per_sec tiles the per-second execution.

The per-spectrum math (kurtosis windows, D'Agostino gates, EMA recurrence,
quantization) is segment-size independent, but outputs are NOT bit
identical across tilings: the bandpass seed for second 0 averages over one
segment (a startup transient that decays with bp_tsmooth), and the
associative-scan EMA's f32 association order shifts with segment length,
flipping ~0.5% of samples by one 2-bit level (measured sps=10 vs 25/100 on
the tiny geometry: 2-5% of packed bytes differ after the first second).
Equivalent science, not equal bits — so the fastest tiling wins.
Constraint: sps must divide 1280 (ffts_per_seg multiple of nscrunch=8).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vlite_fast_tpu.config import PipelineConfig
from vlite_fast_tpu.models import baseband_dsp as dsp

dev = jax.devices()[0]
rng = np.random.default_rng(0)
raw = jax.device_put(np.clip(rng.standard_normal(
    (2, 128_000_000)) / 0.05914 + 128.5, 0, 255).astype(np.uint8), dev)
arm = jnp.bool_(False)
EMA = os.environ.get("VFAST_EMA_IMPL", "assoc")
for sps in (int(a) for a in (sys.argv[1:] or ["20", "10", "5"])):
    cfg = PipelineConfig(seg_per_sec=sps, ema_impl=EMA)
    st = jax.device_put(dsp.init_state(cfg), dev)
    t0 = time.perf_counter()
    out, st = dsp.process_second(cfg, raw, st, arm)
    _ = np.asarray(out.packed_kur)[:4]
    print(f"seg_per_sec={sps} compile+run:",
          round(time.perf_counter()-t0, 1), flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out, st = dsp.process_second(cfg, raw, st, arm)
    _ = np.asarray(out.packed_kur)[:4]; _ = np.asarray(st.bp_kur)[:2, :2]
    dt = (time.perf_counter() - t0) / 5
    print(f"seg_per_sec={sps}: {dt:.4f} s/s -> {1/dt:.2f}x RT", flush=True)
