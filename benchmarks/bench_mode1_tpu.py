"""Chain throughput with rfi_mode=1 (excised stream only): the single-
stream production option — operators who only search the kurtosis stream
(we do; the plain stream is a diagnostic product) halve the DFT work."""
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
for mode in (1, 2):
    cfg = PipelineConfig(rfi_mode=mode)
    st = jax.device_put(dsp.init_state(cfg), dev)
    t0 = time.perf_counter()
    out, st = dsp.process_second(cfg, raw, st, arm)
    _ = np.asarray(out.packed_kur)
    print(f"mode {mode} compile+run:", round(time.perf_counter()-t0, 1),
          flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out, st = dsp.process_second(cfg, raw, st, arm)
    _ = np.asarray(out.packed_kur); _ = np.asarray(st.bp_kur)
    dt = (time.perf_counter() - t0) / 5
    print(f"rfi_mode={mode}: {dt:.4f} s/s -> {1/dt:.2f}x RT", flush=True)
