"""Compare chain ema_impl variants at production geometry on the chip."""
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
raw_np = np.clip(rng.standard_normal((2, 128_000_000)) / 0.05914 + 128.5,
                 0, 255).astype(np.uint8)
raw = jax.device_put(raw_np, dev)
arm = jnp.bool_(False)
for impl in ("assoc", "pallas"):
    cfg = PipelineConfig(ema_impl=impl)
    st = jax.device_put(dsp.init_state(cfg), dev)
    t0 = time.perf_counter()
    out, st = dsp.process_second(cfg, raw, st, arm)
    _ = np.asarray(out.packed_kur)
    print(impl, "compile+run:", round(time.perf_counter() - t0, 1), flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        out, st = dsp.process_second(cfg, raw, st, arm)
    _ = np.asarray(out.packed_kur); _ = np.asarray(st.bp_kur)
    dt = (time.perf_counter() - t0) / 5
    print(f"{impl}: {dt:.4f} s/s of data -> {1/dt:.2f}x RT", flush=True)
