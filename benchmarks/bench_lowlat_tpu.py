"""Measure the low-latency search preset (SearchConfig.low_latency: 6 s
gulps) on the chip: device gulp time, sustained search cost per
data-second, and the latency bound, vs the 24 s production gulp."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vlite_fast_tpu.config import PipelineConfig, SearchConfig
from vlite_fast_tpu.models import search as S

cfg = PipelineConfig()
freqs = np.linspace(cfg.freq_top_mhz,
                    cfg.freq_top_mhz - cfg.bandwidth_mhz, cfg.nchanout,
                    endpoint=False)
dev = jax.devices()[0]
rng = np.random.default_rng(0)

for name, scfg in (("production-24s", SearchConfig(dm_grid_mode="linear")),
                   ("low-latency-6s",
                    SearchConfig.low_latency(dm_grid_mode="linear"))):
    eng = S.SinglePulseSearch(scfg, cfg.tsamp, freqs)
    full = scfg.gulp_samps + eng.overlap
    nbytes = cfg.nchanout * cfg.nbit // 8
    packed = jax.device_put(
        rng.integers(0, 256, (full, nbytes), dtype=np.uint8), dev)
    t0 = time.perf_counter()
    cands = eng.search_gulp_device(packed, cfg.nbit, t_offset=0,
                                   nvalid=scfg.gulp_samps)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps):
        cands = eng.search_gulp_device(packed, cfg.nbit, t_offset=0,
                                       nvalid=scfg.gulp_samps)
    dt = (time.perf_counter() - t0) / reps
    data_s = scfg.gulp_samps * cfg.tsamp
    lat_s = full * cfg.tsamp
    print(f"{name}: gulp {dt*1e3:6.1f} ms ({data_s:.0f} s data, "
          f"{data_s/dt:.0f}x RT; {dt/data_s*1e3:.2f} ms per data-second), "
          f"latency bound {lat_s:.1f} s, compile {compile_s:.0f} s",
          flush=True)
