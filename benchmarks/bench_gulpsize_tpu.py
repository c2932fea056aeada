"""Gulp-size decision table (VERDICT r4 item 7): per-gulp device search
cost at several gulp lengths with the lane-major fold engine, plus the
derived per-data-second tax and the candidate-latency bound
(gulp + DM-1000 overlap), so the production default is picked from
measurement, not round-2 numbers.

Run: python benchmarks/bench_gulpsize_tpu.py [iters]
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
from vlite_fast_tpu.config import PipelineConfig, SearchConfig
from vlite_fast_tpu.models import search as search_mod

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
cfg = PipelineConfig()
dev = jax.devices()[0]
rng = np.random.default_rng(3)
nbytes = cfg.npol_out * cfg.nchanout * cfg.nbit // 8

print(f"{'gulp_s':>7} {'samps':>6} {'compile_s':>9} {'gulp_cost_s':>11} "
      f"{'ms_per_data_s':>13} {'latency_bound_s':>15}", flush=True)
for gulp in (30720, 15360, 10240, 7680, 3840):
    scfg = SearchConfig(dm_grid_mode="linear", gulp_samps=gulp)
    eng = search_mod.SinglePulseSearch(scfg, cfg.tsamp, cfg.freqs_mhz())
    full = gulp + eng.overlap
    pk = jax.device_put(rng.integers(0, 256, (full, nbytes),
                                     dtype=np.uint8), dev)
    t0 = time.perf_counter()
    eng.search_gulp_device(pk, cfg.nbit, 0, gulp)
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        eng.search_gulp_device(pk, cfg.nbit, 0, gulp)
    dt = (time.perf_counter() - t0) / iters
    gulp_s = gulp * cfg.tsamp
    lat = gulp_s + eng.overlap * cfg.tsamp
    print(f"{gulp_s:7.1f} {gulp:6d} {comp:9.1f} {dt:11.4f} "
          f"{dt/gulp_s*1e3:13.2f} {lat:15.1f}", flush=True)
