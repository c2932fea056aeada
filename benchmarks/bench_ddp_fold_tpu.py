"""A/B the lane-major fold dedispersion engine vs the roll+select engine
on chip at PRODUCTION geometry (1024 DM x 4096 chan x 24 s gulp) AND
assert bit-exact agreement on device.

Run: python benchmarks/bench_ddp_fold_tpu.py [ndm] [iters]
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
from vlite_fast_tpu import constants as Cst
from vlite_fast_tpu.config import SearchConfig, PipelineConfig
from vlite_fast_tpu.ops import dedisperse as dd
from vlite_fast_tpu.ops import dedisperse_pallas as ddp

ndm = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
cfg = PipelineConfig()
scfg = SearchConfig(dm_grid_mode="linear", ndm=ndm)
freqs = Cst.channel_freqs_mhz()[Cst.CHANMIN:Cst.CHANMAX + 1]
dms = dd.dm_grid(scfg.dm_min, scfg.dm_max, scfg.ndm)
plan = dd.make_plan(dms, freqs, cfg.tsamp, nsub=128, nbatch=128,
                    zap_ranges=scfg.zap_ranges)
print("max_delay", plan.max_delay, "max_sub_delay", plan.max_sub_delay,
      "rel_max", plan.rel_delays_max, flush=True)

dev = jax.devices()[0]
rng = np.random.default_rng(1)
fb = jax.device_put(rng.standard_normal(
    (scfg.gulp_samps + plan.max_delay, Cst.NCHANOUT)).astype(np.float32), dev)

def timeit(fn, label):
    t0 = time.perf_counter()
    out = fn(fb, plan, scfg.gulp_samps)
    s = float(jnp.sum(out))
    print(f"{label} compile+run: {time.perf_counter()-t0:.2f} s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(fb, plan, scfg.gulp_samps)
        s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label} per gulp: {dt:.4f} s  checksum {s:.1f}", flush=True)
    return out, dt

out_a, dt_a = timeit(ddp.dedisperse_pallas_rollsel, "rollsel")
out_b, dt_b = timeit(ddp.dedisperse_pallas, "fold")
eq = bool(jnp.all(out_a == out_b))
print(f"bit-exact on device: {eq}", flush=True)
print(f"speedup: {dt_a/dt_b:.2f}x  ({dt_a:.4f} -> {dt_b:.4f} s/gulp)", flush=True)
assert eq
