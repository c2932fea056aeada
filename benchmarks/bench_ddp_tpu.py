import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from vlite_fast_tpu import constants as Cst
from vlite_fast_tpu.config import SearchConfig, PipelineConfig
from vlite_fast_tpu.ops import dedisperse as dd
from vlite_fast_tpu.ops import dedisperse_pallas as ddp

cfg = PipelineConfig()
scfg = SearchConfig()
freqs = Cst.channel_freqs_mhz()[Cst.CHANMIN:Cst.CHANMAX + 1]
dms = dd.dm_grid(scfg.dm_min, scfg.dm_max, scfg.ndm)
plan = dd.make_plan(dms, freqs, cfg.tsamp, nsub=128, nbatch=128,
                    zap_ranges=scfg.zap_ranges)
print("max_delay", plan.max_delay, "max_sub_delay", plan.max_sub_delay,
      "rel_max", plan.rel_delays_max, flush=True)
print("vmem:", ddp.max_vmem_bytes(plan, len(freqs), scfg.gulp_samps), flush=True)

dev = jax.devices()[0]
rng = np.random.default_rng(1)
fb = jax.device_put(rng.standard_normal(
    (scfg.gulp_samps + plan.max_delay, Cst.NCHANOUT)).astype(np.float32), dev)

t0 = time.perf_counter()
out = ddp.dedisperse_pallas(fb, plan, scfg.gulp_samps)
s = float(jnp.sum(out))
print("pallas compile+run:", round(time.perf_counter() - t0, 2), "s", flush=True)
t0 = time.perf_counter()
for _ in range(3):
    out = ddp.dedisperse_pallas(fb, plan, scfg.gulp_samps)
    s = float(jnp.sum(out))
dt_p = (time.perf_counter() - t0) / 3
print("pallas per gulp:", round(dt_p, 4), "s", flush=True)

t0 = time.perf_counter()
of = dd.dedisperse_fourier(fb, plan, scfg.gulp_samps)
s2 = float(jnp.sum(of))
print("fourier compile+run:", round(time.perf_counter() - t0, 2), flush=True)
t0 = time.perf_counter()
of = dd.dedisperse_fourier(fb, plan, scfg.gulp_samps)
s2 = float(jnp.sum(of))
dt_f = time.perf_counter() - t0
print("fourier per gulp:", round(dt_f, 4), "s  speedup:", round(dt_f/dt_p, 2), flush=True)

# numeric agreement (fourier is approximate via phase ramps; pallas exact)
a = np.asarray(jnp.mean(jnp.abs(out[:, :1000] - of[:, :1000])))
b = np.asarray(jnp.mean(jnp.abs(out[:, :1000])))
print("mean |pallas - fourier| / mean|pallas|:", a / b, flush=True)
