"""AOT-compile the gather-based subband engine at production geometry and
inspect the lowered HLO (compile only — running it faults the TPU)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re
import numpy as np
import jax, jax.numpy as jnp
from vlite_fast_tpu import constants as Cst
from vlite_fast_tpu.config import SearchConfig, PipelineConfig
from vlite_fast_tpu.ops import dedisperse as dd

cfg, scfg = PipelineConfig(), SearchConfig()
freqs = Cst.channel_freqs_mhz()[Cst.CHANMIN:Cst.CHANMAX + 1]
dms = dd.dm_grid(scfg.dm_min, scfg.dm_max, scfg.ndm)
plan = dd.make_plan(dms, freqs, cfg.tsamp, nsub=128, nbatch=128,
                    zap_ranges=scfg.zap_ranges)
ntime = scfg.gulp_samps + plan.max_delay
fb = jax.ShapeDtypeStruct((ntime, Cst.NCHANOUT), jnp.float32)
lowered = jax.jit(lambda x: dd.dedisperse(x, plan, scfg.gulp_samps)).lower(fb)
txt = lowered.as_text()
print("=== gather ops in stablehlo ===")
for m in re.finditer(r'"stablehlo.gather".*', txt):
    print(m.group(0)[:400], "\n")
print("compiling...", flush=True)
comp = lowered.compile()
hlo = comp.as_text()
print("=== gather/dynamic ops in optimized HLO ===")
for line in hlo.splitlines():
    if "gather" in line or "dynamic-slice" in line:
        print(line.strip()[:300])
mem = comp.memory_analysis()
print("=== memory analysis ===")
print(mem)
