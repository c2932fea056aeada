"""Multi-station serving check: N StationPipelines interleaved on ONE
chip (the production topology the antennas/chip headline implies).
Verifies the single-station extrapolation holds with N live pipelines —
per-station Python/host overhead, interleaved device queues, N gulp
searches — and reports aggregate data-seconds per wall-second."""
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
from vlite_fast_tpu.runtime.control import ObservationDocument
from vlite_fast_tpu.runtime.pipeline import StationPipeline

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_SEC = 40
dev = jax.devices()[0]
cfg = PipelineConfig(inject_frb=True)
scfg = SearchConfig(dm_grid_mode="linear")
rng = np.random.default_rng(0)
staged = [jax.device_put(np.clip(rng.standard_normal(
    (cfg.npol_in, cfg.sample_rate)) / 0.05914 + 128.5, 0, 255
    ).astype(np.uint8), dev) for _ in range(3)]

pipes = [StationPipeline(i, cfg, scfg, out_dir="/tmp/vfast_multi",
                         keep_ring=False, write_cands=False)
         for i in range(N)]
od = ObservationDocument(name="MULTI", start_time=1.7e9)

# warmup (compile once; programs are shared across stations)
for p in pipes:
    p.begin_observation(od, write_fil=False)
for s in range(N_SEC):
    for p in pipes:
        p.feed_second(1.7e9 + s, staged[s % 3])
for p in pipes:
    p.end_observation()

for p in pipes:
    p.begin_observation(od, write_fil=False)
t0 = time.perf_counter()
for s in range(N_SEC):
    for p in pipes:
        p.feed_second(1.7e9 + s, staged[s % 3])
ncands = sum(len(p.end_observation().candidates) for p in pipes)
wall = time.perf_counter() - t0
for p in pipes:
    p.close()
agg = N * N_SEC / wall
print(f"stations={N} seconds={N_SEC} wall={wall:.3f}s  "
      f"aggregate {agg:.2f} antenna-seconds/s  "
      f"({agg:.2f} antennas/chip with {N} live pipelines; "
      f"{ncands} candidates)", flush=True)
