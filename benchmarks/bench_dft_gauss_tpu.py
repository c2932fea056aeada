"""A/B the Gauss 3-multiplication stage-2 DFT against the direct form.

The hlo_stats profile shows the 8 stage-2 einsums (2 streams x 4 real
matmuls for the complex product) at ~8.6 of 40 ms/data-second of device
time.  Gauss's trick computes the same complex product with 3 matmuls
(m1=(br+bi)w2r, m2=br(w2i-w2r), m3=bi(w2i+w2r)); the pre-adds fuse into
the matmul operands.  Full dual-stream chain, cache-warm, plus 2-bit
packed-output agreement (rounding differs slightly near quantizer
thresholds).
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


def time_chain(cfg, tag):
    st = jax.device_put(dsp.init_state(cfg), dev)
    out, st2 = dsp.process_second(cfg, raw, st, jnp.bool_(False))
    _ = np.asarray(out.packed_kur)
    t0 = time.perf_counter()
    n = 8
    for _i in range(n):
        out, st2 = dsp.process_second(cfg, raw, st2, jnp.bool_(False))
    _ = np.asarray(out.packed_kur)
    _ = np.asarray(st2.bp_kur)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1e3:.1f} ms/data-second ({1/dt:.2f}x RT)",
          flush=True)
    return np.asarray(out.packed_kur), np.asarray(out.packed)


pk_g, p_g = time_chain(PipelineConfig(dft_stage2="gauss"), "stage2=gauss ")
pk_d, p_d = time_chain(PipelineConfig(dft_stage2="direct"), "stage2=direct")
print(f"packed byte agreement gauss vs direct: "
      f"kur={(pk_g == pk_d).mean():.6f} plain={(p_g == p_d).mean():.6f}",
      flush=True)
