"""A/B the matmul affine-scan EMA against the associative-scan default.

The profiler showed lax.associative_scan's log-depth tree lowering to
~240 tiny pad/slice/reshape ops per segment — 30 of the chain's 54 ms of
device time was pure data movement.  ops/normalize._affine_scan_matmul
replaces the tree with two (T, T) lower-triangular matmuls (the linear-
recurrence-as-matmul trick), which XLA fuses into the detect->normalize->
scrunch pipeline with no slicing.  Full dual-stream chain, cache-warm,
plus 2-bit packed-output agreement.
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


pk_m, p_m = time_chain(PipelineConfig(ema_impl="matmul"), "ema=matmul")
pk_a, p_a = time_chain(PipelineConfig(ema_impl="assoc"), "ema=assoc ")
print(f"packed byte agreement matmul vs assoc: "
      f"kur={(pk_m == pk_a).mean():.6f} plain={(p_m == p_a).mean():.6f}",
      flush=True)
