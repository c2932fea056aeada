"""A/B the framed front-end (front_layout='frames') against the flat one.

The profiler showed the flat front forcing two physical tile relayouts
of every 1.6 MB f32 voltage block per segment: (npol, nwin, nkurto) for
the kurtosis window reductions and (b, n1, n2) for the Cooley-Tukey DFT
(~11 of 50 ms/data-second).  The framed front reshapes the uint8 BYTES
once and computes the window moments as lane sums + one (n1, wpf)
pooling matmul (ops/kurtosis.rfi_excise_framed); the excision mask is a
per-row boolean whose select fuses into the DFT stage-1 operand read.
Full dual-stream chain, cache-warm, plus packed-output agreement.
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


pk_f, p_f = time_chain(PipelineConfig(front_layout="frames"),
                       "front=frames")
pk_m, p_m = time_chain(PipelineConfig(front_layout="mixed"),
                       "front=mixed ")
pk_l, p_l = time_chain(PipelineConfig(front_layout="flat"),
                       "front=flat  ")
print(f"mixed vs flat agreement: kur={(pk_m == pk_l).mean():.6f} "
      f"plain={(p_m == p_l).mean():.6f}", flush=True)
print(f"packed byte agreement frames vs flat: "
      f"kur={(pk_f == pk_l).mean():.6f} plain={(p_f == p_l).mean():.6f}",
      flush=True)
