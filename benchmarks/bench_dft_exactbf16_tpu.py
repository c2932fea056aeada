"""A/B the exact-bf16-input stage-1 DFT fast path on the chip.

The chain's DFT inputs are 8-bit quantized voltages k/128 — exactly
bf16-representable — so bf16x3's x_lo*w_hi term is identically zero and
stage 1 at dft_precision='high' can run as 2 DEFAULT-precision passes
against a hi/lo split of the DFT matrix (ops/channelize.py
exact_bf16_input).  Measures:

  1. numerical agreement of the fast stage-1 vs plain 'high' vs
     'highest' (power-domain relative error, the quantity the 2-bit
     quantizer sees);
  2. in-chain dual-stream timing (process_second) with the path ON
     (chain call sites pass exact_bf16_input=True) vs OFF (monkeypatched
     off), cache-warm.
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
from vlite_fast_tpu.ops import channelize as ch

dev = jax.devices()[0]
rng = np.random.default_rng(0)

# ---- 1. numerics ---------------------------------------------------------
k = rng.integers(-128, 128, (8, 12500)).astype(np.float32)
x = jax.device_put(k / 128.0, dev)
f = jax.jit(lambda v, p, e: ch.matmul_rfft_planes(v, 12500, precision=p,
                                                  exact_bf16_input=e),
            static_argnums=(1, 2))
ref = np.asarray(jnp.abs(f(x, "highest", False)) ** 2)
hi3 = np.asarray(jnp.abs(f(x, "high", False)) ** 2)
fast = np.asarray(jnp.abs(f(x, "high", True)) ** 2)
scale = ref.mean()
print(f"power rel err vs f32:  high(bf16x3)={np.abs(hi3-ref).max()/scale:.2e}"
      f"  exact2pass={np.abs(fast-ref).max()/scale:.2e}", flush=True)
print(f"exact2pass vs bf16x3 max diff: {np.abs(fast-hi3).max()/scale:.2e}",
      flush=True)

# ---- 2. in-chain timing --------------------------------------------------
cfg = PipelineConfig(dft_exact_input=True)  # rfi_mode 2, dft_precision 'high', channelizer matmul
raw = jax.device_put(np.clip(rng.standard_normal(
    (cfg.npol_in, cfg.sample_rate)) / 0.05914 + 128.5, 0, 255
    ).astype(np.uint8), dev)


def time_chain(tag):
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


pk_on, p_on = time_chain("exact2pass ON ")

cfg = PipelineConfig(dft_exact_input=False)
pk_off, p_off = time_chain("exact2pass OFF")

agree_kur = (pk_on == pk_off).mean()
agree = (p_on == p_off).mean()
print(f"packed byte agreement ON vs OFF: kur={agree_kur:.6f} "
      f"plain={agree:.6f}", flush=True)
