"""A/B the MXU DFT's matmul precision on the chip.

matmul_rfft runs at precision='highest' (6-pass bf16 emulation of fp32,
~1e-6 relative).  TPU MXU native rate is bf16: 'high' (bf16x3) and
'default' (single-pass bf16) trade accuracy for 2x/6x fewer MXU passes.
Downstream the spectra only feed |.|^2 -> EMA bandpass -> 2-bit quantize
(ref process_baseband.cu:593-665), so the tolerance that matters is the
POWER spectrum's relative error vs fp64, and ultimately the 2-bit
flag/sample agreement — measured here and in tests/test_chain.py.
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
from functools import partial
from vlite_fast_tpu.ops import channelize as ch

NFFT = 12500
NSPEC = 20480          # one second of dual-pol data (2 x 10240 spectra)
dev = jax.devices()[0]
rng = np.random.default_rng(0)
frames = rng.standard_normal((NSPEC, NFFT)).astype(np.float32)
frames_d = jax.device_put(frames, dev)

# fp64 oracle power spectrum on a sample of rows
oracle_rows = np.fft.rfft(frames[:32].astype(np.float64), axis=-1)
oracle_pow = np.abs(oracle_rows) ** 2

for prec in ("highest", "high", "default"):
    f = jax.jit(partial(ch.matmul_rfft, nfft=NFFT, precision=prec))
    # complex64 host fetches raise UNIMPLEMENTED over the tunnel — detect
    # to float power ON DEVICE before fetching
    pow_f = jax.jit(lambda x: jnp.abs(f(x[:32])) ** 2)
    out = f(frames_d)
    got_pow = np.asarray(pow_f(frames_d)).astype(np.float64)
    # relative error of per-bin power, guarding empty bins
    scale = oracle_pow.mean()
    err = np.abs(got_pow - oracle_pow) / (oracle_pow + 1e-3 * scale)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = f(frames_d)
    _ = float(jnp.sum(jnp.abs(out[:1, :4])))   # float host fetch = real sync
    dt = (time.perf_counter() - t0) / reps
    print(f"{prec:8s}: {dt*1e3:7.1f} ms per data-second   "
          f"pow rel-err max {err.max():.2e} mean {err.mean():.2e}",
          flush=True)
