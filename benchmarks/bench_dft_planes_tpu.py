"""In-chain A/B of the complex-einsum vs real/imag-plane DFT formulations
(ops/channelize.matmul_rfft vs .matmul_rfft_planes) at production
geometry + packed-output agreement."""
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
from vlite_fast_tpu.ops import channelize as ch
from vlite_fast_tpu.models import baseband_dsp as dsp

dev = jax.devices()[0]
cfg = PipelineConfig()
rng = np.random.default_rng(0)
raw = jax.device_put(np.clip(rng.standard_normal(
    (2, cfg.sample_rate)) / 0.05914 + 128.5, 0, 255).astype(np.uint8), dev)

# channelize() dispatches to matmul_rfft_planes (the measured winner);
# patch that symbol to A/B the two formulations
orig = ch.matmul_rfft_planes
outs = {}
for name, impl in (("complex", ch.matmul_rfft), ("planes", orig)):
    ch.matmul_rfft_planes = impl
    dsp.process_second.clear_cache()
    st = jax.device_put(dsp.init_state(cfg), dev)
    arm = jnp.bool_(False)
    o, st2 = dsp.process_second(cfg, raw, st, arm)
    np.asarray(o.packed[:1])
    for _ in range(3):
        o, st2 = dsp.process_second(cfg, raw, st2, arm)
    np.asarray(o.packed[:1])
    t0 = time.perf_counter(); reps = 5
    for _ in range(reps):
        o, _ = dsp.process_second(cfg, raw, st2, arm)
    np.asarray(o.packed[:1])
    dt = (time.perf_counter() - t0) / reps
    outs[name] = (np.asarray(o.packed), np.asarray(o.packed_kur))
    print(f"{name:8s}: {dt*1e3:6.1f} ms per data-second "
          f"({1/dt:.2f}x RT)", flush=True)
ch.matmul_rfft_planes = orig

for name, i in (("plain", 0), ("kur", 1)):
    a, b = outs["complex"][i], outs["planes"][i]
    ua = np.stack([(a >> s) & 3 for s in (0, 2, 4, 6)])
    ub = np.stack([(b >> s) & 3 for s in (0, 2, 4, 6)])
    print(f"{name}: 2-bit sample agreement {(ua == ub).mean():.6f}",
          flush=True)
