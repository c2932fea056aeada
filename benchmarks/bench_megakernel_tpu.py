"""GO/NO-GO chip timing for the megakernel (docs/megakernel_plan.md).

Times one data-second (320 segments, 2 pol) through:
  a) the XLA chain at rfi_mode=0 (plain stream, ema_impl current default)
  b) megakernel stage B (chain_second_plain + unfactor/realign)
and reports ms/data-second + 2-bit agreement on device.

Run: python benchmarks/bench_megakernel_tpu.py [iters]
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
from vlite_fast_tpu.models import baseband_dsp as bdsp
from vlite_fast_tpu.ops import megakernel as mk
from vlite_fast_tpu.ops import quantize as q_ops

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
cfg = PipelineConfig(rfi_mode=0, dft_exact_input=True)
dev = jax.devices()[0]
print("device", dev, flush=True)
rng = np.random.default_rng(5)
raw = rng.integers(1, 256, size=(2, cfg.sample_rate), dtype=np.uint8)
raw_d = jax.device_put(jnp.asarray(raw), dev)

# --- XLA chain, rfi_mode=0 ---
state = bdsp.init_state(cfg)
arm = jnp.asarray(False)
t0 = time.perf_counter()
out, st2 = bdsp.process_second(cfg, raw_d, state, arm)
chk = float(jnp.sum(out.packed.astype(jnp.int32)))
print(f"chain mode0 compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
for _ in range(iters):
    out, st2 = bdsp.process_second(cfg, raw_d, state, arm)
    chk = float(jnp.sum(out.packed.astype(jnp.int32)))
chain_ms = (time.perf_counter() - t0) / iters * 1e3
print(f"chain mode0: {chain_ms:.1f} ms/data-s  checksum {chk}", flush=True)

# --- megakernel stage B ---
bp0 = mk.bp_to_factored(jnp.zeros((2, cfg.nchan), jnp.float32), cfg.nfft)
bp0 = jax.device_put(bp0, dev)

@jax.jit
def mega_second(raw, bp):
    planes, bp_new = mk.chain_second_plain(
        raw, bp, cfg.nfft, 2, cfg.seg_per_sec, cfg.nscrunch,
        float(cfg.bp_scale))
    packed = mk.unfactor_pack_realign(planes.reshape(
        cfg.seg_per_sec, -1, 64, 32), cfg.nfft, cfg.chanmin, cfg.chanmax)
    return packed, bp_new

t0 = time.perf_counter()
pk, bp1 = mega_second(raw_d, bp0)
chk2 = float(jnp.sum(pk.astype(jnp.int32)))
print(f"megakernel compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
t0 = time.perf_counter()
for _ in range(iters):
    pk, bp1 = mega_second(raw_d, bp0)
    chk2 = float(jnp.sum(pk.astype(jnp.int32)))
mega_ms = (time.perf_counter() - t0) / iters * 1e3
print(f"megakernel: {mega_ms:.1f} ms/data-s  checksum {chk2}", flush=True)

# on-device 2-bit agreement (fresh state both sides)
lev_c = q_ops.unpack_bits(out.packed, 2).astype(jnp.int32)
lev_m = q_ops.unpack_bits(pk, 2).astype(jnp.int32)
agree = float(jnp.mean((lev_c == lev_m).astype(jnp.float32)))
print(f"2-bit agreement (fresh bp both): {agree:.6f}", flush=True)
print(f"speedup (plain stream): {chain_ms/mega_ms:.2f}x", flush=True)
