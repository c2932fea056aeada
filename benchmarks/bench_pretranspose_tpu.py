"""Hunt the megakernel's prologue cost: XLA formulations of the
(npol, nsamp) u8 -> (nseg, nb*128, 128) kernel-layout pretranspose.

The measured 17.9 ms/data-s (bench_megakernel_full_tpu.py split) is
~30x off HBM speed of light for 335 MB of u8 movement; this sweeps
dtype/order variants to find what XLA transposes fast.

Run: python benchmarks/bench_pretranspose_tpu.py [iters]
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

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
cfg = PipelineConfig()
LANE = 128
n1, n2 = 100, 125
npol, nseg = cfg.npol_in, cfg.seg_per_sec
nsamp = cfg.sample_rate
ffts = nsamp // nseg // cfg.nfft
nb = npol * ffts
dev = jax.devices()[0]
rng = np.random.default_rng(0)
raw_d = jax.device_put(rng.integers(0, 256, (npol, nsamp), np.uint8), dev)


def v_current(raw):
    """Shipped path: u8 transpose then pad."""
    f = raw.reshape(npol, nseg, ffts, n1, n2)
    f = jnp.transpose(f, (1, 0, 2, 4, 3))
    f = jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, LANE - n2),
                    (0, LANE - n1)))
    return f.reshape(nseg, nb * LANE, LANE)


def v_pad_first(raw):
    """Pad n1/n2 to 128 BEFORE the transpose (tile-aligned u8 moves)."""
    f = raw.reshape(npol, nseg, ffts, n1, n2)
    f = jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, LANE - n1),
                    (0, LANE - n2)))
    f = jnp.transpose(f, (1, 0, 2, 4, 3))
    return f.reshape(nseg, nb * LANE, LANE)


def v_f32(raw):
    """Cast to f32 first (32-bit transposes are XLA's native tile)."""
    f = raw.reshape(npol, nseg, ffts, n1, n2).astype(jnp.float32)
    f = jnp.transpose(f, (1, 0, 2, 4, 3))
    f = jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, LANE - n2),
                    (0, LANE - n1)))
    return f.reshape(nseg, nb * LANE, LANE).astype(jnp.uint8)


def v_i32(raw):
    f = raw.reshape(npol, nseg, ffts, n1, n2).astype(jnp.int32)
    f = jnp.transpose(f, (1, 0, 2, 4, 3))
    f = jnp.pad(f, ((0, 0), (0, 0), (0, 0), (0, LANE - n2),
                    (0, LANE - n1)))
    return f.reshape(nseg, nb * LANE, LANE).astype(jnp.uint8)


variants = {
    "current(u8 T then pad)": v_current,
    "pad-first(u8 aligned T)": v_pad_first,
    "f32 cast T": v_f32,
    "i32 cast T": v_i32,
}

for name, fn in variants.items():
    try:
        j = jax.jit(fn)
        out = j(raw_d)
        float(jnp.sum(out[0, :4].astype(jnp.int32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = j(raw_d)
        float(jnp.sum(out[0, :4].astype(jnp.int32)))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {ms:.2f} ms/data-s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
