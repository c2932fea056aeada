"""Micro-benchmark of the RFI-excision stage (the chain's measured hot
spot) at production segment geometry, with sub-stage splits."""
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
from vlite_fast_tpu.config import PipelineConfig
from vlite_fast_tpu.ops import kurtosis as kur
from vlite_fast_tpu.ops import unpack as up

cfg = PipelineConfig()
dev = jax.devices()[0]
rng = np.random.default_rng(0)
seg = jax.device_put(np.clip(rng.standard_normal(
    (cfg.npol_in, cfg.seg_samps)) / 0.05914 + 128.5, 0, 255
    ).astype(np.uint8), dev)

def t(fn, label, reps=10):
    out = fn(seg)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(seg)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:2]
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s} {dt*1e3:8.2f} ms/segment "
          f"({dt*cfg.seg_per_sec:0.3f} s per data-second)", flush=True)
    return dt

t(jax.jit(lambda s: jnp.sum(up.convert_uint8(s), axis=-1)),
  "convert only")
t(jax.jit(lambda s: kur.window_stats(up.convert_uint8(s),
                                     cfg.nkurto)), "convert+window_stats")
def stats_ts(s):
    x = up.convert_uint8(s)
    pw, kw = kur.window_stats(x, cfg.nkurto)
    return kur.dagostino_ts(kw, cfg.nkurto)
t(jax.jit(stats_ts), "+dagostino_ts")
def through_mask(s):
    x = up.convert_uint8(s)
    pw, kw = kur.window_stats(x, cfg.nkurto)
    dag = kur.dagostino_ts(kw, cfg.nkurto)
    m, w = kur.apply_mask(x, dag, cfg.nkurto, cfg.nfft, cfg.dag_thresh)
    return jnp.sum(m, axis=-1), w
t(jax.jit(through_mask), "+apply_mask")
def full(s):
    res = kur.rfi_excise(up.convert_uint8(s), cfg.nkurto, cfg.nfft,
                         dag_fb_thresh=cfg.dag_fb_thresh)
    # reduce on device: fetching the (2, 12.8M) masked array to host
    # rides the ~30-60 MB/s dev tunnel and would swamp the timing
    return jnp.sum(res.masked, axis=-1), res.weights
t(jax.jit(full), "full rfi_excise")
