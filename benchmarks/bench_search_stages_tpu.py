"""Attribute the per-gulp search cost on-chip: dequantize | dedisperse |
boxcar-S/N (and its median noise estimator) | top-k, each as progressively
larger fused programs at production geometry, plus candidate variants of
the boxcar stage (subsampled-median noise, per-width top-k without
materializing the S/N cube)."""
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
from vlite_fast_tpu.models import search as S
from vlite_fast_tpu.ops import dedisperse as dd
from vlite_fast_tpu.ops import quantize as q_ops

cfg = PipelineConfig()
scfg = SearchConfig(dm_grid_mode="linear")
freqs = np.linspace(cfg.freq_top_mhz,
                    cfg.freq_top_mhz - cfg.bandwidth_mhz, cfg.nchanout,
                    endpoint=False)
eng = S.SinglePulseSearch(scfg, cfg.tsamp, freqs)
full = scfg.gulp_samps + eng.overlap
nbytes = cfg.nchanout * cfg.nbit // 8
dev = jax.devices()[0]
rng = np.random.default_rng(0)
packed = jax.device_put(
    rng.integers(0, 256, (full, nbytes), dtype=np.uint8), dev)
K = min(16 * scfg.max_candidates, 20000)
W = eng.widths
plan = eng.plan

def timeit(name, fn, reps=3):
    out = fn(packed)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :2]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(packed)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :2]))
    print(f"{name:34s}: {(time.perf_counter()-t0)/reps*1e3:7.1f} ms/gulp",
          flush=True)

def deq(fb):
    fb = q_ops.dequantize(fb, cfg.nbit)
    return fb.reshape(fb.shape[0], -1)[:, :cfg.nchanout].astype(jnp.float32)

from vlite_fast_tpu.ops import dedisperse_pallas as ddp
ntime_out = full - plan.max_delay

timeit("dequantize", jax.jit(lambda p: jnp.sum(deq(p), axis=0)))
timeit("dequantize+dedisperse",
       jax.jit(lambda p: ddp.dedisperse_pallas(deq(p), plan, ntime_out)))
timeit("+boxcar_snr (median noise)",
       jax.jit(lambda p: dd.boxcar_snr(
           ddp.dedisperse_pallas(deq(p), plan, ntime_out),
           plan.nchan_eff, W)))
timeit("+approx_max_k (= current full)",
       jax.jit(lambda p: jax.lax.approx_max_k(dd.boxcar_snr(
           ddp.dedisperse_pallas(deq(p), plan, ntime_out),
           plan.nchan_eff, W).reshape(-1), K, recall_target=0.95)))

# --- variants of the boxcar stage ------------------------------------

def boxcar_subsampled_median(dmt, widths, sub=2048):
    ndm, ntime = dmt.shape
    base = jnp.mean(dmt, axis=1, keepdims=True)
    x = dmt - base
    step = max(1, ntime // sub)
    sigma = 1.4826 * jnp.median(jnp.abs(x[:, ::step]), axis=1)
    sigma = jnp.maximum(sigma, 1e-6)
    cs = jnp.cumsum(x, axis=1)
    cs = jnp.concatenate([jnp.zeros((ndm, 1), cs.dtype), cs], axis=1)
    outs = []
    inv = (1.0 / sigma)[:, None]
    for w_ in widths:
        box = cs[:, w_:] - cs[:, :-w_]
        box = jnp.concatenate([jnp.zeros((ndm, w_ - 1), box.dtype), box],
                              axis=1)
        outs.append(box * inv * jax.lax.rsqrt(jnp.float32(w_)))
    return jnp.stack(outs, axis=0)

timeit("+boxcar (median/15 subsample)",
       jax.jit(lambda p: jax.lax.approx_max_k(boxcar_subsampled_median(
           ddp.dedisperse_pallas(deq(p), plan, ntime_out),
           W).reshape(-1), K, recall_target=0.95)))

def perwidth_topk(dmt, widths, k):
    ndm, ntime = dmt.shape
    base = jnp.mean(dmt, axis=1, keepdims=True)
    x = dmt - base
    step = max(1, ntime // 2048)
    sigma = 1.4826 * jnp.median(jnp.abs(x[:, ::step]), axis=1)
    sigma = jnp.maximum(sigma, 1e-6)
    cs = jnp.cumsum(x, axis=1)
    cs = jnp.concatenate([jnp.zeros((ndm, 1), cs.dtype), cs], axis=1)
    inv = (1.0 / sigma)[:, None]
    kk = k // len(widths)
    vals, idxs = [], []
    for wi, w_ in enumerate(widths):
        box = cs[:, w_:] - cs[:, :-w_]
        box = jnp.concatenate([jnp.zeros((ndm, w_ - 1), box.dtype), box],
                              axis=1)
        snr = box * inv * jax.lax.rsqrt(jnp.float32(w_))
        v, i = jax.lax.approx_max_k(snr.reshape(-1), kk,
                                    recall_target=0.95)
        vals.append(v)
        idxs.append(i + wi * ndm * ntime)
    return jnp.concatenate(vals), jnp.concatenate(idxs)

timeit("per-width topk (no cube)",
       jax.jit(lambda p: perwidth_topk(
           ddp.dedisperse_pallas(deq(p), plan, ntime_out), W, K)))
