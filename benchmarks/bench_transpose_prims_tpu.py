"""Transpose-primitive chip timings for the megakernel relayout work.

Times (a) pallas_pretranspose in all four variants (mxu/xlu x u8/bf16)
and (b) raw in-kernel (128, 128) plane-transpose throughput — XLU
native lax.transpose vs MXU identity dot — on a production-sized
scratch block.  (b) is the GO/NO-GO for a stage-2-batched kernel
("v4"): batching stage 2 needs per-b EXACT f32 transposes of the
stage-1 outputs, which only pays if an XLU tile transpose costs well
under the ~2 MXU passes the hi/lo route would need (which would tie
the v2 stage-1 cost it replaces).

Run: python benchmarks/bench_transpose_prims_tpu.py [iters]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from vlite_fast_tpu.config import PipelineConfig
from vlite_fast_tpu.ops import megakernel as mk

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
dev = jax.devices()[0]
print("device", dev, flush=True)
cfg = PipelineConfig()
LANE = 128
rng = np.random.default_rng(7)
raw = rng.integers(1, 256, (cfg.npol_in, cfg.sample_rate), np.uint8)
raw_d = jax.device_put(jnp.asarray(raw), dev)

# ---- (a) pallas_pretranspose variants ---------------------------------
for mode, odt, impl in (("mxu-u8", jnp.uint8, "mxu"),
                        ("mxu-bf16", jnp.bfloat16, "mxu"),
                        ("xlu-u8", jnp.uint8, "xlu"),
                        ("xlu-bf16", jnp.bfloat16, "xlu")):
    try:
        pp = jax.jit(lambda r, o=odt, im=impl: mk.pallas_pretranspose(
            r, cfg.nfft, cfg.npol_in, cfg.seg_per_sec, out_dtype=o,
            impl=im))
        t0 = time.perf_counter()
        ys = pp(raw_d)
        float(jnp.sum(ys[0, :4].astype(jnp.float32)))
        print(f"pretranspose[{mode}]: compile+run "
              f"{time.perf_counter()-t0:.1f} s", flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            ys = pp(raw_d)
        float(jnp.sum(ys[0, :4].astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"pretranspose[{mode}]: {ms:.2f} ms/data-s", flush=True)
    except Exception as e:
        print(f"pretranspose[{mode}]: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

# ---- (b) raw per-tile transpose throughput ----------------------------
# one grid step = NB (128,128) f32 plane transposes out of VMEM scratch;
# compare XLU native vs MXU identity dot at identical structure.
NB = 128
REPS = 320            # grid steps, mirrors seg_per_sec


def _tile_kernel(x_ref, ident_ref, out_ref, *, impl: str):
    identb = ident_ref[...].astype(jnp.bfloat16)
    acc = jnp.zeros((LANE, LANE), jnp.float32)
    for b in range(NB):
        xb = x_ref[pl.ds(b * LANE, LANE), :]
        if impl == "xlu":
            y = jax.lax.transpose(xb, (1, 0))
        elif impl == "mxu":
            y = jax.lax.dot_general(
                xb.astype(jnp.bfloat16), identb,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:                      # 'none': loop/read baseline
            y = xb
        acc = acc + y
    out_ref[...] = acc


def tile_bench(impl):
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((NB * LANE, LANE)),
                    jnp.float32), dev)
    ident = jnp.eye(LANE, dtype=jnp.float32)
    f = jax.jit(lambda xx: pl.pallas_call(
        functools.partial(_tile_kernel, impl=impl),
        grid=(REPS,),
        in_specs=[pl.BlockSpec((NB * LANE, LANE), lambda i: (0, 0)),
                  pl.BlockSpec((LANE, LANE), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((LANE, LANE), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((LANE, LANE), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xx, ident))
    try:
        y = f(x)
        float(jnp.sum(y))
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(x)
        float(jnp.sum(y))
        s = (time.perf_counter() - t0) / iters
        per_tile_ns = s / (REPS * NB) * 1e9
        print(f"tile-transpose[{impl}]: {s*1e3:.2f} ms for "
              f"{REPS}x{NB} tiles = {per_tile_ns:.0f} ns/tile", flush=True)
    except Exception as e:
        print(f"tile-transpose[{impl}]: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


for impl in ("none", "xlu", "mxu"):
    tile_bench(impl)
