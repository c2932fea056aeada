"""Stage-D GO/NO-GO chip timing for the full dual-stream megakernel.

Times one data-second at the PRODUCTION config (rfi_mode=2, defaults)
through process_second with chain_impl='xla' vs 'megakernel', the way
bench.py times (one device-sum sync AFTER the timed loop, not per
iteration — per-iteration host fetches add ~1.5 ms tunnel RTT each), and
splits the megakernel path into its three pieces (pretranspose prologue
/ one-launch kernel / unfactor+pack epilogue).

2-bit agreement is reported against BOTH chain EMAs: the production
default ema_impl='matmul' (closed-form, itself ~1e-4 from sequential)
and ema_impl='scan' (sequential-exact — the megakernel's own EMA
order, so this is the apples-to-apples parity bar).

Run: python benchmarks/bench_megakernel_full_tpu.py [iters]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
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
dev = jax.devices()[0]
print("device", dev, flush=True)
rng = np.random.default_rng(5)

cfgs = {
    "xla": PipelineConfig(),
    "xla_scan": PipelineConfig(ema_impl="scan"),
    "megakernel": PipelineConfig(chain_impl="megakernel"),
    "megakernel2": PipelineConfig(chain_impl="megakernel2"),
    "megakernel3": PipelineConfig(chain_impl="megakernel3"),
    "megakernel3f": PipelineConfig(chain_impl="megakernel3f"),
    "megakernel4": PipelineConfig(chain_impl="megakernel4"),
}
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
if only:
    cfgs = {k: v for k, v in cfgs.items()
            if k in only or k in ("xla", "xla_scan")}
raw = rng.integers(1, 256, size=(2, cfgs["xla"].sample_rate),
                   dtype=np.uint8)
raw_d = jax.device_put(jnp.asarray(raw), dev)
arm = jnp.asarray(False)

results = {}
for name, cfg in cfgs.items():
    state = bdsp.init_state(cfg)
    t0 = time.perf_counter()
    out, st = bdsp.process_second(cfg, raw_d, state, arm)
    _sync = float(jnp.sum(out.packed.astype(jnp.int32)))
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f} s", flush=True)
    for _ in range(3):       # EMA warm-up outside the timed region
        out, st = bdsp.process_second(cfg, raw_d, st, arm)
    float(jnp.sum(out.packed.astype(jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out, st = bdsp.process_second(cfg, raw_d, st, arm)
    chk = float(jnp.sum(out.packed.astype(jnp.int32)) +
                jnp.sum(out.packed_kur.astype(jnp.int32)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    results[name] = (ms, out, st)
    print(f"{name}: {ms:.1f} ms/data-s  checksum {chk}", flush=True)

# ---- on-device 2-bit agreement ----------------------------------------
for which in ("megakernel", "megakernel2", "megakernel3", "megakernel3f",
              "megakernel4"):
    if which not in results:
        continue
    om = results[which][1]
    for base in ("xla", "xla_scan"):
        ox = results[base][1]
        for stream in ("packed", "packed_kur"):
            lx = q_ops.unpack_bits(getattr(ox, stream), 2).astype(jnp.int32)
            lm = q_ops.unpack_bits(getattr(om, stream), 2).astype(jnp.int32)
            agree = float(jnp.mean((lx == lm).astype(jnp.float32)))
            print(f"2-bit agreement {which} vs {base} [{stream}]: "
                  f"{agree:.6f}", flush=True)
    print(f"{which} speedup vs default chain: "
          f"{results['xla'][0]/results[which][0]:.2f}x", flush=True)

# ---- Pallas-pretranspose primitive timing -----------------------------
_c0 = cfgs["xla"]
for mode, odt, impl in (("pallas-u8", jnp.uint8, "mxu"),
                        ("pallas-bf16", jnp.bfloat16, "mxu"),
                        ("pallas-u8-xlu", jnp.uint8, "xlu"),
                        ("pallas-bf16-xlu", jnp.bfloat16, "xlu")):
    try:
        pp = jax.jit(lambda r, o=odt, im=impl: mk.pallas_pretranspose(
            r, _c0.nfft, _c0.npol_in, _c0.seg_per_sec, out_dtype=o,
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

if "megakernel" not in cfgs:
    sys.exit(0)
# ---- megakernel stage-split timing ------------------------------------
cfg = cfgs["megakernel"]
bpf = jnp.concatenate([
    mk.bp_to_factored(results["megakernel"][2].bp, cfg.nfft),
    mk.bp_to_factored(results["megakernel"][2].bp_kur, cfg.nfft)], axis=0)
bpf = jax.device_put(bpf, dev)

pre = jax.jit(lambda r: mk.pretranspose_u8(r, cfg.nfft, cfg.npol_in,
                                           cfg.seg_per_sec))
xs = pre(raw_d)
float(jnp.sum(xs[0, 0].astype(jnp.int32)))
t0 = time.perf_counter()
for _ in range(iters):
    xs = pre(raw_d)
float(jnp.sum(xs[0, 0].astype(jnp.int32)))
pre_ms = (time.perf_counter() - t0) / iters * 1e3

kern = jax.jit(lambda r, b: mk.chain_second(
    r, b, cfg.nfft, cfg.npol_in, cfg.seg_per_sec, cfg.nscrunch,
    cfg.nkurto, cfg.rfi_mode, float(cfg.bp_scale),
    float(cfg.dag_thresh), float(cfg.dag_fb_thresh)))
outs = kern(raw_d, bpf)
float(jnp.sum(outs[3]))
t0 = time.perf_counter()
for _ in range(iters):
    outs = kern(raw_d, bpf)
float(jnp.sum(outs[3]))
kern_ms = (time.perf_counter() - t0) / iters * 1e3

unf = jax.jit(lambda p: mk.unfactor_pack_realign(p, cfg.nfft,
                                                 cfg.chanmin, cfg.chanmax))
pk = unf(outs[0])
float(jnp.sum(pk.astype(jnp.int32)))
t0 = time.perf_counter()
for _ in range(iters):
    pk1 = unf(outs[0])
    pk2 = unf(outs[1])
float(jnp.sum(pk1.astype(jnp.int32)) + jnp.sum(pk2.astype(jnp.int32)))
unf_ms = (time.perf_counter() - t0) / iters * 1e3 / 2

print(f"split: pretranspose {pre_ms:.1f}  kernel(incl pre) {kern_ms:.1f}  "
      f"unfactor-pack {unf_ms:.1f} ms (x2 streams)", flush=True)

