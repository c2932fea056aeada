"""Production-geometry config-matrix smoke on the real chip.

The CPU test suite exercises every knob at tiny geometry; this runs one
second of data through process_second for each advertised configuration
VARIANT at full production geometry on the TPU — catching
Mosaic/layout/VMEM failures that only appear at real shapes (the class
of bug behind the round-1 gather fault)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import traceback
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
    (2, PipelineConfig().sample_rate)) / 0.05914 + 128.5, 0, 255
    ).astype(np.uint8), dev)

VARIANTS = [
    ("default (2-bit, rfi 2, matmul, assoc)", {}),
    ("4-bit output", {"nbit": 4}),
    ("8-bit output", {"nbit": 8}),
    ("dual-pol output", {"npol_out": 2}),
    ("rfi_mode 0", {"rfi_mode": 0}),
    ("rfi_mode 1", {"rfi_mode": 1}),
    ("PFB channelizer", {"channelizer": "pfb"}),
    ("pallas EMA", {"ema_impl": "pallas"}),
    ("pallas RFI front", {"rfi_impl": "pallas"}),
    ("scan EMA", {"ema_impl": "scan"}),
    ("dft highest", {"dft_precision": "highest"}),
    ("injection armed", {"inject_frb": True}),
    ("histograms on", {"do_histo": True}),
]

fails = 0
for name, kw in VARIANTS:
    try:
        cfg = PipelineConfig(**kw)
        st = jax.device_put(dsp.init_state(cfg), dev)
        t0 = time.perf_counter()
        o, st2 = dsp.process_second(cfg, raw, st, jnp.bool_(
            bool(kw.get("inject_frb"))))
        field = o.packed_kur if cfg.rfi_mode else o.packed
        v = float(jnp.sum(field[:64].astype(jnp.float32)))
        compile_s = time.perf_counter() - t0
        # warm before timing: the tunneled device's first dispatches
        # after a compile are ~10x slow (observed on the first variants
        # of a fresh process); the timing column is indicative only
        for _ in range(2):
            o, st2 = dsp.process_second(cfg, raw, st2, jnp.bool_(False))
        float(jnp.sum((o.packed_kur if cfg.rfi_mode else o.packed)[:1]
                      .astype(jnp.float32)))
        t0 = time.perf_counter()
        o, _ = dsp.process_second(cfg, raw, st2, jnp.bool_(False))
        float(jnp.sum((o.packed_kur if cfg.rfi_mode else o.packed)[:1]
                      .astype(jnp.float32)))
        dt = time.perf_counter() - t0
        print(f"OK   {name:38s} compile {compile_s:6.1f} s  "
              f"run {dt*1e3:7.1f} ms/s", flush=True)
    except Exception as e:
        fails += 1
        print(f"FAIL {name:38s} {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
print(f"{len(VARIANTS) - fails}/{len(VARIANTS)} variants ok", flush=True)
sys.exit(1 if fails else 0)
