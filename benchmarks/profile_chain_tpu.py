"""Profile the dual-stream DSP chain: aggregate device-op durations.

The recipe that found the round-3 EMA win (CLAUDE.md): trace 3
process_second calls with jax.profiler, then aggregate device-op
durations by base name from the .xplane.pb protobuf.  Reshape/slice/pad
time = fusion-breaking data movement worth hunting.

Usage: python benchmarks/profile_chain_tpu.py [trace_dir]
"""
import sys, os, glob, re, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from vlite_fast_tpu.config import PipelineConfig
from vlite_fast_tpu.models import baseband_dsp as dsp

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vfast_trace"

dev = jax.devices()[0]
rng = np.random.default_rng(0)
raw = jax.device_put(np.clip(rng.standard_normal(
    (2, 128_000_000)) / 0.05914 + 128.5, 0, 255).astype(np.uint8), dev)

cfg = PipelineConfig()
st = jax.device_put(dsp.init_state(cfg), dev)
out, st = dsp.process_second(cfg, raw, st, jnp.bool_(False))
_ = np.asarray(out.packed_kur)

with jax.profiler.trace(trace_dir):
    for _i in range(3):
        out, st = dsp.process_second(cfg, raw, st, jnp.bool_(False))
    _ = np.asarray(out.packed_kur)
    _ = np.asarray(st.bp_kur)

paths = sorted(glob.glob(os.path.join(
    trace_dir, "**", "*.xplane.pb"), recursive=True))
print("xplane files:", paths, flush=True)

# the xplane schema ships with several packages; TF is merely the one
# present in this image — probe rather than hard-depend (ADVICE r3)
xplane_pb2 = None
for _prov in ("tensorflow.tsl.profiler.protobuf",
              "tsl.profiler.protobuf",
              "xprof.protobuf"):
    try:
        import importlib
        xplane_pb2 = importlib.import_module(_prov + ".xplane_pb2")
        break
    except ImportError:
        continue
if xplane_pb2 is None:
    sys.exit("no xplane_pb2 provider found (tensorflow/tsl/xprof); "
             f"raw trace left in {trace_dir} — open it with xprof/"
             "tensorboard instead")

space = xplane_pb2.XSpace()
with open(paths[-1], "rb") as f:
    space.ParseFromString(f.read())

BASE = re.compile(r"[.\d]+$")


def base_name(name):
    # fusion.123 -> fusion; dot.5.remat -> dot; strip trailing digits/dots
    name = name.split("%")[-1].strip()
    parts = name.split(".")
    while parts and (parts[-1].isdigit() or parts[-1] in
                     ("remat", "clone", "1")):
        parts.pop()
    return ".".join(parts) if parts else name


for plane in space.planes:
    if "TPU" not in plane.name and "/device" not in plane.name.lower():
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    agg = collections.Counter()
    total = 0
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Ops" not in line.name:
            continue
        for ev in line.events:
            nm = base_name(ev_meta.get(ev.metadata_id, "?"))
            agg[nm] += ev.duration_ps
            total += ev.duration_ps
    if not total:
        continue
    print(f"\n== plane: {plane.name}  (total {total/1e12*1e3:.1f} ms over "
          f"3 data-seconds => {total/3e12*1e3:.1f} ms/data-s)")
    for nm, ps in agg.most_common(30):
        print(f"  {ps/3e12*1e3:8.2f} ms/data-s  {100*ps/total:5.1f}%  {nm}")
