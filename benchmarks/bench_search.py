"""Search-engine benchmark: DM-trial throughput of both dedispersion
engines at the production geometry (4096 ch, 1024 DM trials, 24 s gulps),
plus boxcar S/N.  Reports DM-trials x samples / s and the real-time factor
for keeping up with one antenna's filterbank stream (1280 samp/s)."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(gulp=30720, nchan=4096, ndm=1024, small=False):
    import jax
    import jax.numpy as jnp

    from vlite_fast_tpu import constants as C
    from vlite_fast_tpu.ops import dedisperse as dd

    if small:
        gulp, nchan, ndm = 4096, 1024, 256
    tsamp = C.TSAMP
    freqs = C.channel_freqs_mhz()[C.CHANMIN:C.CHANMAX + 1][:nchan]
    dms = dd.dm_grid(2.0, 1000.0, ndm)
    plan = dd.make_plan(dms, freqs, tsamp, nsub=128, nbatch=128,
                        zap_ranges=((0, 190), (3900, 4096)))
    rng = np.random.default_rng(0)
    ntime = gulp + plan.max_delay
    fb = jax.device_put(rng.standard_normal((ntime, nchan)).astype(np.float32))
    results = {}
    for name, fn in [
        ("fourier", lambda: dd.dedisperse_fourier(fb, plan, gulp)),
        ("subband", lambda: dd.dedisperse(fb, plan, gulp)),
    ]:
        try:
            out = fn()
            _ = float(jnp.sum(out))  # compile+sync
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            _ = float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / iters
            results[name] = dt
        except Exception as e:  # engine may be unsupported on a backend
            results[name] = f"error: {e}"
    line = {"metric": "dedispersion gulp time (24 s of data)",
            "gulp_s": gulp * tsamp, "ndm": ndm, "nchan": nchan}
    for name, dt in results.items():
        if isinstance(dt, float):
            line[name + "_s"] = round(dt, 4)
            line[name + "_rt_factor"] = round(gulp * tsamp / dt, 2)
        else:
            line[name] = dt
    print(json.dumps(line))


if __name__ == "__main__":
    import sys
    main(small="--small" in sys.argv)
