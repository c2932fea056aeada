"""Worker script for the two-process multi-controller tests.

Each process is one 'host' of the cluster: jax.distributed wires them into
a single logical device mesh (CPU backend, 2 virtual devices per process),
each host contributes its local antennas' data, and the collectives run
across process boundaries — the DCN path of SURVEY.md section 5 exercised
for real, not just on a single-process virtual mesh.

Modes:
  coadd      — minimal psum over 'ant' across the process boundary
  arraystep  — the FULL production sharded step (build_array_step: DSP,
               all_to_all reshard, ppermute halos, per-beam + coadd top-k)
               over a (ant=2, time=2) mesh split across 2 processes, with
               the candidate plane decoded host-side.  The test compares
               the printed summary against a single-process run of the
               identical geometry/seed.

Usage: python multihost_worker.py <process_id> <num_processes> <port> [mode]
Prints one JSON line for cross-process comparison.
"""

import hashlib
import json
import sys


def arraystep_config():
    """The shared tiny geometry for the cross-process array-step test
    (also used by the in-process reference run in test_multihost)."""
    import dataclasses

    from vlite_fast_tpu.config import ArrayConfig, PipelineConfig

    acfg = ArrayConfig.tiny(nant=4, mesh_ant=2, mesh_time=2)
    # ema_impl='assoc': the cross-process bit-exactness contract needs
    # the batch/partition-invariant EMA (the default 'matmul' lowers its
    # dot differently across device layouts — bounded in
    # tests/test_chain.py::test_ema_matmul_near_exact)
    return dataclasses.replace(
        acfg, pipeline=PipelineConfig.tiny(sample_rate=100_000,
                                           ema_impl="assoc"))


def arraystep_summary(acfg, mesh, seed=7):
    """Build + run one sharded step on `mesh` and return the JSON-able
    candidate-plane summary.  Works on a single-process virtual mesh and
    on a multi-controller mesh alike: outputs are resharded to replicated
    inside jit, so every process holds the full (small) result."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vlite_fast_tpu.parallel.sharded_pipeline import (
        ArrayStepOutput, build_array_step, extract_candidates)

    step_fn, make_inputs, plan, info = build_array_step(
        acfg, mesh, nsec_per_call=2)
    raw, bp, bp_kur, tail = make_inputs(seed=seed)
    out, state = step_fn(raw, bp, bp_kur, tail)

    rep = jax.jit(lambda t: t,
                  out_shardings=NamedSharding(mesh, P()))
    full = rep(tuple(out))
    pk, btk, ctk, wm = [np.asarray(a.addressable_data(0)) for a in full]
    per_beam, coadd, stats = extract_candidates(
        ArrayStepOutput(pk, btk, ctk, wm), info, acfg.search)

    def cands(cl):
        return [[round(float(c.snr), 3), round(float(c.dm), 3),
                 int(c.peak_idx), int(c.tfilt)] for c in cl]

    return {
        "packed_sha": hashlib.sha256(pk.tobytes()).hexdigest(),
        "weights_mean": [round(float(w), 5) for w in wm],
        "per_beam": {str(b): cands(cl) for b, cl in sorted(per_beam.items())},
        "coadd": cands(coadd),
        "stats": stats,
    }


def run_coadd(pid, nproc):
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    import jax

    from vlite_fast_tpu.parallel.mesh import make_mesh
    from vlite_fast_tpu.parallel.distributed import (local_antenna_slice,
                                                     make_global_array)
    from vlite_fast_tpu.models.coadd import coadd_psum

    nant = 4  # one antenna per global device
    mesh = make_mesh(n_ant=4, n_time=1)
    sl = local_antenna_slice(nant)
    # each host synthesizes ITS antennas' filterbank blocks (deterministic
    # per antenna so the result is checkable)
    local = np.stack([
        np.full((8, 16), float(a + 1), np.float32)
        for a in range(nant)[sl]])
    garr = make_global_array(local, mesh, P("ant", None, None))

    def f(fb_local):
        return coadd_psum(fb_local, "ant", nant)[None]

    mapped = shard_map(f, mesh=mesh, in_specs=P("ant", None, None),
                       out_specs=P("ant", None, None), check_vma=False)
    out = mapped(garr)
    # every shard holds the same coadd: sum(1..4)/sqrt(4) = 5.0
    local_vals = [np.asarray(s.data) for s in out.addressable_shards]
    checks = [float(v.mean()) for v in local_vals]
    print(json.dumps({"pid": pid, "devices": len(jax.devices()),
                      "local_devices": len(jax.local_devices()),
                      "coadd_means": checks}), flush=True)
    return all(abs(c - 5.0) < 1e-5 for c in checks) \
        and len(jax.devices()) == 4


def run_arraystep(pid, nproc):
    import jax

    from vlite_fast_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_ant=2, n_time=2)
    summary = arraystep_summary(arraystep_config(), mesh)
    summary.update(pid=pid, devices=len(jax.devices()),
                   local_devices=len(jax.local_devices()))
    print(json.dumps(summary), flush=True)
    return len(jax.devices()) == 4


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "coadd"
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    ok = run_coadd(pid, nproc) if mode == "coadd" else run_arraystep(
        pid, nproc)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
