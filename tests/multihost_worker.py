"""Worker script for the two-process multi-controller test.

Each process is one 'host' of the cluster: jax.distributed wires them into
a single logical device mesh (CPU backend, 2 virtual devices per process),
each host contributes its local antennas' data, and the coadd psum runs
across process boundaries — the DCN path of SURVEY.md section 5 exercised
for real, not just on a single-process virtual mesh.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
Prints one JSON line with the coadd checksum for cross-process comparison.
"""

import json
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

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
    ok = all(abs(c - 5.0) < 1e-5 for c in checks)
    sys.exit(0 if ok and len(jax.devices()) == 4 else 1)


if __name__ == "__main__":
    main()
