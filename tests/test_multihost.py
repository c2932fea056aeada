"""True multi-controller test: two OS processes = two 'hosts' wired into
one mesh by jax.distributed; each contributes its local antennas and the
coadd psum crosses the process boundary (the DCN path, SURVEY section 5 —
the closest this environment gets to configs[4]'s N>=2 hosts)."""

import json
import os
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def test_two_process_coadd():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))
    env.pop("JAX_PLATFORMS", None)
    port = 39765
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("multihost worker hung")
        assert p.returncode == 0, f"worker failed: {err[-1000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    for o in outs:
        assert o["devices"] == 4 and o["local_devices"] == 2
        assert all(abs(c - 5.0) < 1e-5 for c in o["coadd_means"])
