"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from vlite_fast_tpu.models.coadd import coadd, coadd_psum
from vlite_fast_tpu.parallel.mesh import make_mesh
from vlite_fast_tpu.parallel.halo import halo_from_next, halo_from_prev


def test_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh()
    assert dict(m.shape) == {"ant": 8, "time": 1}
    m = make_mesh(n_ant=4, n_time=2)
    assert dict(m.shape) == {"ant": 4, "time": 2}
    # subsets of the device pool are fine; oversubscription is not
    m = make_mesh(n_ant=3, n_time=2)
    assert dict(m.shape) == {"ant": 3, "time": 2}
    with pytest.raises(ValueError):
        make_mesh(n_ant=3, n_time=3)


def test_coadd_math():
    rng = np.random.default_rng(0)
    fb = rng.standard_normal((4, 16, 8)).astype(np.float32)
    out = np.asarray(coadd(jnp.asarray(fb)))
    np.testing.assert_allclose(out, fb.sum(0) / 2.0, rtol=1e-5)
    # coadd preserves unit variance and grows common-signal S/N by sqrt(n)
    sig = np.ones((4, 16, 8), np.float32)
    np.testing.assert_allclose(np.asarray(coadd(jnp.asarray(sig))),
                               2.0, rtol=1e-6)


def test_coadd_psum_matches_local():
    mesh = make_mesh(n_ant=4, n_time=2)
    rng = np.random.default_rng(1)
    fb = rng.standard_normal((8, 16, 8)).astype(np.float32)  # 8 ants

    def f(fb_local):
        return coadd_psum(fb_local, "ant", 8)[None]

    mapped = shard_map(f, mesh=mesh, in_specs=P("ant"),
                       out_specs=P("ant"), check_vma=False)
    fb_sh = jax.device_put(jnp.asarray(fb), NamedSharding(mesh, P("ant")))
    out = np.asarray(mapped(fb_sh))
    ref = np.asarray(coadd(jnp.asarray(fb)))
    # every ant shard holds the same reduced result
    for k in range(4):
        np.testing.assert_allclose(out[k], ref, rtol=1e-5)


def test_halo_exchange():
    mesh = make_mesh(n_ant=1, n_time=8)
    x = np.arange(8 * 4 * 2, dtype=np.float32).reshape(8 * 4, 2)

    def f(x_local):
        return halo_from_next(x_local, 2, "time")

    mapped = shard_map(f, mesh=mesh, in_specs=P("time"),
                       out_specs=P("time"), check_vma=False)
    x_sh = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("time")))
    out = np.asarray(mapped(x_sh))   # (8*(4+2), 2)
    out = out.reshape(8, 6, 2)
    for s in range(7):
        np.testing.assert_array_equal(out[s, :4], x[s * 4:(s + 1) * 4])
        np.testing.assert_array_equal(out[s, 4:], x[(s + 1) * 4:(s + 1) * 4 + 2])
    np.testing.assert_array_equal(out[7, 4:], 0.0)


def test_halo_from_prev():
    mesh = make_mesh(n_ant=1, n_time=4)
    x = np.arange(4 * 3, dtype=np.float32).reshape(12, 1)

    def f(x_local):
        return halo_from_prev(x_local, 1, "time")

    mapped = shard_map(f, mesh=mesh, in_specs=P("time"),
                       out_specs=P("time"), check_vma=False)
    out = np.asarray(mapped(jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P("time"))))).reshape(4, 4)
    assert out[0, 0] == 0.0
    assert out[1, 0] == x[2, 0]   # last row of shard 0


def test_full_array_step_dryrun():
    """The driver's dryrun contract: full sharded step on 8 virtual devices."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
