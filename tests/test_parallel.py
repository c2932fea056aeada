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


def test_sharded_coherent_dedispersion_roundtrip():
    """disperse (one big chirp) -> time-sharded dedisperse with halo
    exchange -> recover the original voltages away from the stream edges."""
    import jax.numpy as jnp
    from vlite_fast_tpu.ops import coherent as coh
    from vlite_fast_tpu.parallel.sharded_coherent import (
        coherent_dedisperse_sharded)

    rate = 1_000_000
    dm = 150.0
    nsamp = 1 << 18                     # 262144 samples over 8 shards
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, nsamp)).astype(np.float32)
    ker = coh.dispersion_kernel(nsamp, dm, bandwidth_mhz=0.5,
                                freq_bot_mhz=320.0, taper=False)
    dispersed = np.asarray(coh.apply_chirp(jnp.asarray(x), ker))

    mesh = make_mesh(n_ant=1, n_time=8)
    sh = NamedSharding(mesh, P(None, "time"))
    out = np.asarray(coherent_dedisperse_sharded(
        jax.device_put(jnp.asarray(dispersed), sh), mesh, dm, rate,
        bandwidth_mhz=0.5, freq_bot_mhz=320.0))
    n_lo, n_hi = coh.smearing_samples(dm, rate, 320.0, 320.25, 320.5)
    halo = n_lo + n_hi + 4096
    # interior (excluding the global stream edges where no halo exists)
    lo, hi = 2 * halo, nsamp - 2 * halo
    err = np.abs(out[:, lo:hi] - x[:, lo:hi])
    # blockwise chirp convolution leaves percent-level Fresnel leakage at
    # block seams (slowly-decaying band-edge ringing — inherent to
    # overlap-save coherent dedispersion); the bulk must be exact
    assert err.max() < 0.1, err.max()
    assert np.median(err) < 2e-3
    assert (err > 0.01).mean() < 0.01   # <1% of samples above 1% error


def test_sharded_step_detects_pulse():
    """End-to-end on the mesh: a dispersed pulse present at every antenna
    must surface in the coadd search's per-timeblock peak S/N
    (configs[4]-style evidence on the virtual mesh)."""
    import dataclasses
    from vlite_fast_tpu.config import (AntennaConfig, ArrayConfig,
                                       PipelineConfig, SearchConfig)
    from vlite_fast_tpu.models import synthesis
    from vlite_fast_tpu.parallel.mesh import make_mesh
    from vlite_fast_tpu.parallel.sharded_pipeline import build_array_step

    n_ant, n_time = 4, 2
    mesh = make_mesh(n_ant=n_ant, n_time=n_time)
    cfg = PipelineConfig.tiny(freq_top_mhz=320.5, bandwidth_mhz=0.5)
    scfg = SearchConfig(dm_min=0.0, dm_max=600.0, ndm=64, gulp_samps=512,
                        boxcar_max=16, zap_ranges=(), snr_thresh=6.0)
    acfg = ArrayConfig(
        antennas=tuple(AntennaConfig(i + 1, f"ea{i+1:02d}")
                       for i in range(n_ant)),
        pipeline=cfg, search=scfg, mesh_ant=n_ant, mesh_time=n_time)
    step_fn, make_inputs, plan = build_array_step(acfg, mesh,
                                                  nsec_per_block=1)
    raw, bp, bpk = make_inputs(seed=0)
    # overwrite with synthetic dispersed pulses (2 consecutive seconds,
    # one per time block; same sky signal, different noise per antenna)
    dm_true = 300.0
    for a in range(n_ant):
        s = synthesis.SynthConfig(
            tobs=2.0, dm=dm_true, pulse_period=0.05, skip_period=16,
            amp=0.4, seed=50 + a, sample_rate=cfg.sample_rate,
            freq_bot_mhz=320.0, bandwidth_mhz=0.5, buflen=250_000)
        samples, _ = synthesis.generate_baseband(s)
        for tb in range(n_time):
            raw[a, tb] = samples[:, tb * cfg.sample_rate:
                                 (tb + 1) * cfg.sample_rate]
    sh = NamedSharding(mesh, P("ant", "time"))
    out, state = step_fn(jax.device_put(raw, sh),
                         jax.device_put(bp, sh),
                         jax.device_put(bpk, sh))
    snr_max = np.asarray(out.snr_max)
    peak = np.asarray(out.snr_argmax)
    assert snr_max.shape == (n_time,)
    # the coadded pulse should stand out strongly in at least one block
    assert snr_max.max() > 8.0, f"snr_max={snr_max}"
    # peak DM trial near the true DM
    dms = np.asarray(plan.dms)
    best = peak[int(np.argmax(snr_max))]
    assert abs(dms[best[1]] - dm_true) < 100.0
    # RFI weights stay healthy on clean synthetic data
    assert np.asarray(out.weights_mean).min() > 0.9
