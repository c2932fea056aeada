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


class TestShardedCandidatePlane:
    """The production candidate plane on the virtual mesh (VERDICT r2 #1/#2):
    per-beam + coadd top-k searches inside the SPMD program, and packed
    filterbank bytes byte-identical to the sequential streaming chain."""

    NSEC = 4
    DM_TRUE = 300.0
    NA, NT = 4, 2

    @pytest.fixture(scope="class")
    def run(self):
        from vlite_fast_tpu.config import (AntennaConfig, ArrayConfig,
                                           PipelineConfig, SearchConfig)
        from vlite_fast_tpu.models import synthesis
        from vlite_fast_tpu.parallel.mesh import make_mesh
        from vlite_fast_tpu.parallel.sharded_pipeline import (
            build_array_step, extract_candidates)

        na, nt = self.NA, self.NT
        nant = na * nt                      # one antenna per device
        mesh = make_mesh(n_ant=na, n_time=nt)
        # ema_impl='assoc': the class's byte-exact contract is about the
        # sharded DATAFLOW (EMA carry, halos, reshard); assoc is the
        # batch-invariant EMA that makes bit-exactness well-defined.
        # The production default 'matmul' lowers its dot differently
        # under vmap (<=1e-4 single-level quantizer flips — bounded in
        # tests/test_chain.py::test_ema_matmul_near_exact).
        cfg = PipelineConfig.tiny(freq_top_mhz=320.5, bandwidth_mhz=0.5,
                                  ema_impl="assoc")
        scfg = SearchConfig(dm_min=0.0, dm_max=600.0, ndm=64,
                            gulp_samps=512, boxcar_max=16, zap_ranges=(),
                            snr_thresh=6.0, engine="subband",
                            dm_grid_mode="linear")
        acfg = ArrayConfig(
            antennas=tuple(AntennaConfig(i + 1, f"ea{i+1:02d}")
                           for i in range(nant)),
            pipeline=cfg, search=scfg, mesh_ant=na, mesh_time=nt)
        step_fn, make_inputs, plan, info = build_array_step(
            acfg, mesh, nsec_per_call=self.NSEC)
        raw, bp, bpk, tail = make_inputs(seed=0)
        # synthetic dispersed pulses: same sky signal per antenna,
        # independent noise (seed), spanning the multi-second stream
        raw = np.array(raw)
        for a in range(nant):
            s = synthesis.SynthConfig(
                tobs=float(self.NSEC), dm=self.DM_TRUE, pulse_period=0.05,
                skip_period=16, amp=0.4, seed=50 + a,
                sample_rate=cfg.sample_rate, freq_bot_mhz=320.0,
                bandwidth_mhz=0.5, buflen=250_000)
            samples, _ = synthesis.generate_baseband(s)
            raw[a] = samples[:, :self.NSEC * cfg.sample_rate]
        sh = NamedSharding(mesh, P(("ant", "time")))
        raw = jax.device_put(raw, sh)
        out, state = step_fn(raw, bp, bpk, tail)
        per_beam, coadd_cands, topk_stats = extract_candidates(out, info,
                                                               scfg)
        return dict(cfg=cfg, scfg=scfg, acfg=acfg, raw=np.asarray(raw),
                    out=out, state=state, info=info, plan=plan,
                    per_beam=per_beam, coadd=coadd_cands, nant=nant)

    def test_packed_bytes_match_streaming_chain(self, run):
        """VERDICT r2 #2 'done' criterion: the sharded step's packed
        filterbank bytes equal the sequential streaming chain's (EMA
        carried across every second), byte-exact."""
        import jax.numpy as jnp
        from vlite_fast_tpu.models import baseband_dsp as dsp

        cfg = run["cfg"]
        sharded = np.asarray(run["out"].packed_kur)
        for a in (0, run["nant"] - 1):      # first + last antenna
            st = dsp.init_state(cfg)
            blocks = []
            for s in range(self.NSEC):
                sec = run["raw"][a][:, s * cfg.sample_rate:
                                    (s + 1) * cfg.sample_rate]
                o, st = dsp.process_second(cfg, jnp.asarray(sec), st,
                                           jnp.bool_(False))
                blocks.append(np.asarray(o.packed_kur))
            seq = np.concatenate(blocks, axis=0)
            np.testing.assert_array_equal(sharded[a], seq)

    def test_state_carries_across_calls(self, run):
        """Driving a SECOND step call with the returned state must equal
        the sequential chain continued over 2*NSEC seconds (the streaming
        contract, not just single-call parity)."""
        import jax.numpy as jnp
        from vlite_fast_tpu.config import (ArrayConfig, AntennaConfig)
        from vlite_fast_tpu.models import baseband_dsp as dsp
        from vlite_fast_tpu.parallel.mesh import make_mesh
        from vlite_fast_tpu.parallel.sharded_pipeline import build_array_step

        cfg, acfg = run["cfg"], run["acfg"]
        mesh = make_mesh(n_ant=self.NA, n_time=self.NT)
        step_fn, make_inputs, plan, info = build_array_step(
            acfg, mesh, nsec_per_call=self.NSEC)
        bp2, bpk2, tail2 = run["state"]
        sh = NamedSharding(mesh, P(("ant", "time")))
        rng = np.random.default_rng(7)
        raw2 = np.clip(rng.standard_normal(
            run["raw"].shape) / 0.05914 + 128.5, 0, 255).astype(np.uint8)
        out2, _ = step_fn(jax.device_put(raw2, sh), bp2, bpk2, tail2)
        sharded2 = np.asarray(out2.packed_kur)
        a = 0
        st = dsp.init_state(cfg)
        for s in range(self.NSEC):          # replay call 1 to evolve state
            sec = run["raw"][a][:, s * cfg.sample_rate:
                                (s + 1) * cfg.sample_rate]
            _, st = dsp.process_second(cfg, jnp.asarray(sec), st,
                                       jnp.bool_(False))
        blocks = []
        for s in range(self.NSEC):
            sec = raw2[a][:, s * cfg.sample_rate:(s + 1) * cfg.sample_rate]
            o, st = dsp.process_second(cfg, jnp.asarray(sec), st,
                                       jnp.bool_(False))
            blocks.append(np.asarray(o.packed_kur))
        np.testing.assert_array_equal(sharded2[a],
                                      np.concatenate(blocks, axis=0))

    def test_per_beam_candidates_match_single_chip(self, run):
        """VERDICT r2 #1 'done' criterion: per-beam candidates from the
        SPMD program match the single-chip search engine on the same
        filterbank (same DM / S/N / peak within tolerance)."""
        from vlite_fast_tpu.models import search as search_mod

        cfg, scfg, info = run["cfg"], run["scfg"], run["info"]
        eng = search_mod.SinglePulseSearch(scfg, cfg.tsamp,
                                           cfg.freqs_mhz())
        packed = np.asarray(run["out"].packed_kur)
        beams_checked = 0
        for beam in (0, run["nant"] - 1):
            fb = search_mod.filterbank_from_packed(
                packed[beam], cfg.nbit, cfg.nchanout)
            ref_cands = eng.search_stream(fb.astype(np.float32))
            got = run["per_beam"].get(beam, [])
            assert ref_cands and got, (beam, len(ref_cands), len(got))
            # every strong single-chip detection must have a sharded
            # counterpart at the same event: peak within 2 boxcar widths,
            # DM within a few trials, S/N within the per-gulp
            # noise-estimate jitter (gulp boundaries differ)
            strong = [c for c in ref_cands if c.snr > 10.0]
            assert strong, "single-chip search found no strong events"
            dm_step = info.dms[1] - info.dms[0]
            for rb in strong:
                near = [g for g in got
                        if abs(g.peak_idx - rb.peak_idx)
                        <= 2 * max(info.widths)]
                assert near, (beam, rb)
                gb = max(near, key=lambda x: x.snr)
                assert abs(gb.dm - rb.dm) <= 4 * dm_step, (gb, rb)
                assert abs(gb.snr - rb.snr) / rb.snr < 0.25, (gb.snr,
                                                              rb.snr)
                assert abs(gb.dm - self.DM_TRUE) < 75.0
            beams_checked += 1
        assert beams_checked == 2

    def test_coadd_candidates_gain(self, run):
        """The coadd search inside the SPMD program recovers the common
        pulse at higher S/N than any single beam (~sqrt(N) gain)."""
        coadd = run["coadd"]
        assert coadd, "no coadd candidates from the sharded step"
        best_co = max(coadd, key=lambda c: c.snr)
        assert abs(best_co.dm - self.DM_TRUE) < 75.0
        best_single = max(
            (c.snr for cl in run["per_beam"].values() for c in cl),
            default=0.0)
        assert best_co.snr > best_single, (best_co.snr, best_single)

    def test_weights_healthy(self, run):
        assert np.asarray(run["out"].weights_mean).min() > 0.9


class TestShardedInjection:
    """In-graph FRB injection inside the sharded step (build_array_step
    inject_sec — the reference's signal test, src/process_baseband.cu:
    1098-1102 arms an injection every 60 s): the armed burst must come
    back out of the SPMD candidate plane in EVERY beam and in the coadd,
    at the configured DM, with ~sqrt(N) coadd gain."""

    def test_injected_burst_recovered_everywhere(self):
        import dataclasses

        from vlite_fast_tpu.config import (AntennaConfig, ArrayConfig,
                                           PipelineConfig, SearchConfig)
        from vlite_fast_tpu.parallel.mesh import make_mesh
        from vlite_fast_tpu.parallel.sharded_pipeline import (
            build_array_step, extract_candidates)

        na, nt, nant, nsec, dm_true = 4, 2, 8, 4, 300.0
        mesh = make_mesh(n_ant=na, n_time=nt)
        cfg = dataclasses.replace(
            PipelineConfig.tiny(freq_top_mhz=320.5, bandwidth_mhz=0.5),
            inject_frb=True, inject_dm=dm_true, inject_amp=1.3)
        scfg = SearchConfig(dm_min=0.0, dm_max=600.0, ndm=64,
                            gulp_samps=512, boxcar_max=16, zap_ranges=(),
                            snr_thresh=6.0, engine="subband",
                            dm_grid_mode="linear")
        acfg = ArrayConfig(
            antennas=tuple(AntennaConfig(i + 1, f"ea{i+1:02d}")
                           for i in range(nant)),
            pipeline=cfg, search=scfg, mesh_ant=na, mesh_time=nt)
        step_fn, make_inputs, plan, info = build_array_step(
            acfg, mesh, nsec_per_call=nsec, inject_sec=1)
        raw, bp, bpk, tail = make_inputs(seed=0)
        out, _ = step_fn(raw, bp, bpk, tail)
        per_beam, coadd, _ = extract_candidates(out, info, acfg.search)

        dm_step = info.dms[1] - info.dms[0]
        bests = []
        for beam in range(nant):
            cands = per_beam.get(beam, [])
            assert cands, f"beam {beam}: injection not recovered"
            best = max(cands, key=lambda c: c.snr)
            assert abs(best.dm - dm_true) <= 4 * dm_step, (beam, best)
            bests.append(best)
        # all beams see the SAME event (injection armed at the same
        # second on every antenna)
        peaks = {b.peak_idx for b in bests}
        assert max(peaks) - min(peaks) <= 2 * max(info.widths), peaks
        assert coadd, "injection not recovered in the coadd"
        best_co = max(coadd, key=lambda c: c.snr)
        assert abs(best_co.dm - dm_true) <= 4 * dm_step, best_co
        best_single = max(b.snr for b in bests)
        assert best_co.snr > 1.5 * best_single, (best_co.snr, best_single)
