"""Megakernel parity tests (CPU interpret mode).

The megakernel is the VMEM-resident form of the whole per-segment chain
(ref src/process_baseband.cu:1108-1360 as one launch; see
ops/megakernel.py).  Parity here is against (a) an explicit
bf16-emulation oracle (same math, plain jnp — proves the kernel's
layout/roll/packing plumbing) and (b) the production XLA chain (f32 on
CPU — proves end-to-end 2-bit packed agreement, the acceptance bar of
docs/megakernel_plan.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vlite_fast_tpu.config import PipelineConfig
from vlite_fast_tpu.models import baseband_dsp as bdsp
from vlite_fast_tpu.ops import megakernel as mk
from vlite_fast_tpu.ops import quantize as q_ops

# tiny geometry: nfft=2048 -> CT split 32x64 (n1 % 4 == 0 so the packed
# byte rows are whole), 16 ffts/segment, 2-bit, trim exercises the
# chanmin % 4 != 0 realignment path
NFFT = 2048
FFTS = 16
NSEG = 3
SEG_SAMPS = NFFT * FFTS


def _cfg(**kw):
    return PipelineConfig(
        sample_rate=SEG_SAMPS * NSEG, seg_per_sec=NSEG, nfft=NFFT,
        nkurto=256, chanmin=101, chanmax=612, nscrunch=8,
        rfi_mode=0, ema_impl="scan", dft_exact_input=True, **kw)


def _raw(cfg, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 256, size=(2, cfg.sample_rate),
                        dtype=np.uint8)


def test_stageA_power_matches_oracle():
    cfg = _cfg()
    raw = _raw(cfg)
    p = np.asarray(mk.dft_detect_power(jnp.asarray(raw), NFFT, 2, NSEG))
    o = mk.dft_detect_oracle(raw, NFFT, 2, NSEG)
    assert p.shape == o.shape
    rel = np.abs(p - o) / np.maximum(np.abs(o), 1e-3)
    assert rel.max() < 2e-3


def test_stageA_power_matches_chain_layout():
    """Factored (k2, k1) planes refold to the chain's linear channels."""
    from vlite_fast_tpu.ops import channelize as ch_ops
    from vlite_fast_tpu.ops import normalize as norm_ops
    from vlite_fast_tpu.ops import unpack as unpack_ops
    cfg = _cfg()
    raw = _raw(cfg)
    p = np.asarray(mk.dft_detect_power(jnp.asarray(raw), NFFT, 2, NSEG))
    x = unpack_ops.convert_uint8(jnp.asarray(raw[:, :SEG_SAMPS]))
    spec = ch_ops.channelize(x, NFFT, method="matmul", precision="high",
                             exact_bf16_input=True)
    pw = np.asarray(norm_ops.detect(spec)).reshape(2 * FFTS, -1)
    n1, n2 = ch_ops._ct_split(NFFT)
    n2o = NFFT // 2 // n1 + 1
    kz = p[0][:, :n2o, :n1].reshape(2 * FFTS, -1)[:, :NFFT // 2 + 1]
    rel = np.abs(kz - pw) / np.maximum(np.abs(pw), 1e-2)
    assert rel.max() < 5e-3          # bf16 kernel vs f32 CPU chain


def test_stageB_packed_agreement_and_bp_carry():
    cfg = _cfg()
    raw = _raw(cfg)
    st = bdsp.init_state(cfg)
    outs = []
    for s in range(NSEG):
        seg = jnp.asarray(raw[:, s * SEG_SAMPS:(s + 1) * SEG_SAMPS])
        o, st = bdsp.process_segment(cfg, seg, st)
        outs.append(np.asarray(o.packed))
    chain_packed = np.concatenate(outs, axis=0)

    bp0 = mk.bp_to_factored(jnp.zeros((2, cfg.nchan), jnp.float32), NFFT)
    planes, bp_new = mk.chain_second_plain(
        jnp.asarray(raw), bp0, NFFT, 2, NSEG, cfg.nscrunch,
        float(cfg.bp_scale))
    got = np.asarray(mk.unfactor_pack_realign(
        planes, NFFT, cfg.chanmin, cfg.chanmax))
    assert got.shape == chain_packed.shape
    lev_c = np.asarray(q_ops.unpack_bits(jnp.asarray(chain_packed), 2))
    lev_m = np.asarray(q_ops.unpack_bits(jnp.asarray(got), 2))
    assert (lev_c == lev_m).mean() > 0.9999

    bp_lin = np.asarray(mk.bp_from_factored(bp_new, NFFT, cfg.nchan))
    ref_bp = np.asarray(st.bp)
    rel = np.abs(bp_lin - ref_bp) / np.maximum(np.abs(ref_bp), 1e-6)
    assert rel.max() < 1e-4


def test_stageB_bp_carry_across_calls():
    """Second call re-uses the carried bandpass (no re-seeding)."""
    cfg = _cfg()
    raw = _raw(cfg, seed=11)
    raw2 = _raw(cfg, seed=12)
    st = bdsp.init_state(cfg)
    chain = []
    for r in (raw, raw2):
        for s in range(NSEG):
            seg = jnp.asarray(r[:, s * SEG_SAMPS:(s + 1) * SEG_SAMPS])
            o, st = bdsp.process_segment(cfg, seg, st)
            chain.append(np.asarray(o.packed))
    chain_packed = np.concatenate(chain, axis=0)

    bp = mk.bp_to_factored(jnp.zeros((2, cfg.nchan), jnp.float32), NFFT)
    got = []
    for r in (raw, raw2):
        planes, bp = mk.chain_second_plain(
            jnp.asarray(r), bp, NFFT, 2, NSEG, cfg.nscrunch,
            float(cfg.bp_scale))
        got.append(np.asarray(mk.unfactor_pack_realign(
            planes, NFFT, cfg.chanmin, cfg.chanmax)))
    got = np.concatenate(got, axis=0)
    lev_c = np.asarray(q_ops.unpack_bits(jnp.asarray(chain_packed), 2))
    lev_m = np.asarray(q_ops.unpack_bits(jnp.asarray(got), 2))
    assert (lev_c == lev_m).mean() > 0.9999


def test_stageC_dual_stream_parity():
    """Full rfi_mode=2 kernel vs the chain: both packed streams, bit-equal
    weights, exact dag_frac, bp_kur carry — with RFI injected so the
    D'Agostino gates actually fire."""
    from vlite_fast_tpu.models import synthesis
    cfg = PipelineConfig(
        sample_rate=SEG_SAMPS * NSEG, seg_per_sec=NSEG, nfft=NFFT,
        nkurto=256, chanmin=101, chanmax=612, nscrunch=8,
        rfi_mode=2, ema_impl="scan", rfi_impl="xla",
        front_layout="flat", dft_exact_input=True)
    raw = synthesis.white_noise_uint8(cfg.sample_rate, seed=5)
    t = np.arange(3000)
    raw = raw.astype(np.int16)
    raw[0, 40000:43000] += (60 * np.sin(0.3 * t)).astype(np.int16)
    raw = np.clip(raw, 0, 255).astype(np.uint8)

    st = bdsp.init_state(cfg)
    cp, ck, ws, dfs = [], [], [], []
    for s in range(NSEG):
        seg = jnp.asarray(raw[:, s * SEG_SAMPS:(s + 1) * SEG_SAMPS])
        o, st = bdsp.process_segment(cfg, seg, st)
        cp.append(np.asarray(o.packed))
        ck.append(np.asarray(o.packed_kur))
        ws.append(np.asarray(o.weights))
        dfs.append(float(o.dag_frac))
    chain_w = np.concatenate(ws, 1)

    bp0 = mk.bp_to_factored(jnp.zeros((4, cfg.nchan), jnp.float32), NFFT)
    pp, kk, w, dag, bp_new = mk.chain_second(
        jnp.asarray(raw), bp0, NFFT, 2, NSEG, cfg.nscrunch, cfg.nkurto,
        2, float(cfg.bp_scale), float(cfg.dag_thresh),
        float(cfg.dag_fb_thresh))
    got_p = np.asarray(mk.unfactor_pack_realign(
        pp, NFFT, cfg.chanmin, cfg.chanmax))
    got_k = np.asarray(mk.unfactor_pack_realign(
        kk, NFFT, cfg.chanmin, cfg.chanmax))
    for a, b in [(np.concatenate(cp, 0), got_p),
                 (np.concatenate(ck, 0), got_k)]:
        la = np.asarray(q_ops.unpack_bits(jnp.asarray(a), 2))
        lb = np.asarray(q_ops.unpack_bits(jnp.asarray(b), 2))
        assert (la == lb).mean() > 0.9999
    w = np.asarray(w)[:, :, 0]
    got_w = np.concatenate(
        [w[s].reshape(2, SEG_SAMPS // NFFT) for s in range(NSEG)], axis=1)
    assert np.array_equal(chain_w, got_w)
    assert got_w.mean() < 1.0          # gates fired on the injected RFI
    assert abs(np.asarray(dag).mean() - np.mean(dfs)) < 1e-6
    bp_lin = np.asarray(mk.bp_from_factored(bp_new[2:], NFFT, cfg.nchan))
    ref = np.asarray(st.bp_kur)
    rel = np.abs(bp_lin - ref) / np.maximum(np.abs(ref), 1e-6)
    assert rel.max() < 1e-4


def test_unfactor_realign_aligned_case():
    """chanmin % 4 == 0 takes the pure-slice path."""
    cfg = _cfg()
    raw = _raw(cfg, seed=7)
    cfg4 = PipelineConfig(
        sample_rate=SEG_SAMPS * NSEG, seg_per_sec=NSEG, nfft=NFFT,
        nkurto=256, chanmin=100, chanmax=611, nscrunch=8,
        rfi_mode=0, ema_impl="scan", dft_exact_input=True)
    st = bdsp.init_state(cfg4)
    seg = jnp.asarray(raw[:, :SEG_SAMPS])
    o, st = bdsp.process_segment(cfg4, seg, st)
    bp0 = mk.bp_to_factored(jnp.zeros((2, cfg4.nchan), jnp.float32), NFFT)
    planes, _ = mk.chain_second_plain(
        jnp.asarray(raw[:, :SEG_SAMPS]), bp0, NFFT, 2, 1, cfg4.nscrunch,
        float(cfg4.bp_scale))
    got = np.asarray(mk.unfactor_pack_realign(
        planes, NFFT, cfg4.chanmin, cfg4.chanmax))
    lev_c = np.asarray(q_ops.unpack_bits(jnp.asarray(np.asarray(o.packed)), 2))
    lev_m = np.asarray(q_ops.unpack_bits(jnp.asarray(got), 2))
    assert (lev_c == lev_m).mean() > 0.9999


def test_v2_dual_stream_parity():
    """Natural-layout kernel (chain_second_v2): both packed streams,
    bit-equal weights, exact dag_frac, bp carry — same bar as stage C,
    with RFI injected so the row-window gates + roll-fill masks fire."""
    from vlite_fast_tpu.models import synthesis
    cfg = PipelineConfig(
        sample_rate=SEG_SAMPS * NSEG, seg_per_sec=NSEG, nfft=NFFT,
        nkurto=256, chanmin=101, chanmax=612, nscrunch=8,
        rfi_mode=2, ema_impl="scan", rfi_impl="xla",
        front_layout="flat", dft_exact_input=True)
    raw = synthesis.white_noise_uint8(cfg.sample_rate, seed=5)
    t = np.arange(3000)
    raw = raw.astype(np.int16)
    raw[0, 40000:43000] += (60 * np.sin(0.3 * t)).astype(np.int16)
    raw = np.clip(raw, 0, 255).astype(np.uint8)

    st = bdsp.init_state(cfg)
    cp, ck, ws, dfs = [], [], [], []
    for s in range(NSEG):
        seg = jnp.asarray(raw[:, s * SEG_SAMPS:(s + 1) * SEG_SAMPS])
        o, st = bdsp.process_segment(cfg, seg, st)
        cp.append(np.asarray(o.packed))
        ck.append(np.asarray(o.packed_kur))
        ws.append(np.asarray(o.weights))
        dfs.append(float(o.dag_frac))
    chain_w = np.concatenate(ws, 1)

    bp0 = mk.bp_to_factored_v2(jnp.zeros((4, cfg.nchan), jnp.float32),
                               NFFT)
    pp, kk, w, dag, bp_new = mk.chain_second_v2(
        jnp.asarray(raw), bp0, NFFT, 2, NSEG, cfg.nscrunch, cfg.nkurto,
        2, float(cfg.bp_scale), float(cfg.dag_thresh),
        float(cfg.dag_fb_thresh))
    got_p = np.asarray(mk.unfactor_pack_realign_v2(
        pp, NFFT, cfg.chanmin, cfg.chanmax))
    got_k = np.asarray(mk.unfactor_pack_realign_v2(
        kk, NFFT, cfg.chanmin, cfg.chanmax))
    for a, b in [(np.concatenate(cp, 0), got_p),
                 (np.concatenate(ck, 0), got_k)]:
        la = np.asarray(q_ops.unpack_bits(jnp.asarray(a), 2))
        lb = np.asarray(q_ops.unpack_bits(jnp.asarray(b), 2))
        assert (la == lb).mean() > 0.9999
    w = np.asarray(w)[:, :, 0]
    got_w = np.concatenate(
        [w[s].reshape(2, SEG_SAMPS // NFFT) for s in range(NSEG)], axis=1)
    assert np.array_equal(chain_w, got_w)
    assert got_w.mean() < 1.0
    assert abs(np.asarray(dag).mean() - np.mean(dfs)) < 1e-6
    bp_lin = np.asarray(mk.bp_from_factored_v2(bp_new[2:], NFFT,
                                               cfg.nchan))
    ref = np.asarray(st.bp_kur)
    rel = np.abs(bp_lin - ref) / np.maximum(np.abs(ref), 1e-6)
    assert rel.max() < 1e-4


def test_v2_via_process_second_and_carry():
    """chain_impl='megakernel2' through process_second across two calls:
    packed agreement + carried bandpass continue the observation."""
    import dataclasses
    cfg_scan = _cfg()
    cfg2 = dataclasses.replace(cfg_scan, chain_impl="megakernel2",
                               rfi_mode=2)
    cfg_ref = dataclasses.replace(cfg_scan, rfi_mode=2)
    assert bdsp.megakernel_supported(cfg2)
    raw1, raw2 = _raw(cfg2, seed=21), _raw(cfg2, seed=22)
    st_r = bdsp.init_state(cfg_ref)
    st_m = bdsp.init_state(cfg2)
    for raw in (raw1, raw2):
        o_r, st_r = bdsp.process_second(cfg_ref, jnp.asarray(raw), st_r,
                                        jnp.asarray(False))
        o_m, st_m = bdsp.process_second(cfg2, jnp.asarray(raw), st_m,
                                        jnp.asarray(False))
    for stream in ("packed", "packed_kur"):
        la = np.asarray(q_ops.unpack_bits(getattr(o_r, stream), 2))
        lb = np.asarray(q_ops.unpack_bits(getattr(o_m, stream), 2))
        assert (la == lb).mean() > 0.9999, stream
    bp_r, bp_m = np.asarray(st_r.bp_kur), np.asarray(st_m.bp_kur)
    rel = np.abs(bp_m - bp_r) / np.maximum(np.abs(bp_r), 1e-6)
    assert rel.max() < 1e-4


def test_pallas_pretranspose_matches_xla():
    """The MXU identity-dot relayout is byte-identical to pretranspose_u8
    (u8 out) and value-identical to its converted voltages (bf16 out)."""
    cfg = _cfg()
    raw = jnp.asarray(_raw(cfg, seed=21))
    ref = np.asarray(mk.pretranspose_u8(raw, NFFT, 2, NSEG))
    got = np.asarray(mk.pallas_pretranspose(raw, NFFT, 2, NSEG))
    assert got.dtype == np.uint8
    assert np.array_equal(ref, got)

    vb = np.asarray(mk.pallas_pretranspose(
        raw, NFFT, 2, NSEG, out_dtype=jnp.bfloat16)).astype(np.float32)
    ui = ref.astype(np.int32)
    want = ui.astype(np.float32) * (1.0 / 128.0) - 1.0
    want = np.where(ui == 0, 0.0, want)
    assert np.array_equal(vb, want)     # voltages are bf16-exact


def test_chain_second_pallas_pretranspose_byte_exact():
    """chain_second with pretranspose='pallas'/'pallas_bf16' is
    byte-exact vs the XLA-pretranspose kernel (dual stream, carries)."""
    raw = jnp.asarray(_raw(_cfg(), seed=22))
    cfg = _cfg()
    bp0 = mk.bp_to_factored(jnp.zeros((4, cfg.nchan), jnp.float32), NFFT)
    args = (raw, bp0, NFFT, 2, NSEG, cfg.nscrunch, cfg.nkurto, 2,
            float(cfg.bp_scale), float(cfg.dag_thresh),
            float(cfg.dag_fb_thresh))
    ref = mk.chain_second(*args)
    for mode in ("pallas", "pallas_bf16"):
        got = mk.chain_second(*args, pretranspose=mode)
        for r, g in zip(ref, got):
            assert np.array_equal(np.asarray(r), np.asarray(g)), mode


def test_v4_dual_stream_parity():
    """chain_second_v4 (both stages batched, XLU bridge) vs v1 and v2:
    identical products — packed agreement ~1, weights/dag/bp tight."""
    from vlite_fast_tpu.models import synthesis
    cfg = PipelineConfig(
        sample_rate=SEG_SAMPS * NSEG, seg_per_sec=NSEG, nfft=NFFT,
        nkurto=256, chanmin=101, chanmax=612, nscrunch=8,
        rfi_mode=2, ema_impl="scan", rfi_impl="xla",
        front_layout="flat", dft_exact_input=True)
    raw = synthesis.white_noise_uint8(cfg.sample_rate, seed=9)
    t = np.arange(3000)
    raw = raw.astype(np.int16)
    raw[0, 40000:43000] += (60 * np.sin(0.3 * t)).astype(np.int16)
    raw = np.clip(raw, 0, 255).astype(np.uint8)
    raw = jnp.asarray(raw)
    args = (NFFT, 2, NSEG, cfg.nscrunch, cfg.nkurto, 2,
            float(cfg.bp_scale), float(cfg.dag_thresh),
            float(cfg.dag_fb_thresh))

    bp1 = mk.bp_to_factored(jnp.zeros((4, cfg.nchan), jnp.float32), NFFT)
    p1, k1, w1, d1, b1 = mk.chain_second(raw, bp1, *args)
    bp2 = mk.bp_to_factored_v2(jnp.zeros((4, cfg.nchan), jnp.float32),
                               NFFT)
    p2, k2, w2, d2, b2 = mk.chain_second_v2(raw, bp2, *args)
    for pre_dtype in ("u8", "bf16"):
        p4, k4, w4, d4, b4 = mk.chain_second_v4(
            raw, bp2, *args, pre_dtype=pre_dtype, pre_impl="xlu")
        assert np.array_equal(np.asarray(w2), np.asarray(w4))
        assert np.allclose(np.asarray(d2), np.asarray(d4), atol=1e-6)
        # packed planes: v4 shares v2's layout; products identical,
        # accumulation grouping differs only inside dots
        for a, b in ((p2, p4), (k2, k4)):
            la = np.asarray(q_ops.unpack_bits(
                mk.unfactor_pack_realign_v2(a, NFFT, cfg.chanmin,
                                            cfg.chanmax), 2))
            lb = np.asarray(q_ops.unpack_bits(
                mk.unfactor_pack_realign_v2(b, NFFT, cfg.chanmin,
                                            cfg.chanmax), 2))
            assert (la == lb).mean() > 0.9999, pre_dtype
        bl2 = np.asarray(mk.bp_from_factored_v2(b2, NFFT, cfg.nchan))
        bl4 = np.asarray(mk.bp_from_factored_v2(b4, NFFT, cfg.nchan))
        rel = np.abs(bl2 - bl4) / np.maximum(np.abs(bl2), 1e-6)
        assert rel.max() < 1e-3, pre_dtype
        # and against v1 through the byte realign path
        lv1 = np.asarray(q_ops.unpack_bits(
            mk.unfactor_pack_realign(p1, NFFT, cfg.chanmin,
                                     cfg.chanmax), 2))
        lv4 = np.asarray(q_ops.unpack_bits(
            mk.unfactor_pack_realign_v2(p4, NFFT, cfg.chanmin,
                                        cfg.chanmax), 2))
        assert (lv1 == lv4).mean() > 0.9999, pre_dtype
