"""The per-antenna streaming DSP chain — the system's flagship model.

TPU-native re-design of process_baseband (ref src/process_baseband.cu:334,
segment dispatch :1108-1458): one pure, jittable function maps a 100 ms
chunk of raw 8-bit voltages to quantized filterbank bytes, threading the
carried state (EMA bandpass per stream) explicitly.  A second of data is a
lax.scan of that function over its 10 segments; an observation is the host
runtime repeatedly feeding seconds (runtime/pipeline.py).

Chain per segment (matching the reference launch order at
process_baseband.cu:1152-1360):

  uint8 (npol, seg_samps)
    -> convert            (pb_kernels convertarray)
    -> [rfi_mode>0] kurtosis stats + D'Agostino + mask  (ops.kurtosis)
    -> rfft channelize    (cufftExecR2C)
    -> [inject] FRB track multiply                      (ops.injection)
    -> detect + EMA bandpass normalize [weighted]       (ops.normalize)
    -> pscrunch [+weights] -> tscrunch [+weights]
    -> channel trim + quantize + pack                   (ops.quantize)
  -> packed uint8 (out_samps, bytes_per_samp) x {plain, kur} streams

rfi_mode semantics match the reference (-r flag, process_baseband.cu:449):
0 = no excision (plain stream only), 1 = excision in place (kur stream
only), 2 = both streams (default).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlite_fast_tpu.config import PipelineConfig
from vlite_fast_tpu.ops import channelize as ch_ops
from vlite_fast_tpu.ops import injection as inj_ops
from vlite_fast_tpu.ops import kurtosis as kur_ops
from vlite_fast_tpu.ops import normalize as norm_ops
from vlite_fast_tpu.ops import quantize as q_ops
from vlite_fast_tpu.ops import unpack as unpack_ops


class DSPState(NamedTuple):
    """Carried DSP state (the only cross-segment state in the chain,
    SURVEY.md section 5 'checkpoint/resume')."""

    bp: jax.Array        # (npol, nchan) plain-stream bandpass
    bp_kur: jax.Array    # (npol, nchan) kurtosis-stream bandpass
    segs_since_inject: jax.Array  # int32 scalar; <0 means not armed
    tail: jax.Array      # (2, npol, (pfb_ntap-1)*nfft) carried voltages
                         # for the streaming WOLA channelizer — stream 0
                         # plain, stream 1 RFI-masked ((2, npol, 0) unless
                         # channelizer == 'pfb')
    wtail: jax.Array     # (npol, pfb_ntap-1) carried per-block kurtosis
                         # weights for the WOLA weight bookkeeping
                         # ((npol, 0) unless channelizer == 'pfb')


class SegmentOutput(NamedTuple):
    packed: jax.Array       # (out_samps, nbytes) plain stream ('' if mode 1)
    packed_kur: jax.Array   # (out_samps, nbytes) kur stream ('' if mode 0)
    weights: jax.Array      # (npol, ffts_per_seg) kurtosis weights
    dag_frac: jax.Array     # scalar: fraction of fine windows flagged
    histo: jax.Array = None  # (npol, 256) raw-sample histogram (DOHISTO,
                             # ref pb_kernels.cu:321-336) when cfg.do_histo


def init_state(cfg: PipelineConfig) -> DSPState:
    pfb = cfg.channelizer == "pfb"
    tail_len = (cfg.pfb_ntap - 1) * cfg.nfft if pfb else 0
    wtail_len = (cfg.pfb_ntap - 1) if pfb else 0
    return DSPState(
        bp=jnp.zeros((cfg.npol_in, cfg.nchan), jnp.float32),
        bp_kur=jnp.zeros((cfg.npol_in, cfg.nchan), jnp.float32),
        segs_since_inject=jnp.int32(-1),
        tail=jnp.zeros((2, cfg.npol_in, tail_len), jnp.float32),
        wtail=jnp.ones((cfg.npol_in, wtail_len), jnp.float32),
    )


def _frb_delays_np(cfg: PipelineConfig) -> np.ndarray:
    spectra_per_sec = cfg.seg_per_sec * cfg.ffts_per_seg
    return inj_ops.frb_delays(
        cfg.nchan, cfg.inject_dm, spectra_per_sec,
        freq_top_ghz=cfg.freq_top_mhz / 1e3,
        bandwidth_ghz=cfg.bandwidth_mhz / 1e3)


def _frb_delay_array(cfg: PipelineConfig) -> jax.Array:
    return jnp.asarray(_frb_delays_np(cfg))


def _inject_active_limit_segs(cfg: PipelineConfig) -> int:
    """Last segment index (since arming) whose spectra can still lie on
    the injected track: the DM-80 sweep bottoms out max(delays) + width
    spectra after the top-of-band arrival (~1.2 s of the 60 s arming
    period, ref src/process_baseband.cu:1098-1102)."""
    width = cfg.inject_width_s * cfg.seg_per_sec * cfg.ffts_per_seg
    max_d = float(_frb_delays_np(cfg).max())
    return int(np.ceil((max_d + width) / cfg.ffts_per_seg)) + 1


def inject_window_seconds(cfg: PipelineConfig) -> int:
    """Whole seconds (from the arming second, inclusive) during which the
    injected track can still intersect the data.  Host runtimes use this
    to dispatch the injection-free compiled chain outside the window:
    the track multiply + select cost two extra passes over the spectra
    plane per segment (~8 of 59 ms/data-second measured), and an
    in-graph lax.cond saves nothing — the conditional's operand boundary
    breaks the DFT->detect fusion and pessimizes the scan (59.5 vs 51.1
    ms/data-second measured for the never-taken branch).  Outside the
    window the injection path multiplies by all-ones, so skipping it is
    byte-exact."""
    return int(np.ceil((_inject_active_limit_segs(cfg) + 1)
                       / cfg.seg_per_sec)) + 1


def _rfi_stage(cfg: PipelineConfig, raw: jax.Array, x: jax.Array):
    """RFI excision front: (masked voltages, weights, dag_frac).

    rfi_impl 'pallas' runs the fused single-pass kernel
    (ops/rfi_pallas.rfi_front: uint8 convert + window stats + D'Agostino
    gates + mask in one launch — the XLA form is ~6 kernels whose launch
    overhead dominates at the production segment tiling); 'xla' is the
    ops/kurtosis graph form.  Exact flag parity between the two is
    asserted in tests."""
    weights = jnp.ones((cfg.npol_in, cfg.ffts_per_seg), jnp.float32)
    dag_frac = jnp.float32(0.0)
    if cfg.rfi_mode == 0:
        return x, weights, dag_frac
    if cfg.rfi_impl == "pallas":
        from vlite_fast_tpu.ops import rfi_pallas
        x_kur, weights, dag = rfi_pallas.rfi_front(
            raw, cfg.nkurto, cfg.nfft, dag_thresh=cfg.dag_thresh,
            dag_fb_thresh=cfg.dag_fb_thresh)
        dag_frac = jnp.mean((dag >= cfg.dag_thresh).astype(jnp.float32))
        return x_kur, weights, dag_frac
    res = kur_ops.rfi_excise(x, cfg.nkurto, cfg.nfft,
                             dag_thresh=cfg.dag_thresh,
                             dag_fb_thresh=cfg.dag_fb_thresh)
    dag_frac = jnp.mean((res.dag >= cfg.dag_thresh).astype(jnp.float32))
    return res.masked, res.weights, dag_frac


def use_framed_front(cfg: PipelineConfig) -> bool:
    """True when the segment front-end can run entirely in the DFT's
    (b, n1, n2) frame layout (ops/kurtosis.rfi_excise_framed): the uint8
    bytes are reshaped ONCE and no float voltage array ever changes tile
    layout — the flat path's two 1.6 MB f32 relayouts per segment
    (window reshape + CT reshape) profiled at ~11 of 50 ms/data-second."""
    if (cfg.front_layout not in ("frames", "mixed")
            or cfg.channelizer != "matmul"):
        return False
    if cfg.rfi_mode > 0 and cfg.rfi_impl != "xla":
        return False
    if cfg.batch_streams:
        return False
    n1, n2 = ch_ops._ct_split(cfg.nfft)
    # a fine window must be a whole number of n1-rows (then windows per
    # block * rows per window == n1 automatically, since nfft = n1*n2)
    return cfg.nkurto % n2 == 0 and cfg.nfft % cfg.nkurto == 0


def process_segment(cfg: PipelineConfig, raw: jax.Array,
                    state: DSPState) -> tuple[SegmentOutput, DSPState]:
    """One 1/seg_per_sec-second chunk through the full chain.

    raw: (npol_in, seg_samps) uint8. Pure function of (raw, state).
    """
    framed = use_framed_front(cfg)
    if framed:
        n1, n2 = ch_ops._ct_split(cfg.nfft)
        xb = raw.reshape(cfg.npol_in * cfg.ffts_per_seg, n1, n2)
        weights = jnp.ones((cfg.npol_in, cfg.ffts_per_seg), jnp.float32)
        dag_frac = jnp.float32(0.0)
        if cfg.rfi_mode > 0:
            if cfg.front_layout == "frames":
                fr = kur_ops.rfi_excise_framed(
                    xb, cfg.npol_in, cfg.nkurto, cfg.nfft,
                    dag_thresh=cfg.dag_thresh,
                    dag_fb_thresh=cfg.dag_fb_thresh)
                weights, dag, row_keep = fr.weights, fr.dag, fr.row_keep
                x = fr.xf
            else:
                # 'mixed': kurtosis stats on the flat lane-aligned
                # layout, only convert+mask in frame layout (the select
                # fuses into the DFT operand; the flat masked voltages
                # are never materialized)
                res = kur_ops.rfi_excise(
                    unpack_ops.convert_uint8(raw), cfg.nkurto, cfg.nfft,
                    dag_thresh=cfg.dag_thresh,
                    dag_fb_thresh=cfg.dag_fb_thresh)
                weights, dag = res.weights, res.dag
                row_keep = kur_ops.row_keep_from_dag(
                    dag, res.dag_fb, cfg.npol_in, cfg.nkurto, cfg.nfft,
                    n2, dag_thresh=cfg.dag_thresh,
                    dag_fb_thresh=cfg.dag_fb_thresh)
                x = unpack_ops.convert_uint8(xb)
            dag_frac = jnp.mean((dag >= cfg.dag_thresh)
                                .astype(jnp.float32))
            # the mask select fuses into the DFT's stage-1 operand read
            x_kur = jnp.where(row_keep[:, :, None], x, 0.0)
        else:
            x = unpack_ops.convert_uint8(xb)
            x_kur = x
    else:
        x = unpack_ops.convert_uint8(raw)
        x_kur, weights, dag_frac = _rfi_stage(cfg, raw, x)

    new_tail, new_wtail = state.tail, state.wtail
    if framed:
        def spectra(v, stream=0):
            out = ch_ops.matmul_rfft_framed(
                v, cfg.nfft, precision=cfg.dft_precision,
                exact_bf16_input=cfg.dft_exact_input,
                stage2=cfg.dft_stage2)
            return out.reshape(cfg.npol_in, cfg.ffts_per_seg, -1)
    elif cfg.channelizer == "pfb":
        # streaming WOLA: prepend the carried (ntap-1)*nfft voltages so
        # this segment yields exactly ffts_per_seg spectra, then carry the
        # segment's own tail forward (genbase's overlap pattern applied to
        # the analysis side).  Stream 0 carries plain voltages, stream 1
        # the RFI-masked ones; the kurtosis weights get the matching
        # WOLA-window bookkeeping (ch_ops.pfb_weights).
        def spectra(v, stream=0):
            v_ext = jnp.concatenate([state.tail[stream], v], axis=1)
            return ch_ops.polyphase_channelize(v_ext, cfg.nfft,
                                               cfg.pfb_ntap,
                                               method="matmul",
                                               precision=cfg.dft_precision)

        tl = (cfg.pfb_ntap - 1) * cfg.nfft
        new_tail = jnp.stack([x[:, -tl:], x_kur[:, -tl:]])
        if cfg.rfi_mode > 0:
            w_ext = jnp.concatenate([state.wtail, weights], axis=1)
            new_wtail = weights[:, -(cfg.pfb_ntap - 1):]
            weights = ch_ops.pfb_weights(w_ext, cfg.pfb_ntap, cfg.nfft)
    else:
        def spectra(v, stream=0):
            # voltages are exact k/128 values (masking only zeroes):
            # stage 1 of the 'high' DFT runs in 2 bf16 passes
            return ch_ops.channelize(v, cfg.nfft, method=cfg.channelizer,
                                     precision=cfg.dft_precision,
                                     exact_bf16_input=cfg.dft_exact_input,
                                     stage2=cfg.dft_stage2)

    def maybe_inject(spec):
        if not cfg.inject_frb:
            return spec
        delays = _frb_delay_array(cfg)
        width = cfg.inject_width_s * cfg.seg_per_sec * cfg.ffts_per_seg
        since = state.segs_since_inject * cfg.ffts_per_seg
        injected = inj_ops.inject_frb(spec, delays, since, width,
                                      cfg.inject_amp)
        return jnp.where(state.segs_since_inject >= 0, injected, spec)

    if cfg.ema_impl == "pallas":
        from vlite_fast_tpu.ops import pallas_kernels as pk
        ema = pk.normalize_ema_pallas
        ema_w = pk.normalize_ema_weighted_pallas
    elif cfg.ema_impl == "matmul":
        ema = norm_ops.normalize_ema_matmul
        ema_w = norm_ops.normalize_ema_weighted_matmul
    elif cfg.ema_impl == "assoc":
        ema = norm_ops.normalize_ema_assoc
        ema_w = norm_ops.normalize_ema_weighted_assoc
    else:
        ema = norm_ops.normalize_ema
        ema_w = norm_ops.normalize_ema_weighted

    def finish_plain(spec, bp):
        p = norm_ops.detect(spec)
        out, bp_new = ema(p, bp, cfg.bp_scale)
        if cfg.npol_out == 1 and cfg.npol_in == 2:
            out = norm_ops.pscrunch(out)
        out = norm_ops.tscrunch(out, cfg.nscrunch)
        packed = q_ops.sel_and_dig(out, cfg.chanmin, cfg.chanmax, cfg.nbit)
        return packed, bp_new

    def finish_kur(spec, bp):
        p = norm_ops.detect(spec)
        out, bp_new = ema_w(p, weights, bp, cfg.bp_scale)
        w = weights
        if cfg.npol_out == 1 and cfg.npol_in == 2:
            out, w = norm_ops.pscrunch_weights(out, w, cfg.min_weight)
        out = norm_ops.tscrunch_weights(out, w, cfg.nscrunch, cfg.min_weight)
        packed = q_ops.sel_and_dig(out, cfg.chanmin, cfg.chanmax, cfg.nbit)
        return packed, bp_new

    bp, bp_kur = state.bp, state.bp_kur
    nbytes = cfg.npol_out * cfg.nchanout * cfg.nbit // 8
    empty = jnp.zeros((cfg.out_samps_per_seg, nbytes), jnp.uint8)
    if cfg.rfi_mode == 0:
        packed, bp = finish_plain(maybe_inject(spectra(x)), bp)
        packed_kur = empty
    elif cfg.rfi_mode == 1:
        packed_kur, bp_kur = finish_kur(
            maybe_inject(spectra(x_kur, 1)), bp_kur)
        packed = empty
    elif cfg.batch_streams and cfg.channelizer != "pfb":
        # one 2x-batched DFT over [plain; masked] voltages (re-testable
        # alternative; see cfg.batch_streams for the measurement history)
        spec2 = ch_ops.channelize(jnp.concatenate([x, x_kur], axis=0),
                                  cfg.nfft, method=cfg.channelizer,
                                  precision=cfg.dft_precision,
                                  exact_bf16_input=cfg.dft_exact_input,
                                  stage2=cfg.dft_stage2)
        packed, bp = finish_plain(maybe_inject(spec2[:cfg.npol_in]), bp)
        packed_kur, bp_kur = finish_kur(
            maybe_inject(spec2[cfg.npol_in:]), bp_kur)
    else:
        # sequential per-stream DFTs (XLA pipelines producer/consumer
        # pairs across the streams)
        packed, bp = finish_plain(maybe_inject(spectra(x)), bp)
        packed_kur, bp_kur = finish_kur(
            maybe_inject(spectra(x_kur, 1)), bp_kur)

    new_since = jnp.where(state.segs_since_inject >= 0,
                          state.segs_since_inject + 1,
                          state.segs_since_inject)
    new_state = DSPState(bp=bp, bp_kur=bp_kur, segs_since_inject=new_since,
                         tail=new_tail, wtail=new_wtail)
    return SegmentOutput(packed, packed_kur, weights, dag_frac), new_state


def _second_powers(cfg: PipelineConfig, raw_second: jax.Array,
                   state: DSPState):
    """Front half of the chain for the whole second: scan the segments
    through unpack -> kurtosis -> channelize -> inject -> detect, stacking
    full-second detected powers.  No EMA inside the scan — that lets the
    one-pass Pallas EMA run once per second OUTSIDE lax.scan (the Mosaic
    nested-scan lowering bug workaround, see ops/pallas_kernels.py)."""
    segs = raw_second.reshape(cfg.npol_in, cfg.seg_per_sec,
                              cfg.seg_samps).swapaxes(0, 1)
    delays = _frb_delay_array(cfg) if cfg.inject_frb else None
    width = cfg.inject_width_s * cfg.seg_per_sec * cfg.ffts_per_seg

    def step(carry, seg):
        since, tail, wtail = carry
        x = unpack_ops.convert_uint8(seg)
        x_kur, weights, dag_frac = _rfi_stage(cfg, seg, x)
        new_tail, new_wtail = tail, wtail
        if cfg.channelizer == "pfb":
            def spectra(v, stream=0):
                v_ext = jnp.concatenate([tail[stream], v], axis=1)
                return ch_ops.polyphase_channelize(
                    v_ext, cfg.nfft, cfg.pfb_ntap, method="matmul",
                    precision=cfg.dft_precision)
            tl = (cfg.pfb_ntap - 1) * cfg.nfft
            new_tail = jnp.stack([x[:, -tl:], x_kur[:, -tl:]])
            if cfg.rfi_mode > 0:
                w_ext = jnp.concatenate([wtail, weights], axis=1)
                new_wtail = weights[:, -(cfg.pfb_ntap - 1):]
                weights = ch_ops.pfb_weights(w_ext, cfg.pfb_ntap,
                                             cfg.nfft)
        else:
            def spectra(v, stream=0):
                return ch_ops.channelize(v, cfg.nfft,
                                         method=cfg.channelizer,
                                         precision=cfg.dft_precision,
                                         exact_bf16_input=cfg.dft_exact_input,
                                         stage2=cfg.dft_stage2)

        def maybe_inject(spec):
            if not cfg.inject_frb:
                return spec
            injected = inj_ops.inject_frb(
                spec, delays, since * cfg.ffts_per_seg, width,
                cfg.inject_amp)
            return jnp.where(since >= 0, injected, spec)

        p_plain = norm_ops.detect(maybe_inject(spectra(x))) \
            if cfg.rfi_mode != 1 else jnp.zeros(
                (cfg.npol_in, 0, cfg.nchan), jnp.float32)
        p_kur = norm_ops.detect(maybe_inject(spectra(x_kur, 1))) \
            if cfg.rfi_mode != 0 else jnp.zeros(
                (cfg.npol_in, 0, cfg.nchan), jnp.float32)
        since2 = jnp.where(since >= 0, since + 1, since)
        return (since2, new_tail, new_wtail), (p_plain, p_kur, weights,
                                               dag_frac)

    (since, tail, wtail), (pp, pk, w, df) = jax.lax.scan(
        step, (state.segs_since_inject, state.tail, state.wtail), segs)
    # (nseg, npol, ffts, nchan) -> (npol, nseg*ffts, nchan)
    fold = lambda a: jnp.swapaxes(a, 0, 1).reshape(
        cfg.npol_in, -1, cfg.nchan) if a.shape[-2] else a.reshape(
        cfg.npol_in, 0, cfg.nchan)
    weights = jnp.swapaxes(w, 0, 1).reshape(cfg.npol_in, -1)
    return fold(pp), fold(pk), weights, jnp.mean(df), since, tail, wtail


def _finish_stream(cfg: PipelineConfig, out: jax.Array,
                   weights: jax.Array | None) -> jax.Array:
    """Back half of the chain: pscrunch -> tscrunch -> trim+quantize."""
    if weights is None:
        if cfg.npol_out == 1 and cfg.npol_in == 2:
            out = norm_ops.pscrunch(out)
        out = norm_ops.tscrunch(out, cfg.nscrunch)
    else:
        w = weights
        if cfg.npol_out == 1 and cfg.npol_in == 2:
            out, w = norm_ops.pscrunch_weights(out, w, cfg.min_weight)
        out = norm_ops.tscrunch_weights(out, w, cfg.nscrunch,
                                        cfg.min_weight)
    return q_ops.sel_and_dig(out, cfg.chanmin, cfg.chanmax, cfg.nbit)


def resolve_twin_impl(cfg: PipelineConfig) -> str:
    """chain_impl for the pipeline's injection-free twin program
    (config.twin_chain_impl semantics: 'auto' adopts the natural-layout
    megakernel on the TPU backend when the geometry supports it — the
    measured 1.21x of bench_megakernel_full_tpu.py — and keeps the XLA
    chain elsewhere, so CPU tests stay byte-exact and fast)."""
    import dataclasses

    t = cfg.twin_chain_impl
    if t == "same":
        return cfg.chain_impl
    if t == "auto":
        import jax
        cand = dataclasses.replace(cfg, inject_frb=False,
                                   chain_impl="megakernel2")
        if jax.default_backend() == "tpu" and megakernel_supported(cand):
            return "megakernel2"
        return cfg.chain_impl
    return t


def megakernel_supported(cfg: PipelineConfig) -> bool:
    """Geometry/config gate for chain_impl='megakernel' (the injection
    path always uses the XLA chain — host gating keeps the armed window
    there, runtime/pipeline.feed_second)."""
    if cfg.inject_frb or cfg.channelizer != "matmul" or cfg.nbit != 2:
        return False
    if not (cfg.npol_in == 2 and cfg.npol_out == 1
            or cfg.npol_in == 1 and cfg.npol_out == 1):
        return False
    n1, n2 = ch_ops._ct_split(cfg.nfft)
    n2_out = cfg.nfft // 2 // n1 + 1
    if n1 > 128 or n2 > 128 or 2 * n2_out > 128 or n1 % 4:
        return False
    if cfg.rfi_mode > 0:
        if cfg.nkurto % n2 or cfg.nfft % cfg.nkurto:
            return False
        rw = cfg.nkurto // n2
        if cfg.chain_impl == "megakernel2":
            # natural-layout windows: rw consecutive rows, filled by a
            # log2(rw) roll cascade — rw must be a power of two and
            # divide P = n1
            if n1 % rw or rw & (rw - 1):
                return False
        elif n1 // rw > 32:
            return False
    return True


def _megakernel_second(cfg: PipelineConfig, raw_second: jax.Array,
                       state: DSPState, arm_inject: jax.Array
                       ) -> tuple[SegmentOutput, DSPState]:
    """process_second via the one-launch Pallas megakernel
    (ops/megakernel.py; ref src/process_baseband.cu:1108-1360 as one
    fused pass).  Only for inject-free programs (megakernel_supported);
    the carried state is converted to/from the kernel's factored
    bandpass layout per call (tiny (npol, nchan) ops)."""
    from vlite_fast_tpu.ops import megakernel as mk
    v2 = cfg.chain_impl in ("megakernel2", "megakernel4")
    to_fact = mk.bp_to_factored_v2 if v2 else mk.bp_to_factored
    from_fact = mk.bp_from_factored_v2 if v2 else mk.bp_from_factored
    if cfg.chain_impl == "megakernel4":
        # both-stages-batched kernel (v2 layouts, Pallas relayout in)
        chain = partial(mk.chain_second_v4, pre_dtype="u8",
                        pre_impl="xlu")
    elif v2:
        chain = mk.chain_second_v2
    elif cfg.chain_impl in ("megakernel3", "megakernel3f"):
        # pretransposed-layout kernel fed by the Pallas MXU relayout
        # (u8 blocks / converted bf16 voltages) instead of the ~18
        # ms/data-s XLA u8 relayout — byte-identical outputs
        pre = "pallas" if cfg.chain_impl == "megakernel3" \
            else "pallas_bf16"
        chain = partial(mk.chain_second, pretranspose=pre)
    else:
        chain = mk.chain_second
    unfact = mk.unfactor_pack_realign_v2 if v2 \
        else mk.unfactor_pack_realign
    since = jnp.where(arm_inject, jnp.int32(0), state.segs_since_inject)
    bpf = jnp.concatenate([
        to_fact(state.bp, cfg.nfft),
        to_fact(state.bp_kur, cfg.nfft)], axis=0)
    pp, kk, w, dag, bp_new = chain(
        raw_second, bpf, cfg.nfft, cfg.npol_in, cfg.seg_per_sec,
        cfg.nscrunch, cfg.nkurto, cfg.rfi_mode, float(cfg.bp_scale),
        float(cfg.dag_thresh), float(cfg.dag_fb_thresh))
    nbytes = cfg.npol_out * cfg.nchanout * cfg.nbit // 8
    nsamps = cfg.seg_per_sec * cfg.out_samps_per_seg
    empty = jnp.zeros((nsamps, nbytes), jnp.uint8)
    packed = unfact(pp, cfg.nfft, cfg.chanmin, cfg.chanmax) \
        if cfg.rfi_mode != 1 else empty
    packed_kur = unfact(kk, cfg.nfft, cfg.chanmin, cfg.chanmax) \
        if cfg.rfi_mode != 0 else empty
    w3 = w[:, :, 0].reshape(cfg.seg_per_sec, cfg.npol_in,
                            cfg.ffts_per_seg)
    weights = jnp.swapaxes(w3, 0, 1).reshape(cfg.npol_in, -1)
    new_since = jnp.where(since >= 0, since + cfg.seg_per_sec, since)
    new_state = DSPState(
        bp=from_fact(bp_new[:cfg.npol_in], cfg.nfft, cfg.nchan),
        bp_kur=from_fact(bp_new[cfg.npol_in:], cfg.nfft, cfg.nchan),
        segs_since_inject=new_since, tail=state.tail, wtail=state.wtail)
    histo = kur_ops.sample_histogram(raw_second) if cfg.do_histo \
        else jnp.zeros((cfg.npol_in, 0), jnp.int32)
    return SegmentOutput(packed, packed_kur, weights, jnp.mean(dag),
                         histo), new_state


@partial(jax.jit, static_argnames=("cfg",))
def process_second(cfg: PipelineConfig, raw_second: jax.Array,
                   state: DSPState, arm_inject: jax.Array
                   ) -> tuple[SegmentOutput, DSPState]:
    """One second through the full chain.

    raw_second: (npol_in, sample_rate) uint8.  arm_inject: bool scalar —
    start an FRB at the top of this second (ref process_baseband.cu:1098:
    armed when current_sec % 60 == 0).
    Outputs are concatenated over segments (time-major).

    ema_impl 'scan'/'assoc': lax.scan of process_segment (EMA fused per
    segment).  'pallas': segments are scanned through the front half only
    and the one-pass VMEM EMA runs once over the whole second's power
    block (identical results to 'scan' — the per-time-tile seeding matches
    the per-segment call sequence).  chain_impl 'megakernel': the whole
    second in one Pallas launch (injection-free programs only; armed
    programs keep the XLA chain via the host gate).
    """
    if cfg.chain_impl in ("megakernel", "megakernel2", "megakernel3",
                          "megakernel3f", "megakernel4"):
        if not megakernel_supported(cfg):
            raise ValueError(
                f"chain_impl={cfg.chain_impl!r} unsupported for this "
                "config (injection program, channelizer, nbit, or CT "
                "geometry); see baseband_dsp.megakernel_supported")
        return _megakernel_second(cfg, raw_second, state, arm_inject)
    if cfg.ema_impl != "pallas":
        segs = raw_second.reshape(cfg.npol_in, cfg.seg_per_sec,
                                  cfg.seg_samps).swapaxes(0, 1)
        state = state._replace(segs_since_inject=jnp.where(
            arm_inject, jnp.int32(0), state.segs_since_inject))

        def step(st, seg):
            out, st2 = process_segment(cfg, seg, st)
            return st2, out

        state, outs = jax.lax.scan(step, state, segs)
        merge = lambda a: a.reshape((-1,) + a.shape[2:])
        histo = kur_ops.sample_histogram(raw_second) if cfg.do_histo \
            else jnp.zeros((cfg.npol_in, 0), jnp.int32)
        return SegmentOutput(
            packed=merge(outs.packed),
            packed_kur=merge(outs.packed_kur),
            weights=jnp.swapaxes(outs.weights, 0, 1).reshape(
                cfg.npol_in, -1),
            dag_frac=jnp.mean(outs.dag_frac),
            histo=histo,
        ), state

    from vlite_fast_tpu.ops import pallas_kernels as pk
    state = state._replace(segs_since_inject=jnp.where(
        arm_inject, jnp.int32(0), state.segs_since_inject))
    pp, pkur, weights, dag_frac, since, tail, wtail = _second_powers(
        cfg, raw_second, state)
    tt = cfg.ffts_per_seg   # tile = one segment: per-segment seed parity
    bp, bp_kur = state.bp, state.bp_kur
    nbytes = cfg.npol_out * cfg.nchanout * cfg.nbit // 8
    nsamps = cfg.seg_per_sec * cfg.out_samps_per_seg
    empty = jnp.zeros((nsamps, nbytes), jnp.uint8)
    packed = packed_kur = empty
    if cfg.rfi_mode != 1:
        out, bp = pk.normalize_ema_pallas(pp, bp, cfg.bp_scale,
                                          time_tile=tt)
        packed = _finish_stream(cfg, out, None)
    if cfg.rfi_mode != 0:
        out, bp_kur = pk.normalize_ema_weighted_pallas(
            pkur, weights, bp_kur, cfg.bp_scale, time_tile=tt)
        packed_kur = _finish_stream(cfg, out, weights)
    new_state = DSPState(bp=bp, bp_kur=bp_kur, segs_since_inject=since,
                         tail=tail, wtail=wtail)
    histo = kur_ops.sample_histogram(raw_second) if cfg.do_histo \
        else jnp.zeros((cfg.npol_in, 0), jnp.int32)
    return SegmentOutput(packed, packed_kur, weights, dag_frac,
                         histo), new_state


def reference_chain_numpy(cfg: PipelineConfig, raw: np.ndarray,
                          bp_in: Optional[np.ndarray] = None) -> dict:
    """Slow, direct numpy oracle of the *unweighted* chain for tests:
    convert -> rfft -> |.|^2 -> EMA bandpass -> pscrunch -> tscrunch ->
    quantize levels (unpacked).  Mirrors the same math as process_segment
    with rfi_mode=0 for flag-free data."""
    npol, nsamp = raw.shape
    x = raw.astype(np.float32) / 128.0 - 1.0
    x[raw == 0] = 0.0
    spec = np.fft.rfft(x.reshape(npol, -1, cfg.nfft), axis=-1)
    p = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
    ntime = p.shape[1]
    bp = np.zeros((npol, cfg.nchan), np.float32) if bp_in is None else bp_in.copy()
    out = np.empty_like(p)
    seg = cfg.ffts_per_seg
    for s in range(0, ntime, seg):
        blk = p[:, s:s + seg]
        mask = bp == 0.0
        bp[mask] = np.mean(blk, axis=1)[mask]
        for t in range(blk.shape[1]):
            bp = (cfg.bp_scale * blk[:, t] + (1 - cfg.bp_scale) * bp).astype(np.float32)
            out[:, s + t] = blk[:, t] / bp - 1.0
    if cfg.npol_out == 1 and npol == 2:
        out = (np.sqrt(np.float32(0.5)) * (out[0] + out[1]))[None]
    ns = cfg.nscrunch
    out = out.reshape(out.shape[0], -1, ns, cfg.nchan).sum(2) * np.float32(
        1.0 / np.sqrt(ns))
    trimmed = out[:, :, cfg.chanmin:cfg.chanmax + 1]
    return {"power": p, "normalized": out, "trimmed": trimmed, "bp": bp}
