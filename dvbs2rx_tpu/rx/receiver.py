"""DVB-S2 receiver: IQ samples in, MPEG TS bytes out.

TPU-native redesign of the reference receive chain (``apps/dvbs2-rx:832-935``):
instead of one thread per block with ring buffers, the receiver runs a host
streaming loop around jitted, fixed-shape, batched device stages:

    rotator (closed-loop CFO carry) -> Gardner symbol sync (lax.scan)
    -> dense SOF/PLSC frame sync -> PLSC decode -> coarse/fine freq sync
    -> PL descrambling + phase correction -> soft demap -> LDPC (layered
    min-sum) -> BCH -> BB descrambling -> BBHEADER parse/TS stitch (host)

Cross-block control that the reference does with asynchronous PMT messages
(plsync -> rotator frequency updates) is carried as block-granular state: the
frequency correction estimated from frame group k is applied to the sample
stream of group k+1 (the reference already tolerates a two-frame correction
delay, ``lib/plsync_cc_impl.cc:394-402``).

Every device step has a fixed shape (compiled exactly once) and all
host-crossing buffers are float32/int32/uint8 — complex and bool stay
on-device (the tunneled TPU backend cannot transfer them to the host).

Architectural invariants preserved from the reference (SURVEY.md §3.2):
- payload n is processed only after PLHEADER n+1 (two-SOF rule)
- coarse corrections feed the rotator only until coarse-corrected; then the
  fine estimator takes over
- frame-lock state machine: searching -> found -> locked, with unlock after
  ``unlock_thresh`` consecutive weak timing metrics
"""

import datetime
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.pls import PLSInfo, parse_pls, make_pls
from ..spec.pl_defs import PLHEADER_LEN
from ..spec.fec_params import get_fec_info, FECInfo, DVBS2_MODCODS, MODCOD_NUMBERS
from ..spec.bb_frame import BBFrameParser
from ..spec.scramblers import bb_derandomizer_bytes, pl_descrambling_sequence
from ..ops import plsync
from ..ops import cplx
from ..ops.frontend import SymbolSync, rotate_block
from ..ops.ffsync import FeedForwardSync
from ..ops.demap import demap, estimate_snr_qpsk, estimate_snr_generic
from ..ops.ldpc import LDPCDecoder
from ..ops.bch import BCHDecoder
from ..spec.ldpc_tables import get_code
from ..ops.ldpc import get_decoder as _get_ldpc_decoder


def _make_ldpc_decoder(table: str, max_trials: int, impl: str = "auto",
                       algo: str = "offset-min-sum", update: str = "normal"):
    """LDPC decoder factory: the hand-written Pallas kernel on TPU hardware
    (``ops/ldpc_pallas.py``), the XLA roll-based path elsewhere. Non-default
    check-node algorithms / update rules (reference ``algorithms.hh``
    variants) run on the XLA path, which implements all of them."""
    if impl == "auto":
        impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if impl == "pallas" and (algo, update) == ("offset-min-sum", "normal"):
        from ..ops.ldpc_pallas import get_pallas_decoder

        return get_pallas_decoder(table, max_trials)
    return _get_ldpc_decoder(table, max_trials, algo, update)
from ..ops.bch import get_bch_decoder as _get_bch_decoder
from ..spec.fec_params import DVBS2_MODCODS as _MODCODS
from ..utils.runtime import fec_jit




@dataclass
class RxConfig:
    modcod: str = "qpsk1/4"
    frame_size: str = "normal"
    pilots: bool = False
    rolloff: float = 0.2
    sps: int = 2
    gold_code: int = 0
    sym_sync_impl: str = "ffw"    # "ffw" (feed-forward O&M, TPU fast path)
                                  # or "gardner" (reference-faithful loop)
    sym_sync_loop_bw: float = 0.01
    damping: float = 1.0
    rrc_delay: int = 5
    n_subfilt: int = 128
    ldpc_max_trials: int = 25
    ldpc_impl: str = "auto"       # "pallas" (hand-written TPU kernel),
                                  # "xla" (roll-based XLA path), or "auto"
                                  # (pallas on TPU hardware, xla elsewhere)
    ldpc_algo: str = "offset-min-sum"  # | "min-sum" | "min-sum-c"
    ldpc_update: str = "normal"   # | "self-corrected" (reference
                                  # SelfCorrectedUpdate, generic.hh:25)
    fec_batch: int = 8            # frames decoded together (SIMD-lane analog)
    frame_group: int = 4          # frames processed per device step
    frontend_block: int = 4096    # symbols produced per front-end step
    coarse_period: int = 30       # frames per coarse CFO estimate (reference
                                  # --pl-freq-est-period default)
    unlock_thresh: int = 3
    closed_loop: bool = True
    agc: bool = True              # input AGC (the reference chain starts
                                  # with an AGC block, apps/dvbs2-rx:853-856)
    agc_gain: float = 1.0         # initial gain (reference --agc-gain)
    agc_rate: float = 1e-5        # per-sample update rate (reference
                                  # --agc-rate default 1e-5; 1.0 saturates
                                  # to an instant block normalize)
    agc_ref: float = 1.0          # target RMS amplitude (reference --agc-ref)
    out_stream: str = "ts"        # "ts" (MPEG TS) or "bb" (descrambled
                                  # BBFRAMEs, reference --out-stream bb)
    acm_vcm: bool = False         # PLSC-driven variable-MODCOD demodulation
    pls_list: tuple = ()          # accepted PLS values in ACM/VCM (empty =
                                  # all non-dummy)
    pls_expected: tuple = ()      # a-priori PLS values present in the stream:
                                  # restricts the PLSC ML search (reference
                                  # expected_plsc, plsync_cc_impl.cc:88-141);
                                  # empty = all valid PLS values. Dummy PLS
                                  # 0-3 are always searched. Distinct from
                                  # ``pls_list``: that filters the OUTPUT,
                                  # this narrows the DECODER.
    mf_precision: str = "default"  # matched-filter conv precision on TPU
                                  # ("default" bf16 / "high" / "highest"
                                  # exact f32); see pallas_fir.mf_segmented
    plsc_mode: str = "coherent-soft"  # PLSC decode mode (reference
                                  # pl_signaling.cc:114-152): "coherent-soft"
                                  # (default), "coherent-hard", or
                                  # "differential" (hard, CFO-robust)

    def __post_init__(self):
        key = self.modcod.lower()
        if key not in MODCOD_NUMBERS:
            raise ValueError(f"Unknown MODCOD {self.modcod!r}")
        self.modcod_num = MODCOD_NUMBERS[key]
        self.constellation, self.rate = DVBS2_MODCODS[self.modcod_num]
        self.pls = make_pls(self.modcod_num, self.frame_size == "short", self.pilots)
        self.pls_info: PLSInfo = parse_pls(self.pls)
        self.fec: FECInfo = get_fec_info(self.frame_size, self.rate)
        if self.plsc_mode not in (
            "coherent-soft", "coherent-hard", "differential"
        ):
            raise ValueError(f"Unknown PLSC decode mode {self.plsc_mode!r}")


@dataclass
class RxStats:
    locked: bool = False
    sof_cnt: int = 0
    frame_cnt: int = 0
    rejected_cnt: int = 0
    dummy_cnt: int = 0
    lock_cnt: int = 0
    unlock_cnt: int = 0
    coarse_foffset: float = 0.0
    fine_foffset: float = 0.0
    cum_freq_offset: float = 0.0
    coarse_corrected: bool = False
    snr_db: float = 0.0
    ldpc_frames: int = 0
    ldpc_total_iters: int = 0
    bch_frames: int = 0
    bch_frame_errors: int = 0
    bch_corrections: int = 0
    lock_time: float = 0.0        # epoch seconds of the last lock event

    def as_dict(self):
        d = dict(self.__dict__)
        d["ldpc_avg_iters"] = (
            self.ldpc_total_iters / self.ldpc_frames if self.ldpc_frames else 0.0
        )
        return d


def _coarse_foffset_np(r):
    """Host finalization of the coarse CFO estimate (numpy port of
    ``plsync.coarse_foffset_from_autocorr`` for the tiny (89,) accumulator)."""
    N = r.shape[-1] + 1
    angles = np.arctan2(np.imag(r), np.real(r))
    diff = np.diff(np.concatenate([[0.0], angles]))
    diff = np.where(diff > np.pi, diff - 2 * np.pi, diff)
    diff = np.where(diff < -np.pi, diff + 2 * np.pi, diff)
    L = N - 1
    m = np.arange(L, dtype=np.float64)
    w = 3.0 * ((2 * L + 1.0) ** 2 - (2 * m + 1.0) ** 2) / (
        ((2 * L + 1.0) ** 2 - 1) * (2 * L + 1)
    )
    return float(np.clip(np.sum(diff * w) / (2 * np.pi), -0.5, 0.5))


def _snr_refine_frames(xfec, hard_bits, constellation, rate, n_mod):
    """Per-frame refined linear SNR from decoded bits (reference
    ``xfecframe_demapper_cb_impl.cc:188-318``): re-map the decoded
    codeword to reference constellation points and measure the error
    against the saved XFECFRAME symbols. xfec: (B, R, 2) with R <= rows
    (a symbol PREFIX of the frame is enough for the estimate — the VCM
    stream path pools quantized symbol snapshots, see rx/vcm_stream.py),
    hard_bits: (B, n_ldpc) with the first rows*n_mod bits forming the
    codeword. Returns (B,) linear SNRs."""
    from ..spec.constellations import constellation_points
    from ..spec.interleaver import column_order

    order = column_order(constellation, rate)
    bits = hard_bits.astype(jnp.int32)
    B = bits.shape[0]
    rows = bits.shape[1] // n_mod
    if order is None:
        # no interleaver: codeword bits are already symbol-major
        sym_bits = bits.reshape(B, rows, n_mod)
    else:
        # interleaved: codeword = n_mod column blocks; symbol bit k comes
        # from column order[k]
        cols = bits.reshape(B, n_mod, rows)
        sym_bits = jnp.stack([cols[:, c] for c in order], axis=-1)
    idx = jnp.zeros((B, rows), jnp.int32)
    for b in range(n_mod):
        idx = (idx << 1) | sym_bits[..., b]
    idx = idx[:, : xfec.shape[1]]
    pts = jnp.asarray(cplx.from_np(constellation_points(constellation, rate)))
    # one-hot matmul instead of pts[idx]: the (B*rows)-element gather from
    # the tiny constellation table serializes on TPU (profiled at ~5 ms/
    # step for 64 normal frames, the single hottest op in the stream
    # step); the 0/1-weighted matmul rides the MXU. HIGHEST precision
    # keeps the select exact (default bf16 contraction rounds the points
    # ~2^-9); the contraction is tiny, so the pin costs nothing.
    oh = (idx[..., None] == jnp.arange(pts.shape[0])).astype(jnp.float32)
    ref = jnp.einsum("brp,pc->brc", oh, pts,
                     precision=jax.lax.Precision.HIGHEST)      # (B, R, 2)
    sp = jnp.sum(jnp.sum(ref * ref, axis=-1), axis=-1)
    np_ = jnp.sum(jnp.sum((xfec - ref) ** 2, axis=-1), axis=-1)
    return sp / jnp.maximum(np_, 1e-12)


def _snr_refine(xfec, hard_bits, constellation, rate, n_mod):
    """Batch-mean refined SNR (see ``_snr_refine_frames``)."""
    return jnp.mean(
        _snr_refine_frames(xfec, hard_bits, constellation, rate, n_mod)
    )


class Receiver:
    def __init__(self, cfg: RxConfig):
        self.cfg = cfg
        info = cfg.pls_info
        self.frame_len = info.plframe_len
        self.payload_len = info.payload_len

        if cfg.sym_sync_impl == "gardner":
            self.sym_sync = SymbolSync(
                sps=cfg.sps,
                loop_bw=cfg.sym_sync_loop_bw,
                damping=cfg.damping,
                rolloff=cfg.rolloff,
                rrc_delay=cfg.rrc_delay,
                n_subfilt=cfg.n_subfilt,
            )
        elif cfg.sym_sync_impl == "ffw":
            self.sym_sync = FeedForwardSync(
                sps=cfg.sps,
                rolloff=cfg.rolloff,
                rrc_delay=cfg.rrc_delay,
                n_subfilt=cfg.n_subfilt,
                mf_precision=cfg.mf_precision,
            )
        else:
            raise ValueError(f"Unknown sym_sync_impl {cfg.sym_sync_impl!r}")
        self.ldpc = _make_ldpc_decoder(
            cfg.fec.ldpc_table, cfg.ldpc_max_trials, cfg.ldpc_impl,
            cfg.ldpc_algo, cfg.ldpc_update,
        )
        self.bch = BCHDecoder(
            cfg.fec.framesize, cfg.fec.t, cfg.fec.nbch, cfg.fec.kbch
        )
        self._bb_scramble = bb_derandomizer_bytes(cfg.fec.kbch // 8)
        # planar (payload_len, 2) float32 descrambling sequence
        self._descr_np = cplx.from_np(
            pl_descrambling_sequence(cfg.gold_code)[: self.payload_len]
        )

        # fixed shapes
        self._fe_nout = cfg.frontend_block
        self._fe_nsamp = self._fe_nout * cfg.sps + self.sym_sync.history() + 64
        self._acq_win = 2 * self.frame_len + 271

        self._frontend_step = jax.jit(self._frontend_impl)
        self._acq_metric = jax.jit(self._acq_impl)
        self._frame_group = jax.jit(
            self._frame_group_impl, static_argnames=("n_frames",)
        )
        self._frame_group_refined = jax.jit(
            lambda h, p, cc, n0: self._frame_group_impl(
                h, p, cc, n_frames=cfg.frame_group, n0_override=n0
            )
        )
        self._fec_stage = fec_jit(self._fec_stage_impl)
        self._snr_refine = jax.jit(self._snr_refine_impl)
        self.reset()

    # ------------- state -------------

    def reset(self):
        self.stats = RxStats()
        self._samp_buf = np.empty(0, dtype=np.complex64)
        self._sym_buf = np.empty(0, dtype=np.complex64)
        self._ss_state = None  # created lazily (device arrays)
        self._agc_gain = float(self.cfg.agc_gain)
        self._rot_phase = 0.0
        self._rot_inc = 0.0          # per-sample phase increment (closed loop)
        self._lock_state = "searching"
        self._frame_phase = 0        # symbol-buffer index of the next SOF
        self._unlock_cnt = 0
        self._coarse_acc = np.zeros(89, dtype=np.complex64)
        self._coarse_frames = 0
        self._coarse_foffset = 0.0
        self._coarse_corrected = False
        self._fine_foffset = 0.0
        self._cum_foffset = 0.0
        self._settle_frames = 0   # frames to drain before the next closed-loop
                                  # accumulation (pipeline-latency guard)
        self._n0 = None
        self._n0_refined = None
        self._llr_queue = []
        self._xfec_queue = []   # device arrays paired with _llr_queue rows
        self.bb_parser = BBFrameParser(self.cfg.fec.kbch)

    # ------------- public API -------------

    def get_stats(self, sym_rate: float = None) -> dict:
        """Nested statistics in the reference's ``get_stats`` shape
        (``apps/dvbs2-rx:996-1057``): lock/snr plus plsync, fec, bbframes
        and mpeg-ts sections. ``sym_rate`` scales the normalized frequency
        offset to Hz like the reference."""
        s = self.stats
        bb = self.bb_parser.stats
        fer = s.bch_frame_errors / s.bch_frames if s.bch_frames else None
        per = bb.error_cnt / bb.packet_cnt if bb.packet_cnt else None
        foff = s.cum_freq_offset
        return {
            "lock": s.locked,
            "snr": s.snr_db if s.bch_frames else None,
            "plsync": {
                "coarse_freq_corr": s.coarse_corrected,
                # offset normalized by the symbol rate, and in Hz when the
                # caller supplies the symbol rate (reference scales by it)
                "freq_offset_norm": foff,
                "freq_offset_hz": foff * sym_rate if sym_rate else None,
                "sof_count": s.sof_cnt,
                "frame_count": {
                    "processed": s.frame_cnt,
                    "rejected": s.rejected_cnt,
                    "dummy": s.dummy_cnt,
                },
                "locked_since": (
                    datetime.datetime.fromtimestamp(s.lock_time).isoformat()
                    if s.locked and s.lock_time else None
                ),
            },
            "fec": {
                "frames": s.bch_frames,
                "errors": s.bch_frame_errors,
                "fer": fer,
                "avg_ldpc_trials": (
                    s.ldpc_total_iters / s.ldpc_frames
                    if s.ldpc_frames else None
                ),
            },
            "bbframes": {
                "processed": bb.bbframe_cnt,
                "dropped": bb.bbframe_drop_cnt,
                "gaps": bb.bbframe_gap_cnt,
            },
            "mpeg-ts": {
                "packets": bb.packet_cnt,
                "errors": bb.error_cnt,
                "per": per,
            },
        }

    def receive(self, iq: np.ndarray, flush: bool = True) -> np.ndarray:
        """Process IQ samples (complex64 at sps samples/symbol); returns TS
        bytes recovered so far. With ``flush``, process buffered tail frames
        and decode any queued FEC frames even if batches are not full.

        Input is internally re-chunked to about two PLFRAMEs of samples so
        closed-loop frequency corrections take effect promptly even when the
        caller hands over one huge buffer."""
        iq = np.asarray(iq, dtype=np.complex64)
        chunk = 2 * self.frame_len * self.cfg.sps
        out = []
        for i in range(0, max(iq.size, 1), chunk):
            out.append(self._process_chunk(iq[i: i + chunk]))
        if flush:
            out.append(self._process_chunk(np.empty(0, np.complex64), force=True))
            out.append(self._flush_fec())
        return np.concatenate(out) if out else np.empty(0, np.uint8)

    # ------------- host pipeline -------------

    def _process_chunk(self, iq, force=False) -> np.ndarray:
        self._samp_buf = np.concatenate([self._samp_buf, iq])
        self._run_frontend(force=force)
        ts = []
        progress = True
        while progress:
            progress = False
            if self._lock_state != "locked":
                progress = self._acquire()
            if self._lock_state == "locked":
                if self._process_frames(force=force):
                    progress = True
            ts.append(self._drain_fec())
        return np.concatenate(ts) if ts else np.empty(0, np.uint8)

    # ------------- front end -------------

    def _frontend_impl(self, samples, state, rot_phase, rot_inc, agc_gain):
        if self.cfg.agc:
            # Block-granular AGC: a single-pole loop driving the mean sample
            # MAGNITUDE toward agc_ref (the reference uses analog.agc_cc,
            # whose error term is ref - |y|, apps/dvbs2-rx:873). The
            # magnitude convention matters at low SNR: E|x| = 1 leaves the
            # total power at ~4/pi for noise-dominated input, which is what
            # lets the frame-sync timing metric clear the absolute 30/25
            # thresholds at the 2 dB sensitivity bound (docs/support.md).
            # The per-sample update rate of the reference's AGC block maps
            # to a per-block smoothing factor; the default rate of 1.0
            # saturates to an instant block normalization.
            mag = jnp.mean(
                jnp.sqrt(samples[..., 0] ** 2 + samples[..., 1] ** 2)
            )
            target = self.cfg.agc_ref / jnp.maximum(mag, 1e-12)
            alpha = min(1.0, self.cfg.agc_rate * self._fe_nsamp)
            agc_gain = (1.0 - alpha) * agc_gain + alpha * target
            samples = samples * agc_gain
        rotated, _ = rotate_block(samples, rot_phase, rot_inc)
        if self.cfg.sym_sync_impl == "ffw":
            new_state, syms, consumed = self.sym_sync._step_impl(
                state, rotated, self._fe_nout
            )
            return new_state, syms, consumed, agc_gain
        new_state, syms = self.sym_sync._step_impl(state, rotated, self._fe_nout)
        hist = self.sym_sync.history()
        consumed = new_state.n + 1 - hist
        import dataclasses

        new_state = dataclasses.replace(
            new_state, n=jnp.asarray(hist - 1, jnp.int32)
        )
        return new_state, syms, consumed.astype(jnp.int32), agc_gain

    def _run_frontend(self, force=False):
        if self._ss_state is None:
            self._ss_state = self.sym_sync.init_state()
        while True:
            if self._samp_buf.size >= self._fe_nsamp:
                block = self._samp_buf[: self._fe_nsamp]
            elif force and self._samp_buf.size > self.sym_sync.history() + 256:
                block = np.concatenate([
                    self._samp_buf,
                    np.zeros(self._fe_nsamp - self._samp_buf.size, np.complex64),
                ])
            else:
                return
            state, syms_f, consumed, agc_gain = self._frontend_step(
                jnp.asarray(cplx.from_np(block)),
                self._ss_state,
                jnp.float32(self._rot_phase),
                jnp.float32(self._rot_inc),
                jnp.float32(self._agc_gain),
            )
            consumed = int(consumed)
            self._ss_state = state
            self._agc_gain = float(agc_gain)
            self._rot_phase = float(
                (self._rot_phase + self._rot_inc * consumed) % (2 * np.pi)
            )
            n_real = min(
                self._fe_nout,
                max(0, (self._samp_buf.size - self.sym_sync.history()))
                // self.cfg.sps,
            )
            self._sym_buf = np.concatenate(
                [self._sym_buf, cplx.to_np(syms_f)[:n_real]]
            )
            self._samp_buf = self._samp_buf[consumed:]
            if force and self._samp_buf.size <= self.sym_sync.history() + 256:
                return

    # ------------- acquisition -------------

    def _acq_impl(self, symbols):
        hist = jnp.zeros((90, 2), jnp.float32)
        metric, _, _ = plsync.timing_metric(symbols, hist)
        return metric

    def _acquire(self) -> bool:
        if self._sym_buf.size < self._acq_win:
            return False
        metric = np.asarray(
            self._acq_metric(
                jnp.asarray(cplx.from_np(self._sym_buf[: self._acq_win]))
            )
        )
        peak = int(np.argmax(metric[: self.frame_len + 90]))
        if metric[peak] < plsync.THRESHOLD_UNLOCKED:
            # no SOF in this window; drop all but the tail
            keep = self.frame_len + 180
            self._sym_buf = self._sym_buf[-keep:]
            return False
        # confirm the next SOF one frame later
        nxt = peak + self.frame_len
        if nxt >= metric.size:
            return False  # need more symbols
        if metric[nxt] < plsync.THRESHOLD_LOCKED:
            # false alarm; discard past this peak and retry
            self._sym_buf = self._sym_buf[peak + 1:]
            return True
        sof_start = peak - 89
        if sof_start < 0:
            self._sym_buf = self._sym_buf[peak + 1:]
            return True
        self._lock_state = "locked"
        self.stats.lock_cnt += 1
        self.stats.lock_time = time.time()
        self._unlock_cnt = 0
        self._frame_phase = sof_start
        self.stats.sof_cnt += 2
        return True

    # ------------- locked-path processing -------------

    def _process_frames(self, force=False) -> bool:
        """Process frames in fixed groups of ``frame_group``.

        Needs the next frame's header as lookahead (two-SOF rule). With
        ``force``, a final partial group is processed by padding with the
        last frame (only the valid frames are consumed downstream).
        """
        F0 = self.cfg.frame_group
        avail = (self._sym_buf.size - self._frame_phase - 91) // self.frame_len
        if avail >= F0:
            F = F0
        elif force and avail > 0:
            F = avail
        else:
            return False
        fp = self._frame_phase
        L = self.frame_len
        idx = fp + np.arange(F + 1)[:, None] * L + np.arange(-1, 90)[None, :]
        idx = np.clip(idx, 0, self._sym_buf.size - 1)
        headers_ext = self._sym_buf[idx]                       # (F+1, 91)
        payloads = self._sym_buf[
            fp + 90 + np.arange(F)[:, None] * L + np.arange(self.payload_len)[None, :]
        ]
        if F < F0:  # pad a final partial group to the compiled shape
            pad_h = np.repeat(headers_ext[-1:], F0 - F, axis=0)
            headers_ext = np.concatenate(
                [headers_ext[:-1], pad_h, headers_ext[-1:]], axis=0
            )
            payloads = np.concatenate(
                [payloads, np.repeat(payloads[-1:], F0 - F, axis=0)], axis=0
            )

        if self._n0_refined is not None:
            out = self._frame_group_refined(
                jnp.asarray(cplx.from_np(headers_ext)),
                jnp.asarray(cplx.from_np(payloads)),
                jnp.asarray(self._coarse_corrected),
                jnp.float32(self._n0_refined),
            )
        else:
            out = self._frame_group(
                jnp.asarray(cplx.from_np(headers_ext)),
                jnp.asarray(cplx.from_np(payloads)),
                jnp.asarray(self._coarse_corrected),
                n_frames=F0,
            )
        metrics = np.asarray(out["metric"])[: F + 1]
        n0 = float(out["n0"])
        autocorr = cplx.to_np(out["autocorr"])[:F]             # (F, 89)
        fine = np.asarray(out["fine"])[:F]

        # ---- lock maintenance (host state machine) ----
        for k in range(F):
            self.stats.sof_cnt += 1
            if metrics[k] > plsync.THRESHOLD_LOCKED:
                self._unlock_cnt = 0
            else:
                self._unlock_cnt += 1
                if self._unlock_cnt >= self.cfg.unlock_thresh:
                    self._lock_state = "searching"
                    self.stats.unlock_cnt += 1
                    self._sym_buf = self._sym_buf[self._frame_phase + (k + 1) * L:]
                    self._frame_phase = 0
                    self._unlock_cnt = 0
                    return True
            self.stats.frame_cnt += 1

        # ---- frequency tracking (block-granular closed loop) ----
        # Coarse: accumulate the modulation-removed PLHEADER autocorrelation
        # over ``coarse_period`` frames before finalizing an estimate.
        new_coarse = False
        for k in range(F):
            if self._settle_frames > 0:
                # frames still in flight across a rotator update measured
                # the old residual. During coarse pull-in (large updates)
                # their autocorrelation would corrupt the accumulator, so
                # skip them; once coarse-corrected, pending FINE updates
                # shift the residual by less than the fine range and the
                # accumulation must continue — the periodic coarse estimate
                # is what verifies the residual stayed within the fine
                # range (reference plsync_cc_impl.cc:556-566), and pausing
                # it on every fine update would starve that verifier.
                self._settle_frames -= 1
                if not self._coarse_corrected:
                    continue
            self._coarse_acc += autocorr[k]
            self._coarse_frames += 1
            if self._coarse_frames >= self.cfg.coarse_period:
                est = _coarse_foffset_np(self._coarse_acc)
                self._coarse_foffset = est
                self._coarse_corrected = (
                    abs(est) < plsync.FINE_FOFFSET_CORR_RANGE
                )
                self._coarse_acc[:] = 0
                self._coarse_frames = 0
                new_coarse = True
        self.stats.coarse_corrected = self._coarse_corrected
        self.stats.coarse_foffset = self._coarse_foffset
        self._fine_foffset = float(fine[-1])
        self.stats.fine_foffset = self._fine_foffset

        # Closed-loop rotator updates. A new adjustment is only accumulated
        # once the symbols produced *before* the previous adjustment have
        # drained (frames still in flight measured the old residual - the
        # analog of the reference's scheduled updates + tag calibration).
        if self.cfg.closed_loop and self._settle_frames <= 0:
            adj = 0.0
            is_coarse_adj = not self._coarse_corrected
            if is_coarse_adj:
                if new_coarse:
                    adj = self._coarse_foffset
            else:
                adj = float(fine[-1])
            if adj != 0.0:
                self._cum_foffset += adj
                self._rot_inc = -self._cum_foffset * 2 * np.pi / self.cfg.sps
                in_flight = (
                    self._sym_buf.size
                    - (self._frame_phase + F * L)
                    + self._samp_buf.size // self.cfg.sps
                )
                self._settle_frames = in_flight // self.frame_len + 2
                if is_coarse_adj:
                    # a large correction: the accumulated autocorrelation
                    # refers to the old residual
                    self._coarse_acc[:] = 0
                    self._coarse_frames = 0
        self.stats.cum_freq_offset = self._cum_foffset
        self._n0 = n0
        self.stats.snr_db = float(10 * np.log10(1.0 / max(n0, 1e-12)))

        # ---- queue LLRs for FEC (xfec symbols stay on device for the
        # post-decoder SNR refinement) ----
        llrs = np.asarray(out["llrs"])[:F]
        for k in range(F):
            self._llr_queue.append(llrs[k])
            self._xfec_queue.append(out["xfec"][k])

        self._sym_buf = self._sym_buf[self._frame_phase + F * L:]
        self._frame_phase = 0
        self.stats.locked = True
        return True

    def _frame_group_impl(self, headers_ext, payloads, coarse_corrected, n_frames,
                          n0_override=None, llr_quantize=True):
        """Jitted per-group processing: metric, sync, correction, demap.

        ``n0_override``: refined post-decoder N0 (used once the first decoded
        batch reports back, reference ``xfecframe_demapper_cb`` d_waiting_first_llr
        semantics); None -> data-aided estimate only.

        All outputs are host-transfer-safe dtypes (f32/i8); complex results
        are returned as (..., 2) float pairs. ``xfec`` is returned planar for
        the refinement path - keep it on device.
        """
        cfg = self.cfg
        info = cfg.pls_info
        headers = headers_ext[:, 1:]                           # (F+1, 90, 2)

        # timing metric at the expected peak of each frame: the dense kernels
        # evaluated at the single position n = SOF+89
        d = cplx.conj_mul(headers_ext[:, 1:], headers_ext[:, :-1])  # (F+1, 90, 2)
        metric = plsync.frame_metric(d[:, 1:])

        pls = jnp.full((n_frames + 1,), cfg.pls, jnp.int32)   # CCM: known PLS

        # coarse CFO autocorrelation contribution per frame (full PLHEADER,
        # known PLS); the host accumulates over the estimation period
        r = plsync.coarse_autocorr(headers[:n_frames], pls[:n_frames], full=True)

        hdr_phase = plsync.plheader_phase(headers, pls)        # (F+1,)

        payloads_d = cplx.cmul(payloads, jnp.asarray(self._descr_np)[None])

        if info.has_pilots:
            fine = plsync.fine_foffset_pilot_mode(
                headers[:n_frames], payloads_d, pls[:n_frames], info.n_pilots
            )
            pil_ph = plsync.pilot_phases(payloads_d, info.n_pilots)
            fine_ff = jnp.where(coarse_corrected, fine, 0.0)
            xfec = plsync.correct_payload_pilots(
                payloads_d,
                hdr_phase[:n_frames],
                pil_ph,
                fine_ff,
                info.n_slots,
                info.n_pilots,
            )
        else:
            fine = plsync.fine_foffset_pilotless(
                hdr_phase[:n_frames], hdr_phase[1:], info.plframe_len
            )
            fine_ff = jnp.where(coarse_corrected, fine, 0.0)
            xfec = plsync.correct_payload_pilotless(
                payloads_d, hdr_phase[:n_frames], fine_ff
            )

        # SNR estimate from the first frame's data symbols
        if cfg.constellation == "QPSK":
            snr_lin = estimate_snr_qpsk(xfec[0])
        else:
            snr_lin = estimate_snr_generic(xfec[0], cfg.constellation, cfg.rate)
        n0 = 1.0 / jnp.maximum(snr_lin, 1e-9)
        n0_demap = n0 if n0_override is None else n0_override

        llrs = demap(
            xfec, jnp.broadcast_to(n0_demap, (n_frames,)), cfg.constellation,
            cfg.rate, quantize=llr_quantize,
        )
        return {
            "metric": metric,
            "autocorr": r,
            "fine": fine,
            "n0": n0,
            "llrs": llrs,
            "xfec": xfec,
        }

    # ------------- FEC -------------

    def _fec_stage_impl(self, llrs):
        hard, llrs_out, iters, ok = self.ldpc._decode_impl(llrs)
        bch_in = hard[:, : self.cfg.fec.nbch]
        corrected, n_corr = self.bch._decode_impl(bch_in)
        kbits = corrected[:, : self.cfg.fec.kbch].astype(jnp.int32)
        weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.int32))
        kbytes = jnp.sum(
            kbits.reshape(kbits.shape[0], -1, 8) * weights[None, None, :], axis=-1
        ).astype(jnp.uint8)
        # hard stays on device for the post-decoder SNR refinement
        return kbytes, n_corr.astype(jnp.int32), iters.astype(jnp.int32), \
            ok.astype(jnp.int32), hard

    def _fec_stage_lane_major_impl(self, llrsT):
        """Lane-major FEC stage: llrsT (N, B) int8, frames on the minor axis.

        The decoder-native layout end to end — no int8 transposes anywhere
        (the (B, N) int8 -> kernel-layout transposes cost ~4.6 ms for 128
        normal frames, more than the LDPC decode itself; see
        tools/probes/compose_split.py). Returns kbytes in (B, kbch/8) like
        ``_fec_stage_impl``.
        """
        hard_t, _llrs_out_t, iters, ok = self.ldpc.decode_lane_major(llrsT)
        corrected_t, n_corr = self.bch.decode_lane_major(
            hard_t[: self.cfg.fec.nbch]
        )
        kbits_t = corrected_t[: self.cfg.fec.kbch].astype(jnp.int32)
        B = kbits_t.shape[1]
        weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.int32))
        kbytes = jnp.sum(
            kbits_t.reshape(-1, 8, B) * weights[None, :, None], axis=1
        ).astype(jnp.uint8).transpose(1, 0)
        return kbytes, n_corr.astype(jnp.int32), iters.astype(jnp.int32), \
            ok.astype(jnp.int32), hard_t

    def _snr_refine_impl(self, xfec, hard_bits):
        cfg = self.cfg
        return _snr_refine(
            xfec, hard_bits, cfg.constellation, cfg.rate,
            cfg.pls_info.n_mod,
        )

    def _drain_fec(self) -> np.ndarray:
        out = []
        B = self.cfg.fec_batch
        while len(self._llr_queue) >= B:
            batch = np.stack(self._llr_queue[:B])
            xfecs = self._xfec_queue[:B]
            del self._llr_queue[:B]
            del self._xfec_queue[:B]
            out.append(self._decode_batch(batch, xfecs=xfecs))
        return np.concatenate(out) if out else np.empty(0, np.uint8)

    def _flush_fec(self) -> np.ndarray:
        if not self._llr_queue:
            return np.empty(0, np.uint8)
        # pad to the batch size with a repeat of the last frame
        B = self.cfg.fec_batch
        n = len(self._llr_queue)
        batch = np.stack(self._llr_queue + [self._llr_queue[-1]] * (B - n))
        xfecs = self._xfec_queue[:n]
        self._llr_queue = []
        self._xfec_queue = []
        return self._decode_batch(batch, valid=n, xfecs=xfecs)

    def _decode_batch(self, batch, valid=None, xfecs=None) -> np.ndarray:
        valid = batch.shape[0] if valid is None else valid
        kbytes, n_corr, iters, ok, hard = self._fec_stage(jnp.asarray(batch))
        if xfecs:
            # refine N0 from the decoded codewords (all device-side; only the
            # final scalar crosses to the host)
            xfec_stack = jnp.stack(list(xfecs))
            snr = float(self._snr_refine(xfec_stack, hard[: len(xfecs)]))
            if snr > 0:
                self._n0_refined = 1.0 / snr
                self.stats.snr_db = float(10 * np.log10(snr))
        kbytes = np.asarray(kbytes)[:valid]
        n_corr = np.asarray(n_corr)[:valid]
        self.stats.ldpc_frames += valid
        self.stats.ldpc_total_iters += int(iters) * valid
        self.stats.bch_frames += valid
        self.stats.bch_frame_errors += int(np.sum(n_corr < 0))
        self.stats.bch_corrections += int(np.sum(np.maximum(n_corr, 0)))
        if self.cfg.out_stream == "bb":
            # tap the descrambled BBFRAMEs (reference --out-stream bb)
            return (kbytes ^ self._bb_scramble[None, :]).reshape(-1)
        ts = []
        for row in kbytes:
            ts.append(self.bb_parser.push(row ^ self._bb_scramble))
        return np.concatenate(ts) if ts else np.empty(0, np.uint8)


class ACMReceiver(Receiver):
    """ACM/VCM receiver: PLSC-driven variable-MODCOD demodulation
    (reference ``plsync_cc`` with the PLSC decoder enabled,
    ``lib/plsync_cc_impl.cc:582-594``), redesigned as a *windowed batched*
    pipeline for TPU:

    - the SOF/PLSC timing metric is computed densely over a whole symbol
      window in one dispatch; every header candidate in the window is then
      PLSC-decoded in a second batched dispatch (the (128, 64) soft-ML
      matmul batches trivially across candidates)
    - frame boundaries are derived on the host by walking the decoded PLS
      run (frame k's length comes from its decoded PLS; payload k is only
      processed once header k+1 is confirmed — the two-SOF rule)
    - consecutive same-PLS frames are processed through a lane-batched
      per-PLS frame-group program (compiled once per PLS actually seen),
      exactly like the CCM fast path
    - before PLSC decoding, each header is derotated following the
      reference's ``derotate_plheader`` (``pl_freq_sync.cc:351-437``):
      SOF-phase correction always, plus open-loop frequency derotation by
      the latest coarse/fine estimate when no closed-loop rotator runs
    - while not coarse-corrected, the coarse CFO autocorrelation uses the
      SOF symbols only (the decoded PLSC cannot be trusted yet — the
      chicken-and-egg the reference breaks the same way,
      ``plsync_cc_impl.cc:510-566``); after correction it switches to the
      full PLHEADER for better averaging
    - frames whose PLS is not in ``pls_list`` are rejected and counted;
      dummy frames are skipped (reference ``plsync_cc_impl.cc:904-916``)
    - post-decoder SNR refinement runs per PLS: decoded codewords are
      re-mapped and compared against the saved XFECFRAME symbols, and the
      refined N0 drives subsequent demapping for that PLS (reference
      ``xfecframe_demapper_cb_impl.cc:188-318``)

    One deviation from the reference, documented here: coarse corrections
    are also fed to the (internal) rotator while frame-locked state has not
    been reached yet. The reference only corrects when locked because its
    asynchronous rotator messages could land mid-frame; our rotator update
    is applied at a block boundary with a settle guard, so the race does
    not exist — and without unlocked pull-in, a coherent-soft PLSC decode
    can never lock under a large CFO in the first place.
    """

    def __init__(self, cfg: RxConfig):
        assert cfg.acm_vcm
        super().__init__(cfg)
        self._pls_enabled = np.zeros(128, dtype=bool)
        if cfg.pls_list:
            self._pls_enabled[list(cfg.pls_list)] = True
        else:
            # all decodable PLS values: modcod 0 is the dummy frame and
            # modcods 29-31 are reserved (reference pls_info_t::parse maps
            # them to n_mod = 0); a noisy PLSC decode landing on a reserved
            # value must count as rejected, not crash the resource lookup
            for pls in range(128):
                self._pls_enabled[pls] = (pls >> 2) in _MODCODS
        # The ML search runs over the a-priori expected PLS subset plus dummy
        # frames (PLS 0-3), mirroring the reference's expected_plsc
        # (plsync_cc_impl.cc:88-141, reed_muller.cc:42-55). By default all
        # valid PLS values are searched so out-of-filter frames still decode
        # to their TRUE PLS (keeping frame-length tracking right) and are
        # rejected by the output filter.
        if cfg.pls_expected:
            self._plsc_search_mask = np.zeros(128, dtype=bool)
            self._plsc_search_mask[list(cfg.pls_expected)] = True
        else:
            self._plsc_search_mask = np.array(
                [(pls >> 2) in _MODCODS for pls in range(128)]
            )
        self._plsc_search_mask[:4] = True
        # Window sizing: the chain walk needs frame k plus header k+1 inside
        # one window, so the window must AT LEAST cover the longest PLFRAME
        # the stream can carry (grown lazily if a longer frame is decoded —
        # jits retrace per shape). Seed it to cover a full ``frame_group``
        # of the longest a-priori frames: a window that fits only one frame
        # pays the dense metric + PLSC dispatch per frame AND pads every
        # per-PLS group program F0:1, while a group-sized window amortizes
        # both (the dense metric cost is linear in W, so per-symbol cost is
        # unchanged).
        seeds = {cfg.pls} | set(cfg.pls_list) | set(cfg.pls_expected)
        lmax = max(parse_pls(p).plframe_len for p in seeds)
        self._win_len = self._round_win(cfg.frame_group * lmax)
        self._win_plsc = jax.jit(self._win_plsc_impl)
        # single-header decode for the weak-metric fallback in the chain
        # walk (was referenced but never bound — a latent AttributeError on
        # the first below-threshold expected header)
        self._plsc_jit = jax.jit(self._plsc_impl)
        self._group_jits = {}
        self._pls_resources = {}
        self._curr_pls = None
        self._fec_queue = []  # ordered [(pls, llr np, xfec device), ...]
        self.bb_parser = BBFrameParser()  # variable frame sizes

    def get_stats(self, sym_rate: float = None) -> dict:
        """Reference-shaped stats plus coherent per-PLS sections: in
        ACM/VCM each PLS is its own demapper+FEC context, so SNR, frame
        counters and LDPC trials are reported per PLS (reference
        ``apps/dvbs2-rx:996-1057`` reports the single demapper's SNR; a
        variable-MODCOD monitor needs it per MODCOD)."""
        base = super().get_stats(sym_rate)
        per_plsync, per_fec = {}, {}
        for pls, res in sorted(self._pls_resources.items()):
            st = res["stats"]
            if st["frames"] == 0 and st["fec_frames"] == 0:
                continue
            const, rate = res["constellation"], res["rate"]
            name = f"{const.lower()}{rate}"
            per_plsync[pls] = {
                "modcod": name,
                "frames": st["frames"],
                "fine_foffset": st["fine_foffset"],
            }
            per_fec[pls] = {
                "modcod": name,
                "frames": st["fec_frames"],
                "errors": st["fec_errors"],
                "avg_ldpc_trials": (
                    st["ldpc_iters"] / st["fec_frames"]
                    if st["fec_frames"] else None
                ),
                "snr": st["snr_db"],
            }
        base["plsync"]["per_pls"] = per_plsync
        base["fec"]["per_pls"] = per_fec
        return base

    @staticmethod
    def _round_win(plframe_len: int) -> int:
        return int(np.ceil((plframe_len + 384) / 1024)) * 1024

    def _ensure_win(self, plframe_len: int) -> bool:
        """Grow the window if a decoded PLS implies a longer frame."""
        if plframe_len + 91 > self._win_len:
            self._win_len = self._round_win(plframe_len)
            return True
        return False

    def reset(self):
        super().reset()
        self._coarse_acc_sof = np.zeros(25, dtype=np.complex64)
        self._coarse_mode = "sof"
        self._fine_ready = False
        # absolute stream position of _sym_buf[0] and the last header whose
        # autocorrelation was accumulated: while searching, windows overlap
        # across _acquire passes, and a surviving peak must not contribute
        # to the coarse accumulator more than once
        self._abs_pos = 0
        self._last_acc_abs = -1

    def _consume_syms(self, n: int):
        n = int(n)
        self._sym_buf = self._sym_buf[n:]
        self._abs_pos += n

    # ---------- per-PLS resources ----------

    def _resources(self, pls: int):
        res = self._pls_resources.get(pls)
        if res is None:
            info = parse_pls(pls)
            const, rate = _MODCODS[info.modcod]
            framesize = "short" if info.short_fecframe else "normal"
            fec = get_fec_info(framesize, rate)
            res = {
                "info": info,
                "fec": fec,
                "constellation": const,
                "rate": rate,
                "ldpc": _make_ldpc_decoder(
                    fec.ldpc_table, self.cfg.ldpc_max_trials,
                    self.cfg.ldpc_impl, self.cfg.ldpc_algo,
                    self.cfg.ldpc_update,
                ),
                "bch": _get_bch_decoder(framesize, fec.t, fec.nbch, fec.kbch),
                "bb_scramble": bb_derandomizer_bytes(fec.kbch // 8),
                "descr": cplx.from_np(
                    pl_descrambling_sequence(self.cfg.gold_code)[: info.payload_len]
                ),
                "n0_refined": 0.0,   # post-decoder refined N0 (0 = not yet)
                # per-PLS observability (reference reports per-demapper SNR
                # coherently, apps/dvbs2-rx:996-1057; in ACM/VCM each PLS
                # is its own demapper+FEC context)
                "stats": {
                    "frames": 0,          # PL frames accepted (plsync view)
                    "fec_frames": 0,      # FEC frames decoded
                    "fec_errors": 0,      # BCH decode failures
                    "ldpc_iters": 0,      # cumulative LDPC trials
                    "snr_db": None,       # refined per-PLS SNR
                    "fine_foffset": 0.0,  # last fine estimate from this PLS
                },
            }
            self._pls_resources[pls] = res
        return res

    # ---------- jitted pieces ----------

    def _derot_params(self):
        """(foffset, apply_freq) for the pre-PLSC-decode derotation.

        Open loop: derotate by the most recent fine estimate once
        coarse-corrected and a fine estimate exists, else by the coarse
        estimate (reference ``pl_freq_sync.cc:409-412``). Closed loop: the
        rotator already corrects; only the SOF-phase correction applies.
        """
        if self.cfg.closed_loop:
            return 0.0, False
        if self._coarse_corrected and self._fine_ready:
            return self._fine_foffset, True
        return self._coarse_foffset, True

    def _win_plsc_impl(self, symbols, sofs, foffset, apply_freq):
        """Batched candidate-header processing over one window.

        symbols: (W, 2); sofs: (C,) SOF start indices. Returns per candidate
        the decoded PLS (after derotation), the SOF-only and full-PLHEADER
        coarse autocorrelation contributions (computed on the *raw* header:
        the estimators measure the true residual).
        """
        W = symbols.shape[0]
        sofs = jnp.clip(sofs, 0, W - PLHEADER_LEN)

        def gather(pos):
            return jax.lax.dynamic_slice(symbols, (pos, 0), (PLHEADER_LEN, 2))

        hdrs = jax.vmap(gather)(sofs)                        # (C, 90, 2)
        der = plsync.derotate_plheader(hdrs, foffset, apply_freq)
        decode = {
            "coherent-soft": plsync.plsc_decode_soft,
            "coherent-hard": plsync.plsc_decode_hard,
            "differential": plsync.plsc_decode_diff,
        }[self.cfg.plsc_mode]
        mask = jnp.asarray(self._plsc_search_mask)
        pls, _scores = decode(der, enabled_mask=mask)
        sof_r = plsync.coarse_autocorr(hdrs, pls, full=False)
        full_r = plsync.coarse_autocorr(hdrs, pls, full=True)
        return pls, sof_r, full_r

    def _acm_group_impl(self, pls: int):
        """UNJITTED per-PLS frame-group program (F0 consecutive same-PLS
        frames + the following header); ``_acm_group`` jits it, and the
        batched multi-channel driver vmaps it over a channel axis."""
        res = self._resources(pls)
        info = res["info"]
        F0 = self.cfg.frame_group
        descr = jnp.asarray(res["descr"])

        def impl(headers, pls_next, payloads, coarse_corrected,
                 n0_override):
            # headers (F0+1, 90, 2) — headers[F0] belongs to the NEXT
            # frame (any PLS; only its data-aided phase is needed, so
            # its true PLS indexes the conj-PLHEADER LUT)
            plsv = jnp.concatenate([
                jnp.full((F0,), pls, jnp.int32), pls_next[None]
            ])
            hdr_phase = plsync.plheader_phase(headers, plsv)
            payloads_d = cplx.cmul(payloads, descr[None])
            if info.has_pilots:
                fine = plsync.fine_foffset_pilot_mode(
                    headers[:F0], payloads_d, plsv[:F0], info.n_pilots
                )
                pil_ph = plsync.pilot_phases(payloads_d, info.n_pilots)
                fine_ff = jnp.where(coarse_corrected, fine, 0.0)
                xfec = plsync.correct_payload_pilots(
                    payloads_d, hdr_phase[:F0], pil_ph, fine_ff,
                    info.n_slots, info.n_pilots,
                )
            else:
                fine = plsync.fine_foffset_pilotless(
                    hdr_phase[:F0], hdr_phase[1:], info.plframe_len
                )
                fine_ff = jnp.where(coarse_corrected, fine, 0.0)
                xfec = plsync.correct_payload_pilotless(
                    payloads_d, hdr_phase[:F0], fine_ff
                )
            if res["constellation"] == "QPSK":
                snr_lin = estimate_snr_qpsk(xfec[0])
            else:
                snr_lin = estimate_snr_generic(
                    xfec[0], res["constellation"], res["rate"]
                )
            n0_da = 1.0 / jnp.maximum(snr_lin, 1e-9)
            n0 = jnp.where(n0_override > 0, n0_override, n0_da)
            llrs = demap(
                xfec, jnp.broadcast_to(n0, (F0,)),
                res["constellation"], res["rate"],
            )
            return {"fine": fine, "n0": n0_da, "llrs": llrs,
                    "xfec": xfec}

        return impl

    def _acm_group(self, pls: int):
        """Jitted per-PLS frame-group program, compiled once per PLS."""
        key = ("group", pls)
        fn = self._group_jits.get(key)
        if fn is None:
            fn = jax.jit(self._acm_group_impl(pls))
            self._group_jits[key] = fn
        return fn

    # ---------- windowed host pipeline ----------

    @staticmethod
    def _find_peaks(metric, thresh, guard=64):
        """Local maxima of the dense timing metric above ``thresh``."""
        cand = np.flatnonzero(metric > thresh)
        peaks = []
        for n in cand:
            lo = max(0, int(n) - guard)
            hi = min(metric.size, int(n) + guard + 1)
            if int(n) == lo + int(np.argmax(metric[lo:hi])):
                peaks.append(int(n))
        return peaks

    def _window_decode(self, start: int):
        """Dense metric + batched PLSC decode over symbols[start:start+W].

        Returns (metric (valid,), cand: dict sof -> (pls, sof_r, full_r),
        valid). ``valid`` is the number of real (non-padded) symbols.
        """
        W = self._win_len
        buf = self._sym_buf[start: start + W]
        valid = buf.size
        if valid < W:
            buf = np.concatenate([buf, np.zeros(W - valid, np.complex64)])
        dev = jnp.asarray(cplx.from_np(buf))
        metric = np.asarray(self._acq_metric(dev))[:valid]

        peaks = [n for n in self._find_peaks(metric, plsync.THRESHOLD_LOCKED)
                 if n >= 89 and n - 89 + 90 <= valid]
        C = W // 3330 + 3
        if len(peaks) > C:  # keep the strongest C candidates
            peaks = sorted(sorted(peaks, key=lambda n: -metric[n])[:C])
        sofs = np.zeros(C, np.int32)
        sofs[: len(peaks)] = [n - 89 for n in peaks]
        foffset, apply_freq = self._derot_params()
        pls, sof_r, full_r = self._win_plsc(
            dev, jnp.asarray(sofs), jnp.float32(foffset),
            jnp.asarray(bool(apply_freq)),
        )
        pls = np.asarray(pls)
        sof_r = cplx.to_np(np.asarray(sof_r))
        full_r = cplx.to_np(np.asarray(full_r))
        cand = {
            int(sofs[i]): (int(pls[i]), sof_r[i], full_r[i])
            for i in range(len(peaks))
        }
        return metric, cand, valid

    def _cand_at(self, cand, pos, tol=1):
        for p in range(pos - tol, pos + tol + 1):
            if p in cand:
                return cand[p]
        return None

    def _acquire(self) -> bool:
        min_need = 3330 + 181   # shortest PLFRAME + two headers
        if self._sym_buf.size < min_need:
            return False
        metric, cand, valid = self._window_decode(0)
        # SOF declaration while searching uses the higher threshold
        # (reference THRESHOLD_UNLOCKED = 30, pl_frame_sync.h:160-162)
        strong = {
            sof: e for sof, e in cand.items()
            if metric[sof + 89] > plsync.THRESHOLD_UNLOCKED
        }
        if not strong:
            # no SOF in this window; drop all but a header-sized tail
            if self._sym_buf.size > self._win_len:
                self._consume_syms(self._win_len - 180)
                return True
            return False

        # closed-loop coarse pull-in from every detected header (SOF-only
        # accumulation: the PLS is not trustworthy while searching); each
        # header contributes once even when windows overlap across passes
        new_coarse = False
        for sof in sorted(strong):
            if self._abs_pos + sof <= self._last_acc_abs:
                continue
            self._last_acc_abs = self._abs_pos + sof
            if self._track_coarse_frame(strong[sof][1], None):
                new_coarse = True
        self._closed_loop_adjust(new_coarse, None, 3330)

        # chain confirmation: a candidate whose decoded PLS predicts the
        # next SOF position correctly locks the receiver (two-SOF rule)
        wait_sof = None
        for sof in sorted(strong):
            pls = strong[sof][0]
            L = parse_pls(pls).plframe_len
            if self._ensure_win(L):
                return True  # window grew; retry
            nxt_peak = sof + L + 89
            if nxt_peak >= valid:
                # next header beyond this window (or not received yet)
                if wait_sof is None:
                    wait_sof = sof
                continue
            confirmed = (
                self._cand_at(cand, sof + L) is not None
                or metric[nxt_peak] > plsync.THRESHOLD_LOCKED
            )
            if confirmed:
                self._lock_state = "locked"
                self.stats.lock_cnt += 1
                self.stats.lock_time = time.time()
                self._unlock_cnt = 0
                self._frame_phase = sof
                self._curr_pls = pls
                self.stats.sof_cnt += 2
                return True
        if wait_sof is not None:
            # align the buffer to the first unconfirmable candidate and
            # wait for its next header
            if wait_sof > 0:
                self._consume_syms(wait_sof)
                return True
            return False
        # candidates exist but none chains: false peaks; skip past the first
        self._consume_syms(min(strong) + 1)
        return True

    def _process_frames(self, force=False) -> bool:
        progressed = False
        while self._curr_pls is not None:
            fp = self._frame_phase
            L0 = parse_pls(self._curr_pls).plframe_len
            if self._ensure_win(L0):
                continue
            if self._sym_buf.size - fp < L0 + 91:
                break
            metric, cand, valid = self._window_decode(fp)

            # ---- walk the decoded-PLS chain through the window ----
            frames = []   # (pos, pls, own_metric, cand_entry or None)
            pos, pls = 0, self._curr_pls
            grew = False
            while True:
                L = parse_pls(pls).plframe_len
                if self._ensure_win(L):
                    grew = True
                    break
                nxt = pos + L
                if nxt + 91 > valid:
                    break
                entry_next = self._cand_at(cand, nxt)
                if entry_next is not None:
                    pls_next = entry_next[0]
                else:
                    # weak/no peak at the expected position: decode that
                    # single header anyway (the reference decodes every
                    # PLHEADER regardless of the timing metric)
                    foffset, apply_freq = self._derot_params()
                    p, _, _ = self._plsc_jit(
                        jnp.asarray(cplx.from_np(
                            self._sym_buf[fp + nxt - 1: fp + nxt + 90]
                        )),
                        jnp.float32(foffset), jnp.asarray(bool(apply_freq)),
                    )
                    pls_next = int(p)
                frames.append(
                    (pos, pls, float(metric[pos + 89]),
                     self._cand_at(cand, pos))
                )
                pos, pls = nxt, pls_next
            if grew:
                continue
            if not frames:
                break

            # ---- lock maintenance ----
            frames_all = frames
            keep = len(frames)
            unlocked = False
            for k, (p, fpls, m_own, _) in enumerate(frames):
                self.stats.sof_cnt += 1
                if m_own > plsync.THRESHOLD_LOCKED:
                    self._unlock_cnt = 0
                else:
                    self._unlock_cnt += 1
                    if self._unlock_cnt >= self.cfg.unlock_thresh:
                        keep = k
                        unlocked = True
                        break
            frames = frames[:keep]

            # ---- frequency tracking (coarse per frame, reference
            # handle_plheader strategy) ----
            new_coarse = False
            for p, fpls, m_own, entry in frames:
                if entry is None:
                    continue
                if self._track_coarse_frame(entry[1], entry[2]):
                    new_coarse = True

            # ---- classify + group same-PLS runs, process payloads ----
            fine_last = None
            run = []    # positions of consecutive same-PLS data frames
            run_pls = None
            mean_L = max(
                int(np.mean([parse_pls(f[1]).plframe_len for f in frames])), 1
            )

            def flush_run(next_pls):
                nonlocal fine_last, run, run_pls
                if run:
                    fine = self._process_run(run_pls, run, next_pls)
                    if fine is not None:
                        fine_last = fine
                    run, run_pls = [], None

            for k, (p, fpls, m_own, entry) in enumerate(frames):
                info = parse_pls(fpls)
                if info.dummy_frame:
                    flush_run(fpls)
                    self.stats.dummy_cnt += 1
                    continue
                if not self._pls_enabled[fpls]:
                    flush_run(fpls)
                    self.stats.rejected_cnt += 1
                    continue
                self.stats.frame_cnt += 1
                if run and (fpls != run_pls
                            or len(run) >= self.cfg.frame_group):
                    flush_run(fpls)
                run.append(p)
                run_pls = fpls
            # the header following the last run frame belongs to the next
            # walked position (its PLS is known from the walk)
            next_after = (frames_all[keep][1] if keep < len(frames_all)
                          else pls)
            flush_run(next_after)

            self._closed_loop_adjust(new_coarse, fine_last, mean_L)

            if unlocked:
                # consume through the frame that triggered the unlock
                bad_pos, bad_pls = frames_all[keep][0], frames_all[keep][1]
                consumed = bad_pos + parse_pls(bad_pls).plframe_len
                self._lock_state = "searching"
                self.stats.unlock_cnt += 1
                self._consume_syms(fp + consumed)
                self._frame_phase = 0
                self._curr_pls = None
                self._unlock_cnt = 0
                return True

            self._consume_syms(fp + pos)
            self._frame_phase = 0
            self._curr_pls = pls
            self.stats.locked = True
            progressed = True
            if self._sym_buf.size < parse_pls(pls).plframe_len + 91:
                break
        return progressed

    def _process_run(self, pls, positions, next_pls):
        """Process a run of consecutive same-PLS frames through the batched
        per-PLS group program; queue LLRs in stream order. Returns the last
        frame's fine-CFO estimate (or None when not coarse-corrected)."""
        res = self._resources(pls)
        info = res["info"]
        F0 = self.cfg.frame_group
        F = len(positions)
        fp = self._frame_phase
        L = info.plframe_len
        p0 = fp + positions[0]
        # headers for frames 0..F-1 plus the immediately following header
        hidx = p0 + np.arange(F + 1)[:, None] * L + np.arange(90)[None, :]
        hidx = np.clip(hidx, 0, self._sym_buf.size - 1)
        headers = self._sym_buf[hidx]                      # (F+1, 90)
        pidx = p0 + 90 + np.arange(F)[:, None] * L \
            + np.arange(info.payload_len)[None, :]
        payloads = self._sym_buf[pidx]                     # (F, payload_len)
        if F < F0:   # pad to the compiled shape; only F frames are consumed
            pad_h = np.repeat(headers[-2:-1], F0 - F, axis=0)
            headers = np.concatenate(
                [headers[:-1], pad_h, headers[-1:]], axis=0
            )
            payloads = np.concatenate(
                [payloads, np.repeat(payloads[-1:], F0 - F, axis=0)], axis=0
            )
        out = self._acm_group(pls)(
            jnp.asarray(cplx.from_np(headers)),
            jnp.asarray(np.int32(next_pls)),
            jnp.asarray(cplx.from_np(payloads)),
            jnp.asarray(self._coarse_corrected),
            jnp.float32(res["n0_refined"]),
        )
        llrs = np.asarray(out["llrs"])[:F]
        for k in range(F):
            self._fec_queue.append((pls, llrs[k], out["xfec"][k]))
        res["stats"]["frames"] += F
        n0 = float(out["n0"])
        if res["n0_refined"] == 0.0:
            self.stats.snr_db = float(10 * np.log10(1.0 / max(n0, 1e-12)))
        fine = float(np.asarray(out["fine"])[F - 1])
        res["stats"]["fine_foffset"] = fine
        if self._coarse_corrected:
            self._fine_ready = True
            self._fine_foffset = fine
            self.stats.fine_foffset = fine
            return fine
        return None

    # ---------- frequency tracking ----------

    def _track_coarse_frame(self, sof_r, full_r) -> bool:
        """Accumulate one header's coarse-CFO autocorrelation; SOF-only
        while not coarse-corrected, full PLHEADER after (reference
        ``plsync_cc_impl.cc:510-566``). Returns True when a new estimate
        was finalized."""
        if self._settle_frames > 0:
            # see Receiver._process_frames: pending COARSE updates gate the
            # accumulation; pending fine updates must not starve the
            # periodic coarse verification
            self._settle_frames -= 1
            if not self._coarse_corrected:
                return False
        mode = "full" if (self._coarse_corrected and full_r is not None) \
            else "sof"
        if mode != self._coarse_mode:
            self._coarse_mode = mode
            self._coarse_acc[:] = 0
            self._coarse_acc_sof[:] = 0
            self._coarse_frames = 0
        if mode == "sof":
            self._coarse_acc_sof += sof_r
        else:
            self._coarse_acc += full_r
        self._coarse_frames += 1
        if self._coarse_frames < self.cfg.coarse_period:
            return False
        acc = self._coarse_acc_sof if mode == "sof" else self._coarse_acc
        est = _coarse_foffset_np(acc)
        self._coarse_foffset = est
        self._coarse_corrected = abs(est) < plsync.FINE_FOFFSET_CORR_RANGE
        self._coarse_acc[:] = 0
        self._coarse_acc_sof[:] = 0
        self._coarse_frames = 0
        self.stats.coarse_corrected = self._coarse_corrected
        self.stats.coarse_foffset = est
        return True

    def _closed_loop_adjust(self, new_coarse, fine_last, mean_frame_len):
        """Block-granular rotator update (the CCM path's logic, with the
        settle guard measured in frames of the current mean length)."""
        self.stats.coarse_corrected = self._coarse_corrected
        self.stats.coarse_foffset = self._coarse_foffset
        if not self.cfg.closed_loop or self._settle_frames > 0:
            self.stats.cum_freq_offset = self._cum_foffset
            return
        adj = 0.0
        is_coarse_adj = not self._coarse_corrected
        if is_coarse_adj:
            if new_coarse:
                adj = self._coarse_foffset
        elif fine_last is not None:
            adj = fine_last
        if adj != 0.0:
            self._cum_foffset += adj
            self._rot_inc = -self._cum_foffset * 2 * np.pi / self.cfg.sps
            in_flight = self._sym_buf.size + self._samp_buf.size // self.cfg.sps
            self._settle_frames = in_flight // max(mean_frame_len, 1) + 2
            if is_coarse_adj:
                self._coarse_acc[:] = 0
                self._coarse_acc_sof[:] = 0
                self._coarse_frames = 0
        self.stats.cum_freq_offset = self._cum_foffset

    # ---------- single-header decode (weak-metric fallback) ----------

    def _plsc_impl(self, hdr_ext, foffset, apply_freq):
        """hdr_ext (91, 2) -> (pls int32, timing metric f32, scores)."""
        decode = {
            "coherent-soft": plsync.plsc_decode_soft,
            "coherent-hard": plsync.plsc_decode_hard,
            "differential": plsync.plsc_decode_diff,
        }[self.cfg.plsc_mode]
        mask = jnp.asarray(self._plsc_search_mask)
        der = plsync.derotate_plheader(hdr_ext[1:], foffset, apply_freq)
        pls, scores = decode(der, enabled_mask=mask)
        d = cplx.conj_mul(hdr_ext[1:], hdr_ext[:-1])[None]     # (1, 90, 2)
        metric = plsync.frame_metric(d[:, 1:])[0]
        return pls, metric, scores

    # ---------- ordered FEC ----------

    def _drain_fec(self) -> np.ndarray:
        out = []
        B = self.cfg.fec_batch
        while self._fec_queue:
            pls0 = self._fec_queue[0][0]
            run = 1
            while run < len(self._fec_queue) and self._fec_queue[run][0] == pls0:
                run += 1
            if run < B and len(self._fec_queue) == run and not self._fec_flush:
                break  # wait for more same-PLS frames
            take = min(run, B)
            batch = [llr for _, llr, _ in self._fec_queue[:take]]
            xfecs = [x for _, _, x in self._fec_queue[:take]]
            del self._fec_queue[:take]
            out.append(self._decode_acm_batch(pls0, batch, xfecs))
        return np.concatenate(out) if out else np.empty(0, np.uint8)

    _fec_flush = False

    def _flush_fec(self) -> np.ndarray:
        self._fec_flush = True
        try:
            return self._drain_fec()
        finally:
            self._fec_flush = False

    def _acm_fec_impl(self, pls: int):
        """UNJITTED per-PLS lane-major FEC program (LDPC + BCH + bit pack):
        llrsT (N, B) int8 with frames on the minor (lane) axis — the
        decoder-native layout (see ``_fec_stage_lane_major_impl``). Frames
        from any channel/step pool freely along the lane axis: per-lane
        convergence freezing makes each frame's result independent of the
        batch composition, so the multi-channel driver concatenates C
        channels' queues into ONE wide decode (the reference's SIMD-lane
        trick applied across channels, ``ldpc_decoder_bb_impl.cc:309-352``)
        with bit-identical per-frame outputs."""
        res = self._resources(pls)
        fec = res["fec"]
        ldpc, bch = res["ldpc"], res["bch"]

        def fec_impl(llrsT):
            hard_t, _llrs_t, iters, ok = ldpc.decode_lane_major(llrsT)
            corrected_t, n_corr = bch.decode_lane_major(hard_t[: fec.nbch])
            kbits_t = corrected_t[: fec.kbch].astype(jnp.int32)
            B = kbits_t.shape[1]
            weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.int32))
            kbytes = jnp.sum(
                kbits_t.reshape(-1, 8, B) * weights[None, :, None], axis=1
            ).astype(jnp.uint8).transpose(1, 0)
            return kbytes, n_corr.astype(jnp.int32), \
                iters.astype(jnp.int32), hard_t

        return fec_impl

    def _acm_refine_impl(self, pls: int):
        """UNJITTED per-PLS post-decoder SNR refinement."""
        res = self._resources(pls)
        const, rate = res["constellation"], res["rate"]
        n_mod = res["info"].n_mod
        return lambda x, h: _snr_refine(x, h, const, rate, n_mod)

    def _decode_acm_batch(self, pls, llr_list, xfec_list) -> np.ndarray:
        res = self._resources(pls)
        B = self.cfg.fec_batch
        n = len(llr_list)
        # lane-major upload: frames on the minor axis (the transpose is
        # host-side numpy — the LLR queue already lives on the host)
        batch_t = np.ascontiguousarray(
            np.stack(llr_list + [llr_list[-1]] * (B - n)).T
        )

        key = ("fec", pls)
        fn = self._group_jits.get(key)
        if fn is None:
            fn = fec_jit(self._acm_fec_impl(pls))
            self._group_jits[key] = fn

        kbytes, n_corr, iters, hard_t = fn(jnp.asarray(batch_t))

        # post-decoder SNR refinement per PLS (reference
        # xfecframe_demapper_cb_impl.cc:188-318): subsequent demapping of
        # this PLS uses the refined N0
        rkey = ("refine", pls)
        rfn = self._group_jits.get(rkey)
        if rfn is None:
            rfn = jax.jit(self._acm_refine_impl(pls))
            self._group_jits[rkey] = rfn
        snr = float(rfn(jnp.stack(list(xfec_list)), hard_t[:, :n].T))
        if snr > 0:
            res["n0_refined"] = 1.0 / snr
            res["stats"]["snr_db"] = float(10 * np.log10(snr))
            self.stats.snr_db = res["stats"]["snr_db"]

        kbytes = np.asarray(kbytes)[:n]
        n_corr = np.asarray(n_corr)[:n]
        self.stats.ldpc_frames += n
        self.stats.ldpc_total_iters += int(iters) * n
        self.stats.bch_frames += n
        self.stats.bch_frame_errors += int(np.sum(n_corr < 0))
        self.stats.bch_corrections += int(np.sum(np.maximum(n_corr, 0)))
        res["stats"]["fec_frames"] += n
        res["stats"]["ldpc_iters"] += int(iters) * n
        res["stats"]["fec_errors"] += int(np.sum(n_corr < 0))
        ts = []
        for row in kbytes:
            ts.append(self.bb_parser.push(row ^ res["bb_scramble"]))
        return np.concatenate(ts) if ts else np.empty(0, np.uint8)



def make_receiver(cfg: RxConfig):
    """Factory: CCM Receiver or ACMReceiver depending on the config."""
    return ACMReceiver(cfg) if cfg.acm_vcm else Receiver(cfg)
