"""Device-resident ACM/VCM steady-state receiver: variable-MODCOD IQ ->
BBFRAME bytes as ONE jitted step (VERDICT r3 item 1).

``StreamReceiver`` (stream.py) is the CCM device-resident engine: frame
geometry is static, so the whole chain is dense batched math. ACM/VCM makes
frame length a *data-dependent* quantity (each frame's decoded PLSC decides
where the next frame starts, ``lib/plsync_cc_impl.cc:805-955``), which the
round-3 build handled with a host-orchestrated windowed walk
(``rx/receiver.py ACMReceiver``) at ~6x below the CCM rate. This module is
the TPU-first redesign per SURVEY.md §7 ("data-dependent shapes: max-shape
padding + masks"):

- **Chain walk on device**: a ``lax.scan`` over ``K_max`` frame slots
  carries (position, PLS) per channel. Each slot slices one 94-symbol
  window at the PREDICTED next-SOF position, adjusts it with a 3-point
  early/on-time/late frame-metric discriminator (absorbing timing-loop
  slips), decodes its PLSC ((128, 64) matmul), and steps the position by
  the 128-entry PLS->frame-length table. Differential (CFO-robust) PLSC
  decoding drives the walk until coarse-corrected, then the configured
  coherent mode takes over — mirroring the reference's decode-mode options
  (``pl_signaling.cc:114-152``) and solving the pull-in chicken-and-egg
  (the walk needs frame lengths before the CFO is corrected).
- **Per-PLS static geometry**: the expected PLS set (``cfg.pls_expected`` /
  ``pls_list``) is a compile-time constant, so inside the per-PLS loop the
  payload length, pilot layout, descrambler span, demapper, and
  deinterleaver are all static — only the lane-selection masks are
  data-dependent. Frames are padded to the longest expected frame.
- **Pooled lane-major FEC queues**: demapped LLR columns append to one
  global (N, CAP) int8 queue per PLS — frames pooled across channels AND
  steps — and a ``lax.cond`` drains a full ``B_fec``-lane batch whenever
  one is ready (the reference's frames-as-SIMD-lanes,
  ``ldpc_decoder_bb_impl.cc:309-352``, applied across channels). Per-lane
  convergence freezing in the decoders (ops/ldpc.py) makes every frame's
  result independent of how it was pooled.
- **Ordered delivery**: each data frame carries (channel, seq) metadata;
  the host engine reorders per channel (different-PLS frames drain from
  different queues at different times) and stitches TS bytes.

- **Post-decoder SNR refinement**: alongside each LLR column the queue
  pools an int8-quantized snapshot of the frame's first ``R_SUB`` data
  symbols; when a batch drains, the decoded bits re-map to constellation
  points against the snapshots (reference
  ``xfecframe_demapper_cb_impl.cc:188-318``, the LLR-PDU feedback) and
  the per-(channel, PLS) refined N0 carried in state scales the NEXT
  frames' LLRs — the reference's 8-frame symbol pool + async PDU loop
  collapsed into queue + carry. Only BCH-clean lanes update the estimate
  (a failed decode would poison the scale). The snapshot is a prefix
  (<=4096 symbols, estimator std ~2%) quantized at 1/32 (~-41 dB noise
  floor), both negligible at DVB-S2 operating SNRs.

Scope: any expected-PLS set, mixed normal+short frame sizes included
(queues pad to the largest code); closed-loop rotator. Dummy frames are
walked and counted at line rate; out-of-filter frames are rejected and
counted (``plsync_cc_impl.cc:904-916``).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx, plsync
from ..ops.demap import demap, estimate_snr_qpsk, estimate_snr_generic, \
    quantize_llrs
from ..ops.ffsync import FeedForwardSync, FFSyncState
from ..ops.frontend import rotate_block
from ..spec.fec_params import get_fec_info, DVBS2_MODCODS as _MODCODS
from ..spec.pls import parse_pls
from ..spec.scramblers import bb_derandomizer_bytes, pl_descrambling_sequence
from .receiver import RxConfig, RxStats, _make_ldpc_decoder
from ..ops.bch import get_bch_decoder as _get_bch_decoder
from ..utils.runtime import fec_jit

DUMMY_PLFRAME_LEN = 3330


def _tab_lookup(tab, pls):
    """128-entry table lookup as an exact one-hot matmul (tiny-table
    gathers serialize on TPU; see receiver._snr_refine)."""
    oh = (pls[..., None] == jnp.arange(128)).astype(jnp.float32)
    return jnp.matmul(
        oh, jnp.asarray(tab, jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )


class VCMStreamReceiver:
    """Variable-MODCOD multi-channel receiver as one device step.

    ``step(state, iq) -> (state', outputs, stats)`` with ``iq`` of shape
    (C, n_in, 2) float planar. ``outputs`` holds up to ``DRAIN`` decoded
    ``B_fec``-lane FEC batches per expected PLS (see ``step`` docstring).
    """

    def __init__(self, cfg: RxConfig, n_channels: int,
                 frames_per_step: int = 2, fec_lanes: int = None,
                 allow_dummy: bool = True):
        if not cfg.acm_vcm:
            raise ValueError("VCMStreamReceiver requires acm_vcm=True")
        if cfg.sym_sync_impl != "ffw":
            raise ValueError("VCMStreamReceiver requires sym_sync_impl='ffw'")
        if not cfg.closed_loop:
            raise ValueError("VCMStreamReceiver requires closed_loop=True")
        expected = tuple(cfg.pls_expected or cfg.pls_list)
        if not expected:
            raise ValueError(
                "VCMStreamReceiver needs the a-priori PLS set "
                "(cfg.pls_expected or cfg.pls_list); the fully-blind search "
                "path is the host ACMReceiver"
            )
        infos = [parse_pls(p) for p in expected]
        if any(i.dummy_frame for i in infos):
            raise ValueError("dummy PLS values need not be listed")
        self.cfg = cfg
        self.n_channels = C = n_channels
        self.pls_set = expected
        self.S = S = len(expected)
        self._infos = infos
        # per-PLS frame-size class: mixed normal+short streams are
        # supported; queues/LLR buffers pad to the largest code
        # (short-frame lanes waste 3/4 of their queue rows, bounded by
        # the PLS set the operator configured)
        self._framesizes = [
            "short" if i.short_fecframe else "normal" for i in infos
        ]
        self._fecs = [
            get_fec_info(fs, _MODCODS[i.modcod][1])
            for fs, i in zip(self._framesizes, infos)
        ]
        self.n_ldpc = max(f.nldpc for f in self._fecs)
        self.kb_max = max(f.kbch for f in self._fecs) // 8

        # geometry
        self.L_max = max(i.plframe_len for i in infos)
        self.Lp_max = self.L_max - 90
        L_min_data = min(i.plframe_len for i in infos)
        L_min_walk = DUMMY_PLFRAME_LEN if allow_dummy else L_min_data
        self.n_out = frames_per_step * self.L_max
        self.n_in = self.n_out * cfg.sps
        self.K_max = self.n_out // L_min_walk + 2
        self.F_pay = self.n_out // L_min_data + 2
        self.B_lanes = C * self.F_pay
        if fec_lanes is None:
            fec_lanes = 128 if jax.devices()[0].platform == "tpu" else 16
        self.B_fec = fec_lanes
        self.DRAIN = max(1, -(-self.B_lanes // self.B_fec))
        self.CAP = self.B_fec + self.B_lanes + 8

        # front end (identical mechanics to the CCM StreamReceiver)
        self.sync = FeedForwardSync(
            sps=cfg.sps, rolloff=cfg.rolloff, max_block=self.n_out,
            mf_precision=cfg.mf_precision,
        )
        self._hist = self.sync.history()
        self._n_fe = self.n_in + self._hist
        self.N_BUF = self.n_in + self._hist + self.L_max * cfg.sps + 1024
        # symbol ring: one step's append + the priming backlog (prime keeps
        # up to n_out symbols from the SOF; the walk drains the excess over
        # the first couple of steps at K_max frames/step)
        self.N_SYM = 2 * self.n_out + 128
        self._settle0 = int(
            (self.N_SYM + self.N_BUF / cfg.sps) // L_min_data + 2
        )

        # spec tables (host numpy; closed over as constants)
        self._L_tab = np.array(
            [parse_pls(p).plframe_len for p in range(128)], np.int32
        )
        self._dummy_tab = np.array(
            [parse_pls(p).dummy_frame for p in range(128)], np.float32
        )
        enabled = np.zeros(128, np.float32)
        out_filter = tuple(cfg.pls_list) if cfg.pls_list else expected
        enabled[list(out_filter)] = 1.0
        self._enabled_tab = enabled
        mask = np.zeros(128, bool)
        mask[list(expected)] = True
        mask[:4] = True                      # dummies always searched
        self._search_mask = mask
        self._descr = cplx.from_np(
            pl_descrambling_sequence(cfg.gold_code)[: self.Lp_max]
        )

        # per-PLS resources
        self._ldpc = [
            _make_ldpc_decoder(f.ldpc_table, cfg.ldpc_max_trials,
                               cfg.ldpc_impl, cfg.ldpc_algo, cfg.ldpc_update)
            for f in self._fecs
        ]
        self._bch = [
            _get_bch_decoder(fs, f.t, f.nbch, f.kbch)
            for fs, f in zip(self._framesizes, self._fecs)
        ]
        self.bb_scramble = [
            bb_derandomizer_bytes(f.kbch // 8) for f in self._fecs
        ]
        # post-decoder SNR refinement: pooled symbol-snapshot prefix length
        # (uniform across the PLS set so the queue is one array) and the
        # int8 quantization scale (see module docstring)
        self.R_SUB = min(
            4096,
            min(f.nldpc // i.n_mod for f, i in zip(self._fecs, infos)),
        )
        self.XF_SCALE = 32.0
        # closed-loop coarse re-application floor (see the rotator update
        # in _build_step): with any pilotless PLS expected, residuals the
        # per-frame fine estimator aliases on (> ~1/(4 L_max)) must keep
        # being closed by the full-PLHEADER coarse; all-pilots sets can
        # leave anything under the pilot-mode fine range to the fine loop
        if all(i.has_pilots for i in infos):
            self._coarse_reapply_min = plsync.FINE_FOFFSET_CORR_RANGE
        else:
            # the pilotless per-frame fine estimator is unambiguous only
            # for |f| < 1/(2 L): a closed-loop residual beyond that reads
            # ALIASED (wrong magnitude and often wrong sign), so feeding
            # it back walks the rotator AWAY (r5 limit-cycle study,
            # tools/probes/vcm_hw_diag.py). Split the loop at half the
            # alias range: fine applies only readings it can trust
            # (|fine| < 1/(4 L_max)); anything larger is closed by the
            # continuously-firing full-PLHEADER coarse. A static residual
            # below the alias limit is harmless either way — the demap
            # corrects each frame's own measured phase ramp.
            self._coarse_reapply_min = 1.0 / (4.0 * self.L_max)

        # The step is 1 + S jitted programs: A = front end + chain walk +
        # demap + control (everything but FEC), then ONE program per
        # expected PLS for queue append + pooled FEC drain (each embeds
        # exactly one compiled Pallas LDPC kernel — see make_step_b).
        step_a, step_b_fns = self._build_step()
        self._step_a = jax.jit(step_a, donate_argnums=0)
        self._step_b = [
            fec_jit(f, donate_argnums=0) for f in step_b_fns
        ]
        self._flush_fns = None
        self._reacquire = None

    def step(self, state, iq):
        """One VCM stream step: (state, iq (C, n_in, 2)) ->
        (state', outputs, stats)."""
        state, llr8, xf8, meta, sels, stats = self._step_a(state, iq)
        outputs = {"kb": [], "meta": [], "n_corr": [], "fired": []}
        iters = []
        for fn in self._step_b:
            state, o, stats_b = fn(state, llr8, xf8, meta, sels)
            for k in outputs:
                outputs[k].append(o[k])
            iters.append(stats_b["ldpc_iters"])
        # per-si device scalars; np.asarray stacks them on first host read
        stats = {**stats, "ldpc_iters": iters,
                 "n0_refined": stats_b["n0_refined"]}
        return state, outputs, stats

    # ---------------- state ----------------

    def init_state_np(self):
        C, S = self.n_channels, self.S
        return {
            # front end
            "sbuf": np.zeros((C, self.N_BUF, 2), np.float32),
            "sfill": np.zeros((C,), np.int32),
            "ff_tau": np.zeros((C,), np.float32),
            "ff_rate": np.zeros((C,), np.float32),
            "ff_init": np.zeros((C,), np.int32),
            "rot_phase": np.zeros((C,), np.float32),
            "rot_inc": np.zeros((C,), np.float32),
            "agc_gain": np.ones((C,), np.float32),
            # symbol ring (right-aligned) + chain carry
            # rail-major (C, 2, N_SYM): every consumer (ring shift,
            # header windows, payload slices) moves data along the
            # lane-tiled N axis; the planar (C, N, 2) ring forced a
            # 68 MB minor-dim-2 relayout copy every step (6.2 ms of
            # the 19 ms r5 step; HLO copy.524)
            "symbuf": np.zeros((C, 2, self.N_SYM), np.float32),
            "symfill": np.zeros((C,), np.int32),
            "fp_right": np.zeros((C,), np.int32),   # frame start from right
            "pls": np.zeros((C,), np.int32),
            "seq": np.zeros((C,), np.int32),
            # frequency tracking
            "coarse_acc": np.zeros((C, 89, 2), np.float32),
            "coarse_frames": np.zeros((C,), np.int32),
            "coarse_foffset": np.zeros((C,), np.float32),
            "coarse_corrected": np.zeros((C,), bool),
            "cum_foffset": np.zeros((C,), np.float32),
            "settle": np.zeros((C,), np.int32),
            "unlock_cnt": np.zeros((C,), np.int32),
            # pooled per-PLS FEC queues (global across channels)
            "qllr": np.zeros((S, self.n_ldpc, self.CAP), np.int8),
            "qmeta": np.zeros((S, self.CAP, 2), np.int32),
            "qfill": np.zeros((S,), np.int32),
            # symbol snapshots pooled with the LLRs + the refined N0 carry
            "qxf": np.zeros((S, self.R_SUB * 2, self.CAP), np.int8),
            "n0_refined": np.zeros((C, S), np.float32),
        }

    # ---------------- step pieces ----------------

    def _frontend(self, state, iq):
        """AGC + rotator + feed-forward timing; appends to the symbol ring.
        Same right-aligned static-shift design as the CCM StreamReceiver."""
        cfg = self.cfg
        n_in, n_out, n_fe = self.n_in, self.n_out, self._n_fe
        gain = state["agc_gain"]
        if cfg.agc:
            mag = jnp.mean(
                jnp.sqrt(iq[..., 0] ** 2 + iq[..., 1] ** 2), axis=-1
            )
            target = cfg.agc_ref / jnp.maximum(mag, 1e-12)
            alpha = min(1.0, cfg.agc_rate * n_in)
            gain = (1.0 - alpha) * gain + alpha * target
            iq = iq * gain[:, None, None]
        rot, phase = jax.vmap(rotate_block)(
            iq, state["rot_phase"], state["rot_inc"]
        )
        overflow = state["sfill"] > self.N_BUF - n_in
        sfill = jnp.minimum(state["sfill"] + n_in, self.N_BUF)
        sbuf = jnp.concatenate([state["sbuf"][:, n_in:], rot], axis=1)
        ff = FFSyncState(
            tau=state["ff_tau"], rate=state["ff_rate"],
            initialized=state["ff_init"],
        )
        start = self.N_BUF - sfill
        fe_in = jax.vmap(
            lambda b, s: jax.lax.dynamic_slice(b, (s, 0), (n_fe, 2))
        )(sbuf, start)
        ff2, syms, consumed = self.sync.step_batched(ff, fe_in, n_out)
        sfill = sfill - consumed
        underflow = sfill < (n_fe - n_in)
        symbuf = jnp.concatenate(
            [state["symbuf"][:, :, n_out:],
             jnp.transpose(syms, (0, 2, 1))], axis=2
        )
        symfill = jnp.minimum(state["symfill"] + n_out, self.N_SYM)
        new_state = dict(
            state, sbuf=sbuf, sfill=sfill, agc_gain=gain, rot_phase=phase,
            ff_tau=ff2.tau, ff_rate=ff2.rate, ff_init=ff2.initialized,
            symbuf=symbuf, symfill=symfill,
        )
        return new_state, overflow, underflow

    def _hdr3_at(self, symbuf_T, pos):
        """94-symbol window [pos-2, pos+92) per channel + 3-point metric,
        ``pos`` = nominal SOF start. ``symbuf_T`` is the RAIL-MAJOR (C, 2,
        N_SYM) view of the symbol ring: slicing the planar (C, N_SYM, 2)
        ring inside the walk scan made XLA demand a minor-dim-2 layout for
        the whole ring and relayout-copy all 68 MB of it every step at
        ~12.5% lane utilization (6.2 ms of the r5 19 ms step; HLO
        copy.528). The rail-major view transposes once per step at full
        lane width; the per-slot windows transpose back at 94-symbol size.

        Returns (m3 (C, 3), ext94 (C, 94, 2)): m3[:, o] is the frame metric
        for SOF offset d = o-1, and the offset-d header is
        ext[:, d+2 : d+92].
        """
        C = self.n_channels
        p = jnp.clip(pos - 2, 0, self.N_SYM - 94)
        ext_r = jax.vmap(
            lambda s, i: jax.lax.dynamic_slice(s, (0, i), (2, 94))
        )(symbuf_T, p)                                  # (C, 2, 94)
        # pin the tiny window BEFORE transposing: without the barrier,
        # XLA back-propagates the transposed (minor-dim-2) layout demand
        # through the walk's while carry onto the whole 68 MB ring and
        # re-materializes it with a 6.2 ms relayout copy every step
        ext = jax.lax.optimization_barrier(ext_r).transpose(0, 2, 1)
        wins = jnp.stack(
            [ext[:, o: o + 91] for o in range(3)], axis=1
        )                                               # (C, 3, 91, 2)
        d = cplx.conj_mul(wins[..., 1:, :], wins[..., :-1, :])
        m3 = plsync.frame_metric(
            d[..., 1:, :].reshape(-1, 89, 2)
        ).reshape(C, 3)
        return m3, ext

    @staticmethod
    def _hdr_from_ext(ext, shift):
        """Offset-``shift`` 90-symbol header out of a ``_hdr3_at`` window."""
        return jax.vmap(
            lambda e, s: jax.lax.dynamic_slice(e, (s + 2, 0), (90, 2))
        )(ext, shift)

    def _decode_plsc(self, hdr, corrected):
        """Per-channel PLSC decode: differential (CFO-robust) while not
        coarse-corrected, the configured coherent mode after."""
        mask = jnp.asarray(self._search_mask)
        der = plsync.derotate_plheader(
            hdr, jnp.float32(0.0), jnp.asarray(False)
        )
        coh = {
            "coherent-soft": plsync.plsc_decode_soft,
            "coherent-hard": plsync.plsc_decode_hard,
            "differential": plsync.plsc_decode_diff,
        }[self.cfg.plsc_mode]
        pls_c, _ = coh(der, enabled_mask=mask)
        pls_d, _ = plsync.plsc_decode_diff(hdr, enabled_mask=mask)
        return jnp.where(corrected, pls_c, pls_d).astype(jnp.int32)

    def _walk(self, state):
        """Decoded-PLS chain walk over K_max slots (lax.scan).

        Carry: (pos, pls, alive, own_hdr, own_metric). Emits per slot:
        pos, pls, valid, own_hdr, own_metric, next_pls, next_hdr.
        """
        C = self.n_channels
        symbuf_T = state["symbuf"]          # rail-major (C, 2, N_SYM)
        corrected = state["coarse_corrected"]
        L_tab = jnp.asarray(self._L_tab)

        fp0 = self.N_SYM - state["fp_right"]
        # first frame: 3-point re-align + header slice (the intra-step
        # analog of the CCM stream's frame-alignment DLL)
        m3, ext = self._hdr3_at(symbuf_T, fp0)
        center = m3[:, 1]
        shift = jnp.where(
            center + 1e-3 >= jnp.max(m3, axis=1),
            0, jnp.argmax(m3, axis=1).astype(jnp.int32) - 1,
        )
        pos0 = fp0 + shift
        own0 = self._hdr_from_ext(ext, shift)
        m_own0 = jnp.take_along_axis(
            m3, (shift + 1)[:, None], axis=1
        )[:, 0]
        # a frame is walkable when the (conservative) longest frame plus
        # the following header fit inside the buffered symbols
        valid_lim = self.N_SYM - self.L_max - 92
        have = self.N_SYM - state["symfill"]  # first valid symbol index
        alive0 = (pos0 <= valid_lim) & (pos0 >= have)

        def body(carry, _):
            pos, pls, alive, own_hdr, m_own = carry
            L = _tab_lookup(self._L_tab, pls).astype(jnp.int32)
            nxt_nom = pos + L
            m3n, extn = self._hdr3_at(symbuf_T, nxt_nom)
            cn = m3n[:, 1]
            shiftn = jnp.where(
                cn + 1e-3 >= jnp.max(m3n, axis=1),
                0, jnp.argmax(m3n, axis=1).astype(jnp.int32) - 1,
            )
            nxt = nxt_nom + shiftn
            next_hdr = self._hdr_from_ext(extn, shiftn)
            next_pls = self._decode_plsc(next_hdr, corrected)
            m_next = jnp.take_along_axis(
                m3n, (shiftn + 1)[:, None], axis=1
            )[:, 0]
            out = {
                "pos": pos, "pls": pls, "valid": alive,
                "own_hdr": own_hdr, "metric": m_own,
                "next_pls": next_pls, "next_hdr": next_hdr,
            }
            alive_n = alive & (nxt <= valid_lim)
            # a dead chain freezes: the first un-walked frame is the carry
            # the next step resumes from
            carry = (
                jnp.where(alive, nxt, pos),
                jnp.where(alive, next_pls, pls),
                alive_n,
                jnp.where(alive[:, None, None], next_hdr, own_hdr),
                jnp.where(alive, m_next, m_own),
            )
            return carry, out

        carry0 = (pos0, state["pls"], alive0, own0, m_own0)
        (pos_f, pls_f, _alive_f, _h, _m), slots = jax.lax.scan(
            body, carry0, None, length=self.K_max
        )
        # chain carry for the next step: first un-walked frame
        n_walked = jnp.sum(slots["valid"].astype(jnp.int32), axis=0)
        fp_right = self.N_SYM - pos_f
        new_pls = pls_f
        return slots, fp_right, new_pls, n_walked

    def _lane_fn(self, si: int):
        """Per-lane payload program for expected PLS index ``si`` (static
        geometry: the ACMReceiver group program's math, one frame/lane)."""
        info = self._infos[si]
        fec = self._fecs[si]
        const, rate = _MODCODS[info.modcod]
        Lp = info.payload_len
        descr = jnp.asarray(self._descr)[:Lp]

        def lane(own_hdr, payload, next_phase):
            pls = jnp.int32(self.pls_set[si])
            hdr_phase = plsync.plheader_phase(own_hdr, pls)
            pay = cplx.cmul(payload[:Lp], descr)
            if info.has_pilots:
                fine = plsync.fine_foffset_pilot_mode(
                    own_hdr, pay, pls, info.n_pilots
                )
                pil_ph = plsync.pilot_phases(pay, info.n_pilots)
            else:
                fine = plsync.fine_foffset_pilotless(
                    hdr_phase, next_phase, info.plframe_len
                )
            return hdr_phase, pay, fine, (
                pil_ph if info.has_pilots else None
            )

        def correct_demap(own_hdr, payload, next_phase, corrected, n0_ov):
            hdr_phase, pay, fine, pil_ph = lane(own_hdr, payload, next_phase)
            fine_ff = jnp.where(corrected, fine, 0.0)
            if info.has_pilots:
                xfec = plsync.correct_payload_pilots(
                    pay, hdr_phase, pil_ph, fine_ff,
                    info.n_slots, info.n_pilots,
                )
            else:
                xfec = plsync.correct_payload_pilotless(
                    pay, hdr_phase, fine_ff
                )
            if const == "QPSK":
                snr = estimate_snr_qpsk(xfec)
            else:
                snr = estimate_snr_generic(xfec, const, rate)
            n0 = 1.0 / jnp.maximum(snr, 1e-9)
            # refined post-decoder N0 (per channel+PLS carry) once the
            # first decoded batch of this PLS came back; data-aided before
            n0_use = jnp.where(n0_ov > 0, n0_ov, n0)
            llr = demap(xfec[None], n0_use[None], const, rate,
                        quantize=False)[0]
            if fec.nldpc < self.n_ldpc:   # mixed frame-size set: pad to
                llr = jnp.pad(llr, (0, self.n_ldpc - fec.nldpc))  # queue

            xfq = jnp.clip(
                jnp.round(xfec[: self.R_SUB] * self.XF_SCALE), -127, 127
            ).astype(jnp.int8).reshape(self.R_SUB * 2)
            return {"llrs": llr, "fine": fine, "n0": n0_use, "xfq": xfq}

        return correct_demap, fec

    def _fec_branch(self, si: int):
        """Lane-major FEC for expected PLS ``si`` (B_fec lanes). Also
        returns the per-lane refined SNR from the decoded bits against the
        pooled symbol snapshots ``xfT`` ((R_SUB*2, B) int8; pass zeros to
        skip — lanes with BCH failures report snr 0 and are ignored by the
        carry update in ``step_b``)."""
        from .receiver import _snr_refine_frames

        fec = self._fecs[si]
        info = self._infos[si]
        const, rate = _MODCODS[info.modcod]
        ldpc, bch = self._ldpc[si], self._bch[si]

        def run(llrsT, xfT):
            # queues pad to the largest expected code; this PLS's code
            # occupies the first nldpc rows
            llrsT = llrsT[: fec.nldpc]
            hard_t, _lt, iters, ok = ldpc.decode_lane_major(llrsT)
            corrected_t, n_corr = bch.decode_lane_major(hard_t[: fec.nbch])
            xf = (
                xfT.astype(jnp.float32) / self.XF_SCALE
            ).reshape(self.R_SUB, 2, -1).transpose(2, 0, 1)  # (B, R_SUB, 2)
            snr = _snr_refine_frames(
                xf, hard_t.transpose(1, 0), const, rate, info.n_mod
            )
            snr = jnp.where(n_corr >= 0, snr, 0.0)
            kbits_t = corrected_t[: fec.kbch].astype(jnp.int32)
            B = kbits_t.shape[1]
            weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.int32))
            kbytes = jnp.sum(
                kbits_t.reshape(-1, 8, B) * weights[None, :, None], axis=1
            ).astype(jnp.uint8).transpose(1, 0)
            pad = self.kb_max - fec.kbch // 8
            if pad:
                kbytes = jnp.pad(kbytes, ((0, 0), (0, pad)))
            return (kbytes, n_corr.astype(jnp.int32),
                    iters.astype(jnp.int32), snr)

        return run

    # ---------------- the step ----------------

    def _build_step(self):
        C, S = self.n_channels, self.S
        K, FP = self.K_max, self.F_pay
        B = self.B_lanes
        cfg = self.cfg
        lanes = [self._lane_fn(si) for si in range(S)]
        fec_branches = [self._fec_branch(si) for si in range(S)]
        pls_arr = np.asarray(self.pls_set, np.int32)

        def step_a(state, iq):
            state, overflow, underflow = self._frontend(state, iq)
            symbuf = state["symbuf"]
            # the append moved every buffered symbol left by n_out
            state = dict(
                state, fp_right=state["fp_right"] + self.n_out
            )
            slots, fp_right, new_pls, n_walked = self._walk(state)

            valid = slots["valid"]                       # (K, C)
            pls_s = slots["pls"]
            is_dummy = _tab_lookup(self._dummy_tab, pls_s) > 0.5
            is_enabled = _tab_lookup(self._enabled_tab, pls_s) > 0.5
            is_data = valid & (~is_dummy) & is_enabled
            rejected = valid & (~is_dummy) & (~is_enabled)

            # next-header phases (for pilotless fine CFO), with the TRUE
            # decoded next PLS indexing the conj-PLHEADER LUT
            nxt_ph = plsync.plheader_phase(
                slots["next_hdr"].reshape(K * C, 90, 2),
                slots["next_pls"].reshape(K * C),
            ).reshape(K, C)

            # ---- compact data slots to (C, F_pay) stream-ordered lanes ----
            rank = jnp.cumsum(is_data.astype(jnp.int32), axis=0) - 1  # (K,C)
            oh = (
                is_data[:, :, None]
                & (rank[:, :, None] == jnp.arange(FP)[None, None, :])
            ).astype(jnp.float32)                        # (K, C, FP)

            def compact(x, kind=jnp.float32):
                # x: (K, C, ...) -> (C, FP, ...)
                xf = x.astype(jnp.float32)
                extra = xf.ndim - 2
                ohx = oh.reshape(K, C, FP, *([1] * extra))
                out = jnp.sum(ohx * xf[:, :, None], axis=0)
                return out.astype(kind)

            d_pos = compact(slots["pos"], jnp.int32)
            d_pls = compact(pls_s, jnp.int32)
            d_nxtph = compact(nxt_ph)
            d_hdr = compact(slots["own_hdr"])            # (C, FP, 90, 2)
            d_valid = jnp.sum(oh, axis=0) > 0.5          # (C, FP)
            counts = jnp.sum(is_data.astype(jnp.int32), axis=0)  # (C,)
            d_seq = state["seq"][:, None] + jnp.arange(FP)[None, :]

            # ---- payload extraction (max-shape) ----
            pay = jax.vmap(
                lambda sb, ps: jax.vmap(
                    lambda p: jax.lax.dynamic_slice(
                        sb, (0, p), (2, self.Lp_max)
                    )
                )(ps)
            )(symbuf, jnp.clip(d_pos + 90, 0, self.N_SYM - self.Lp_max))
            # (C, FP, 2, Lp_max) rail-major

            hdr_l = d_hdr.reshape(B, 90, 2)
            pay_l = pay.reshape(B, 2, self.Lp_max).transpose(0, 2, 1)
            nxtph_l = d_nxtph.reshape(B)
            pls_l = d_pls.reshape(B)
            valid_l = d_valid.reshape(B)
            corrected_l = jnp.repeat(state["coarse_corrected"], FP)

            # ---- per-expected-PLS demap (static geometry), lane select ----
            llr = jnp.zeros((self.n_ldpc, B), jnp.float32)
            fine = jnp.zeros((B,), jnp.float32)
            n0 = jnp.zeros((B,), jnp.float32)
            xf8 = jnp.zeros((self.R_SUB * 2, B), jnp.int8)
            sel_s = []
            for si in range(S):
                fn, _ = lanes[si]
                n0_ov = jnp.repeat(state["n0_refined"][:, si], FP)
                out = jax.vmap(
                    fn, in_axes=(0, 0, 0, 0, 0),
                    out_axes={"llrs": -1, "fine": 0, "n0": 0, "xfq": -1},
                )(hdr_l, pay_l, nxtph_l, corrected_l, n0_ov)
                sel = valid_l & (pls_l == int(pls_arr[si]))
                sel_s.append(sel)
                llr = jnp.where(sel[None, :], out["llrs"], llr)
                fine = jnp.where(sel, out["fine"], fine)
                n0 = jnp.where(sel, out["n0"], n0)
                xf8 = jnp.where(sel[None, :], out["xfq"], xf8)
            llr8 = quantize_llrs(llr)                    # (N, B) int8

            meta = jnp.stack(
                [
                    jnp.repeat(jnp.arange(C, dtype=jnp.int32), FP),
                    d_seq.reshape(B),
                ],
                axis=1,
            )                                            # (B, 2)
            sels = jnp.stack(sel_s)                      # (S, B)

            # ---- lock maintenance over walked slots ----
            def ul_body(u, x):
                act, m = x
                return jnp.where(
                    act,
                    jnp.where(m > plsync.THRESHOLD_LOCKED, 0, u + 1),
                    u,
                ), None

            unlock, _ = jax.lax.scan(
                ul_body, state["unlock_cnt"], (valid, slots["metric"])
            )
            locked = unlock < cfg.unlock_thresh

            # ---- coarse CFO accumulation: FULL-PLHEADER always. The walk
            # differentially decodes every PLSC even before CFO correction,
            # so modulation removal over all 90 symbols is available from
            # the first frame — unlike the reference, which must start
            # SOF-only (plsync_cc_impl.cc:510-566). The SOF-only (25-lag)
            # estimator's noise+ISI floor at coarse_period accumulation is
            # ~1e-4..8e-4 (tools/probes/sof bias study, r5) — comparable to
            # FINE_FOFFSET_CORR_RANGE, so one unlucky fire could latch a
            # false rotator CFO that the aliasing-limited pilotless fine
            # (range 1/(2L) ~ 1.5e-5 for normal frames) can never observe.
            # The 89-lag full estimator is ~30x finer.
            r_full = plsync.coarse_autocorr(
                slots["own_hdr"].reshape(K * C, 90, 2),
                pls_s.reshape(K * C), full=True,
            ).reshape(K, C, 89, 2)
            def coarse_body(carry, x):
                acc_f, cf, settle, corrected, coarse_est, nc = carry
                act, r_f = x
                in_settle = settle > 0
                settle = jnp.where(act & in_settle, settle - 1, settle)
                skip_k = (~act) | (in_settle & (~corrected))
                acc_f = jnp.where(
                    skip_k[:, None, None], acc_f, acc_f + r_f
                )
                cf = jnp.where(skip_k, cf, cf + 1)
                fire = cf >= cfg.coarse_period
                est_new = plsync.coarse_foffset_from_autocorr(acc_f)
                coarse_est = jnp.where(fire, est_new, coarse_est)
                corrected = jnp.where(
                    fire,
                    jnp.abs(est_new) < plsync.FINE_FOFFSET_CORR_RANGE,
                    corrected,
                )
                acc_f = jnp.where(fire[:, None, None], 0.0, acc_f)
                cf = jnp.where(fire, 0, cf)
                return (acc_f, cf, settle, corrected, coarse_est,
                        nc | fire), None

            (acc_f, cf, settle, corrected, coarse_est, new_coarse), \
                _ = jax.lax.scan(
                    coarse_body,
                    (state["coarse_acc"],
                     state["coarse_frames"], state["settle"],
                     state["coarse_corrected"], state["coarse_foffset"],
                     jnp.zeros((C,), bool)),
                    (valid, r_full),
                )

            # ---- closed-loop rotator update (block granular) ----
            fine_cf = fine.reshape(C, FP)
            fine_last = jnp.zeros((C,), jnp.float32)
            have_fine = jnp.zeros((C,), bool)
            for j in range(FP):
                v = d_valid[:, j]
                fine_last = jnp.where(v, fine_cf[:, j], fine_last)
                have_fine = have_fine | v
            cum = state["cum_foffset"]
            rot_inc = state["rot_inc"]
            can = settle <= 0
            # a fired coarse estimate above the re-application floor takes
            # precedence EVEN WHEN CORRECTED: the pilotless per-frame fine
            # aliases at 1/(2L), so only the continuously-running coarse
            # can close residuals between ~1e-5 and the fine range — the
            # closed loop holds |residual| under the fine capture range
            # instead of latching whatever the first coarse fire left
            coarse_due = new_coarse & (
                jnp.abs(coarse_est) > self._coarse_reapply_min
            )
            fine_ok = have_fine & (
                jnp.abs(fine_last) < self._coarse_reapply_min
            )
            adj = jnp.where(
                coarse_due,
                coarse_est,
                jnp.where(corrected & fine_ok, fine_last, 0.0),
            )
            adj = jnp.where(can, adj, 0.0)
            applied = adj != 0.0
            cum = cum + adj
            rot_inc = jnp.where(
                applied, -cum * (2 * np.pi) / cfg.sps, rot_inc
            )
            settle = jnp.where(applied, self._settle0, settle)
            wipe = applied & (~corrected)
            acc_f = jnp.where(wipe[:, None, None], 0.0, acc_f)
            cf = jnp.where(wipe, 0, cf)

            new_state = dict(
                state,
                fp_right=jnp.minimum(fp_right, self.N_SYM),
                pls=new_pls,
                seq=state["seq"] + counts,
                coarse_acc=acc_f,
                coarse_frames=cf,
                coarse_foffset=coarse_est,
                coarse_corrected=corrected,
                cum_foffset=cum,
                settle=settle,
                rot_inc=rot_inc,
                unlock_cnt=unlock,
            )
            # frame start fell off the symbol ring (e.g. a channel whose
            # chain died and stopped consuming): flag for re-acquisition
            sym_lost = fp_right > self.N_SYM - 94
            stats = {
                "locked": locked,
                "sym_lost": sym_lost,
                "metric": jnp.where(
                    n_walked > 0,
                    jnp.sum(jnp.where(valid, slots["metric"], 0.0), axis=0)
                    / jnp.maximum(n_walked, 1),
                    0.0,
                ),
                "n_walked": n_walked,
                "frames": jnp.sum(is_data.astype(jnp.int32)),
                "dummies": jnp.sum((valid & is_dummy).astype(jnp.int32)),
                "rejected": jnp.sum(rejected.astype(jnp.int32)),
                "coarse_foffset": coarse_est,
                "coarse_corrected": corrected,
                "cum_foffset": cum,
                "fine_foffset": fine_last,
                "n0": n0.reshape(C, FP)[:, 0],
                "seq": new_state["seq"],
                "fp_right": fp_right,
                "overflow": overflow,
                "underflow": underflow,
            }
            return new_state, llr8, xf8, meta, sels, stats

        def make_step_b(si):
            """One PLS's queue append + pooled FEC drain + refined-N0
            update as its OWN jitted program: each embeds exactly one
            Pallas LDPC kernel, keeping every program under the remote-
            compile upload limit (one program with all S kernels plus the
            refinement math exceeds it at 64 channels); the extra
            dispatches pipeline away in the sustained loop."""

            def step_b_si(state, llr8, xf8, meta, sels):
                qllr, qmeta, qxf, qfill = (
                    state["qllr"], state["qmeta"], state["qxf"],
                    state["qfill"],
                )
                n0_ref = state["n0_refined"]
                sel = sels[si]
                n_s = jnp.sum(sel.astype(jnp.int32))
                # stable compaction of selected lanes to the front (exact
                # one-hot permutation matmul; lane gathers serialize)
                lrank = jnp.cumsum(sel.astype(jnp.int32)) - 1
                perm = (
                    sel[:, None]
                    & (lrank[:, None] == jnp.arange(B)[None, :])
                ).astype(jnp.float32)                    # (B, B)
                # bf16 is exact here: operands are int8 in [-127, 127]
                # (< 2^8, exactly representable) and each output row of a
                # permutation matmul has exactly one nonzero product, so
                # no summation error either — and bf16 runs the MXU at
                # full rate where HIGHEST pays multi-pass f32
                comp = jnp.matmul(
                    llr8.astype(jnp.bfloat16), perm.astype(jnp.bfloat16)
                ).astype(jnp.int8)                       # (N, B)
                compx = jnp.matmul(
                    xf8.astype(jnp.bfloat16), perm.astype(jnp.bfloat16)
                ).astype(jnp.int8)                       # (R_SUB*2, B)
                compm = jnp.matmul(
                    perm.T, meta.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST,
                ).astype(jnp.int32)                      # (B, 2)
                q = jax.lax.dynamic_update_slice(
                    qllr[si], comp, (0, qfill[si])
                )
                qx = jax.lax.dynamic_update_slice(
                    qxf[si], compx, (0, qfill[si])
                )
                qm = jax.lax.dynamic_update_slice(
                    qmeta[si], compm, (qfill[si], 0)
                )
                fill = qfill[si] + n_s

                def decode(q, qm, qx, n0col, fill, _si=si):
                    kb, nc, iters, snr = fec_branches[_si](
                        q[:, : self.B_fec], qx[:, : self.B_fec]
                    )
                    # per-channel mean over this batch's BCH-clean lanes
                    # -> refined N0 carry (reference LLR-PDU feedback)
                    chan = qm[: self.B_fec, 0]
                    good = (snr > 0)[:, None]
                    ohc = (
                        (chan[:, None] == jnp.arange(C)[None, :]) & good
                    ).astype(jnp.float32)                # (B_fec, C)
                    cnt = jnp.sum(ohc, axis=0)
                    mean = (
                        jnp.sum(ohc * snr[:, None], axis=0)
                        / jnp.maximum(cnt, 1.0)
                    )
                    n0col = jnp.where(
                        cnt > 0, 1.0 / jnp.maximum(mean, 1e-9), n0col
                    )
                    # a channel whose lanes in this batch ALL failed BCH
                    # drops its refined carry (0 = use data-aided): a
                    # stale overconfident N0 from before an SNR drop
                    # (rain fade) would otherwise keep scaling LLRs hot
                    # while every decode fails, with only a full unlock
                    # able to clear it (r4 advisor, medium)
                    cnt_all = jnp.sum(
                        (chan[:, None] == jnp.arange(C)[None, :])
                        .astype(jnp.float32), axis=0
                    )
                    n0col = jnp.where(
                        (cnt_all > 0) & (cnt == 0), 0.0, n0col
                    )
                    q2 = jnp.concatenate(
                        [q[:, self.B_fec:],
                         jnp.zeros((self.n_ldpc, self.B_fec), jnp.int8)],
                        axis=1,
                    )
                    qx2 = jnp.concatenate(
                        [qx[:, self.B_fec:],
                         jnp.zeros((self.R_SUB * 2, self.B_fec), jnp.int8)],
                        axis=1,
                    )
                    qm2 = jnp.concatenate(
                        [qm[self.B_fec:],
                         jnp.zeros((self.B_fec, 2), jnp.int32)],
                        axis=0,
                    )
                    return (kb, qm[: self.B_fec], nc, iters, q2, qm2, qx2,
                            n0col, fill - self.B_fec)

                def skip(q, qm, qx, n0col, fill):
                    return (
                        jnp.zeros((self.B_fec, self.kb_max), jnp.uint8),
                        jnp.zeros((self.B_fec, 2), jnp.int32),
                        jnp.zeros((self.B_fec,), jnp.int32),
                        jnp.int32(0), q, qm, qx, n0col, fill,
                    )

                def drain_body(carry, _):
                    q, qm, qx, n0col, fill = carry
                    fire = fill >= self.B_fec
                    kb, md, nc, iters, q, qm, qx, n0col, fill = jax.lax.cond(
                        fire, decode, skip, q, qm, qx, n0col, fill
                    )
                    return (q, qm, qx, n0col, fill), (kb, md, nc, fire,
                                                      iters)

                (q, qm, qx, n0col, fill), \
                    (kb_d, meta_d, nc_d, fired_d, it_d) = jax.lax.scan(
                        drain_body, (q, qm, qx, n0_ref[:, si], fill),
                        None, length=self.DRAIN,
                    )
                new_state = dict(
                    state,
                    qllr=qllr.at[si].set(q),
                    qmeta=qmeta.at[si].set(qm),
                    qxf=qxf.at[si].set(qx),
                    qfill=qfill.at[si].set(fill),
                    n0_refined=n0_ref.at[:, si].set(n0col),
                )
                outputs = {
                    "kb": kb_d,          # (DRAIN, B_fec, kb_max)
                    "meta": meta_d,      # (DRAIN, B_fec, 2)
                    "n_corr": nc_d,      # (DRAIN, B_fec)
                    "fired": fired_d,    # (DRAIN,)
                }
                stats_b = {"ldpc_iters": jnp.max(it_d),
                           "n0_refined": new_state["n0_refined"]}
                return new_state, outputs, stats_b

            return step_b_si

        return step_a, [make_step_b(si) for si in range(S)]

    # ---------------- flush ----------------

    def flush(self, state):
        """Decode queue remainders (sub-batch, masked) at end of stream.
        Returns (state', list over S of (kbytes, meta, n_corr, count))."""
        if self._flush_fns is None:
            fns = []
            for si in range(S := self.S):
                branch = self._fec_branch(si)

                def fl(q, qm, fill, _b=branch):
                    kb, nc, _it, _snr = _b(
                        q[:, : self.B_fec],
                        jnp.zeros((self.R_SUB * 2, self.B_fec), jnp.int8),
                    )
                    return kb, qm[: self.B_fec], nc

                fns.append(fec_jit(fl))
            self._flush_fns = fns
        outs = []
        for si in range(self.S):
            fill = int(np.asarray(state["qfill"][si]))
            taken = []
            q = state["qllr"][si]
            qm = state["qmeta"][si]
            while fill > 0:
                n = min(fill, self.B_fec)
                kb, md, nc = self._flush_fns[si](q, qm, fill)
                taken.append((np.asarray(kb)[:n], np.asarray(md)[:n],
                              np.asarray(nc)[:n]))
                q = jnp.concatenate(
                    [q[:, self.B_fec:],
                     jnp.zeros((self.n_ldpc, self.B_fec), jnp.int8)],
                    axis=1,
                )
                qm = jnp.concatenate(
                    [qm[self.B_fec:], jnp.zeros((self.B_fec, 2), jnp.int32)],
                    axis=0,
                )
                fill -= n
            outs.append(taken)
        state = dict(
            state,
            qllr=jnp.zeros_like(state["qllr"]),
            qmeta=jnp.zeros_like(state["qmeta"]),
            qxf=jnp.zeros_like(state["qxf"]),
            qfill=jnp.zeros_like(state["qfill"]),
        )
        return state, outs

    # ---------------- priming ----------------

    def prime(self, iq_prefix: np.ndarray, strict: bool = True):
        """Acquire each channel from the first samples: dense CFO-robust
        timing metric, SOF peak, differential PLSC decode, whole-symbol
        rewind so the chain carry points at a known frame start."""
        C, sps = self.n_channels, self.cfg.sps
        n_out, n_fe = self.n_out, self._n_fe
        cfg = self.cfg
        if iq_prefix.shape[0] != C:
            raise ValueError(f"expected {C} channels")
        if iq_prefix.shape[1] < n_fe:
            raise ValueError(f"prime needs >= {n_fe} samples per channel")

        @jax.jit
        def fe0(iq):
            gain = jnp.ones((C,), jnp.float32)
            if cfg.agc:
                mag = jnp.mean(
                    jnp.sqrt(iq[..., 0] ** 2 + iq[..., 1] ** 2), axis=-1
                )
                gain = cfg.agc_ref / jnp.maximum(mag, 1e-12)
                iq = iq * gain[:, None, None]
            ff = jax.tree.map(
                lambda x: jnp.stack([x] * C), self.sync.init_state()
            )
            ff2, syms, consumed = self.sync.step_batched(ff, iq, n_out)
            hist = jnp.zeros((C, 90, 2), jnp.float32)
            metric = jax.vmap(
                lambda s, h: plsync.timing_metric(s, h)[0]
            )(syms, hist)
            return ff2, syms, consumed, metric, iq, gain

        @jax.jit
        def decode_hdrs(hdrs):
            mask = jnp.asarray(self._search_mask)
            pls, _ = plsync.plsc_decode_diff(hdrs, enabled_mask=mask)
            return pls

        block0 = cplx.from_np(iq_prefix[:, :n_fe]).astype(np.float32)
        ff2, syms_d, consumed_d, metric_d, rot_d, gain_d = fe0(
            jnp.asarray(block0)
        )
        syms = np.asarray(syms_d)
        consumed = np.asarray(consumed_d)
        metric = np.asarray(metric_d)

        state = self.init_state_np()
        prime_ok = np.ones((C,), bool)
        sof = np.zeros((C,), np.int64)
        for c in range(C):
            win = metric[c, : self.L_max + 90]
            p = int(np.argmax(win))
            if win[p] < plsync.THRESHOLD_UNLOCKED or p < 89:
                if strict:
                    raise RuntimeError(
                        f"prime: no SOF on channel {c} (peak {win[p]:.1f})"
                    )
                prime_ok[c] = False
                sof[c] = 90
                continue
            sof[c] = p - 89
        hdrs = np.stack([
            cplx.from_np(np.zeros(90, np.complex64))
            if syms.shape[1] < sof[c] + 90
            else syms[c, sof[c]: sof[c] + 90]
            for c in range(C)
        ])
        pls = np.asarray(decode_hdrs(jnp.asarray(hdrs)))

        for c in range(C):
            if not prime_ok[c]:
                continue
            # rewind so fp_right marks the frame start; keep ALL symbols
            # from the SOF on in the ring, the raw tail in sbuf
            keep_syms = n_out - int(sof[c])
            state["symbuf"][c, :, self.N_SYM - n_out:] = syms[c].T
            state["symfill"][c] = n_out
            state["fp_right"][c] = keep_syms
            state["pls"][c] = int(pls[c])
            tail = np.asarray(rot_d)[c, int(consumed[c]):n_fe]
            state["sbuf"][c, self.N_BUF - tail.shape[0]:] = tail
            state["sfill"][c] = tail.shape[0]
        state["ff_tau"] = np.asarray(ff2.tau)
        state["ff_rate"] = np.asarray(ff2.rate)
        state["ff_init"] = np.asarray(ff2.initialized)
        state["agc_gain"] = np.asarray(gain_d)
        self.prime_ok = prime_ok
        return jax.device_put(state)

    # ---------------- re-acquisition (device-side) ----------------

    def _build_reacquire(self):
        """Masked device-side re-acquisition from the latest raw samples
        (the VCM analog of StreamReceiver._build_reacquire): fresh timing
        state, dense CFO-robust metric, differential PLSC decode of the
        found header, spliced into the carried state with masked merges.
        CFO knowledge (rotator increment, corrected flag) survives; frame/
        timing alignment, the chain carry, and the coarse accumulators
        reset. Queues and seq counters are untouched — in-flight frames
        still decode; the host reorderer skips the lost seq range."""
        C = self.n_channels
        n_out, n_fe = self.n_out, self._n_fe
        cfg = self.cfg

        def reacquire(state, iq_tail, mask):
            gain = state["agc_gain"]
            x = iq_tail * gain[:, None, None] if cfg.agc else iq_tail
            rot, phase = jax.vmap(rotate_block)(
                x, jnp.zeros((C,), jnp.float32), state["rot_inc"]
            )
            ff0 = jax.tree.map(
                lambda v: jnp.stack([v] * C), self.sync.init_state()
            )
            ff2, syms, consumed = self.sync.step_batched(ff0, rot, n_out)
            hist = jnp.zeros((C, 90, 2), jnp.float32)
            metric = jax.vmap(
                lambda s, h: plsync.timing_metric(s, h)[0]
            )(syms, hist)
            win = metric[:, : self.L_max + 90]
            p = jnp.argmax(win, axis=1).astype(jnp.int32)
            found = (
                jnp.take_along_axis(win, p[:, None], axis=1)[:, 0]
                >= plsync.THRESHOLD_UNLOCKED
            ) & (p >= 89)
            sof = jnp.clip(p - 89, 0, n_out - 90)
            hdr = jax.vmap(
                lambda s, i: jax.lax.dynamic_slice(s, (i, 0), (90, 2))
            )(syms, sof)
            smask = jnp.asarray(self._search_mask)
            pls, _ = plsync.plsc_decode_diff(hdr, enabled_mask=smask)

            pad = jnp.zeros((C, 2, self.N_SYM - n_out), jnp.float32)
            symbuf = jnp.concatenate(
                [pad, jnp.transpose(syms, (0, 2, 1))], axis=2
            )
            tail_pad = jnp.zeros(
                (C, max(self.N_BUF - n_fe, 0), 2), jnp.float32
            )
            sbuf = jnp.concatenate([tail_pad, rot], axis=1)[:, -self.N_BUF:]
            sfill = n_fe - consumed

            ok = mask & found

            def mk(new, old):
                m_b = ok.reshape((C,) + (1,) * (old.ndim - 1))
                return jnp.where(m_b, new, old)

            zc = jnp.zeros((C,), jnp.int32)
            new_state = dict(
                state,
                sbuf=mk(sbuf, state["sbuf"]),
                sfill=mk(sfill, state["sfill"]),
                ff_tau=mk(ff2.tau, state["ff_tau"]),
                ff_rate=mk(ff2.rate, state["ff_rate"]),
                ff_init=mk(ff2.initialized, state["ff_init"]),
                rot_phase=mk(phase, state["rot_phase"]),
                symbuf=mk(symbuf, state["symbuf"]),
                symfill=mk(jnp.full((C,), n_out, jnp.int32),
                           state["symfill"]),
                fp_right=mk((n_out - sof).astype(jnp.int32),
                            state["fp_right"]),
                pls=mk(pls.astype(jnp.int32), state["pls"]),
                coarse_acc=mk(jnp.zeros_like(state["coarse_acc"]),
                              state["coarse_acc"]),
                coarse_frames=mk(zc, state["coarse_frames"]),
                unlock_cnt=mk(zc, state["unlock_cnt"]),
                # refined N0 is stale after re-acquisition: back to
                # data-aided until the next decoded batch
                n0_refined=mk(jnp.zeros_like(state["n0_refined"]),
                              state["n0_refined"]),
            )
            return new_state, ok

        return reacquire

    def reacquire(self, state, iq_tail, mask):
        if self._reacquire is None:
            self._reacquire = jax.jit(
                self._build_reacquire(), donate_argnums=0
            )
        return self._reacquire(state, iq_tail, mask)


class VCMStreamEngine:
    """Product host receiver around ``VCMStreamReceiver``: chunked input,
    soft priming, automatic re-acquisition, per-channel seq-ordered TS
    stitching — the ACM/VCM counterpart of ``rx.stream.StreamEngine``
    (same ``receive()/get_stats()`` surface as the host receivers)."""

    def __init__(self, cfg: RxConfig, n_channels: int = 1,
                 frames_per_step: int = 2, fec_lanes: int = None,
                 gap_skip_steps: int = 8):
        from ..spec.bb_frame import BBFrameParser
        from .receiver import Receiver

        self.cfg = cfg
        self.sr = VCMStreamReceiver(
            cfg, n_channels=n_channels, frames_per_step=frames_per_step,
            fec_lanes=fec_lanes,
        )
        self.n_channels = C = n_channels
        self.stats = RxStats()
        self._get_stats_impl = Receiver.get_stats
        self.bb_parsers = [BBFrameParser() for _ in range(C)]
        self.bb_parser = self.bb_parsers[0]
        self._buf = np.empty((C, 0), np.complex64)
        self._primed = False
        self.state = None
        self._was_locked = np.zeros((C,), bool)
        # per-channel seq-ordered delivery
        self._reorder = [dict() for _ in range(C)]
        self._next_seq = np.zeros((C,), np.int64)
        self._blocked = np.zeros((C,), np.int32)
        self._gap_skip_steps = gap_skip_steps
        self.gaps_skipped = 0
        # re-acquisition policy (rolling raw-block history, like
        # StreamSession)
        self._blk_hist = []
        self._nblk = int(np.ceil(self.sr._n_fe / self.sr.n_in)) + 1
        self.need = np.zeros((C,), bool)
        self.reacquired = 0
        # per-PLS monitoring (ACMReceiver.get_stats parity)
        self._per_pls = [
            {"fec_frames": 0, "fec_errors": 0} for _ in range(self.sr.S)
        ]
        self._n0_ref = np.zeros((C, self.sr.S), np.float32)

    def get_stats(self, sym_rate: float = None) -> dict:
        """Reference-shaped stats plus coherent per-PLS sections (the
        ACMReceiver.get_stats contract): refined SNR, frame and error
        counters per expected PLS."""
        base = self._get_stats_impl(self, sym_rate)
        per_plsync, per_fec = {}, {}
        for si, pls in enumerate(self.sr.pls_set):
            st = self._per_pls[si]
            if st["fec_frames"] == 0:
                continue
            info = self.sr._infos[si]
            const, rate = _MODCODS[info.modcod]
            name = f"{const.lower()}{rate}"
            # refined N0 averaged over the channels that have decoded
            # this PLS (nonzero carry) — channel 0 alone may not even
            # carry it on multi-channel engines (r4 advisor, low)
            col = self._n0_ref[:, si]
            n0 = float(col[col > 0].mean()) if (col > 0).any() else 0.0
            per_plsync[pls] = {"modcod": name, "frames": st["fec_frames"]}
            per_fec[pls] = {
                "modcod": name,
                "frames": st["fec_frames"],
                "errors": st["fec_errors"],
                "snr": (
                    float(10 * np.log10(1.0 / n0)) if n0 > 0 else None
                ),
            }
        base["plsync"]["per_pls"] = per_plsync
        base["fec"]["per_pls"] = per_fec
        return base

    # ---- output handling ----

    def _ingest(self, outputs):
        kb = np.asarray(outputs["kb"])          # (S, DRAIN, B, kb_max)
        meta = np.asarray(outputs["meta"])
        ncorr = np.asarray(outputs["n_corr"])
        fired = np.asarray(outputs["fired"])
        s = self.stats
        for si in range(self.sr.S):
            for d in range(self.sr.DRAIN):
                if not fired[si, d]:
                    continue
                self._ingest_batch(si, kb[si, d], meta[si, d], ncorr[si, d])

    def _ingest_batch(self, si, kb, meta, ncorr):
        s = self.stats
        n = kb.shape[0]
        s.ldpc_frames += n
        s.bch_frames += n
        s.bch_frame_errors += int(np.sum(ncorr < 0))
        s.bch_corrections += int(np.sum(np.maximum(ncorr, 0)))
        self._per_pls[si]["fec_frames"] += n
        self._per_pls[si]["fec_errors"] += int(np.sum(ncorr < 0))
        nbytes = self.sr._fecs[si].kbch // 8
        scr = self.sr.bb_scramble[si]
        for i in range(n):
            c, seq = int(meta[i, 0]), int(meta[i, 1])
            self._reorder[c][seq] = kb[i, :nbytes] ^ scr
        return n

    def _deliver(self):
        """Pop contiguous seq runs per channel into the BB parsers."""
        out = [[] for _ in range(self.n_channels)]
        for c in range(self.n_channels):
            buf = self._reorder[c]
            progressed = True
            while progressed:
                progressed = False
                nxt = int(self._next_seq[c])
                if nxt in buf:
                    out[c].append(self.bb_parsers[c].push(buf.pop(nxt)))
                    self._next_seq[c] += 1
                    self._blocked[c] = 0
                    progressed = True
                elif buf and self._blocked[c] >= self._gap_skip_steps:
                    # frames lost to a re-acquisition (or rejected): skip
                    # forward; the BB parser re-syncs via SYNCD
                    self._next_seq[c] = min(buf)
                    self.gaps_skipped += 1
                    progressed = True
            if buf:
                self._blocked[c] += 1
        return out

    def _update_stats(self, stats):
        s = self.stats
        locked = np.asarray(stats["locked"])
        now_locked = bool(locked.all())
        if now_locked and not s.locked:
            s.lock_cnt += 1
            s.lock_time = time.time()
        if (~locked & self._was_locked).any():
            s.unlock_cnt += int((~locked & self._was_locked).sum())
        self._was_locked = locked
        s.locked = now_locked
        s.frame_cnt += int(stats["frames"])
        s.sof_cnt += int(np.sum(np.asarray(stats["n_walked"])))
        s.dummy_cnt += int(stats["dummies"])
        s.rejected_cnt += int(stats["rejected"])
        s.coarse_foffset = float(np.asarray(stats["coarse_foffset"])[0])
        s.fine_foffset = float(np.asarray(stats["fine_foffset"])[0])
        s.cum_freq_offset = float(np.asarray(stats["cum_foffset"])[0])
        s.coarse_corrected = bool(
            np.asarray(stats["coarse_corrected"]).all()
        )
        n0 = float(np.asarray(stats["n0"])[0])
        if n0 > 0:
            s.snr_db = float(10 * np.log10(1.0 / max(n0, 1e-12)))
        s.ldpc_total_iters += int(np.max(np.asarray(stats["ldpc_iters"])))
        self._n0_ref = np.asarray(stats["n0_refined"])

    # ---- the host loop ----

    def receive(self, iq: np.ndarray, flush: bool = True):
        """Process IQ samples; returns TS bytes (flat array single-channel,
        list of arrays multi-channel)."""
        iq = np.asarray(iq, dtype=np.complex64)
        if iq.ndim == 1:
            iq = iq[None]
        if iq.shape[0] != self.n_channels:
            raise ValueError(f"expected {self.n_channels} channel rows")
        self._buf = np.concatenate([self._buf, iq], axis=1)
        sr = self.sr
        ts = [[] for _ in range(self.n_channels)]

        if not self._primed and self._buf.shape[1] >= sr._n_fe:
            self.state = sr.prime(self._buf[:, : sr._n_fe], strict=False)
            self.need = ~sr.prime_ok
            self._buf = self._buf[:, sr._n_fe:]
            self._primed = True

        while self._primed and self._buf.shape[1] >= sr.n_in:
            blk = cplx.from_np(self._buf[:, : sr.n_in]).astype(np.float32)
            self._buf = self._buf[:, sr.n_in:]
            dblk = jnp.asarray(blk)
            self._blk_hist.append(dblk)
            if len(self._blk_hist) > self._nblk:
                self._blk_hist.pop(0)
            self.state, outputs, stats = sr.step(self.state, dblk)
            self._update_stats(stats)
            self._ingest(outputs)
            for c, parts in enumerate(self._deliver()):
                ts[c].extend(parts)
            self.need |= ~np.asarray(stats["locked"])
            self.need |= np.asarray(stats["underflow"])
            self.need |= np.asarray(stats["overflow"])
            self.need |= np.asarray(stats["sym_lost"])
            have = sum(b.shape[1] for b in self._blk_hist)
            if self.need.any() and have >= sr._n_fe:
                tail = jnp.concatenate(self._blk_hist, axis=1)[:, -sr._n_fe:]
                self.state, ok = sr.reacquire(
                    self.state, tail, jnp.asarray(self.need)
                )
                ok = np.asarray(ok)
                self.reacquired += int(ok.sum())
                self.need &= ~ok

        if flush and self._primed:
            self.state, rem = sr.flush(self.state)
            for si, taken in enumerate(rem):
                for kb, md, nc in taken:
                    self._ingest_batch(si, kb, md, nc)
            # final delivery: skip any unfilled gaps
            self._blocked[:] = self._gap_skip_steps
            for c, parts in enumerate(self._deliver()):
                ts[c].extend(parts)
        out = [
            np.concatenate(t) if t else np.empty(0, np.uint8) for t in ts
        ]
        return out[0] if self.n_channels == 1 else out
