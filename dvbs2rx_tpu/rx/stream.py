"""Fully device-resident locked steady-state receiver: IQ -> BBFRAME bytes.

``Receiver`` (receiver.py) is the general host-orchestrated pipeline:
acquisition, lock maintenance, and control-loop state live on the host, and
every step round-trips scalars through the (high-latency) dispatch path.
That is correct but caps *sustained* throughput at the dispatch latency.

``StreamReceiver`` is the TPU-first steady-state engine: ONE jitted step
``state, iq -> state', bbframes, stats`` carrying ALL receiver state
(sample buffer, timing-loop state, rotator NCO, frame alignment, coarse/
fine CFO tracking, SNR refinement) as a donated device pytree. Steps chain
on-device with no host round trip, so a host loop can keep dozens of steps
in flight and sustained throughput approaches the fused compute bound
(bench.py measures both). The same step jits under a channel-sharded mesh:
this is the "one sharded IQ->TS step" of SURVEY.md §2.7 — data parallelism
over channels, every per-channel control decision vectorized with masks
instead of host branches.

Scope: CCM/single-PLS steady state (the reference's field configuration,
``docs/support.md:53-61``), feed-forward (O&M) timing recovery. Acquisition
happens once in ``prime()`` (dense timing metric over the first block, the
same math the host Receiver uses); afterwards frame alignment is *tracked*
on device with a three-point early/on-time/late frame-metric discriminator
(the frame-alignment analog of a DLL) that absorbs ffsync symbol slips.
Loss of lock is flagged in stats (``locked``); re-acquisition is a host
policy (re-prime), as in the reference where the block graph keeps running
and frame sync re-searches (``lib/pl_frame_sync.cc:183-217``).

Reference mapping: the host loop of ``Receiver._process_frames``
(coarse/fine/closed-loop semantics, ``lib/plsync_cc_impl.cc:494-727``)
re-expressed as masked vector updates over the channel axis.
"""

import queue as _queue
import threading
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import cplx, plsync
from ..ops.crc8_dev import packet_validity
from ..ops.demap import quantize_llrs
from ..ops.ffsync import FeedForwardSync, FFSyncState
from ..ops.frontend import rotate_block
from ..parallel.batch import make_lane_fn
from .receiver import Receiver, RxConfig, _snr_refine
from ..utils.runtime import fec_jit

TAIL = 182          # carried symbols: one extended header window + margin
FP_MIN, FP_MAX = 2, 90
FP0 = 46            # nominal frame-start index inside the carried tail


class StreamReceiver:
    """Locked steady-state multi-channel receiver as one device step."""

    def __init__(self, cfg: RxConfig, n_channels: int, frames_per_step: int = 2,
                 mesh: Mesh = None):
        if cfg.sym_sync_impl != "ffw":
            raise ValueError("StreamReceiver requires sym_sync_impl='ffw'")
        self.cfg = cfg
        self.mesh = mesh
        self._rx = Receiver(cfg)
        self.frame_len = L = self._rx.frame_len
        self.payload_len = self._rx.payload_len
        self.n_channels = C = n_channels
        self.F = F = frames_per_step
        self.n_out = F * L                      # symbols per step
        self.n_in = self.n_out * cfg.sps        # input samples per step
        self.sync = FeedForwardSync(
            sps=cfg.sps, rolloff=cfg.rolloff, max_block=self.n_out,
            mf_precision=cfg.mf_precision,
        )
        self._hist = self.sync.history()
        self._n_fe = self.n_in + self._hist     # front-end slice length
        # sample buffer: steady occupancy = history + rewind (< one frame,
        # from priming) on top of the per-step fill
        self.N_BUF = self.n_in + self._hist + L * cfg.sps + 1024
        # settle horizon: symbols in flight downstream of the rotator when
        # a correction lands (carried tail + buffered samples), in frames
        self._settle0 = int((TAIL + self.N_BUF / cfg.sps) // L + 2)
        self._lane = make_lane_fn(cfg, self._rx._descr_np)

        step = self._build_step()
        self.raw_step = step      # unjitted, for composition (bench source)
        self._reacquire = None    # built lazily (compiles only when needed)
        if mesh is not None:
            def leaf_spec(x):
                # channel-led arrays shard over "ch"; scalar aggregates
                # replicate. Outputs are pinned too so the donated state
                # round-trips with a stable sharding.
                nd = getattr(x, "ndim", 0)
                if nd >= 1 and x.shape[0] == n_channels:
                    return NamedSharding(
                        mesh, P(*(["ch"] + [None] * (nd - 1)))
                    )
                return NamedSharding(mesh, P())

            state_tmpl = self.init_state_np()
            state_sh = jax.tree.map(leaf_spec, state_tmpl)
            iq_sh = NamedSharding(mesh, P("ch", None, None))
            out_shapes = jax.eval_shape(
                step, state_tmpl,
                jax.ShapeDtypeStruct((n_channels, self.n_in, 2), jnp.float32),
            )
            out_sh = jax.tree.map(leaf_spec, out_shapes)
            self.step = fec_jit(
                step, in_shardings=(state_sh, iq_sh), out_shardings=out_sh,
                donate_argnums=0,
            )
        else:
            self.step = fec_jit(step, donate_argnums=0)

    # ---------------- state ----------------

    def init_state_np(self):
        """Zero state as a host pytree (template for shardings/priming)."""
        C = self.n_channels
        return {
            "sbuf": np.zeros((C, self.N_BUF, 2), np.float32),
            "sfill": np.zeros((C,), np.int32),
            "ff_tau": np.zeros((C,), np.float32),
            "ff_rate": np.zeros((C,), np.float32),
            "ff_init": np.zeros((C,), np.int32),
            "rot_phase": np.zeros((C,), np.float32),
            "rot_inc": np.zeros((C,), np.float32),
            "agc_gain": np.ones((C,), np.float32),
            "sym_tail": np.zeros((C, TAIL, 2), np.float32),
            "fp": np.full((C,), FP0, np.int32),
            "coarse_acc": np.zeros((C, 89, 2), np.float32),
            "coarse_frames": np.zeros((C,), np.int32),
            "coarse_foffset": np.zeros((C,), np.float32),
            "coarse_corrected": np.zeros((C,), bool),
            "cum_foffset": np.zeros((C,), np.float32),
            "settle": np.zeros((C,), np.int32),
            "unlock_cnt": np.zeros((C,), np.int32),
            "n0_refined": np.zeros((C,), np.float32),
        }

    def put_iq(self, iq_block):
        """Place one (C, n_in, 2) float block on device (channel-sharded
        under a mesh)."""
        if self.mesh is None:
            return jnp.asarray(iq_block)
        return jax.device_put(
            iq_block, NamedSharding(self.mesh, P("ch", None, None))
        )

    def put_state(self, state_np):
        if self.mesh is None:
            return jax.device_put(state_np)
        return jax.device_put(
            state_np,
            jax.tree.map(
                lambda x: NamedSharding(
                    self.mesh, P(*(["ch"] + [None] * (x.ndim - 1)))
                ),
                state_np,
            ),
        )

    # ---------------- the step ----------------

    def _build_step(self):
        cfg = self.cfg
        C, F, L = self.n_channels, self.F, self.frame_len
        Lp = self.payload_len
        B = C * F
        n_in, n_out, n_fe = self.n_in, self.n_out, self._n_fe
        sps = cfg.sps
        lane = self._lane
        W_sym = F * L + 94                      # window span from fp-2
        settle0 = self._settle0

        def frontend(state, iq):
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
            # RIGHT-ALIGNED sample buffer: valid data always ends at index
            # N_BUF, so the append is a STATIC shift-by-n_in concatenation
            # and "consuming" samples is pure bookkeeping (sfill shrinks) —
            # no per-channel dynamic update/shift of the big buffer (the
            # vmapped dynamic slice/update lowered to per-channel while
            # loops costing ~3.2 ms/step at 64 channels). The only dynamic
            # access left is the per-channel n_fe-sample front-end read at
            # offset N_BUF - sfill. Overflow (append would push valid data
            # past capacity) drops the oldest samples off the left edge
            # automatically and is reported.
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
            # underflow: the NEXT front-end read needs n_fe - n_in carried
            # samples; sustained same-sign slips that drain below that are
            # surfaced so the host policy can re-prime before the extraction
            # windows read stale buffer tail (advisor r2)
            underflow = sfill < (n_fe - n_in)
            new_state = dict(
                state, sbuf=sbuf, sfill=sfill, agc_gain=gain,
                rot_phase=phase, ff_tau=ff2.tau, ff_rate=ff2.rate,
                ff_init=ff2.initialized,
            )
            return new_state, syms, overflow, underflow

        def extract(sym_all_lane, fp):
            """(T, 2, C) symbols + per-channel fp -> lane-major windows."""
            w = jax.vmap(
                lambda s, f: jax.lax.dynamic_slice(s, (f - 2, 0), (W_sym, 2)),
                in_axes=(2, 0), out_axes=2,
            )(sym_all_lane, fp)                 # (W_sym, 2, C)
            hdr = jnp.stack(
                [w[k * L + 1: k * L + 92] for k in range(F + 1)], axis=-1
            )                                   # (91, 2, C, F+1)
            pay = jnp.stack(
                [w[k * L + 92: k * L + 92 + Lp] for k in range(F)], axis=-1
            )                                   # (Lp, 2, C, F)
            # early/on-time/late discriminator headers (frame-alignment DLL)
            hdr3 = jnp.stack(
                [
                    jnp.stack(
                        [w[k * L + 1 + d: k * L + 92 + d]
                         for k in range(F + 1)], axis=-1
                    )
                    for d in (-1, 0, 1)
                ],
                axis=-1,
            )                                   # (91, 2, C, F+1, 3)
            return hdr, pay, hdr3

        def slip_metric(hdr3):
            """Mean frame metric per (channel, early/on-time/late)."""
            e = hdr3.transpose(2, 3, 4, 0, 1)   # (C, F+1, 3, 91, 2)
            d = cplx.conj_mul(e[..., 1:, :], e[..., :-1, :])
            m = plsync.frame_metric(
                d[..., 1:, :].reshape(-1, 89, 2)
            ).reshape(C, F + 1, 3)
            return jnp.mean(m, axis=1)          # (C, 3)

        def step(state, iq):
            state, syms, overflow, underflow = frontend(state, iq)
            sym_all = jnp.concatenate([state["sym_tail"], syms], axis=1)
            sym_lane = sym_all.transpose(1, 2, 0)          # (T, 2, C)
            fp = state["fp"]
            hdr, pay, hdr3 = extract(sym_lane, fp)

            # ---- per-lane PL processing + demap (b = c*F + f) ----
            h = hdr[..., :F].reshape(91, 2, B)
            nxt = hdr[..., 1:].reshape(91, 2, B)
            p = pay.reshape(Lp, 2, B)
            n0_ov = jnp.repeat(
                jnp.where(state["n0_refined"] > 0, state["n0_refined"], -1.0),
                F,
            )
            cc = jnp.repeat(state["coarse_corrected"], F)
            out = jax.vmap(
                lane,
                in_axes=(-1, -1, -1, 0, 0),
                out_axes={"metric": 0, "autocorr": 0, "fine": 0, "n0": 0,
                          "llrs": -1, "xfec": 0},
            )(h, nxt, p, cc, n0_ov)
            llrsT = quantize_llrs(out["llrs"])             # (N, B)
            kbytes, n_corr, iters, ok, hard_t = (
                self._rx._fec_stage_lane_major_impl(llrsT)
            )
            # device-side TS preparation (VERDICT r3 item 6, SURVEY §7
            # layer 5): per-packet CRC-8 validity + BBHEADER validity
            # computed here on the descrambled bytes, so the host stitch
            # is a flag lookup + memcpy instead of a per-byte CRC loop.
            # kbytes itself stays scrambled (the step's output contract).
            ts_ok, hdr_ok = packet_validity(
                kbytes ^ jnp.asarray(self._rx._bb_scramble)[None]
            )

            # ---- post-decoder SNR refinement (frame 0 of each channel,
            # reference xfecframe_demapper LLR-PDU loop) ----
            xfec_c = out["xfec"].reshape(C, F, -1, 2)[:, 0]
            hard_c = hard_t[:, ::F].T                      # (C, n_ldpc)
            snr_ref = jax.vmap(
                lambda x, hb: _snr_refine(
                    x[None], hb[None], cfg.constellation, cfg.rate,
                    cfg.pls_info.n_mod,
                )
            )(xfec_c, hard_c)
            n0_refined = jnp.where(
                snr_ref > 0, 1.0 / jnp.maximum(snr_ref, 1e-9),
                state["n0_refined"],
            )

            # ---- frame-alignment tracking (slips from the timing loop) ----
            m3 = slip_metric(hdr3)                         # (C, 3)
            center = m3[:, 1]
            shift = jnp.where(
                center + 1e-3 >= jnp.max(m3, axis=1),
                0,
                jnp.argmax(m3, axis=1).astype(jnp.int32) - 1,
            )
            fp = jnp.clip(fp + shift, FP_MIN, FP_MAX)

            # ---- lock maintenance ----
            m_frames = out["metric"].reshape(C, F, 2)[:, :, 0]
            unlock = state["unlock_cnt"]
            for k in range(F):
                unlock = jnp.where(
                    m_frames[:, k] > plsync.THRESHOLD_LOCKED, 0, unlock + 1
                )
            locked = unlock < cfg.unlock_thresh

            # ---- coarse accumulation with settle gating
            # (vectorized Receiver._process_frames:574-606) ----
            acc = state["coarse_acc"]
            cf = state["coarse_frames"]
            settle = state["settle"]
            corrected = state["coarse_corrected"]
            coarse_est = state["coarse_foffset"]
            autocorr = out["autocorr"].reshape(C, F, 89, 2)
            new_coarse = jnp.zeros((C,), bool)
            for k in range(F):
                in_settle = settle > 0
                settle = jnp.where(in_settle, settle - 1, settle)
                skip = in_settle & (~corrected)
                acc = jnp.where(
                    skip[:, None, None], acc, acc + autocorr[:, k]
                )
                cf = jnp.where(skip, cf, cf + 1)
                fire = cf >= cfg.coarse_period
                est_new = plsync.coarse_foffset_from_autocorr(acc)
                coarse_est = jnp.where(fire, est_new, coarse_est)
                corrected = jnp.where(
                    fire,
                    jnp.abs(est_new) < plsync.FINE_FOFFSET_CORR_RANGE,
                    corrected,
                )
                acc = jnp.where(fire[:, None, None], 0.0, acc)
                cf = jnp.where(fire, 0, cf)
                new_coarse = new_coarse | fire

            # ---- closed-loop rotator update (ibid:608-634) ----
            fine = out["fine"].reshape(C, F)
            cum = state["cum_foffset"]
            rot_inc = state["rot_inc"]
            if cfg.closed_loop:
                can = settle <= 0
                adj = jnp.where(
                    corrected,
                    fine[:, -1],
                    jnp.where(new_coarse, coarse_est, 0.0),
                )
                adj = jnp.where(can, adj, 0.0)
                applied = adj != 0.0
                cum = cum + adj
                rot_inc = jnp.where(
                    applied, -cum * (2 * np.pi) / sps, rot_inc
                )
                settle = jnp.where(applied, settle0, settle)
                wipe = applied & (~corrected)
                acc = jnp.where(wipe[:, None, None], 0.0, acc)
                cf = jnp.where(wipe, 0, cf)

            new_state = dict(
                state,
                sym_tail=sym_all[:, n_out:],
                fp=fp,
                coarse_acc=acc,
                coarse_frames=cf,
                coarse_foffset=coarse_est,
                coarse_corrected=corrected,
                cum_foffset=cum,
                settle=settle,
                rot_inc=rot_inc,
                unlock_cnt=unlock,
                n0_refined=n0_refined,
            )
            stats = {
                "metric": center,                           # (C,)
                "locked": locked,
                "bch_errors": jnp.sum(n_corr < 0),
                "ldpc_iters": iters,
                "n0": out["n0"].reshape(C, F)[:, 0],
                "snr_refined": snr_ref,
                "coarse_foffset": coarse_est,
                "fine_foffset": fine[:, -1],
                "coarse_corrected": corrected,
                "cum_foffset": cum,
                "fp": fp,
                "ts_ok": ts_ok.reshape(C, F, -1),
                "hdr_ok": hdr_ok.reshape(C, F),
                "sfill": new_state["sfill"],
                "overflow": overflow,       # per-channel, like underflow: an
                                            # overflowed channel dropped
                                            # unconsumed samples (frame grid
                                            # broken) and must re-acquire
                "underflow": underflow,
            }
            return new_state, kbytes.reshape(C, F, -1), stats

        return step

    def make_scan_step(self, T: int):
        """T chained steps as ONE jitted dispatch: ``state, blocks (T, C,
        n_in, 2) -> state', kbytes (T, C, F, kbch/8), stats``.

        Steps already chain on-device through the donated state; this
        additionally amortizes the per-dispatch submission cost over T
        steps (on this environment's tunneled TPU a dispatch costs ~24 ms
        on the wire, which otherwise bounds sustained throughput at
        step_samples / 24 ms regardless of compute). The reference has no
        analog — its scheduler runs continuously; this is the batch-the-
        control-plane equivalent.
        """
        def multi(state, blocks):
            def body(st, blk):
                st, kb, stats = self.raw_step(st, blk)
                return st, (kb, stats)
            state, (kbs, stats) = jax.lax.scan(body, state, blocks)
            return state, kbs, stats

        if self.mesh is not None:
            blocks_sh = NamedSharding(self.mesh, P(None, "ch", None, None))

            def leaf_spec(x):
                nd = getattr(x, "ndim", 0)
                if nd >= 1 and x.shape[0] == self.n_channels:
                    return NamedSharding(
                        self.mesh, P(*(["ch"] + [None] * (nd - 1)))
                    )
                return NamedSharding(self.mesh, P())

            state_tmpl = self.init_state_np()
            state_sh = jax.tree.map(leaf_spec, state_tmpl)
            return fec_jit(
                multi, in_shardings=(state_sh, blocks_sh),
                donate_argnums=0,
            )
        return fec_jit(multi, donate_argnums=0)

    # ---------------- re-acquisition (device-side) ----------------

    def _build_reacquire(self):
        """One jitted (state, iq_tail, mask) -> (state', ok) re-acquisition.

        The device analog of the reference's automatic frame-sync re-search
        (``lib/pl_frame_sync.cc:183-217``): for every channel flagged in
        ``mask``, re-run the priming math (fresh timing state, dense timing
        metric, whole-symbol rewind) on the most recent ``n_fe`` raw input
        samples and splice the result into the carried state with masked
        merges — no host round trip of the (large) state pytree. CFO
        knowledge survives: the rotator increment, cumulative offset, and
        coarse-corrected flag are kept; only the frame/timing alignment and
        the coarse accumulator (stale across the outage) reset.

        ``ok[c]`` is True when channel ``c`` was flagged AND a SOF peak
        above threshold was found; channels flagged but not found keep
        their old state (the host retries next step).
        """
        C, F, L = self.n_channels, self.F, self.frame_len
        n_out, n_fe, sps = self.n_out, self._n_fe, self.cfg.sps
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
            metric = jax.vmap(self._rx._acq_impl)(syms)
            win = metric[:, : L + 90]
            p = jnp.argmax(win, axis=1).astype(jnp.int32)
            found = jnp.take_along_axis(
                win, p[:, None], axis=1
            )[:, 0] >= plsync.THRESHOLD_UNLOCKED
            ss = p - 89
            ss = jnp.where(ss < FP0, ss + L, ss)
            m = (n_out - ss - (TAIL - FP0)) // L
            E = ss + (TAIL - FP0) + m * L
            r = n_out - E
            start = consumed - r * sps
            # right-aligned buffer: place ALL n_fe re-processed samples at
            # the right edge with one STATIC slice (the already-consumed
            # prefix lands before the valid region, harmlessly);
            # sfill marks where the valid (unconsumed) suffix begins
            pad = jnp.zeros((C, max(self.N_BUF - n_fe, 0), 2), jnp.float32)
            sbuf = jnp.concatenate([pad, rot], axis=1)[:, -self.N_BUF:]
            sfill = n_fe - start
            sym_tail = jax.vmap(
                lambda s, e: jax.lax.dynamic_slice(
                    s, (e - TAIL, 0), (TAIL, 2)
                )
            )(syms, E)

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
                sym_tail=mk(sym_tail, state["sym_tail"]),
                fp=mk(jnp.full((C,), FP0, jnp.int32), state["fp"]),
                coarse_acc=mk(jnp.zeros_like(state["coarse_acc"]),
                              state["coarse_acc"]),
                coarse_frames=mk(zc, state["coarse_frames"]),
                unlock_cnt=mk(zc, state["unlock_cnt"]),
            )
            return new_state, ok

        return reacquire

    def reacquire(self, state, iq_tail, mask):
        """Re-acquire the channels flagged in ``mask`` from the latest
        ``n_fe`` raw samples (``iq_tail``: (C, n_fe, 2) float planar).
        Returns (state', ok)."""
        if self._reacquire is None:
            fn = self._build_reacquire()
            if self.mesh is not None:
                ch = NamedSharding(self.mesh, P("ch"))
                iq_sh = NamedSharding(self.mesh, P("ch", None, None))
                state_tmpl = self.init_state_np()

                def leaf_spec(x):
                    nd = getattr(x, "ndim", 0)
                    if nd >= 1 and x.shape[0] == self.n_channels:
                        return NamedSharding(
                            self.mesh, P(*(["ch"] + [None] * (nd - 1)))
                        )
                    return NamedSharding(self.mesh, P())

                state_sh = jax.tree.map(leaf_spec, state_tmpl)
                self._reacquire = jax.jit(
                    fn,
                    in_shardings=(state_sh, iq_sh, ch),
                    out_shardings=(state_sh, ch),
                    donate_argnums=0,
                )
            else:
                self._reacquire = jax.jit(fn, donate_argnums=0)
        return self._reacquire(state, iq_tail, mask)

    # ---------------- priming (host-side acquisition) ----------------

    def prime(self, iq_prefix: np.ndarray, strict: bool = True):
        """Acquire from the first samples and build the steady-state carry.

        iq_prefix: (C, n) complex64, n >= n_in + history + 1. Runs one
        front-end block, finds the SOF with the dense timing metric (the
        host Receiver's acquisition math), and rewinds the sample buffer by
        a whole number of symbols so the next step's frame group starts at
        ``FP0`` inside the carried tail. Returns the device state.

        With ``strict=False`` a channel without a SOF peak above threshold
        does not raise: it keeps the zero state (it will read as unlocked)
        and is reported in ``self.prime_ok`` for the host re-acquisition
        policy (``StreamSession``) to retry.
        """
        C, sps = self.n_channels, self.cfg.sps
        L, F = self.frame_len, self.F
        n_out, n_fe = self.n_out, self._n_fe
        if iq_prefix.shape[0] != C:
            raise ValueError(f"expected {C} channels")
        if iq_prefix.shape[1] < n_fe:
            raise ValueError(f"prime needs >= {n_fe} samples per channel")
        cfg = self.cfg

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
            metric = jax.vmap(self._rx._acq_impl)(syms)
            return ff2, syms, consumed, metric, iq, gain

        block0 = cplx.from_np(iq_prefix[:, :n_fe]).astype(np.float32)
        ff2, syms_d, consumed_d, metric_d, rot_d, gain_d = fe0(
            jnp.asarray(block0)
        )
        syms = np.asarray(syms_d)
        consumed = np.asarray(consumed_d)
        metric = np.asarray(metric_d)
        rotated = np.asarray(rot_d)

        state = self.init_state_np()
        first_sof = np.zeros((C,), np.int64)
        prime_ok = np.ones((C,), bool)
        for c in range(C):
            p = int(np.argmax(metric[c, : L + 90]))
            if metric[c, p] < plsync.THRESHOLD_UNLOCKED:
                if strict:
                    raise RuntimeError(
                        f"prime: no SOF found on channel {c} "
                        f"(peak {metric[c, p]:.1f})"
                    )
                prime_ok[c] = False
                continue
            ss = p - 89
            if ss < FP0:
                ss += L
            m = (n_out - ss - (TAIL - FP0)) // L
            E = ss + (TAIL - FP0) + m * L       # tail ends here
            r = n_out - E                       # whole symbols to rewind
            start = int(consumed[c]) - r * sps
            tail_samples = rotated[c, start:n_fe]
            # right-aligned buffer: valid data ends at index N_BUF
            state["sbuf"][c, self.N_BUF - tail_samples.shape[0]:] = \
                tail_samples
            state["sfill"][c] = tail_samples.shape[0]
            state["sym_tail"][c] = syms[c, E - TAIL: E]
            first_sof[c] = ss
        state["ff_tau"] = np.asarray(ff2.tau)
        state["ff_rate"] = np.asarray(ff2.rate)
        state["ff_init"] = np.asarray(ff2.initialized)
        state["agc_gain"] = np.asarray(gain_d)
        self._first_sof = first_sof             # diagnostics for tests
        self.prime_ok = prime_ok
        return self.put_state(state)


class StreamSession:
    """Host policy around ``StreamReceiver``: prime, step, monitor lock,
    and re-acquire dropped channels.

    The reference receiver re-searches automatically when frame sync
    unlocks because its block graph keeps running
    (``lib/pl_frame_sync.cc:183-217``); here the device step keeps running
    too, and this host loop implements the deferred policy: when a
    channel's ``locked`` stat falls (or it never primed), re-run the
    device-side acquisition (``StreamReceiver.reacquire``) on the most
    recent raw samples, which the session keeps as a short rolling window
    of already-uploaded device blocks — no extra host->device traffic.
    """

    def __init__(self, sr: StreamReceiver):
        self.sr = sr
        self.state = None
        self._blk_hist = []           # most recent device input blocks
        self._nblk = int(np.ceil(sr._n_fe / sr.n_in)) + 1
        self.need = np.zeros((sr.n_channels,), bool)
        self.reacquired = 0           # channels successfully re-acquired

    def prime(self, iq_prefix: np.ndarray):
        """Soft-prime: failed channels are queued for re-acquisition.
        Returns the per-channel success mask."""
        self.state = self.sr.prime(iq_prefix, strict=False)
        self.need = ~self.sr.prime_ok
        return self.sr.prime_ok.copy()

    def step(self, blk):
        """One stream step. ``blk``: (C, n_in, 2) float32 planar, host or
        device array. Returns (kbytes, stats); stats values are device
        arrays (reading ``locked`` here forces the step's completion, which
        is the price of per-step lock monitoring)."""
        sr = self.sr
        dblk = blk if isinstance(blk, jax.Array) else sr.put_iq(blk)
        self._blk_hist.append(dblk)
        if len(self._blk_hist) > self._nblk:
            self._blk_hist.pop(0)
        self.state, kb, stats = sr.step(self.state, dblk)
        locked = np.asarray(stats["locked"])
        self.need |= ~locked
        # buffer under/overflow corrupts extraction (stale tail reads /
        # dropped unconsumed samples) before the lock metric notices
        self.need |= np.asarray(stats["underflow"])
        self.need |= np.asarray(stats["overflow"])
        have = sum(b.shape[1] for b in self._blk_hist)
        if self.need.any() and have >= sr._n_fe:
            tail = jnp.concatenate(self._blk_hist, axis=1)[:, -sr._n_fe:]
            if sr.mesh is not None:
                tail = jax.device_put(
                    tail, NamedSharding(sr.mesh, P("ch", None, None))
                )
            self.state, ok = sr.reacquire(
                self.state, tail, jnp.asarray(self.need)
            )
            ok = np.asarray(ok)
            self.reacquired += int(ok.sum())
            self.need &= ~ok
        return kb, stats


class StreamEngine:
    """Product host receiver driving the device-resident stream step.

    Drop-in replacement for ``rx.receiver.Receiver`` in the CCM/ffw
    configuration: same ``receive()/get_stats()/stats`` surface, so
    ``apps/dvbs2-rx`` can route its main loop through the low-dispatch
    device-resident engine (the reference's only receive path IS its
    product path, ``apps/dvbs2-rx:832-967``). Handles chunked input of any
    size (internal sample re-blocking to the step size), soft priming, and
    automatic re-acquisition via ``StreamSession``; TS bytes are stitched
    on the host with the native BB-frame fast path when available.

    Multi-channel operation (``n_channels > 1``) expects ``receive`` to be
    fed a (C, n) array and returns a list of per-channel TS byte arrays —
    the TPU-first batched mode the scalar reference cannot do.
    """

    def __init__(self, cfg: RxConfig, n_channels: int = 1,
                 frames_per_step: int = 2, mesh: Mesh = None):
        from ..spec.bb_frame import BatchTSStitcher
        from ..spec.scramblers import bb_derandomizer_bytes
        from .receiver import RxStats

        self.cfg = cfg
        self.sr = StreamReceiver(cfg, n_channels=n_channels,
                                 frames_per_step=frames_per_step, mesh=mesh)
        self.sess = StreamSession(self.sr)
        self.n_channels = n_channels
        self.stats = RxStats()
        self.frame_len = self.sr.frame_len
        self._scr = bb_derandomizer_bytes(cfg.fec.kbch // 8)
        # whole-step native stitch (one C call per step; per-channel
        # reassembly state lives in flat arrays inside the stitcher)
        self._stitcher = BatchTSStitcher(n_channels)
        self.bb_parser = self._stitcher          # get_stats() compatibility
        self._buf = np.empty((n_channels, 0), np.complex64)
        self._primed = False
        self._was_locked = np.zeros((n_channels,), bool)
        # asynchronous TS readback (VERDICT r3 item 5): device->host
        # fetches + BB stitching run on a dedicated reader thread, so the
        # step-feeding thread never blocks on a d2h transfer and sustained
        # throughput is bounded by max(compute, d2h) instead of their sum
        # (the reference gets the same concurrency for free from its
        # thread-per-block scheduler, lib/bbdeheader_bb_impl.cc). A
        # bounded queue backpressures the feeder if d2h falls behind.
        self._fetchq = _queue.Queue(maxsize=4)
        self._done = []                          # stitched per-channel TS
        self._done_lock = threading.Lock()
        self._reader_err = None
        self._reader = threading.Thread(target=self._reader_loop,
                                        daemon=True)
        self._reader.start()

    # -- Receiver-compatible surface --

    get_stats = Receiver.get_stats

    def _update_stats(self, stats):
        s = self.stats
        C, F = self.n_channels, self.sr.F
        locked = np.asarray(stats["locked"])
        now_locked = bool(locked.all())
        if now_locked and not s.locked:
            s.lock_cnt += 1
            s.lock_time = time.time()
        if (~locked & self._was_locked).any():
            s.unlock_cnt += int((~locked & self._was_locked).sum())
        self._was_locked = locked
        s.locked = now_locked
        nf = int(locked.sum()) * F
        s.sof_cnt += nf
        s.frame_cnt += nf
        s.coarse_foffset = float(np.asarray(stats["coarse_foffset"])[0])
        s.fine_foffset = float(np.asarray(stats["fine_foffset"])[0])
        s.cum_freq_offset = float(np.asarray(stats["cum_foffset"])[0])
        s.coarse_corrected = bool(
            np.asarray(stats["coarse_corrected"]).all()
        )
        snr = float(np.asarray(stats["snr_refined"])[0])
        if snr > 0:
            s.snr_db = 10.0 * np.log10(snr)
        errs = int(stats["bch_errors"])
        s.bch_frames += C * F
        s.bch_frame_errors += errs
        s.ldpc_frames += C * F
        s.ldpc_total_iters += int(stats["ldpc_iters"]) * C * F

    def _stitch(self, kb_np, ok_np, hdr_np):
        """BBFRAME bytes (C, F, kbch/8) -> per-channel TS byte arrays:
        ONE vectorized descramble XOR + ONE native whole-step stitch call
        (the device already did the per-packet CRC work — VERDICT r3 item
        6; the per-frame Python push glue was the remaining host cost)."""
        return self._stitcher.push_step(
            kb_np ^ self._scr[None, None], ok_np, hdr_np
        )

    def _reader_loop(self):
        while True:
            item = self._fetchq.get()
            if item is None:
                self._fetchq.task_done()
                return
            kb, ts_ok, hdr_ok = item
            try:
                parts = self._stitch(np.asarray(kb), np.asarray(ts_ok),
                                     np.asarray(hdr_ok))
                with self._done_lock:
                    self._done.append(parts)
            except BaseException as e:   # surface on the feeding thread
                self._reader_err = e
            finally:
                self._fetchq.task_done()

    def _drain_done(self, ts):
        if self._reader_err is not None:
            raise self._reader_err
        with self._done_lock:
            done, self._done = self._done, []
        for parts in done:
            for c, t in enumerate(parts):
                ts[c].append(t)

    def receive(self, iq: np.ndarray, flush: bool = True):
        """Process IQ samples; returns recovered TS bytes (flat uint8 array
        for single-channel, list of arrays for multi-channel).

        Samples short of a full device step are buffered across calls; on
        ``flush`` any final sub-step remainder is dropped (the device step
        has a fixed shape — matching the reference, which also leaves the
        pipeline's in-flight tail undelivered at shutdown).
        """
        iq = np.asarray(iq, dtype=np.complex64)
        if iq.ndim == 1:
            iq = iq[None]
        if iq.shape[0] != self.n_channels:
            raise ValueError(f"expected {self.n_channels} channel rows")
        self._buf = np.concatenate([self._buf, iq], axis=1)
        sr = self.sr
        ts = [[] for _ in range(self.n_channels)]

        if not self._primed and self._buf.shape[1] >= sr._n_fe:
            self.sess.prime(self._buf[:, : sr._n_fe])
            self._buf = self._buf[:, sr._n_fe:]
            self._primed = True

        while self._primed and self._buf.shape[1] >= sr.n_in:
            blk = cplx.from_np(self._buf[:, : sr.n_in]).astype(np.float32)
            self._buf = self._buf[:, sr.n_in:]
            kb, stats = self.sess.step(blk)
            self._update_stats(stats)
            # hand the device arrays to the reader thread; the d2h fetch
            # and TS stitch overlap the next steps' compute
            self._fetchq.put((kb, stats["ts_ok"], stats["hdr_ok"]))
            self._drain_done(ts)
        if flush:
            self._fetchq.join()          # all in-flight fetches stitched
            self._drain_done(ts)
        out = [
            np.concatenate(t) if t else np.empty(0, np.uint8) for t in ts
        ]
        return out[0] if self.n_channels == 1 else out
