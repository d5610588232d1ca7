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

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import cplx, plsync
from ..ops.demap import quantize_llrs
from ..ops.ffsync import FeedForwardSync, FFSyncState
from ..ops.frontend import rotate_block
from ..parallel.batch import make_lane_fn
from .receiver import Receiver, RxConfig, _snr_refine

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
            sps=cfg.sps, rolloff=cfg.rolloff, max_block=self.n_out
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
            self.step = jax.jit(
                step, in_shardings=(state_sh, iq_sh), out_shardings=out_sh,
                donate_argnums=0,
            )
        else:
            self.step = jax.jit(step, donate_argnums=0)

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
            # append to the sample buffer (overflow clamps + is reported)
            sfill = jnp.minimum(state["sfill"], self.N_BUF - n_in)
            overflow = state["sfill"] > self.N_BUF - n_in
            sbuf = jax.vmap(
                lambda b, x, f: jax.lax.dynamic_update_slice(b, x, (f, 0))
            )(state["sbuf"], rot, sfill)
            sfill = sfill + n_in
            ff = FFSyncState(
                tau=state["ff_tau"], rate=state["ff_rate"],
                initialized=state["ff_init"],
            )
            ff2, syms, consumed = self.sync.step_batched(
                ff, sbuf[:, :n_fe], n_out
            )
            # drop consumed samples (pad so the dynamic slice never clamps)
            pad = jnp.zeros((C, n_in + 64, 2), jnp.float32)
            sbuf = jax.vmap(
                lambda b, c: jax.lax.dynamic_slice(
                    b, (c, 0), (self.N_BUF, 2)
                )
            )(jnp.concatenate([sbuf, pad], axis=1), consumed)
            sfill = sfill - consumed
            new_state = dict(
                state, sbuf=sbuf, sfill=sfill, agc_gain=gain,
                rot_phase=phase, ff_tau=ff2.tau, ff_rate=ff2.rate,
                ff_init=ff2.initialized,
            )
            return new_state, syms, overflow

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
            state, syms, overflow = frontend(state, iq)
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
                "sfill": new_state["sfill"],
                "overflow": jnp.sum(overflow),
            }
            return new_state, kbytes.reshape(C, F, -1), stats

        return step

    # ---------------- priming (host-side acquisition) ----------------

    def prime(self, iq_prefix: np.ndarray):
        """Acquire from the first samples and build the steady-state carry.

        iq_prefix: (C, n) complex64, n >= n_in + history + 1. Runs one
        front-end block, finds the SOF with the dense timing metric (the
        host Receiver's acquisition math), and rewinds the sample buffer by
        a whole number of symbols so the next step's frame group starts at
        ``FP0`` inside the carried tail. Returns the device state.
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
        for c in range(C):
            p = int(np.argmax(metric[c, : L + 90]))
            if metric[c, p] < plsync.THRESHOLD_UNLOCKED:
                raise RuntimeError(
                    f"prime: no SOF found on channel {c} "
                    f"(peak {metric[c, p]:.1f})"
                )
            ss = p - 89
            if ss < FP0:
                ss += L
            m = (n_out - ss - (TAIL - FP0)) // L
            E = ss + (TAIL - FP0) + m * L       # tail ends here
            r = n_out - E                       # whole symbols to rewind
            start = int(consumed[c]) - r * sps
            tail_samples = rotated[c, start:n_fe]
            state["sbuf"][c, : tail_samples.shape[0]] = tail_samples
            state["sfill"][c] = tail_samples.shape[0]
            state["sym_tail"][c] = syms[c, E - TAIL: E]
            first_sof[c] = ss
        state["ff_tau"] = np.asarray(ff2.tau)
        state["ff_rate"] = np.asarray(ff2.rate)
        state["ff_init"] = np.asarray(ff2.initialized)
        state["agc_gain"] = np.asarray(gain_d)
        self._first_sof = first_sof             # diagnostics for tests
        return self.put_state(state)
