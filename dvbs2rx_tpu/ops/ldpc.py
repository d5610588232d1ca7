"""Layered offset-min-sum LDPC decoder (JAX/XLA path).

TPU-native reformulation of the reference's SIMD layered decoder
(``lib/ldpc_decoder/layered_decoder.hh``, ``algorithms.hh``): DVB-S2's
quasi-cyclic structure makes every layer of 360 checks parallel, and each
layer's variable-node accesses are cyclic *rolls* of 360-bit column blocks
(see ``spec/ldpc_tables.py``), so the decoder is pure vector arithmetic on
``[360, batch]`` int8 tiles — no gathers.

The layer schedule is **statically unrolled**: every block index, roll
amount, and edge count is a compile-time constant, so XLA lowers each layer
to plain slices/rotates with no dynamic indexing and no padding masks (the
only mask left is the single missing previous-parity edge of check 0).

Algorithm parity with the production reference configuration
(``ldpc_decoder_avx2.cc:13-19``): offset-min-sum with beta = 1, saturating
int8 arithmetic, messages clamped to [-32, 31], hard-decision early exit via
the parity check each iteration. Frames are batched along the minor axis like
the reference's SIMD lanes (32 frames/AVX2 register there; 128+ lanes here).

One deliberate divergence: checks *within* a layer update in parallel
(flooding inside the layer) instead of the reference's serial sweep. When a
column block appears twice in one layer the two updates compose as saturating
deltas. This is the standard parallel-hardware schedule for QC-LDPC and has
negligible BER impact.

LLR convention: positive = bit 0 (matches ``lib/qpsk.h`` demapping).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.ldpc_tables import LDPCCode

_I16 = jnp.int16
_I8 = jnp.int8

MSG_CLAMP_LO = -32
MSG_CLAMP_HI = 31
BETA = 1  # offset-min-sum beta = FACTOR/2 with FACTOR=2


def _sat8(x16):
    return jnp.clip(x16, -128, 127).astype(_I8)


class LDPCDecoder:
    """Batched layered decoder for one code table.

    Call with int8 LLRs of shape (batch, N); returns (hard_bits uint8
    (batch, N), final LLRs int8, iterations_used int32, converged (batch,)).
    """

    def __init__(self, code: LDPCCode, max_trials: int = 25,
                 algo: str = "offset-min-sum", update: str = "normal"):
        """``algo``: check-node rule — "offset-min-sum" (production default,
        beta=1), "min-sum" (beta=0), or "min-sum-c" (two-input min with the
        additive correction factor, ``algorithms.hh`` MinSumCAlgorithm with
        FACTOR=2). ``update``: message store rule — "normal" or
        "self-corrected" (message zeroed on sign flip, ``generic.hh:25``
        SelfCorrectedUpdate)."""
        if algo not in ("offset-min-sum", "min-sum", "min-sum-c"):
            raise ValueError(f"unknown LDPC algorithm {algo!r}")
        if update not in ("normal", "self-corrected"):
            raise ValueError(f"unknown LDPC update rule {update!r}")
        self.algo = algo
        self.update_rule = update
        self.beta = BETA if algo == "offset-min-sum" else 0
        self.code = code
        self.max_trials = max_trials
        lay = code.layers
        self.q = code.q
        self.M = code.M
        self.n_blocks = code.n_blocks
        # static per-layer edge lists [(block, shift), ...]
        self._edges = []
        for i in range(self.q):
            e = []
            for c in range(lay["max_cnt"]):
                if lay["block"][i, c] >= 0:
                    e.append((int(lay["block"][i, c]),
                              int(lay["shift"][i, c] % code.M)))
            self._edges.append(e)
        self.max_deg = max(len(e) for e in self._edges) + 2
        # message slots per layer: len(edges) data + own parity + prev parity
        self._decode = jax.jit(self._decode_impl)

    # ---------- static per-layer helpers ----------

    def _layer_vals(self, i, v, p):
        """Edge input values for layer i as a list of (360, B) int8 arrays:
        [data edges..., own parity, previous parity]."""
        M, q = self.M, self.q
        vals = [jnp.roll(v[b], s, axis=0) for b, s in self._edges[i]]
        vals.append(p[i])
        if i > 0:
            vals.append(p[i - 1])
        else:
            vals.append(jnp.roll(p[q - 1], 1, axis=0))
        return vals

    def _prev_mask(self, i):
        """(360, 1) int8-friendly bool: False only at check (0, 0)."""
        if i > 0:
            return None
        m = np.ones((self.M, 1), dtype=bool)
        m[0, 0] = False
        return m

    @staticmethod
    def _minc(a, b, factor=2):
        """Two-input min with the additive correction factor
        (``algorithms.hh`` MinSumCAlgorithm::minc, FACTOR=2): an int
        approximation of the boxplus correction term. Non-associative; the
        exclusive combine order below matches the reference's
        ``exclusive_reduce`` exactly."""
        m = jnp.minimum(jnp.abs(a), jnp.abs(b))
        # vsign(vsign(m, a), b): magnitude with the product sign, 0 if a or b is 0
        x = jnp.sign(a) * jnp.sign(b) * m
        apb = jnp.abs(a + b)
        amb = jnp.abs(a - b)
        half = factor // 2
        pc = (2 * factor > apb) & (amb > 2 * apb)
        nc = (2 * factor > amb) & (apb > 2 * amb)
        return x + jnp.where(pc, half, 0) - jnp.where(nc, half, 0)

    def _minc_exclusive(self, inp):
        """Exclusive minc-reduce over the edge axis with the reference's
        prefix/suffix order (``exclusive_reduce.hh:20-34``): prefixes combine
        left-associatively from the head, suffixes from the tail, and
        out[i] = op(prefix, suffix)."""
        E = inp.shape[0]
        outs = [None] * E
        pres = [None] * E
        pre = inp[0]
        for i in range(1, E - 1):
            pres[i] = pre
            pre = self._minc(pre, inp[i])
        outs[E - 1] = pre
        suf = inp[E - 1]
        for i in range(E - 2, 0, -1):
            outs[i] = self._minc(pres[i], suf)
            suf = self._minc(suf, inp[i])
        outs[0] = suf
        return jnp.stack(outs)

    def _update_layer(self, i, v, p, msgs):
        E = len(self._edges[i]) + 2
        vals = jnp.stack(self._layer_vals(i, v, p))            # (E, 360, B)
        old = msgs[i][:E]                                      # (E, 360, B)

        inp = jnp.clip(vals.astype(_I16) - old.astype(_I16), -128, 127)
        pm = self._prev_mask(i)
        if pm is not None:
            # the masked edge is forced positive & large: inert in the check
            inp = inp.at[E - 1].set(
                jnp.where(jnp.asarray(pm), inp[E - 1], 127)
            )

        if self.algo == "min-sum-c":
            out = self._minc_exclusive(inp)                    # int16
        else:
            mags = jnp.maximum(jnp.minimum(jnp.abs(inp), 127) - self.beta, 0)
            min0 = jnp.min(mags, axis=0)
            is_min = mags == min0[None]
            first_min = jnp.argmax(is_min, axis=0)
            mags_wo = jnp.where(
                jnp.arange(E)[:, None, None] == first_min[None], 127, mags
            )
            min1 = jnp.min(mags_wo, axis=0)
            excl_min = jnp.where(is_min, min1[None], min0[None])

            neg = inp < 0
            total_sign = jnp.sum(neg, axis=0) & 1
            excl_sign = (total_sign[None] ^ neg) & 1
            out = jnp.where(excl_sign == 1, -excl_min, excl_min)  # int16

        if self.algo == "min-sum-c":
            # the reference's MinSumCAlgorithm<int8> update() stores messages
            # saturated to the int8 range only (no +-32 clamp, unlike its
            # MinSum counterpart's NormalUpdate, algorithms.hh)
            new_msgs = jnp.clip(out, -128, 127).astype(_I8)
        else:
            new_msgs = jnp.clip(out, MSG_CLAMP_LO, MSG_CLAMP_HI).astype(_I8)
        if self.update_rule == "self-corrected":
            # SelfCorrectedUpdate: keep the new message only if the previous
            # one was zero or has the same sign; else store zero.
            keep = (old == 0) | ((old < 0) == (new_msgs < 0))
            new_msgs = jnp.where(keep, new_msgs, jnp.int8(0))
        # new value = sat(inp + out) with the unclamped check output; written
        # back as deltas so multiple edges into one block compose
        target = jnp.clip(inp + out, -128, 127)
        delta = target - vals.astype(_I16)
        if pm is not None:
            delta = delta.at[E - 1].set(
                jnp.where(jnp.asarray(pm), delta[E - 1], 0)
            )
            new_msgs = new_msgs.at[E - 1].set(
                jnp.where(jnp.asarray(pm), new_msgs[E - 1], 0)
            )

        for c, (b, s) in enumerate(self._edges[i]):
            d = jnp.roll(delta[c], -s, axis=0)
            v = v.at[b].set(_sat8(v[b].astype(_I16) + d))
        p = p.at[i].set(_sat8(p[i].astype(_I16) + delta[len(self._edges[i])]))
        d_prev = delta[E - 1]
        if i > 0:
            p = p.at[i - 1].set(_sat8(p[i - 1].astype(_I16) + d_prev))
        else:
            d = jnp.roll(d_prev, -1, axis=0)
            p = p.at[self.q - 1].set(_sat8(p[self.q - 1].astype(_I16) + d))

        pad = msgs.shape[1] - E
        if pad:
            new_msgs = jnp.concatenate(
                [new_msgs, jnp.zeros((pad,) + new_msgs.shape[1:], _I8)]
            )
        msgs = msgs.at[i].set(new_msgs)
        return v, p, msgs

    def _bad(self, v, p):
        """Per-frame parity check: True where any check is unsatisfied.

        A zero LLR counts as unsatisfied, matching the reference's
        ``vcgtz``-based test.
        """
        B = v.shape[-1]
        bad = jnp.zeros((B,), jnp.int32)
        for i in range(self.q):
            vals = jnp.stack(self._layer_vals(i, v, p))        # (E, 360, B)
            neg = vals < 0
            zero = vals == 0
            pm = self._prev_mask(i)
            if pm is not None:
                keep = jnp.asarray(pm)
                neg = neg.at[-1].set(neg[-1] & keep)
                zero = zero.at[-1].set(zero[-1] & keep)
            sign = jnp.sum(neg, axis=0) & 1
            unsat = (sign == 1) | jnp.any(zero, axis=0)
            bad = bad | jnp.any(unsat, axis=0).astype(jnp.int32)
        return bad

    # ---------- decode ----------

    def _run_decode(self, v, par):
        """Shared layered-decode core on lane-major state (v (nb, M, B),
        par (q, M, B)); returns (v, par, trials_left, bad).

        Per-lane freeze at convergence: a lane whose parity check passes
        keeps the state it converged with — further iterations (driven by
        slower lanes in the batch) no longer touch it. This makes every
        frame's decode result INDEPENDENT of batch composition, so frames
        can be pooled freely across channels/steps (the cross-channel
        SIMD-lane pooling of ``lib/ldpc_decoder_bb_impl.cc:309-352``)
        with bit-identical per-frame outputs. The reference's scalar
        early exit (``layered_decoder.hh:153-154``) instead keeps
        iterating converged lanes; at operating SNR the results coincide
        (a satisfied codeword only reinforces), but only the frozen
        semantics guarantee it."""
        q = self.q
        B = v.shape[-1]
        msgs = jnp.zeros((q, self.max_deg, self.M, B), _I8)

        def cond(state):
            v, p, msgs, trials, bad = state
            return jnp.any(bad > 0) & (trials > 0)

        def body(state):
            v, p, msgs, trials, bad = state
            act = bad > 0                              # (B,) still decoding
            v2, p2 = v, p
            for i in range(q):
                v2, p2, msgs = self._update_layer(i, v2, p2, msgs)
            # frozen lanes keep their converged state (messages don't
            # matter for them: their deltas are discarded every iteration)
            v = jnp.where(act[None, None, :], v2, v)
            p = jnp.where(act[None, None, :], p2, p)
            return v, p, msgs, trials - 1, \
                jnp.where(act, self._bad(v2, p2), 0)

        bad0 = self._bad(v, par)
        v, par, _msgs, trials_left, bad = jax.lax.while_loop(
            cond, body, (v, par, msgs, self.max_trials, bad0)
        )
        return v, par, trials_left, bad

    def _decode_impl(self, llrs):
        code = self.code
        B = llrs.shape[0]
        K, q, M = code.K, self.q, self.M

        v = llrs[:, :K].reshape(B, self.n_blocks, M).transpose(1, 2, 0)
        par = llrs[:, K:].reshape(B, M, q).transpose(2, 1, 0)  # pty[i, j]
        v, par, trials_left, bad = self._run_decode(v, par)

        hard_data = (v < 0).astype(jnp.uint8).transpose(2, 0, 1).reshape(B, K)
        hard_par = (par < 0).astype(jnp.uint8).transpose(2, 1, 0).reshape(B, M * q)
        hard = jnp.concatenate([hard_data, hard_par], axis=1)
        llr_data = v.transpose(2, 0, 1).reshape(B, K)
        llr_par = par.transpose(2, 1, 0).reshape(B, M * q)
        llrs_out = jnp.concatenate([llr_data, llr_par], axis=1)
        return hard, llrs_out, self.max_trials - trials_left, (bad == 0)

    def decode_lane_major(self, llrsT):
        """(N, B) int8 entry matching PallasLDPCDecoder.decode_lane_major.

        The XLA path's internal state is already lane-major; this skips the
        (B, N) round trip entirely."""
        code = self.code
        K, q, M = code.K, self.q, self.M
        B = llrsT.shape[1]
        v = llrsT[:K].reshape(self.n_blocks, M, B)
        par = llrsT[K:].reshape(M, q, B).transpose(1, 0, 2)
        v, par, trials_left, bad = self._run_decode(v, par)
        llr_data_t = v.reshape(K, B)
        llr_par_t = par.transpose(1, 0, 2).reshape(M * q, B)
        llrsT_out = jnp.concatenate([llr_data_t, llr_par_t], axis=0)
        hard_t = (llrsT_out < 0).astype(jnp.uint8)
        return hard_t, llrsT_out, self.max_trials - trials_left, (bad == 0)

    def __call__(self, llrs):
        llrs = jnp.asarray(llrs, _I8)
        return self._decode(llrs)


@functools.lru_cache(maxsize=16)
def get_decoder(table_name: str, max_trials: int = 25,
                algo: str = "offset-min-sum",
                update: str = "normal") -> LDPCDecoder:
    from ..spec.ldpc_tables import get_code

    return LDPCDecoder(get_code(table_name), max_trials, algo, update)
