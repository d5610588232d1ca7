"""Layered offset-min-sum LDPC decoder (JAX/XLA path).

TPU-native reformulation of the reference's SIMD layered decoder
(``lib/ldpc_decoder/layered_decoder.hh``, ``algorithms.hh``): DVB-S2's
quasi-cyclic structure makes every layer of 360 checks parallel, and each
layer's variable-node accesses are cyclic *rolls* of 360-bit column blocks
(see ``spec/ldpc_tables.py``), so the decoder is pure vector arithmetic on
``[360, batch]`` int8 tiles — no gathers.

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


def _qabs(x8):
    """Saturating |x|: |-128| -> 127."""
    return jnp.clip(jnp.abs(x8.astype(_I16)), 0, 127).astype(_I16)


def _roll360(x, shift):
    """roll(x, shift, axis=0) for a (360, B) block with a traced shift."""
    m = x.shape[0]
    two = jnp.concatenate([x, x], axis=0)
    start = (m - shift) % m
    return jax.lax.dynamic_slice_in_dim(two, start, m, axis=0)


class LDPCDecoder:
    """Batched layered decoder for one code table.

    Call with int8 LLRs of shape (batch, N); returns (hard_bits uint8
    (batch, N), iterations_used, converged bool (batch,)).
    """

    def __init__(self, code: LDPCCode, max_trials: int = 25):
        self.code = code
        self.max_trials = max_trials
        lay = code.layers
        self.q = code.q
        self.M = code.M
        self.n_blocks = code.n_blocks
        self.max_cnt = lay["max_cnt"]
        self._cnt = jnp.asarray(lay["cnt"], jnp.int32)
        self._block = jnp.asarray(np.maximum(lay["block"], 0), jnp.int32)
        self._valid = jnp.asarray(lay["block"] >= 0)
        self._shift = jnp.asarray(lay["shift"] % code.M, jnp.int32)
        self._decode = jax.jit(self._decode_impl)

    # ---------- core ----------

    def _layer_inputs(self, i, v, p, msgs):
        """Collect the (E, 360, B) input values and masks for layer i.

        E = max_cnt data edges + own parity + previous parity.
        Values for masked-out edges are forced to +127 (never the min, sign
        bit 0) so they are inert in the check update.
        """
        M, q, E = self.M, self.q, self.max_cnt + 2
        blocks = self._block[i]          # (max_cnt,)
        shifts = self._shift[i]
        valid = self._valid[i]           # (max_cnt,) bool

        def gather_edge(c):
            blk = jnp.take(v, blocks[c], axis=0)          # (360, B)
            return _roll360(blk, shifts[c])

        data_vals = jnp.stack([gather_edge(c) for c in range(self.max_cnt)])
        own = p[i][None]                                   # (1, 360, B)
        prev_wrap = _roll360(p[q - 1], 1)
        prev = jnp.where(i > 0, jnp.take(p, (i - 1) % q, axis=0), prev_wrap)[None]
        vals = jnp.concatenate([data_vals, own, prev], axis=0)  # (E, 360, B)

        # masks: (E, 360) broadcastable over batch
        j_idx = jnp.arange(M)
        data_mask = jnp.broadcast_to(valid[:, None], (self.max_cnt, M))
        own_mask = jnp.ones((1, M), bool)
        # check (0, 0) has no previous-parity edge
        prev_mask = jnp.where(i > 0, jnp.ones((M,), bool), j_idx != 0)[None]
        mask = jnp.concatenate([data_mask, own_mask, prev_mask], axis=0)
        return vals, mask[..., None]  # (E, 360, 1)

    def _update_layer(self, i, state):
        v, p, msgs = state
        q, M, E = self.q, self.M, self.max_cnt + 2
        vals, mask = self._layer_inputs(i, v, p, msgs)
        old_msgs = jnp.take(msgs, i, axis=0)               # (E, 360, B)

        inp16 = vals.astype(_I16) - old_msgs.astype(_I16)
        inp = jnp.clip(inp16, -128, 127)                   # saturating sub
        inp = jnp.where(mask, inp, 127)

        # offset-min-sum magnitudes
        mags = jnp.maximum(_qabs(_sat8(inp)) - BETA, 0)    # (E, 360, B) int16
        mags = jnp.where(mask, mags, 127)

        # exclusive two-min reduction over the edge axis
        min0 = jnp.min(mags, axis=0)
        # second min: min over edges of max(mag, min0-with-self-excluded)...
        # standard trick: sort-free second minimum via masking one argmin
        is_min = mags == min0[None]
        first_min_idx = jnp.argmax(is_min, axis=0)         # (360, B)
        mags_wo_first = jnp.where(
            jnp.arange(E)[:, None, None] == first_min_idx[None], 127, mags
        )
        min1 = jnp.min(mags_wo_first, axis=0)
        excl_min = jnp.where(mags == min0[None], min1[None], min0[None])

        # exclusive sign product (XOR of sign bits; masked edges are positive)
        neg = (inp < 0) & mask
        total_sign = jnp.sum(neg, axis=0) & 1              # (360, B)
        excl_sign = (total_sign[None] ^ neg) & 1
        out = jnp.where(excl_sign == 1, -excl_min, excl_min)  # int16

        # messages are stored clamped to [-32, 31] (reference NormalUpdate)
        new_msgs = jnp.clip(out, MSG_CLAMP_LO, MSG_CLAMP_HI).astype(_I8)
        new_msgs = jnp.where(mask, new_msgs, 0)

        # new variable value = sat(inp + out) with the *unclamped* check
        # output (the clamp above applies to the stored message only, matching
        # the reference's add/update split). Written back as a delta against
        # the current stored value so that two edges into the same block
        # compose (delta = target - current, applied with saturating adds).
        target = jnp.clip(inp + out, -128, 127)
        delta = jnp.where(mask, target - vals.astype(_I16), 0)

        blocks, shifts, valid = self._block[i], self._shift[i], self._valid[i]

        def apply_data(c, vv):
            d = _roll360(delta[c], -shifts[c])
            blk = jnp.take(vv, blocks[c], axis=0).astype(_I16)
            upd = _sat8(blk + d)
            return jax.lax.cond(
                valid[c],
                lambda vv: vv.at[blocks[c]].set(upd),
                lambda vv: vv,
                vv,
            )

        for c in range(self.max_cnt):
            v = apply_data(c, v)

        # parity updates (single edge each; direct set)
        p = p.at[i].set(_sat8(p[i].astype(_I16) + delta[self.max_cnt]))
        d_prev = delta[self.max_cnt + 1]

        def upd_prev_mid(p):
            idx = (i - 1) % q
            return p.at[idx].set(_sat8(jnp.take(p, idx, axis=0).astype(_I16) + d_prev))

        def upd_prev_wrap(p):
            d = _roll360(d_prev, -1)
            return p.at[q - 1].set(_sat8(p[q - 1].astype(_I16) + d))

        p = jax.lax.cond(i > 0, upd_prev_mid, upd_prev_wrap, p)

        msgs = msgs.at[i].set(new_msgs)
        return v, p, msgs

    def _bad(self, v, p):
        """Per-frame parity check: True where any check is unsatisfied."""

        def layer_bad(i, acc):
            vals, mask = self._layer_inputs(i, v, p, None)
            neg = (vals < 0) & mask
            zero = (vals == 0) & mask
            sign = jnp.sum(neg, axis=0) & 1                # (360, B)
            unsat = (sign == 1) | jnp.any(zero, axis=0)
            return acc | jnp.any(unsat, axis=0)            # (B,)

        B = v.shape[-1]
        return jax.lax.fori_loop(0, self.q, layer_bad, jnp.zeros((B,), bool))

    def _decode_impl(self, llrs):
        code = self.code
        B = llrs.shape[0]
        K, q, M = code.K, self.q, self.M

        v = llrs[:, :K].reshape(B, self.n_blocks, M).transpose(1, 2, 0)
        par = llrs[:, K:].reshape(B, M, q).transpose(2, 1, 0)  # pty[i, j] layout
        msgs = jnp.zeros((q, self.max_cnt + 2, M, B), _I8)

        def cond(state):
            v, p, msgs, trials, bad = state
            return jnp.any(bad) & (trials > 0)

        def body(state):
            v, p, msgs, trials, _ = state
            v, p, msgs = jax.lax.fori_loop(
                0, q, lambda i, s: self._update_layer(i, s), (v, p, msgs)
            )
            bad = self._bad(v, p)
            return v, p, msgs, trials - 1, bad

        bad0 = self._bad(v, par)
        v, par, msgs, trials_left, bad = jax.lax.while_loop(
            cond, body, (v, par, msgs, self.max_trials, bad0)
        )

        hard_data = (v < 0).astype(jnp.uint8).transpose(2, 0, 1).reshape(B, K)
        hard_par = (par < 0).astype(jnp.uint8).transpose(2, 1, 0).reshape(B, M * q)
        hard = jnp.concatenate([hard_data, hard_par], axis=1)
        # also return the final LLRs (for post-decoder SNR refinement)
        llr_data = v.transpose(2, 0, 1).reshape(B, K)
        llr_par = par.transpose(2, 1, 0).reshape(B, M * q)
        llrs_out = jnp.concatenate([llr_data, llr_par], axis=1)
        return hard, llrs_out, self.max_trials - trials_left, ~bad

    def __call__(self, llrs):
        llrs = jnp.asarray(llrs, _I8)
        return self._decode(llrs)


@functools.lru_cache(maxsize=16)
def get_decoder(table_name: str, max_trials: int = 25) -> LDPCDecoder:
    from ..spec.ldpc_tables import get_code

    return LDPCDecoder(get_code(table_name), max_trials)
