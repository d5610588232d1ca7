"""Batched BCH decoder (JAX): syndrome matmul + Berlekamp-Massey + Chien.

TPU-native reformulation of the reference decoder (``lib/bch.cc:175-487``):

- Syndromes: instead of streaming polynomial division, all 2t syndromes are
  computed at once as a binary matrix product ``(r @ A) mod 2`` with the
  precomputed bit-plane matrix of alpha powers (``spec/bch_spec.py``) — an
  MXU matmul in float32 (exact for sums < 2^24).
- Error-locator polynomial: Berlekamp-Massey over GF(2^m), batched across
  frames with exp/log-table arithmetic; 2t tiny sequential steps per frame.
- Error locations: dense Chien-style evaluation of sigma at alpha^(-e) for
  every bit position at once, reformulated for the MXU: multiplication by
  the constant alpha^(-e*i) is GF(2)-linear in sigma_i's bits, so the whole
  evaluation is one int8 matrix product (sigma bits) @ T with a precomputed
  ((t+1)*m, nbch*m) bit-plane matrix, followed by a mod-2 and a zero test.
  (The previous 50M-element LUT-gather formulation ran ~30x slower than the
  reference CPU decoder; the MXU form is ~3 orders of magnitude faster.)

Decode failure (more than t errors) is reported per frame like the
reference's ``-1`` return: the located roots must match deg(sigma).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import bch_spec
from ..spec.galois import GF2m


class BCHDecoder:
    def __init__(self, framesize: str, t: int, nbch: int, kbch: int):
        self.framesize = framesize
        self.t = t
        self.nbch = nbch
        self.kbch = kbch
        field = bch_spec.field_for(framesize)
        self.m = field.m
        self.ord = field.order - 1
        # numpy-resident LUTs (lifted inside traces; see ldpc.py note)
        self._exp_np = field.exp.astype(np.int32)              # 2*(2^m-1)
        self._log_np = field.log.astype(np.int32)              # 2^m
        A = bch_spec.syndrome_bit_matrix(framesize, t, nbch)
        self._A = A.astype(np.int8)                            # (nbch, 2t*m)
        self._T = self._chien_bit_matrix(field)                # ((t+1)m, nbch*m)
        self._decode = jax.jit(self._decode_impl)

    def _chien_bit_matrix(self, field):
        """T[i*m+l, e*m+k] = bit k of alpha^l * alpha^(-p_e * i), where
        p_e = nbch-1-e is the polynomial power of bit position e. Then
        eval(sigma, alpha^(-p_e)) bits = XOR over rows selected by the set
        bits of the sigma coefficients — i.e. (sigma_bits @ T) mod 2."""
        m, t, nbch, ordn = self.m, self.t, self.nbch, self.ord
        p = (nbch - 1 - np.arange(nbch, dtype=np.int64))       # (nbch,)
        i = np.arange(t + 1, dtype=np.int64)                   # (t+1,)
        l = np.arange(m, dtype=np.int64)                       # (m,)
        T = np.empty(((t + 1) * m, nbch * m), np.int8)
        k = np.arange(m, dtype=np.int32)
        for s0 in range(0, nbch, 4096):                        # bound temp RAM
            pe = p[s0:s0 + 4096]
            expo = (l[None, :, None] - i[:, None, None] * pe[None, None, :])
            vals = self._exp_np[expo % ordn]                   # (t+1, m, E)
            bits = ((vals[..., None] >> k) & 1).astype(np.int8)
            T[:, s0 * m:(s0 + len(pe)) * m] = bits.reshape(
                (t + 1) * m, len(pe) * m
            )
        return T

    # ---- GF helpers (batched) ----

    def _gf_mul(self, a, b):
        exp, log = jnp.asarray(self._exp_np), jnp.asarray(self._log_np)
        res = exp[log[a] + log[b]]
        return jnp.where((a == 0) | (b == 0), 0, res)

    def _gf_inv(self, a):
        exp, log = jnp.asarray(self._exp_np), jnp.asarray(self._log_np)
        return exp[(self.ord - log[a]) % self.ord]

    # ---- stages ----

    def _syndromes(self, bits):
        """bits (B, nbch) uint8 -> syndromes (B, 2t) int32 GF elements."""
        # int8 x int8 -> int32 rides the MXU's integer path (exact; column
        # sums <= nbch < 2^31), ~4x the f32 matmul rate
        s_bits = jnp.dot(
            bits.astype(jnp.int8), jnp.asarray(self._A),
            preferred_element_type=jnp.int32,
        ) & 1                                                  # (B, 2t*m)
        s_bits = s_bits.reshape(bits.shape[0], 2 * self.t, self.m)
        weights = (1 << jnp.arange(self.m, dtype=jnp.int32))
        return jnp.sum(s_bits * weights[None, None, :], axis=-1)

    def _berlekamp_massey(self, S):
        """S (B, 2t) -> (sigma (B, t+1) coefficients sigma_0..sigma_t, L (B,)).

        Classic BM over GF(2^m). sigma may exceed degree t for uncorrectable
        frames; coefficients are tracked up to 2t and then truncated, with the
        failure flagged via L > t.
        """
        B = S.shape[0]
        n_steps = 2 * self.t
        W = 2 * self.t + 1  # coefficient storage width

        C0 = jnp.zeros((B, W), jnp.int32).at[:, 0].set(1)
        Bp0 = C0
        L0 = jnp.zeros((B,), jnp.int32)
        m0 = jnp.ones((B,), jnp.int32)
        b0 = jnp.ones((B,), jnp.int32)

        idx = jnp.arange(W)

        def step(n, carry):
            C, Bp, L, m, b = carry
            # discrepancy d = sum_i C[i] * S[n - i] (i = 0..W-1, masked)
            s_idx = n - idx                                     # (W,)
            s_val = jnp.where(
                (s_idx >= 0) & (s_idx < n_steps),
                S[:, jnp.clip(s_idx, 0, n_steps - 1)],
                0,
            )                                                   # (B, W)
            d = jax.lax.reduce(
                self._gf_mul(C, s_val), jnp.int32(0), jax.lax.bitwise_xor, (1,)
            )                                                   # (B,)

            coef = self._gf_mul(d, self._gf_inv(b))             # (B,)
            # shifted = x^m * Bp: shift right by m positions (per frame)
            roll_idx = idx[None, :] - m[:, None]                # (B, W)
            shifted = jnp.where(
                roll_idx >= 0,
                jnp.take_along_axis(Bp, jnp.clip(roll_idx, 0, W - 1), axis=1),
                0,
            )
            C_new = C ^ self._gf_mul(coef[:, None], shifted)

            update = d != 0
            grow = update & (2 * L <= n)
            C_next = jnp.where(update[:, None], C_new, C)
            Bp_next = jnp.where(grow[:, None], C, Bp)
            L_next = jnp.where(grow, n + 1 - L, L)
            b_next = jnp.where(grow, d, b)
            m_next = jnp.where(grow, 1, m + 1)
            return C_next, Bp_next, L_next, m_next, b_next

        C, _, L, _, _ = jax.lax.fori_loop(0, n_steps, step, (C0, Bp0, L0, m0, b0))
        return C[:, : self.t + 1], L

    def _chien(self, sigma):
        """sigma (B, t+1) -> (error_mask (B, nbch) bool, n_roots (B,)).

        One int8 MXU matmul: eval(sigma, alpha^(-p_e)) for every position e
        = (sigma coefficient bits) @ T mod 2, zero iff e is an error."""
        B = sigma.shape[0]
        m = self.m
        sig_bits = (
            (sigma[:, :, None] >> jnp.arange(m, dtype=jnp.int32)) & 1
        ).reshape(B, (self.t + 1) * m).astype(jnp.int8)
        s = jnp.dot(
            sig_bits, jnp.asarray(self._T),
            preferred_element_type=jnp.int32,
        )                                                       # (B, nbch*m)
        eval_bits = (s & 1).reshape(B, self.nbch, m)
        err = jnp.sum(eval_bits, axis=-1) == 0
        return err, jnp.sum(err, axis=1).astype(jnp.int32)

    def _decode_impl(self, bits):
        B = bits.shape[0]
        S = self._syndromes(bits)
        clean = jnp.all(S == 0, axis=1)                         # (B,)

        def fast(_):
            # all-frames-clean early exit (the overwhelmingly common case
            # post-LDPC at operating SNR; mirrors the reference's zero-
            # syndrome shortcut, lib/bch.cc:467-475, batched)
            return bits, jnp.zeros((B,), jnp.int32)

        def slow(_):
            sigma, L = self._berlekamp_massey(S)
            err_mask, n_roots = self._chien(sigma)
            # failure: locator degree beyond t, or root count mismatch
            fail = (~clean) & ((L > self.t) | (n_roots != L))
            apply_mask = (~clean[:, None]) & (~fail[:, None]) & err_mask
            corrected = bits ^ apply_mask.astype(bits.dtype)
            n_corr = jnp.where(clean, 0, jnp.where(fail, -1, n_roots))
            return corrected, n_corr

        return jax.lax.cond(jnp.all(clean), fast, slow, None)

    def decode_lane_major(self, bits_t):
        """bits_t (nbch, B) uint8 -> (corrected_t (nbch, B), n_corr (B,)).

        Lane-major twin of ``_decode_impl``: the syndrome matmul contracts
        over axis 0 directly (no int8 transpose); the rare correcting path
        pays one transposed mask application.
        """
        B = bits_t.shape[1]
        s_bits = jax.lax.dot_general(
            bits_t.astype(jnp.int8), jnp.asarray(self._A),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ) & 1                                                   # (B, 2t*m)
        s_bits = s_bits.reshape(B, 2 * self.t, self.m)
        weights = (1 << jnp.arange(self.m, dtype=jnp.int32))
        S = jnp.sum(s_bits * weights[None, None, :], axis=-1)
        clean = jnp.all(S == 0, axis=1)

        def fast(_):
            return bits_t, jnp.zeros((B,), jnp.int32)

        def slow(_):
            sigma, L = self._berlekamp_massey(S)
            err_mask, n_roots = self._chien(sigma)              # (B, nbch)
            fail = (~clean) & ((L > self.t) | (n_roots != L))
            apply_mask = (~clean[None, :]) & (~fail[None, :]) & err_mask.T
            corrected_t = bits_t ^ apply_mask.astype(bits_t.dtype)
            n_corr = jnp.where(clean, 0, jnp.where(fail, -1, n_roots))
            return corrected_t, n_corr

        return jax.lax.cond(jnp.all(clean), fast, slow, None)

    def __call__(self, bits):
        """bits (B, nbch) uint8 -> (corrected bits, n_corrections (B,)).

        n_corrections is -1 for uncorrectable frames (reference
        ``bch_codec::decode`` convention).
        """
        return self._decode(jnp.asarray(bits, jnp.uint8))


@functools.lru_cache(maxsize=16)
def get_bch_decoder(framesize: str, t: int, nbch: int, kbch: int) -> BCHDecoder:
    return BCHDecoder(framesize, t, nbch, kbch)
