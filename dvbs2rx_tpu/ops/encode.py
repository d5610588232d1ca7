"""Device-side batched FEC encoding (BCH + LDPC) — lane-major.

The reference transmits through gr-dtv's CPU blocks (``apps/dvbs2-tx``
delegates to ``dvb_bch_bb``/``dvb_ldpc_bb``); this module provides the
TPU-native equivalent so stimulus generation and BER sweeps run at device
rates:

- **BCH**: systematic parity is GF(2)-linear in the message, so the whole
  encode is one int8 MXU matmul against a precomputed ``(kbch, deg)``
  bit-plane matrix ``P`` with ``P[i] = x^(deg + kbch - 1 - i) mod g(x)``
  (the streaming LFSR of ``lib/bch.cc:36-62`` unrolled into a matrix).
- **LDPC**: the eIRA accumulator structure (``lib/ldpc_decoder/ldpc.hh``)
  is quasi-cyclic: check-sum position ``(x + m*q) mod R`` decomposes as
  column ``x % q`` and a cyclic block shift by ``x // q``, so the check
  sums are a static stack of ``jnp.roll`` XORs (the same roll structure as
  the decoder) and the accumulator chain is one prefix-XOR scan
  (``cumsum & 1``) over the parity axis.

Both run lane-major (bits (n, B) with frames on the minor axis) like the
decode path. Bit-exact against the host reference encoders
(``spec/bch_spec.bch_encode_bytes``, ``LDPCCode.encode``) — see
``tests/test_device_encoder.py``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import bch_spec
from ..spec.fec_params import get_fec_info
from ..spec.ldpc_tables import get_code


@functools.lru_cache(maxsize=8)
def bch_parity_matrix(framesize: str, t: int, kbch: int) -> np.ndarray:
    """(kbch, deg) int8: row i = bits of x^(deg + kbch - 1 - i) mod g(x),
    MSB-first columns, so parity_bits = (msg_bits @ P) & 1."""
    _table, deg, g = bch_spec._byte_rem_table(framesize, t)
    mask = (1 << deg) - 1
    pw = np.empty(kbch, dtype=object)
    r = 1
    for _ in range(deg):                 # r = x^deg mod g
        r <<= 1
        if r >> deg:
            r ^= g
        r &= mask
    for j in range(kbch):                # pw[j] = x^(deg + j) mod g
        pw[j] = r
        r <<= 1
        if r >> deg:
            r ^= g
        r &= mask
    P = np.zeros((kbch, deg), dtype=np.int8)
    nbytes = deg // 8
    for i in range(kbch):
        v = int(pw[kbch - 1 - i])
        P[i] = np.unpackbits(
            np.frombuffer(v.to_bytes(nbytes, "big"), np.uint8)
        )
    return P


class DeviceEncoder:
    """Batched systematic BCH + LDPC encoder on device, lane-major."""

    def __init__(self, frame_size: str, rate: str):
        self.fec = get_fec_info(frame_size, rate)
        self.code = get_code(self.fec.ldpc_table)
        self._P = bch_parity_matrix(frame_size, self.fec.t, self.fec.kbch)
        # static LDPC check-sum edge structure: per (block, addr) the column
        # j = x % q and block shift s = x // q
        edges = []
        for b, addrs in enumerate(self.code.block_addr):
            for x in addrs.tolist():
                edges.append((b, int(x) % self.code.q, int(x) // self.code.q))
        self._edges = edges
        self._encode = jax.jit(self.encode_lane_major)

    def bch_encode_lane_major(self, msg_t):
        """msg_t (kbch, B) uint8 bits -> codeword (nbch, B) uint8 bits."""
        par = jax.lax.dot_general(
            jnp.asarray(self._P), msg_t.astype(jnp.int8),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ) & 1                                               # (deg, B)
        return jnp.concatenate([msg_t, par.astype(jnp.uint8)], axis=0)

    def ldpc_encode_lane_major(self, data_t):
        """data_t (K, B) uint8 bits -> codeword (N, B) uint8 bits."""
        code = self.code
        M, q, R = code.M, code.q, code.N - code.K
        B = data_t.shape[1]
        blocks = data_t.astype(jnp.int32).reshape(code.n_blocks, M, B)
        acc = jnp.zeros((M, q, B), jnp.int32)
        cols = [[] for _ in range(q)]
        for b, j, s in self._edges:
            cols[j].append((b, s))
        col_vals = []
        for j in range(q):
            v = jnp.zeros((M, B), jnp.int32)
            for b, s in cols[j]:
                v = v ^ jnp.roll(blocks[b], s, axis=0)
            col_vals.append(v)
        acc = jnp.stack(col_vals, axis=1)                   # (M, q, B)
        # accumulator chain: parity[a] = XOR of acc[0..a] in natural order
        # a = m*q + j -> C-order flatten of (M, q)
        flat = acc.reshape(R, B)
        parity = (jnp.cumsum(flat, axis=0) & 1).astype(jnp.uint8)
        return jnp.concatenate([data_t, parity], axis=0)

    def encode_lane_major(self, msg_t):
        """msg_t (kbch, B) bits -> LDPC codeword (nldpc, B) bits."""
        return self.ldpc_encode_lane_major(self.bch_encode_lane_major(msg_t))

    def __call__(self, msg_t):
        return self._encode(jnp.asarray(msg_t, jnp.uint8))


@functools.lru_cache(maxsize=8)
def get_device_encoder(frame_size: str, rate: str) -> DeviceEncoder:
    return DeviceEncoder(frame_size, rate)
