"""Device-side CRC-8 validity maps for BBFRAME/TS preparation.

The host TS stitch (``spec/bb_frame.py`` + ``native/dvbs2rx_native.c``,
reference ``lib/bbdeheader_bb_impl.cc:144-261``) spends its time computing
the per-packet CRC-8: every 188-byte user packet carries the CRC of its
187 predecessor bytes in place of the 0x47 sync byte. That check is pure
per-byte arithmetic — exactly what the device should do (SURVEY.md §7
layer 5 prescribes this split: per-frame packet payloads + validity masks
on device, final byte stitching on host).

CRC-8 (init 0, no reflection, no xorout) is LINEAR over GF(2):
``crc(left || right) = M^|right| . crc(left) ^ crc(right)`` with ``M`` the
one-byte state-advance bit-matrix. So:

1. inclusive prefix CRCs ``S[i] = crc(frame[0..i])`` come from a
   Kogge-Stone scan in log2(n) levels, each level XOR-combining a shifted
   copy through the CONSTANT matrix ``M^(2^k)`` — static bit-plane wiring,
   no gathers, fully vectorized over (lanes, positions);
2. the CRC of ANY 187-byte window then falls out algebraically:
   ``crc(frame[p-187..p-1]) = S[p-1] ^ M^187 . S[p-188]``, evaluated for
   every position p at once.

The host is left a branchless memcpy + flag lookup (the stitch loop's
data-dependent part: SYNCD alignment and the one cross-frame partial
packet, whose window spans two frames and is checked on the host).
"""

import functools

import jax.numpy as jnp
import numpy as np

from ..spec.scramblers import CRC8_POLY, crc8_table


@functools.lru_cache(maxsize=4)
def _m1(poly: int = CRC8_POLY):
    """One-byte CRC state advance as an (8, 8) GF(2) bit matrix: the CRC
    update ``crc' = table[crc ^ byte] = M.crc ^ M.byte`` is linear, and
    column j of M is ``table[1 << j]`` as bits."""
    t = crc8_table(poly)
    M = np.zeros((8, 8), np.uint8)
    for j in range(8):
        v = int(t[1 << j])
        for k in range(8):
            M[k, j] = (v >> k) & 1
    return M


def _matpow(M, e):
    R = np.eye(8, dtype=np.uint8)
    A = M.copy()
    while e:
        if e & 1:
            R = (R @ A) % 2
        A = (A @ A) % 2
        e >>= 1
    return R


def _apply(M, c):
    """Static-wired GF(2) matrix application on trailing bit planes:
    c (..., 8) 0/1 -> (..., 8). Each output bit XORs the constant-selected
    input planes (no matmul, no gather)."""
    outs = []
    for r in range(8):
        cols = np.flatnonzero(M[r])
        if cols.size == 0:
            outs.append(jnp.zeros_like(c[..., 0]))
            continue
        acc = c[..., int(cols[0])]
        for j in cols[1:]:
            acc = acc ^ c[..., int(j)]
        outs.append(acc)
    return jnp.stack(outs, axis=-1)


def crc8_prefix_bits(frames_u8):
    """Inclusive per-byte prefix CRCs of each frame.

    frames_u8: (..., n) uint8. Returns (bits (..., n, 8) int8 raw byte
    bits, S (..., n, 8) int8 prefix-CRC bits)."""
    b = frames_u8.astype(jnp.int32)
    bits = ((b[..., None] >> jnp.arange(8, dtype=jnp.int32)) & 1).astype(
        jnp.int8
    )
    M1 = _m1()
    c = _apply(M1, bits)                       # crc of each single byte
    n = c.shape[-2]
    k = 0
    while (1 << k) < n:
        d = 1 << k
        A = _matpow(M1, d)
        # left neighbour 2^k back (zeros shifted in: those positions are
        # already full prefixes)
        pad = [(0, 0)] * (c.ndim - 2) + [(d, 0), (0, 0)]
        left = jnp.pad(c, pad)[..., :n, :]
        c = c ^ _apply(A, left)
        k += 1
    return bits, c


def packet_validity(frames_u8, window: int = 187):
    """Per-position CRC-window validity + header validity for each frame.

    frames_u8: (B, n) uint8 descrambled BBFRAME bytes. Returns
    (ok_packed (B, ceil(n/8)) uint8 LSB-first, hdr_ok (B,) int32):
    ``ok[p]`` (p >= window) says byte p equals the CRC-8 of the preceding
    ``window`` bytes — the TS user-packet check; ``hdr_ok`` checks the
    10-byte BBHEADER (CRC over 9 bytes vs byte 9)."""
    bits, S = crc8_prefix_bits(frames_u8)
    n = frames_u8.shape[-1]
    A = _matpow(_m1(), window)
    pad1 = [(0, 0)] * (S.ndim - 2) + [(1, 0), (0, 0)]
    padw = [(0, 0)] * (S.ndim - 2) + [(window + 1, 0), (0, 0)]
    Sm1 = jnp.pad(S, pad1)[..., :n, :]             # S[p-1]
    Smw = jnp.pad(S, padw)[..., :n, :]             # S[p-window-1]
    crc_seg = Sm1 ^ _apply(A, Smw)
    ok = jnp.all(crc_seg == bits, axis=-1)         # (B, n)
    hdr_ok = jnp.all(S[..., 8, :] == bits[..., 9, :], axis=-1).astype(
        jnp.int32
    )
    npad = (-n) % 8
    okp = jnp.pad(ok.astype(jnp.int32), [(0, 0)] * (ok.ndim - 1)
                  + [(0, npad)])
    w = (1 << jnp.arange(8, dtype=jnp.int32))
    packed = jnp.sum(
        okp.reshape(*ok.shape[:-1], -1, 8) * w, axis=-1
    ).astype(jnp.uint8)
    return packed, hdr_ok
