"""pi/2-BPSK mapping/demapping for the PLHEADER (ETSI EN 302 307-1 Sec. 5.5.2).

Numpy reference implementations (the JAX hot paths live in ``ops``); parity
with reference ``lib/pi2_bpsk.cc``. The index convention is C-style (starting
at 0), so the even/odd mappings are swapped relative to the standard's
1-based convention:

    even index: bit 0 -> (+s, +s),  bit 1 -> (-s, -s)
    odd  index: bit 0 -> (-s, +s),  bit 1 -> (+s, -s)

with s = sqrt(2)/2.
"""

import numpy as np

from .pl_defs import SQRT2_2

# Derotation factors turning pi/2-BPSK into real 2-PAM (+1 for bit 0):
# even index: multiply by (s - js); odd index: multiply by (-s - js).
_ROT_EVEN = np.complex64(complex(SQRT2_2, -SQRT2_2))
_ROT_ODD = np.complex64(complex(-SQRT2_2, -SQRT2_2))


def map_bpsk(bits: np.ndarray) -> np.ndarray:
    """Map bits (uint8 array, transmission order) to pi/2-BPSK symbols."""
    bits = np.asarray(bits)
    n = bits.shape[-1]
    j = np.arange(n)
    even = (j & 1) == 0
    s = np.float32(SQRT2_2)
    sign = 1.0 - 2.0 * bits.astype(np.float32)  # +1 for bit 0, -1 for bit 1
    re = np.where(even, s * sign, -s * sign)
    im = s * sign
    return (re + 1j * im).astype(np.complex64)


def derotate_bpsk(syms: np.ndarray) -> np.ndarray:
    """Rotate pi/2-BPSK symbols onto the real axis; returns real soft decisions.

    The result is positive for bit 0 and negative for bit 1.
    """
    syms = np.asarray(syms)
    n = syms.shape[-1]
    rot = np.where((np.arange(n) & 1) == 0, _ROT_EVEN, _ROT_ODD)
    return np.real(syms * rot).astype(np.float32)


def demap_bpsk(syms: np.ndarray) -> np.ndarray:
    """Coherent hard demap; returns uint8 bits."""
    return (derotate_bpsk(syms) < 0).astype(np.uint8)


def demap_bpsk_diff(syms: np.ndarray) -> np.ndarray:
    """Differential hard demap robust to CFO.

    ``syms`` must start with the last SOF symbol followed by the N symbols to
    demap (N+1 inputs total). Decision rule (reference ``lib/pi2_bpsk.cc:76``):
    starting from bit=0 (last SOF bit), flip when the differential's imaginary
    part is negative, and flip again on odd indexes.
    """
    syms = np.asarray(syms)
    n = syms.shape[-1] - 1
    diff = np.conj(syms[1:]) * syms[:-1]
    flips = (np.imag(diff) < 0).astype(np.uint8) ^ (np.arange(n) & 1).astype(np.uint8)
    # bit[j] = bit[j-1] ^ flips[j] with bit[-1] = 0 -> cumulative XOR of flips
    return np.bitwise_xor.accumulate(flips).astype(np.uint8)
