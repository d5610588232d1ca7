"""BCH construction tests against known generator polynomials.

Small-field oracles from classic BCH literature (the same vectors used in the
reference's ``lib/qa_bch.cc:90-180``), plus DVB-S2 degree checks: the
generator degree must equal nbch - kbch for every FEC configuration.
"""

import numpy as np
import pytest

from dvbs2rx_tpu.spec.galois import GF2m, gf2_poly_mul, gf2_poly_rem
from dvbs2rx_tpu.spec import bch_spec
from dvbs2rx_tpu.spec.fec_params import FEC_TABLE


def _gen_poly(gf: GF2m, t: int) -> int:
    from dvbs2rx_tpu.spec.galois import gf2_poly_lcm

    g = 1
    for i in range(t):
        g = gf2_poly_lcm(g, gf.min_poly(int(gf.alpha_pow(2 * i + 1))))
    return g


def test_gf16_gen_polys():
    gf = GF2m(0b10011)  # GF(2^4), x^4 + x + 1
    assert _gen_poly(gf, 1) == 0b10011
    assert _gen_poly(gf, 2) == 0b111010001  # x^8+x^7+x^6+x^4+1
    assert _gen_poly(gf, 3) == 0b10100110111


def test_gf64_gen_polys():
    gf = GF2m(0b1000011)  # GF(2^6), x^6 + x + 1
    g1 = 0b1000011
    assert _gen_poly(gf, 1) == g1
    g2 = gf2_poly_mul(g1, 0b1010111)
    assert _gen_poly(gf, 2) == g2
    g3 = gf2_poly_mul(g2, 0b1100111)
    assert _gen_poly(gf, 3) == g3


@pytest.mark.parametrize("framesize", ["normal", "short", "medium"])
def test_dvbs2_gen_poly_degrees(framesize):
    """deg(g) must equal nbch - kbch for every DVB-S2 code of this frame size."""
    seen = set()
    for (fs, rate), v in FEC_TABLE.items():
        if fs != framesize:
            continue
        key = (v["t"], v["nbch"] - v["kbch"])
        if key in seen:
            continue
        seen.add(key)
        g = bch_spec.generator_poly(framesize, v["t"])
        assert g.bit_length() - 1 == v["nbch"] - v["kbch"], (rate, v)


def test_bch_encode_roundtrip():
    """Systematic encode: codeword polynomial must be divisible by g(x)."""
    framesize, t, nbch, kbch = "normal", 12, 16200, 16008
    rng = np.random.default_rng(0)
    msg_bits = rng.integers(0, 2, kbch).astype(np.uint8)
    msg_bytes = np.packbits(msg_bits)
    parity = bch_spec.bch_encode_bytes(msg_bytes, framesize, t)
    assert parity.size == (nbch - kbch) // 8
    cw_bits = np.concatenate([msg_bits, np.unpackbits(parity)])
    # codeword as polynomial: first transmitted bit = highest power
    cw_int = int.from_bytes(np.packbits(cw_bits).tobytes(), "big")
    g = bch_spec.generator_poly(framesize, t)
    assert gf2_poly_rem(cw_int, g) == 0


def test_syndrome_matrix():
    """Binary-matmul syndromes match direct polynomial evaluation."""
    framesize, t, nbch, kbch = "short", 12, 3240, 3072
    # use a small synthetic shortened code over the short-frame field
    field = bch_spec.field_for(framesize)
    A = bch_spec.syndrome_bit_matrix(framesize, t, nbch)
    assert A.shape == (nbch, 2 * t * field.m)
    rng = np.random.default_rng(1)
    r = rng.integers(0, 2, nbch).astype(np.uint8)
    syn_bits = (r @ A.astype(np.int64)) % 2
    # direct: S_i = sum over set bits of alpha^(i * power)
    powers = nbch - 1 - np.flatnonzero(r)
    for i in range(1, 2 * t + 1):
        vals = field.alpha_pow(i * powers)
        s_direct = 0
        for v in vals.tolist():
            s_direct ^= v
        s_mat = 0
        for b in range(field.m):
            s_mat |= int(syn_bits[(i - 1) * field.m + b]) << b
        assert s_mat == s_direct

    # all-zero syndrome for a valid codeword
    kb = kbch // 8
    msg = rng.integers(0, 256, kb, dtype=np.uint8)
    # encode against a true shortened code with n = nbch
    parity = bch_spec.bch_encode_bytes(msg, framesize, t)
    cw = np.concatenate([np.unpackbits(msg), np.unpackbits(parity)])
    assert cw.size == nbch
    syn = (cw @ A.astype(np.int64)) % 2
    assert not syn.any()
