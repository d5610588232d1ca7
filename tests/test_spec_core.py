"""Spec-core golden tests: constants and tables vs. first-principles checks.

Oracles follow the reference QA strategy (SURVEY.md §4): SOF word, PLSC
scrambler, RM codewords, scrambling sequences, FEC geometry, LDPC QC
structure invariants.
"""

import numpy as np
import pytest

from dvbs2rx_tpu.spec import pl_defs, reed_muller, pi2_bpsk, scramblers
from dvbs2rx_tpu.spec.pls import parse_pls, make_pls
from dvbs2rx_tpu.spec.fec_params import get_fec_info, DVBS2_MODCODS, FEC_TABLE
from dvbs2rx_tpu.spec.ldpc_tables import get_code, available_tables


def test_pl_defs():
    assert pl_defs.PLHEADER_LEN == 90
    assert pl_defs.MAX_PLFRAME_PAYLOAD == 360 * 90 + 22 * 36
    assert pl_defs.SOF_BITS.shape == (26,)
    # SOF = 0x18D2E82 as 26 bits MSB first
    assert "".join(map(str, pl_defs.SOF_BITS)) == format(0x18D2E82, "026b")
    assert pl_defs.bits_to_u64(pl_defs.PLSC_SCRAMBLER_BITS) == pl_defs.PLSC_SCRAMBLER


def test_pls_parse():
    # QPSK 1/4 (modcod 1) normal, no pilots
    info = parse_pls(make_pls(1, False, False))
    assert info.n_mod == 2 and info.n_slots == 360
    assert info.plframe_len == 361 * 90
    assert info.payload_len == 360 * 90
    # short frames: 4x fewer slots
    info_s = parse_pls(make_pls(1, True, False))
    assert info_s.n_slots == 90
    # pilots: (n_slots-1)//16 blocks
    info_p = parse_pls(make_pls(5, False, True))
    assert info_p.n_pilots == (360 - 1) // 16 == 22
    assert info_p.plframe_len == 361 * 90 + 22 * 36
    # dummy frame
    dummy = parse_pls(0)
    assert dummy.dummy_frame and dummy.n_slots == 36 and not dummy.has_pilots
    # 8PSK/16APSK/32APSK slot counts
    assert parse_pls(make_pls(12, False, False)).n_slots == 240
    assert parse_pls(make_pls(18, False, False)).n_slots == 180
    assert parse_pls(make_pls(24, False, False)).n_slots == 144


def test_reed_muller_properties():
    cw = reed_muller.codeword_bits()
    assert cw.shape == (128, 64)
    # Linearity over the 6 MSBs and minimum distance 32
    weights = cw.sum(axis=1)
    assert weights[0] == 0
    nz = weights[1:]
    assert nz.min() == 32
    # encode/decode round trip, hard and soft
    for pls in [0, 1, 21, 64, 127]:
        bits = reed_muller.encode(pls)
        assert reed_muller.decode_hard(bits) == pls
        soft = (1.0 - 2.0 * (bits ^ pl_defs.PLSC_SCRAMBLER_BITS)).astype(np.float32)
        assert reed_muller.decode_soft(soft) == pls
    # soft decode with noise
    rng = np.random.default_rng(0)
    bits = reed_muller.encode(21)
    soft = (1.0 - 2.0 * (bits ^ pl_defs.PLSC_SCRAMBLER_BITS)).astype(np.float32)
    noisy = soft + rng.normal(0, 0.7, 64).astype(np.float32)
    assert reed_muller.decode_soft(noisy) == 21
    # codeword-subset restriction
    assert reed_muller.decode_soft(noisy, enabled=[3, 21]) == 21


def test_pi2_bpsk_roundtrip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 64).astype(np.uint8)
    syms = pi2_bpsk.map_bpsk(bits)
    assert np.allclose(np.abs(syms), 1.0, atol=1e-6)
    # consecutive symbols always differ by +-90 degrees
    dphi = np.angle(syms[1:] * np.conj(syms[:-1]))
    assert np.allclose(np.abs(dphi), np.pi / 2, atol=1e-6)
    assert np.array_equal(pi2_bpsk.demap_bpsk(syms), bits)
    # differential demap needs the last SOF symbol (bit 0 at odd index 25)
    last_sof = pi2_bpsk.map_bpsk(np.concatenate([np.zeros(26, np.uint8), bits]))[25]
    seq = np.concatenate([[last_sof], syms])
    assert np.array_equal(pi2_bpsk.demap_bpsk_diff(seq), bits)
    # differential demap is CFO-robust: apply a strong rotation ramp
    rot = np.exp(1j * 2 * np.pi * 0.02 * np.arange(65)).astype(np.complex64)
    assert np.array_equal(pi2_bpsk.demap_bpsk_diff(seq * rot), bits)


def test_plheader_structure():
    """PLHEADER symbols for a known PLS: SOF + scrambled-RM PLSC, pi/2-BPSK."""
    pls = 21
    plsc_bits = reed_muller.encode(pls) ^ pl_defs.PLSC_SCRAMBLER_BITS
    header_bits = np.concatenate([pl_defs.SOF_BITS, plsc_bits])
    syms = pi2_bpsk.map_bpsk(header_bits)
    assert syms.shape == (90,)
    # first SOF symbol: bit 0 at even index -> (+s, +s)
    s = pl_defs.SQRT2_2
    assert np.allclose(syms[0], s + 1j * s)
    # last SOF symbol: bit 0 at odd index 25 -> (-s, +s)
    assert np.allclose(syms[25], -s + 1j * s)


def test_pl_scrambler():
    rn = scramblers.pl_scrambling_rn(0)
    assert rn.shape[0] == pl_defs.MAX_PLFRAME_PAYLOAD
    assert rn.max() <= 3
    assert not np.all(rn == rn[0])
    seq = scramblers.pl_scrambling_sequence(0)
    dseq = scramblers.pl_descrambling_sequence(0)
    assert np.allclose(seq * dseq, 1.0)
    # gold code changes the sequence
    assert not np.array_equal(rn, scramblers.pl_scrambling_rn(1))
    # scramble+descramble round trip on random symbols
    rng = np.random.default_rng(2)
    x = (rng.normal(size=100) + 1j * rng.normal(size=100)).astype(np.complex64)
    y = x * seq[:100]
    assert np.allclose(y * dseq[:100], x, atol=1e-6)


def test_bb_derandomizer():
    seq = scramblers.bb_derandomizer_bytes(16)
    # First bits of the standard PRBS 000000110011... for register 100101010000000:
    # regenerate independently with a python LFSR over bits
    sr = [1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0]  # MSB..LSB of 0x4A80 >> 0? check via bits
    bits_ref = []
    reg = 0x4A80
    for _ in range(128):
        b = (reg ^ (reg >> 1)) & 1
        bits_ref.append(b)
        reg = (reg >> 1) | (b << 14)
    packed = np.packbits(np.array(bits_ref, dtype=np.uint8))
    assert np.array_equal(seq, packed)
    # XOR is an involution
    data = np.arange(16, dtype=np.uint8)
    assert np.array_equal((data ^ seq) ^ seq, data)


def test_crc8():
    data = np.arange(9, dtype=np.uint8)
    c = scramblers.crc8(data)
    assert 0 <= c < 256
    full = np.concatenate([data, [c]]).astype(np.uint8)
    assert scramblers.crc8_check(full)
    full[3] ^= 0x10
    assert not scramblers.crc8_check(full)


def test_fec_params():
    info = get_fec_info("normal", "1/4")
    assert (info.kbch, info.nbch, info.t, info.nldpc) == (16008, 16200, 12, 64800)
    assert info.ldpc_table == "S2_B1"
    info = get_fec_info("normal", "3/5")
    assert (info.kbch, info.nbch, info.t) == (38688, 38880, 12)
    info = get_fec_info("short", "1/2")
    assert info.nldpc == 16200
    assert info.ldpc_table == "S2_C4"
    info = get_fec_info("medium", "1/3")
    assert info.nldpc == 32400 and info.rate_enum == "C1_3_MEDIUM"
    # every MODCOD resolves for its valid frame sizes
    for modcod, (const, rate) in DVBS2_MODCODS.items():
        get_fec_info("normal", rate)
        if modcod <= 10 or rate in ("8/9",):  # short frames exist for these
            pass
    # table count sanity: 60 entries extracted
    assert len(FEC_TABLE) == 60


@pytest.mark.parametrize("name", ["S2_B1", "S2_B4", "S2_C4", "S2X_B2", "T2_A3"])
def test_ldpc_tables_structure(name):
    code = get_code(name)
    assert code.R % code.M == 0
    assert code.K % code.M == 0
    layers = code.layers
    # Every base address lands in exactly one layer; total edges match
    assert int(layers["cnt"].sum()) * 1 == sum(len(a) for a in code.block_addr)
    # links_total = data edges * M + parity edges (R own + R-1 previous)
    data_links = sum(len(a) for a in code.block_addr) * code.M
    assert code.links_total == data_links + 2 * code.R - 1


def test_ldpc_tables_all_load():
    names = available_tables()
    assert len(names) == 57
    for n in names:
        c = get_code(n)
        assert c.N in (64800, 16200, 32400)


def test_ldpc_encode_satisfies_checks():
    code = get_code("S2_C4")  # short 1/2: small enough to be quick
    rng = np.random.default_rng(3)
    info = rng.integers(0, 2, code.K).astype(np.uint8)
    cw = code.encode(info)
    assert cw.shape == (code.N,)
    assert np.array_equal(cw[: code.K], info)
    assert code.check(cw)
    # flipped bit breaks parity
    cw[5] ^= 1
    assert not code.check(cw)
