"""LDPC decoder tests: convergence, error correction, early exit."""

import numpy as np
import pytest

from dvbs2rx_tpu.spec.ldpc_tables import get_code
from dvbs2rx_tpu.ops.ldpc import LDPCDecoder


def _llrs_from_bits(bits, mag=16):
    return np.where(bits > 0, -mag, mag).astype(np.int8)


@pytest.fixture(scope="module")
def code():
    return get_code("S2_C4")  # short FECFRAME rate 1/2 (N=16200, K=7200)


@pytest.fixture(scope="module")
def decoder(code):
    return LDPCDecoder(code, max_trials=25)


def test_noiseless_converges_immediately(code, decoder):
    rng = np.random.default_rng(0)
    B = 4
    info = rng.integers(0, 2, (B, code.K)).astype(np.uint8)
    cw = code.encode(info)
    hard, llrs_out, iters, ok = decoder(_llrs_from_bits(cw))
    assert int(iters) == 0
    assert np.all(np.asarray(ok))
    assert np.array_equal(np.asarray(hard), cw)


def test_corrects_noisy_llrs(code, decoder):
    rng = np.random.default_rng(1)
    B = 4
    info = rng.integers(0, 2, (B, code.K)).astype(np.uint8)
    cw = code.encode(info)
    # BPSK over AWGN at ~1.5 dB Eb/N0 for rate 1/2 -> well within the code's
    # correction capability; LLR = 4/N0 * amplitude, quantized int8
    esn0_db = 1.0
    esn0 = 10 ** (esn0_db / 10)
    n0 = 1 / esn0
    x = 1.0 - 2.0 * cw.astype(np.float32)
    y = x + rng.normal(0, np.sqrt(n0 / 2), x.shape).astype(np.float32)
    llrs = np.clip(np.rint(y * (4 / n0)), -128, 127).astype(np.int8)
    # sanity: raw hard decisions contain errors
    raw_ber = np.mean((llrs < 0) != cw)
    assert raw_ber > 0.01
    hard, _, iters, ok = decoder(llrs)
    assert np.all(np.asarray(ok)), f"not converged after {iters} iters"
    assert np.array_equal(np.asarray(hard), cw)
    assert int(iters) >= 1


def test_detects_uncorrectable(code, decoder):
    rng = np.random.default_rng(2)
    B = 2
    llrs = rng.integers(-20, 20, (B, code.N)).astype(np.int8)  # pure noise
    hard, _, iters, ok = decoder(llrs)
    assert int(iters) == 25
    assert not np.any(np.asarray(ok))


def test_mixed_batch_converges_together(code, decoder):
    """A clean frame and a noisy frame in one batch both decode correctly."""
    rng = np.random.default_rng(3)
    info = rng.integers(0, 2, (2, code.K)).astype(np.uint8)
    cw = code.encode(info)
    llrs = _llrs_from_bits(cw)
    noisy = llrs.astype(np.int16).copy()
    flip = rng.choice(code.N, 600, replace=False)
    noisy[1, flip] = -noisy[1, flip] // 4  # weak wrong-sign LLRs
    noisy = noisy.astype(np.int8)
    hard, _, iters, ok = decoder(noisy)
    assert np.all(np.asarray(ok))
    assert np.array_equal(np.asarray(hard), cw)


def test_batch_composition_independence(code, decoder):
    """Per-lane freeze at convergence: a frame decodes to the SAME bits
    and LLRs whether it is decoded alone or pooled with slower frames
    (the property that makes cross-channel same-PLS pooling bit-exact;
    the reference's scalar early exit lacks the guarantee)."""
    rng = np.random.default_rng(7)
    info = rng.integers(0, 2, (3, code.K)).astype(np.uint8)
    cw = code.encode(info)
    # frame 0: moderately noisy (converges in a few iterations);
    # frames 1-2: heavily corrupted (converge late or never)
    esn0 = 10 ** (1.0 / 10)
    n0 = 1 / esn0
    x = 1.0 - 2.0 * cw.astype(np.float32)
    y = x + rng.normal(0, np.sqrt(n0 / 2), x.shape).astype(np.float32)
    llrs = np.clip(np.rint(y * (4 / n0)), -128, 127).astype(np.int8)
    flip = rng.choice(code.N, 4000, replace=False)
    llrs[1, flip] = -llrs[1, flip]
    llrs[2] = rng.integers(-10, 10, code.N).astype(np.int8)  # never converges

    h_alone, l_alone, _, ok_alone = decoder(llrs[:1])
    h_pool, l_pool, _, ok_pool = decoder(llrs)
    assert np.asarray(ok_alone)[0] and np.asarray(ok_pool)[0]
    np.testing.assert_array_equal(np.asarray(h_pool)[0],
                                  np.asarray(h_alone)[0])
    np.testing.assert_array_equal(np.asarray(l_pool)[0],
                                  np.asarray(l_alone)[0])


@pytest.mark.parametrize("table,esn0_db", [
    ("S2_C2", -1.0),    # rate 1/3 short (threshold ~ -1.2 dB BPSK-equivalent)
    ("S2X_C1", -2.0),   # rate 11/45 short
    ("T2_B3", 3.0),     # DVB-T2 rate 3/5 short
])
def test_other_code_tables(table, esn0_db):
    """Decoder generality across S2 / S2X / T2 short tables."""
    c = get_code(table)
    dec = LDPCDecoder(c, max_trials=25)
    rng = np.random.default_rng(11)
    info = rng.integers(0, 2, (2, c.K)).astype(np.uint8)
    cw = c.encode(info)
    esn0 = 10 ** (esn0_db / 10)
    n0 = 1 / esn0
    y = (1.0 - 2.0 * cw) + rng.normal(0, np.sqrt(n0 / 2), cw.shape)
    llrs = np.clip(np.rint(y * 4 / n0), -128, 127).astype(np.int8)
    hard, _, iters, ok = dec(llrs)
    assert np.all(np.asarray(ok))
    assert np.array_equal(np.asarray(hard), cw)


@pytest.mark.parametrize("algo,update", [
    ("min-sum", "normal"),
    ("min-sum-c", "normal"),
    ("offset-min-sum", "self-corrected"),
    ("min-sum", "self-corrected"),
])
def test_algorithm_variants_correct_noise(code, algo, update):
    """The alternative check-node rules / update rules from the reference's
    ``algorithms.hh`` (MinSum, MinSumC, SelfCorrectedUpdate) all close the
    same operating point as the production offset-min-sum."""
    rng = np.random.default_rng(4)
    B = 4
    info = rng.integers(0, 2, (B, code.K)).astype(np.uint8)
    cw = code.encode(info)
    esn0 = 10 ** (1.2 / 10)
    n0 = 1 / esn0
    x = 1.0 - 2.0 * cw.astype(np.float32)
    y = x + rng.normal(0, np.sqrt(n0 / 2), x.shape).astype(np.float32)
    llrs = np.clip(np.rint(y * (4 / n0)), -128, 127).astype(np.int8)
    assert np.mean((llrs < 0) != cw) > 0.01
    dec = LDPCDecoder(code, max_trials=30, algo=algo, update=update)
    hard, _, iters, ok = dec(llrs)
    assert np.all(np.asarray(ok)), f"{algo}/{update}: not converged ({iters})"
    assert np.array_equal(np.asarray(hard), cw)


def test_min_sum_variants_noiseless(code):
    rng = np.random.default_rng(5)
    info = rng.integers(0, 2, (2, code.K)).astype(np.uint8)
    cw = code.encode(info)
    for algo in ("min-sum", "min-sum-c"):
        dec = LDPCDecoder(code, max_trials=5, algo=algo)
        hard, _, iters, ok = dec(_llrs_from_bits(cw))
        assert int(iters) == 0 and np.all(np.asarray(ok))
        assert np.array_equal(np.asarray(hard), cw)
