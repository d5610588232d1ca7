"""Batched BCH decoder tests: correction up to t errors, failure detection."""

import numpy as np
import pytest

from dvbs2rx_tpu.spec import bch_spec
from dvbs2rx_tpu.ops.bch import BCHDecoder


def encode_frame(rng, framesize, t, nbch, kbch):
    msg = rng.integers(0, 256, kbch // 8, dtype=np.uint8)
    parity = bch_spec.bch_encode_bytes(msg, framesize, t)
    return np.concatenate([np.unpackbits(msg), np.unpackbits(parity)])


@pytest.fixture(scope="module")
def dec():
    # short FECFRAME rate 1/2: BCH(7200, 7032), t=12 over GF(2^14)
    return BCHDecoder("short", 12, 7200, 7032)


def test_clean_frames(dec):
    rng = np.random.default_rng(0)
    cw = np.stack([encode_frame(rng, "short", 12, 7200, 7032) for _ in range(3)])
    out, n = dec(cw)
    assert np.array_equal(np.asarray(out), cw)
    assert np.all(np.asarray(n) == 0)


@pytest.mark.parametrize("n_errors", [1, 2, 5, 12])
def test_corrects_errors(dec, n_errors):
    rng = np.random.default_rng(n_errors)
    cw = np.stack([encode_frame(rng, "short", 12, 7200, 7032) for _ in range(2)])
    corrupted = cw.copy()
    for b in range(2):
        pos = rng.choice(7200, n_errors, replace=False)
        corrupted[b, pos] ^= 1
    out, n = dec(corrupted)
    assert np.array_equal(np.asarray(out), cw)
    assert np.all(np.asarray(n) == n_errors)


def test_mixed_batch(dec):
    rng = np.random.default_rng(42)
    cw = np.stack([encode_frame(rng, "short", 12, 7200, 7032) for _ in range(3)])
    corrupted = cw.copy()
    corrupted[1, rng.choice(7200, 7, replace=False)] ^= 1
    corrupted[2, rng.choice(7200, 3, replace=False)] ^= 1
    out, n = dec(corrupted)
    assert np.array_equal(np.asarray(out), cw)
    assert np.asarray(n).tolist() == [0, 7, 3]


def test_uncorrectable_flagged(dec):
    rng = np.random.default_rng(7)
    cw = np.stack([encode_frame(rng, "short", 12, 7200, 7032)])
    corrupted = cw.copy()
    corrupted[0, rng.choice(7200, 40, replace=False)] ^= 1  # way beyond t=12
    out, n = dec(corrupted)
    assert int(np.asarray(n)[0]) == -1


def test_normal_frame_field():
    """GF(2^16) variant used for normal FECFRAMEs."""
    dec = BCHDecoder("normal", 12, 16200, 16008)
    rng = np.random.default_rng(1)
    cw = np.stack([encode_frame(rng, "normal", 12, 16200, 16008)])
    corrupted = cw.copy()
    corrupted[0, rng.choice(16200, 12, replace=False)] ^= 1
    out, n = dec(corrupted)
    assert np.array_equal(np.asarray(out), cw)
    assert int(np.asarray(n)[0]) == 12
