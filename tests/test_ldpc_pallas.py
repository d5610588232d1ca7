"""Pallas LDPC kernel vs the XLA roll-based decoder: bit-exact agreement.

Runs the kernel in Pallas interpreter mode (CPU); the device path differs
only in the lowering of the same traced program. Covers a variable-degree
table (S2_C1: cnt 1..2 exercises edge padding) and a high-degree table, with
both non-converging (random-LLR, full trial count) and converging
(encoded + mild noise, early-exit) inputs.
"""

import numpy as np
import pytest

from dvbs2rx_tpu.spec.ldpc_tables import get_code
from dvbs2rx_tpu.ops.ldpc import LDPCDecoder
from dvbs2rx_tpu.ops.ldpc_pallas import PallasLDPCDecoder


def _compare(table, llrs, trials):
    code = get_code(table)
    ref = LDPCDecoder(code, max_trials=trials)
    ker = PallasLDPCDecoder(code, max_trials=trials, interpret=True)
    h0, l0, it0, c0 = [np.asarray(x) for x in ref(llrs)]
    h1, l1, it1, c1 = [np.asarray(x) for x in ker(llrs)]
    assert int(it1) == int(it0)
    np.testing.assert_array_equal(c1, c0)
    np.testing.assert_array_equal(h1, h0)
    np.testing.assert_array_equal(l1, l0)


@pytest.mark.parametrize("table", ["S2_C1", "S2_C10"])
def test_random_llrs_bit_exact(table):
    code = get_code(table)
    rng = np.random.default_rng(3)
    llrs = rng.integers(-25, 25, (8, code.N), dtype=np.int8)
    _compare(table, llrs, trials=4)


def test_converging_early_exit_bit_exact():
    code = get_code("S2_C1")
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, (8, code.K), dtype=np.uint8)
    cw = code.encode(bits)
    llrs = np.where(cw == 0, 14, -14).astype(np.int8)
    flip = rng.random((8, code.N)) < 0.02
    llrs = np.where(flip, -llrs, llrs).astype(np.int8)
    code_ok = get_code("S2_C1")
    ker = PallasLDPCDecoder(code_ok, max_trials=10, interpret=True)
    h1, _, it1, c1 = [np.asarray(x) for x in ker(llrs)]
    assert bool(np.all(c1))
    assert int(it1) < 10
    np.testing.assert_array_equal(h1[:, : code.K], bits)
    _compare("S2_C1", llrs, trials=10)
