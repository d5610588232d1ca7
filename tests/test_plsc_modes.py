"""PLSC decode-mode tests (reference ``pl_signaling.cc:114-152``).

The reference decoder supports (coherent, soft) combinations: coherent-soft
(default), coherent-hard, and differential-hard — the latter robust to large
CFO since it works on symbol-to-symbol differentials. It can also restrict
the ML search to an a-priori PLS subset (``reed_muller.cc:42-55``,
``plsync_cc_impl.cc:88-141``).
"""

import numpy as np
import pytest

from dvbs2rx_tpu.ops import cplx, plsync
from dvbs2rx_tpu.spec import pi2_bpsk, pl_defs, reed_muller


def clean_plheader(pls: int) -> np.ndarray:
    bits = np.concatenate([
        pl_defs.SOF_BITS,
        reed_muller.codeword_bits()[pls] ^ pl_defs.PLSC_SCRAMBLER_BITS,
    ])
    return pi2_bpsk.map_bpsk(bits)


def rotate(syms, foffset, phase0=0.0):
    n = np.arange(syms.size)
    return syms * np.exp(1j * (phase0 + 2 * np.pi * foffset * n)).astype(
        np.complex64
    )


MODES = {
    "coherent-soft": plsync.plsc_decode_soft,
    "coherent-hard": plsync.plsc_decode_hard,
    "differential": plsync.plsc_decode_diff,
}


@pytest.mark.parametrize("mode", list(MODES))
@pytest.mark.parametrize("pls", [0, 21 << 2 | 2, 85, 127])
def test_clean_decode_all_modes(mode, pls):
    hdr = cplx.from_np(clean_plheader(pls))
    out, scores = MODES[mode](hdr)
    assert int(out) == pls
    assert scores.shape[-1] == 128


@pytest.mark.parametrize("mode", list(MODES))
def test_moderate_noise_all_modes(mode):
    rng = np.random.default_rng(0)
    pls = (12 << 2) | 1
    syms = clean_plheader(pls)
    noisy = syms + (rng.normal(0, 0.3, (90, 2)) @ [1, 1j]).astype(np.complex64)
    out, _ = MODES[mode](cplx.from_np(noisy))
    assert int(out) == pls


def test_differential_survives_large_cfo():
    """At CFO = 0.15 cycles/symbol the coherent modes are hopeless (the
    constellation spins through ~54 deg/symbol) but the differential demap
    still decodes — the reference's motivation for the mode."""
    pls = (21 << 2) | 2
    hdr = rotate(clean_plheader(pls), 0.15, phase0=0.7)
    p_diff, _ = plsync.plsc_decode_diff(cplx.from_np(hdr))
    assert int(p_diff) == pls
    p_soft, _ = plsync.plsc_decode_soft(cplx.from_np(hdr))
    p_hard, _ = plsync.plsc_decode_hard(cplx.from_np(hdr))
    assert int(p_soft) != pls and int(p_hard) != pls


def test_subset_restriction_recovers():
    """With the search restricted to the expected PLS subset, a header too
    noisy for the full-128 search still decodes correctly (the reference's
    expected_plsc a-priori knowledge)."""
    pls = (4 << 2) | 1
    mask = np.zeros(128, bool)
    mask[:4] = True       # dummies always expected
    mask[pls] = True
    syms = clean_plheader(pls)
    hit = False
    for seed in range(200):
        rng = np.random.default_rng(seed)
        noisy = syms + (rng.normal(0, 1.6, (90, 2)) @ [1, 1j]).astype(
            np.complex64
        )
        hdr = cplx.from_np(noisy)
        full, _ = plsync.plsc_decode_soft(hdr)
        if int(full) == pls:
            continue
        hit = True
        restricted, _ = plsync.plsc_decode_soft(hdr, enabled_mask=mask)
        assert int(restricted) in (pls, 0, 1, 2, 3)
        break
    assert hit, "noise level never broke the unrestricted search"


def test_diff_matches_spec_demap():
    """The JAX differential decode path must agree with the numpy spec
    demap + hard RM decode composition."""
    rng = np.random.default_rng(5)
    pls = (16 << 2) | 3
    noisy = clean_plheader(pls) + (
        rng.normal(0, 0.4, (90, 2)) @ [1, 1j]
    ).astype(np.complex64)
    bits_scr = pi2_bpsk.demap_bpsk_diff(noisy[pl_defs.SOF_LEN - 1:])
    bits = bits_scr ^ pl_defs.PLSC_SCRAMBLER_BITS
    ref = reed_muller.decode_hard(bits)
    out, _ = plsync.plsc_decode_diff(cplx.from_np(noisy))
    assert int(out) == ref


def test_acm_expected_pls_mask():
    """RxConfig.pls_expected narrows the receiver's ML search subset while
    dummies stay searched; pls_list alone keeps the full search (so
    out-of-filter frames decode to their true PLS for rejection)."""
    from dvbs2rx_tpu.rx.receiver import ACMReceiver, RxConfig
    from dvbs2rx_tpu.spec.pls import make_pls

    pls_a = make_pls(4, True, False)
    rx = ACMReceiver(RxConfig(acm_vcm=True, pls_list=(pls_a,)))
    assert rx._plsc_search_mask.sum() > 100      # full valid search
    assert rx._pls_enabled.sum() == 1

    rx2 = ACMReceiver(
        RxConfig(acm_vcm=True, pls_list=(pls_a,), pls_expected=(pls_a,))
    )
    assert set(np.where(rx2._plsc_search_mask)[0]) == {0, 1, 2, 3, pls_a}
