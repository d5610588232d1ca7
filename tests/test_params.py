"""Parameter validation/translation tests (reference qa_params.py analog)."""

import pytest

from dvbs2rx_tpu.utils.params import (
    validate, translate, dvbs2_pls, pls_filter, pl_info,
)


def test_validate():
    assert validate(modcod="qpsk1/2", frame_size="normal")
    assert validate(modcod="8psk3/5", frame_size="short", rolloff=0.35)
    with pytest.raises(ValueError):
        validate(modcod="qpsk7/8")
    with pytest.raises(ValueError):
        validate(frame_size="tiny")
    with pytest.raises(ValueError):
        validate(rolloff=0.15)  # S2X-only rolloff under DVB-S2
    assert validate(standard="DVB-S2X", rolloff=0.15)
    with pytest.raises(ValueError):
        validate(modcod="qpsk9/10", frame_size="short")  # no short 9/10


def test_translate():
    const, rate, fec, pls = translate("qpsk1/2", "normal", pilots=False)
    assert (const, rate) == ("QPSK", "1/2")
    assert fec.nldpc == 64800
    assert pls == (4 << 2)


def test_dvbs2_pls_and_filter():
    assert dvbs2_pls(21, False, True) == (21 << 2) | 1
    assert dvbs2_pls("qpsk3/5", True, False) == (5 << 2) | 2
    lo, hi = pls_filter(0, 63, 64, 127)
    assert lo == (1 << 0) | (1 << 63)
    assert hi == (1 << 0) | (1 << 63)
    with pytest.raises(ValueError):
        pls_filter(128)


def test_pl_info():
    info = pl_info("qpsk3/5", short_fecframe=False, pilots=True)
    assert info["n_slots"] == 360
    assert info["n_pilots"] == 22
    assert info["plframe_len"] == 361 * 90 + 22 * 36
    assert pl_info(0, False, False)["dummy"]
