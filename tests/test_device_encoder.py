"""Device batched FEC encoder vs the host reference encoders (bit-exact)."""

import numpy as np
import pytest

from dvbs2rx_tpu.ops.encode import get_device_encoder
from dvbs2rx_tpu.spec.bch_spec import bch_encode_bytes
from dvbs2rx_tpu.spec.fec_params import get_fec_info
from dvbs2rx_tpu.spec.ldpc_tables import get_code


@pytest.mark.parametrize("frame_size,rate", [
    ("short", "1/2"), ("normal", "1/2"), ("short", "3/5"),
])
def test_device_encoder_matches_host(frame_size, rate):
    fec = get_fec_info(frame_size, rate)
    code = get_code(fec.ldpc_table)
    enc = get_device_encoder(frame_size, rate)
    rng = np.random.default_rng(1)
    B = 4
    msgs = rng.integers(0, 2, (B, fec.kbch)).astype(np.uint8)

    # BCH: parity matmul vs the streaming byte-LUT encoder
    cw_bch = np.asarray(enc.bch_encode_lane_major(msgs.T.copy())).T
    for i in range(B):
        par_ref = np.unpackbits(
            bch_encode_bytes(np.packbits(msgs[i]), frame_size, fec.t))
        assert np.array_equal(cw_bch[i, fec.kbch:], par_ref)
        assert np.array_equal(cw_bch[i, : fec.kbch], msgs[i])

    # LDPC: roll/prefix-XOR vs the host accumulator encoder
    cw = np.asarray(enc(msgs.T.copy())).T                    # full chain
    ref = code.encode(cw_bch[:, : fec.nbch])
    assert np.array_equal(cw, ref)
    # every parity check must hold
    for i in range(B):
        assert code.check(cw[i])


def test_device_encoder_roundtrip_through_decoder():
    """Device-encoded noisy codewords decode cleanly through the lane-major
    FEC stage (encode and decode agree on every structural convention)."""
    import jax.numpy as jnp
    from dvbs2rx_tpu.rx.receiver import Receiver, RxConfig
    from dvbs2rx_tpu.ops.demap import quantize_llrs

    cfg = RxConfig(modcod="qpsk1/2", frame_size="short", fec_batch=6)
    rx = Receiver(cfg)
    enc = get_device_encoder("short", "1/2")
    rng = np.random.default_rng(2)
    msgs = rng.integers(0, 2, (6, cfg.fec.kbch)).astype(np.uint8)
    cw_t = np.asarray(enc(msgs.T.copy()))                    # (N, B)
    vals = 12.0 * (1.0 - 2.0 * cw_t.astype(np.float32))
    vals += rng.normal(0, 6.0, vals.shape).astype(np.float32)
    llrsT = quantize_llrs(jnp.asarray(vals))
    kbytes, n_corr, _it, _ok, _h = rx._fec_stage_lane_major_impl(llrsT)
    assert np.all(np.asarray(n_corr) >= 0)
    expect = np.packbits(msgs, axis=1)
    assert np.array_equal(np.asarray(kbytes), expect)
