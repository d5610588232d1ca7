"""On-hardware test tier (VERDICT r3 item 4): run via

    DVBS2RX_TEST_TPU=1 python -m pytest tests/ -q -m tpu

Everything else in the suite runs on the hermetic virtual CPU mesh, which
exercises the Pallas kernels only in interpreter mode — a compile-mode
regression (e.g. a Mosaic change breaking ``pltpu.roll``) would otherwise
surface as a bench failure, not a test failure. This tier is the small
set of correctness checks that must hold on the real target:

- Pallas LDPC kernel (compiled, non-interpret) bit-A/B vs the XLA path at
  two lane counts
- the compiled ``pallas_fir`` matched-filter kernel vs the XLA conv
- a 5-step ``StreamReceiver`` integrity run through the real jitted step
- a 3-step ``VCMStreamReceiver`` chain-walk run

``ci.sh`` runs this tier automatically when a TPU is reachable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform != "tpu",
        reason="real TPU required (DVBS2RX_TEST_TPU=1)",
    ),
]


def _awgn_llrs(code, B, esn0_db, seed):
    rng = np.random.default_rng(seed)
    info = rng.integers(0, 2, (B, code.K)).astype(np.uint8)
    cw = code.encode(info)
    esn0 = 10 ** (esn0_db / 10)
    x = 1.0 - 2.0 * cw.astype(np.float32)
    y = x + rng.normal(0, np.sqrt(1 / esn0 / 2), x.shape).astype(np.float32)
    return cw, np.clip(np.rint(y * 4 * esn0), -128, 127).astype(np.int8)


@pytest.mark.parametrize("lanes", [128, 256])
def test_pallas_ldpc_matches_xla_on_hw(lanes):
    """Compiled (non-interpret) Pallas layered decoder == XLA path,
    bit-for-bit, on real hardware at production lane counts."""
    from dvbs2rx_tpu.spec.ldpc_tables import get_code
    from dvbs2rx_tpu.ops.ldpc import LDPCDecoder
    from dvbs2rx_tpu.ops.ldpc_pallas import PallasLDPCDecoder

    code = get_code("S2_C4")      # short rate 1/2
    cw, llrs = _awgn_llrs(code, lanes, 1.0, seed=lanes)
    pal = PallasLDPCDecoder(code, max_trials=25, interpret=False)
    xla = LDPCDecoder(code, max_trials=25)
    llrsT = jnp.asarray(np.ascontiguousarray(llrs.T))
    h_p, l_p, it_p, ok_p = pal.decode_lane_major(llrsT)
    h_x, l_x, it_x, ok_x = xla.decode_lane_major(llrsT)
    np.testing.assert_array_equal(np.asarray(h_p), np.asarray(h_x))
    np.testing.assert_array_equal(np.asarray(l_p), np.asarray(l_x))
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_x))
    assert int(it_p) == int(it_x)
    # and it actually corrected the noise
    assert np.asarray(ok_p).all()
    np.testing.assert_array_equal(np.asarray(h_p).T, cw)


def test_pallas_fir_matches_conv_on_hw():
    """Compiled mf_segmented Pallas kernel == XLA grouped-conv lowering."""
    from dvbs2rx_tpu.ops.pallas_fir import mf_segmented
    from dvbs2rx_tpu.spec.rrc import polyphase_rrc_bank

    bank, L, _delay = polyphase_rrc_bank(2, 0.2, 5, 128)
    rng = np.random.default_rng(0)
    C, S, seg = 4, 8, 512
    OFF = 16
    n_samp = S * seg * 2 + L + OFF + 2
    x = rng.normal(size=(C, n_samp, 2)).astype(np.float32)
    taps = bank[rng.integers(0, 128, (C, S))].astype(np.float32)
    off = rng.integers(0, OFF, (C, S)).astype(np.int32)
    a = mf_segmented(jnp.asarray(x), jnp.asarray(taps), jnp.asarray(off),
                     2, seg, OFF, use_pallas=True, precision="highest")
    b = mf_segmented(jnp.asarray(x), jnp.asarray(taps), jnp.asarray(off),
                     2, seg, OFF, use_pallas=False, precision="highest")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def _ccm_waveform(n_frames, seed=0):
    from dvbs2rx_tpu.tx import Transmitter, TxConfig
    from dvbs2rx_tpu.tx.transmitter import awgn_channel

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short"))
    rng = np.random.default_rng(seed)
    n_pkts = (n_frames * tx.df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    return awgn_channel(tx.ts_to_iq(pkts.reshape(-1)), 13.0, sps=2,
                        seed=seed + 1)


def test_stream_receiver_integrity_on_hw():
    """5 steps of the real compiled CCM stream step: locked, zero BCH
    errors, TS frames delivered."""
    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.rx.stream import StreamReceiver

    C, F, W = 4, 2, 5
    cfg = RxConfig(modcod="qpsk1/2", frame_size="short",
                   sym_sync_impl="ffw", fec_batch=C * F)
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F)
    iq1 = _ccm_waveform(2 * (W + 4) * F + 8, seed=5)
    iq = np.stack([iq1] * C)
    state = sr.prime(iq[:, : sr._n_fe])
    errs = 0
    for t in range(W):
        blk = cplx.from_np(
            iq[:, sr._n_fe + t * sr.n_in: sr._n_fe + (t + 1) * sr.n_in]
        ).astype(np.float32)
        state, kb, stats = sr.step(state, jnp.asarray(blk))
        errs += int(stats["bch_errors"])
    assert errs == 0
    assert bool(np.asarray(stats["locked"]).all())
    assert np.asarray(kb).shape == (C, F, cfg.fec.kbch // 8)


def test_vcm_stream_receiver_on_hw():
    """3 steps of the compiled VCM chain walk on a 2-PLS stream."""
    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.rx.vcm_stream import VCMStreamReceiver
    from dvbs2rx_tpu.spec.pls import make_pls
    from dvbs2rx_tpu.tx import TxConfig
    from dvbs2rx_tpu.tx.transmitter import awgn_channel
    from dvbs2rx_tpu.tx.vcm import VCMTransmitter

    pls = (make_pls(4, True, False), make_pls(5, True, False))
    vtx = VCMTransmitter([TxConfig(modcod="qpsk1/2", frame_size="short"),
                          TxConfig(modcod="qpsk3/5", frame_size="short")])
    rng = np.random.default_rng(1)
    pkts = rng.integers(0, 256, (400, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    iq1 = awgn_channel(vtx.ts_to_iq(pkts.reshape(-1), [0, 1]), 15.0,
                       sps=2, seed=2)
    cfg = RxConfig(modcod="qpsk1/2", frame_size="short", acm_vcm=True,
                   pls_expected=pls)
    sr = VCMStreamReceiver(cfg, n_channels=2, frames_per_step=2,
                           fec_lanes=8)
    iq = np.stack([iq1, iq1])
    state = sr.prime(iq[:, : sr._n_fe])
    assert sr.prime_ok.all()
    frames = 0
    errs = 0
    for t in range(3):
        blk = cplx.from_np(
            iq[:, sr._n_fe + t * sr.n_in: sr._n_fe + (t + 1) * sr.n_in]
        ).astype(np.float32)
        state, outputs, stats = sr.step(state, jnp.asarray(blk))
        frames += int(stats["frames"])
        fired = np.asarray(outputs["fired"])
        nc = np.asarray(outputs["n_corr"])
        errs += int(np.sum((nc < 0) & fired[..., None]))
    assert frames >= 8
    assert errs == 0
    assert bool(np.asarray(stats["locked"]).all())


def test_vcm_product_shape_compiles_on_hw():
    """AOT-compile the VCM step programs at the BENCH shape (64 channels,
    qpsk1/2 + 8psk3/5 normal FECFRAMEs, 128 FEC lanes). The r4 bench died
    on a compile-time scoped-VMEM OOM at exactly this shape while the toy
    on-hw test passed — VMEM-budget failures are shape-dependent, so the
    tier must compile what the bench runs (VERDICT r4 item 4)."""
    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.rx.vcm_stream import VCMStreamReceiver
    from dvbs2rx_tpu.spec.pls import make_pls

    cfg = RxConfig(
        modcod="qpsk1/2", frame_size="normal", acm_vcm=True,
        pls_expected=(make_pls(4, False, True), make_pls(12, False, True)),
    )
    sr = VCMStreamReceiver(cfg, n_channels=64, frames_per_step=2,
                           fec_lanes=128)
    state = sr.init_state_np()
    B = sr.B_lanes
    llr8 = jnp.zeros((sr.n_ldpc, B), jnp.int8)
    xf8 = jnp.zeros((sr.R_SUB * 2, B), jnp.int8)
    meta = jnp.zeros((B, 2), jnp.int32)
    sels = jnp.zeros((sr.S, B), bool)
    iq = jax.ShapeDtypeStruct((64, sr.n_in, 2), jnp.float32)
    sr._step_a.lower(state, iq).compile()
    for si in range(sr.S):
        sr._step_b[si].lower(state, llr8, xf8, meta, sels).compile()


def test_ccm_product_shape_compiles_on_hw():
    """AOT-compile the CCM stream step at the BENCH shape (64 channels,
    normal FECFRAMEs, 128-lane pooled FEC)."""
    from dvbs2rx_tpu.rx.receiver import RxConfig
    from dvbs2rx_tpu.rx.stream import StreamReceiver

    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal",
                   sym_sync_impl="ffw", fec_batch=128)
    sr = StreamReceiver(cfg, n_channels=64, frames_per_step=2)
    state = sr.init_state_np()
    iq = jax.ShapeDtypeStruct((64, sr.n_in, 2), jnp.float32)
    sr.step.lower(state, iq).compile()
