"""AGC tests: the receiver's input gain control (reference AGC block,
``apps/dvbs2-rx:853-856`` / ``--agc-gain/--agc-rate/--agc-ref``)."""

import numpy as np

from dvbs2rx_tpu.ops import cplx
from dvbs2rx_tpu.rx.receiver import Receiver, RxConfig


def _frontend_gain_trace(cfg, iq, n_blocks):
    """Run front-end blocks and return the AGC gain after each one."""
    import jax.numpy as jnp

    rx = Receiver(cfg)
    rx._ss_state = rx.sym_sync.init_state()
    gains = []
    for i in range(n_blocks):
        block = iq[i * rx._fe_nsamp: (i + 1) * rx._fe_nsamp]
        state, syms, consumed, gain = rx._frontend_step(
            jnp.asarray(cplx.from_np(block)),
            rx._ss_state,
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.float32(rx._agc_gain),
        )
        rx._agc_gain = float(gain)
        gains.append(rx._agc_gain)
    return gains


def test_agc_instant_normalize():
    """agc_rate=1.0 drives each block's mean |x| to agc_ref instantly
    (the reference agc_cc error term is ref - |y|)."""
    cfg = RxConfig(modcod="qpsk1/4", frame_size="short", agc_rate=1.0)
    rng = np.random.default_rng(0)
    iq = (0.03 * (rng.normal(size=2 * 65536) + 1j * rng.normal(size=2 * 65536))
          / np.sqrt(2)).astype(np.complex64)
    gains = _frontend_gain_trace(cfg, iq, 2)
    # complex Gaussian with E|x|^2 = 0.03^2 has E|x| = 0.03*sqrt(pi)/2
    expect = 1.0 / (0.03 * np.sqrt(np.pi) / 2)
    assert abs(gains[0] - expect) / expect < 0.05


def test_agc_slow_loop_converges_to_ref():
    """A reference-style slow rate converges exponentially toward agc_ref."""
    cfg = RxConfig(modcod="qpsk1/4", frame_size="short",
                   agc_gain=1.0, agc_rate=3e-5, agc_ref=1.0)
    rng = np.random.default_rng(1)
    amp = 0.2
    n = 24 * (4096 * 2 + 200)
    iq = (amp * (rng.normal(size=n) + 1j * rng.normal(size=n))
          / np.sqrt(2)).astype(np.complex64)
    gains = _frontend_gain_trace(cfg, iq, 20)
    # monotone approach toward 1/E|x| = 1/(amp*sqrt(pi)/2), no overshoot
    # beyond a few %
    g_target = 1.0 / (amp * np.sqrt(np.pi) / 2)
    assert gains[0] < gains[5] < gains[-1] <= 1.02 * g_target
    assert gains[-1] > 0.8 * g_target
    # single-pole: each step moves a constant fraction toward the target
    alphas = [
        (gains[i + 1] - gains[i]) / (g_target - gains[i]) for i in range(8)
    ]
    assert np.std(alphas) < 0.1 * np.mean(alphas) + 1e-6


def test_agc_disabled_passthrough():
    cfg = RxConfig(modcod="qpsk1/4", frame_size="short", agc=False)
    rng = np.random.default_rng(2)
    iq = (0.01 * (rng.normal(size=2 * 65536) + 1j * rng.normal(size=2 * 65536))
          ).astype(np.complex64)
    gains = _frontend_gain_trace(cfg, iq, 2)
    assert gains == [1.0, 1.0]
