"""Time-axis sharding: halo-exchanged timing metric == unsharded result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvbs2rx_tpu.ops import cplx, plsync
from dvbs2rx_tpu.parallel import stream_shard
from dvbs2rx_tpu.spec.pls import make_pls
from dvbs2rx_tpu.tx import Transmitter, TxConfig


@pytest.fixture(scope="module")
def waveform():
    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short"))
    rng = np.random.default_rng(1)
    pkts = rng.integers(0, 256, (64, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    syms = tx.modulate_ts(pkts.reshape(-1))
    syms = syms + 0.02 * (
        rng.normal(size=(syms.size, 2)).astype(np.float32)
        @ np.array([1, 1j], np.complex64)
    )
    return syms.astype(np.complex64)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_metric_matches_unsharded(waveform, n_dev):
    mesh = stream_shard.make_time_mesh(jax.devices()[:n_dev])
    T = (waveform.size // n_dev) * n_dev
    sym = cplx.from_np(waveform[:T])

    ref, _, _ = jax.jit(
        lambda s: plsync.timing_metric(s, jnp.zeros((90, 2), jnp.float32))
    )(sym)

    fn = stream_shard.sharded_timing_metric(mesh)
    got = fn(stream_shard.shard_time(mesh, jnp.asarray(sym)))

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_metric_finds_sofs(waveform):
    """Peaks of the sharded metric land on PLHEADER ends, even for frames
    straddling shard boundaries."""
    mesh = stream_shard.make_time_mesh(jax.devices()[:8])
    T = (waveform.size // 8) * 8
    sym = cplx.from_np(waveform[:T])
    fn = stream_shard.sharded_timing_metric(mesh)
    m = np.asarray(fn(stream_shard.shard_time(mesh, jnp.asarray(sym))))

    tx = Transmitter(TxConfig(modcod="qpsk1/2", frame_size="short"))
    L = tx.cfg.pls_info.plframe_len
    peaks = np.where(m > 25.0)[0]
    expect = np.arange(89, T, L)  # last PLHEADER symbol of each frame
    expect = expect[expect < T]
    assert set(expect) <= set(peaks.tolist())
    assert len(peaks) <= len(expect) + 2


def test_sharded_matched_filter_matches_unsharded():
    """Time-sharded MF+decimate with ppermute halos equals the unsharded
    zero-history convolution bit-for-bit (f32 exact: same op order per
    output)."""
    import jax
    import jax.numpy as jnp
    from dvbs2rx_tpu.parallel import stream_shard
    from dvbs2rx_tpu.spec.rrc import polyphase_rrc_bank

    devices = jax.devices()[:8]
    mesh = stream_shard.make_time_mesh(devices)
    rng = np.random.default_rng(5)
    sps = 2
    T = 8 * 1024 * sps
    x = rng.normal(size=(T, 2)).astype(np.float32)
    bank, L, _delay = polyphase_rrc_bank(sps, 0.2, 5, 4)
    taps = bank[0]

    f = stream_shard.sharded_matched_filter(mesh, taps, sps=sps)
    y = np.asarray(f(stream_shard.shard_time(mesh, jnp.asarray(x))))

    xz = np.concatenate([np.zeros((len(taps) - 1, 2), np.float32), x])
    lhs = jnp.asarray(xz.T[:, None, :])
    rhs = jnp.asarray(taps, jnp.float32)[None, None, :]
    ref = np.asarray(jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(sps,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"))[:, 0, :].T)
    assert y.shape == (T // sps, 2)
    np.testing.assert_allclose(y, ref, rtol=0, atol=1e-5)
