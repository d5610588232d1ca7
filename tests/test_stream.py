"""StreamReceiver: the fully device-resident steady-state IQ->BBFRAME step.

Covers priming (dense-metric acquisition + whole-symbol rewind), bit-exact
steady-state decoding, the vectorized closed-loop CFO pull-in (the on-device
translation of Receiver._process_frames' host control loop), and the
channel-sharded step on the 8-virtual-device CPU mesh (SURVEY.md §2.7's
"one sharded IQ->TS step").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dvbs2rx_tpu.ops import cplx
from dvbs2rx_tpu.rx.receiver import RxConfig
from dvbs2rx_tpu.rx.stream import StreamReceiver
from dvbs2rx_tpu.tx import Transmitter, TxConfig, awgn_channel

MODCOD, FRAME = "qpsk1/2", "short"


def _stimulus(sr, n_steps, esn0_db=15.0, freq_offset=0.0, seed=0):
    txc = TxConfig(modcod=sr.cfg.modcod, frame_size=sr.cfg.frame_size,
                   pilots=sr.cfg.pilots, sps=2, rolloff=0.2)
    tx = Transmitter(txc)
    rng = np.random.default_rng(seed)
    need = sr._n_fe + n_steps * sr.n_in + 4096
    n_frames = need // (sr.frame_len * 2) + 4
    n_pkts = (n_frames * tx.df_bytes) // 188 + 2
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    ts = pkts.reshape(-1)
    iq1 = awgn_channel(
        tx.ts_to_iq(ts), esn0_db, sps=2, freq_offset=freq_offset,
        seed=seed + 1,
    )
    iq = np.stack([iq1] * sr.n_channels)
    # fresh instance: the Tx scrambler/counter state advanced in ts_to_iq
    ref_bb = Transmitter(txc).bbframes(ts)
    return iq, ref_bb


def _run(sr, iq, n_steps):
    state = sr.prime(iq[:, : sr._n_fe])
    frames, stats = [], None
    for t in range(n_steps):
        blk = cplx.from_np(
            iq[:, sr._n_fe + t * sr.n_in: sr._n_fe + (t + 1) * sr.n_in]
        ).astype(np.float32)
        state, kbytes, stats = sr.step(state, sr.put_iq(blk))
        frames.append(np.asarray(kbytes))
    return frames, stats


def _match(ref_bb, kb):
    """Map each decoded BBFRAME to its index in the Tx frame list (-1 if
    not present)."""
    C, F = kb.shape[:2]
    return [
        [
            int(w[0]) if (w := np.where(
                (ref_bb == kb[c, f]).all(axis=1))[0]).size else -1
            for f in range(F)
        ]
        for c in range(C)
    ]


def test_stream_steady_state_bit_exact():
    C, F, T = 2, 2, 4
    cfg = RxConfig(modcod=MODCOD, frame_size=FRAME, sym_sync_impl="ffw",
                   fec_batch=C * F)
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F)
    iq, ref_bb = _stimulus(sr, T)
    frames, stats = _run(sr, iq, T)
    last = None
    for kb in frames:
        idx = _match(ref_bb, kb)
        for c in range(C):
            assert -1 not in idx[c], f"frame not bit-exact: {idx}"
            assert idx[c][1] == idx[c][0] + 1, f"not consecutive: {idx}"
            if last is not None:
                assert idx[c][0] == last[c] + 1, f"stream gap: {idx}"
        last = [idx[c][-1] for c in range(C)]
    assert bool(np.all(np.asarray(stats["locked"])))
    assert int(stats["bch_errors"]) == 0
    assert np.all(np.asarray(stats["fp"]) == 46)
    # refined SNR ~ Es/N0 (15 dB = 31.6 linear)
    snr = np.asarray(stats["snr_refined"])
    assert np.all((snr > 20) & (snr < 50)), snr


@pytest.mark.slow
def test_stream_cfo_pull_in():
    """Vectorized coarse->fine closed loop: 1e-3/sample CFO (2e-3/symbol,
    beyond the fine range) pulls in via the coarse estimator and settles to
    bit-exact decoding."""
    C, F, T = 1, 2, 12
    cfg = RxConfig(modcod=MODCOD, frame_size=FRAME, sym_sync_impl="ffw",
                   fec_batch=C * F, coarse_period=4)
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F)
    iq, ref_bb = _stimulus(sr, T, freq_offset=1e-3, seed=2)
    state = sr.prime(iq[:, : sr._n_fe])
    clean_tail = 0
    for t in range(T):
        blk = cplx.from_np(
            iq[:, sr._n_fe + t * sr.n_in: sr._n_fe + (t + 1) * sr.n_in]
        ).astype(np.float32)
        state, kbytes, stats = sr.step(state, jnp.asarray(blk))
        idx = _match(ref_bb, np.asarray(kbytes))
        if -1 not in idx[0] and bool(np.asarray(stats["coarse_corrected"])[0]):
            clean_tail += 1
        else:
            clean_tail = 0
    assert clean_tail >= 3, "did not settle to bit-exact decode under CFO"
    cum = float(np.asarray(stats["cum_foffset"])[0])
    assert abs(cum - 2e-3) < 1e-4, cum  # per-symbol offset = sps * 1e-3


def test_stream_sharded_matches_single_device():
    """The channel-sharded step decodes the same bytes as the unsharded one
    on the 8-virtual-device CPU mesh."""
    from dvbs2rx_tpu.parallel.batch import make_channel_mesh

    C, F, T = 8, 2, 2
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = RxConfig(modcod=MODCOD, frame_size=FRAME, sym_sync_impl="ffw",
                   fec_batch=C * F)
    mesh = make_channel_mesh(devices[:8])
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F, mesh=mesh)
    iq, ref_bb = _stimulus(sr, T, seed=4)
    frames, stats = _run(sr, iq, T)
    for kb in frames:
        idx = _match(ref_bb, kb)
        for c in range(C):
            assert -1 not in idx[c], f"sharded decode not bit-exact: {idx}"
    assert int(stats["bch_errors"]) == 0


@pytest.mark.slow
def test_stream_normal_frames_long_run():
    """40-step steady state on normal FECFRAMEs at 6 dB Es/N0 — the bench
    workload. Regression for the round-2 collapse: the timing-rate estimator
    railed at MAX_RATE within ~2 steps of normal-frame steady state (block
    size 64980 symbols destabilized the alpha-beta loop), all channels lost
    lock permanently, and BCH failed on every frame. The stream must decode
    every frame bit-exact with zero BCH errors and hold lock throughout."""
    C, F, T = 1, 2, 40
    cfg = RxConfig(modcod=MODCOD, frame_size="normal", sym_sync_impl="ffw",
                   fec_batch=C * F)
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F)
    iq, ref_bb = _stimulus(sr, T, esn0_db=6.0, seed=7)
    frames, stats = _run(sr, iq, T)
    last = None
    for t, kb in enumerate(frames):
        idx = _match(ref_bb, kb)
        for c in range(C):
            assert -1 not in idx[c], f"step {t}: frame not bit-exact: {idx}"
            assert idx[c][1] == idx[c][0] + 1, f"step {t}: not consecutive"
            if last is not None:
                assert idx[c][0] == last[c] + 1, f"step {t}: stream gap"
        last = [idx[c][-1] for c in range(C)]
    assert bool(np.all(np.asarray(stats["locked"])))
    assert int(stats["bch_errors"]) == 0
    # the timing rate must not be railed at the clamp
    from dvbs2rx_tpu.ops.ffsync import MAX_RATE
    # rate lives in the receiver state; check via stats sfill steadiness:
    # a railed rate drains/overfills the sample buffer monotonically
    assert int(np.asarray(stats["sfill"]).max()) < sr.N_BUF - sr.n_in


def test_stream_dropout_relock():
    """Loss of lock + host re-acquisition policy (StreamSession).

    A mid-stream sample gap (a dropout that shifts frame alignment by a
    non-multiple of the frame period) destroys the frame grid; the session
    must detect the unlock via the stats, re-acquire the affected channels
    on-device from the recent raw samples, and return to bit-exact
    consecutive decoding. Reference analog: frame sync re-searches
    automatically after 3 weak frames (lib/pl_frame_sync.cc:183-217)."""
    from dvbs2rx_tpu.rx.stream import StreamSession

    C, F, T = 2, 2, 14
    cfg = RxConfig(modcod=MODCOD, frame_size=FRAME, sym_sync_impl="ffw",
                   fec_batch=C * F)
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F)
    iq, ref_bb = _stimulus(sr, T + 2, seed=9)
    # dropout: remove a non-frame-multiple span after step 4
    cut = sr._n_fe + 4 * sr.n_in + 12345
    gap = 3 * sr.frame_len + 1311          # symbols' worth of samples
    iq = np.concatenate([iq[:, :cut], iq[:, cut + gap:]], axis=1)

    sess = StreamSession(sr)
    ok = sess.prime(iq[:, : sr._n_fe])
    assert ok.all()
    clean_tail, relocked = 0, False
    for t in range(T):
        blk = cplx.from_np(
            iq[:, sr._n_fe + t * sr.n_in: sr._n_fe + (t + 1) * sr.n_in]
        ).astype(np.float32)
        kb, stats = sess.step(blk)
        idx = _match(ref_bb, np.asarray(kb))
        step_clean = all(
            -1 not in idx[c] and idx[c][1] == idx[c][0] + 1 for c in range(C)
        )
        if t <= 3:
            assert step_clean, f"pre-dropout step {t} not clean: {idx}"
        if sess.reacquired and step_clean:
            relocked = True
            clean_tail += 1
        elif not step_clean:
            clean_tail = 0
    assert sess.reacquired >= C, f"no re-acquisition ({sess.reacquired})"
    assert relocked and clean_tail >= 3, (
        f"did not return to bit-exact decoding (clean_tail={clean_tail})"
    )
    assert bool(np.all(np.asarray(stats["locked"])))


@pytest.mark.parametrize("modcod,pilots,esn0", [
    ("qpsk1/2", True, 15.0),      # pilot-mode fine sync in the lane fn
    ("8psk2/3", False, 15.0),     # non-QPSK demap + deinterleave path
])
def test_stream_modcod_coverage(modcod, pilots, esn0):
    """Steady-state stream coverage beyond QPSK-pilotless (VERDICT r2 item
    6): pilots on, and one 8PSK MODCOD, both bit-exact."""
    C, F, T = 1, 2, 6
    cfg = RxConfig(modcod=modcod, frame_size=FRAME, pilots=pilots,
                   sym_sync_impl="ffw", fec_batch=C * F)
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F)
    iq, ref_bb = _stimulus(sr, T, esn0_db=esn0, seed=13)
    frames, stats = _run(sr, iq, T)
    last = None
    for t, kb in enumerate(frames):
        idx = _match(ref_bb, kb)
        for c in range(C):
            assert -1 not in idx[c], f"step {t} not bit-exact: {idx}"
            if last is not None:
                assert idx[c][0] == last[c] + 1, f"step {t}: stream gap"
        last = [idx[c][-1] for c in range(C)]
    assert bool(np.all(np.asarray(stats["locked"])))
    assert int(stats["bch_errors"]) == 0


def test_stream_scan_step_matches_stepwise():
    """make_scan_step(T): T on-device chained steps in one dispatch decode
    the same bytes and stats as T individual step calls."""
    C, F, T = 1, 2, 4
    cfg = RxConfig(modcod=MODCOD, frame_size=FRAME, sym_sync_impl="ffw",
                   fec_batch=C * F)
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F)
    iq, ref_bb = _stimulus(sr, T, seed=17)
    blks = np.stack([
        cplx.from_np(
            iq[:, sr._n_fe + t * sr.n_in: sr._n_fe + (t + 1) * sr.n_in]
        ).astype(np.float32)
        for t in range(T)
    ])
    # stepwise
    state = sr.prime(iq[:, : sr._n_fe])
    step_out = []
    for t in range(T):
        state, kb, stats = sr.step(state, jnp.asarray(blks[t]))
        step_out.append(np.asarray(kb))
    # one scanned dispatch
    state2 = sr.prime(iq[:, : sr._n_fe])
    scan = sr.make_scan_step(T)
    state2, kbs, sstats = scan(state2, jnp.asarray(blks))
    kbs = np.asarray(kbs)
    for t in range(T):
        np.testing.assert_array_equal(kbs[t], step_out[t])
    assert bool(np.all(np.asarray(sstats["locked"])[-1]))


@pytest.mark.slow
def test_stream_normal_frames_cfo():
    """Vectorized closed-loop CFO pull-in at normal-FECFRAME block sizes:
    the coarse accumulator, settle guard, and rotator update must behave
    with the large-block timing tracker (the round-2 collapse coupled CFO
    dynamics with the railed rate estimator; this pins the interaction).

    Pilots on: at normal frames the pilotless fine range (1/(2*plframe) =
    1.5e-5/sym) cannot cover the coarse estimator's residual, so a
    pilotless normal-frame stream cannot trim a CFO below the coarse
    threshold — a physics limit the reference shares (its field guidance
    is pilots for such links); the pilot-mode fine range (3.4e-4) can."""
    C, F, T = 1, 2, 12
    cfg = RxConfig(modcod=MODCOD, frame_size="normal", pilots=True,
                   sym_sync_impl="ffw", fec_batch=C * F, coarse_period=4)
    sr = StreamReceiver(cfg, n_channels=C, frames_per_step=F)
    iq, ref_bb = _stimulus(sr, T, esn0_db=8.0, freq_offset=2e-4, seed=23)
    state = sr.prime(iq[:, : sr._n_fe])
    clean_tail = 0
    for t in range(T):
        blk = cplx.from_np(
            iq[:, sr._n_fe + t * sr.n_in: sr._n_fe + (t + 1) * sr.n_in]
        ).astype(np.float32)
        state, kbytes, stats = sr.step(state, jnp.asarray(blk))
        idx = _match(ref_bb, np.asarray(kbytes))
        if -1 not in idx[0] and bool(np.asarray(stats["coarse_corrected"])[0]):
            clean_tail += 1
        else:
            clean_tail = 0
    assert clean_tail >= 3, "did not settle to bit-exact decode under CFO"
    cum = float(np.asarray(stats["cum_foffset"])[0])
    assert abs(cum - 4e-4) < 5e-5, cum  # per-symbol offset = sps * 2e-4
