"""Device-resident VCM stream engine tests (rx/vcm_stream.py).

The ACM/VCM analog of tests/test_stream.py: the decoded-PLS chain walk,
pooled per-PLS FEC queues, seq-ordered delivery, CFO pull-in via the
differential PLSC decode, and dropout re-acquisition — all through the
single jitted step."""

import numpy as np
import pytest

from dvbs2rx_tpu.tx import TxConfig
from dvbs2rx_tpu.tx.transmitter import awgn_channel
from dvbs2rx_tpu.tx.vcm import VCMTransmitter
from dvbs2rx_tpu.rx.receiver import RxConfig
from dvbs2rx_tpu.rx.vcm_stream import VCMStreamEngine, VCMStreamReceiver
from dvbs2rx_tpu.spec.pls import make_pls

from tests.test_e2e_loopback import make_ts, check_ts_subset

PLS_A = make_pls(4, True, False)     # qpsk1/2 short
PLS_B = make_pls(5, True, False)     # qpsk3/5 short
PLS_C = make_pls(13, True, False)    # 8psk2/3 short
PLS_AP = make_pls(4, True, True)     # qpsk1/2 short, pilots

CFGS = {
    PLS_A: TxConfig(modcod="qpsk1/2", frame_size="short"),
    PLS_B: TxConfig(modcod="qpsk3/5", frame_size="short"),
    PLS_C: TxConfig(modcod="8psk2/3", frame_size="short"),
    PLS_AP: TxConfig(modcod="qpsk1/2", frame_size="short", pilots=True),
}


def vcm_waveform(pls_seq, schedule, n_pkts=400, esn0_db=15.0, seed=0,
                 freq_offset=0.0):
    vtx = VCMTransmitter([CFGS[p] for p in pls_seq])
    ts_in = make_ts(n_pkts, seed=seed)
    iq = vtx.ts_to_iq(ts_in, schedule)
    iq = awgn_channel(iq, esn0_db, sps=2, seed=seed + 1,
                      freq_offset=freq_offset)
    return ts_in, iq


def engine(pls_expected, C=1, pls_list=(), **kw):
    cfg = RxConfig(modcod="qpsk1/2", frame_size="short", acm_vcm=True,
                   pls_expected=tuple(pls_expected),
                   pls_list=tuple(pls_list), **kw)
    return VCMStreamEngine(cfg, n_channels=C, frames_per_step=2,
                           fec_lanes=8)


def test_vcm_stream_two_modcods():
    """Alternating QPSK 1/2 + 3/5 short frames through the device walk."""
    ts_in, iq = vcm_waveform((PLS_A, PLS_B), [0, 1])
    eng = engine((PLS_A, PLS_B))
    ts_out = eng.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=300)
    assert eng.stats.bch_frame_errors == 0
    assert eng.stats.unlock_cnt == 0
    assert eng.stats.frame_cnt >= 60
    assert eng.gaps_skipped == 0


def test_vcm_stream_multichannel_matches_single():
    """C channels with DIFFERENT streams decode like single engines (the
    pooled FEC queues mix channels; per-lane convergence freezing keeps
    per-frame results composition-independent)."""
    streams = [
        vcm_waveform((PLS_A, PLS_B), [0, 1], n_pkts=260, seed=10 + c)
        for c in range(3)
    ]
    n = min(iq.size for _, iq in streams)
    iq = np.stack([iq[:n] for _, iq in streams])
    multi = engine((PLS_A, PLS_B), C=3)
    outs = multi.receive(iq)
    for c in range(3):
        single = engine((PLS_A, PLS_B))
        ref = single.receive(iq[c])
        np.testing.assert_array_equal(outs[c], ref,
                                      err_msg=f"channel {c} diverged")
        check_ts_subset(streams[c][0], outs[c], min_packets=150)


def test_vcm_stream_dummy_frames():
    """Dummy PLFRAMEs are walked at line rate, counted, not queued."""
    ts_in, iq = vcm_waveform((PLS_A, PLS_B), [0, -1, 1, -1], seed=3)
    eng = engine((PLS_A, PLS_B))
    ts_out = eng.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=250)
    assert eng.stats.dummy_cnt >= 10
    assert eng.stats.bch_frame_errors == 0


def test_vcm_stream_mixed_constellations():
    """QPSK and 8PSK interleaved: per-PLS static demap geometry + two
    pooled FEC queues draining at different cadences (exercises the host
    reorderer)."""
    ts_in, iq = vcm_waveform((PLS_A, PLS_C), [0, 1], esn0_db=16.0, seed=9)
    eng = engine((PLS_A, PLS_C))
    ts_out = eng.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=250)
    assert eng.stats.bch_frame_errors == 0
    assert eng.gaps_skipped == 0


def test_vcm_stream_pls_filter_rejects():
    """Frames outside pls_list are rejected and counted; their length
    still drives the chain walk so accepted frames keep decoding."""
    ts_in, iq = vcm_waveform((PLS_A, PLS_B), [0, 1], seed=5)
    eng = engine((PLS_A, PLS_B), pls_list=(PLS_A,))
    ts_out = eng.receive(iq)
    assert eng.stats.rejected_cnt >= 10
    assert eng.stats.frame_cnt >= 20
    # accepted frames decode to valid input packets (TS has gaps at
    # rejections)
    in_pkts = {ts_in[i * 188:(i + 1) * 188].tobytes()
               for i in range(ts_in.size // 188)}
    hits = sum(
        ts_out[i * 188:(i + 1) * 188].tobytes() in in_pkts
        for i in range(ts_out.size // 188)
    )
    assert hits >= 20


def test_vcm_stream_chunked_receive():
    """Chunked receive() is identical to one-shot (carry across calls)."""
    ts_in, iq = vcm_waveform((PLS_A, PLS_B), [0, 1], n_pkts=260, seed=11)
    one = engine((PLS_A, PLS_B))
    ref = one.receive(iq)
    chunked = engine((PLS_A, PLS_B))
    outs = []
    for i in range(0, iq.size, 70000):
        outs.append(chunked.receive(iq[i: i + 70000], flush=False))
    outs.append(chunked.receive(np.empty(0, np.complex64), flush=True))
    got = np.concatenate(outs)
    np.testing.assert_array_equal(got, ref)


def test_vcm_stream_cfo_pull_in():
    """CFO at 60x the fine range: the differential PLSC decode keeps the
    chain walk alive while SOF-only coarse accumulation pulls the rotator
    in; steady state decodes bit-exact (the walk's pull-in
    chicken-and-egg, solved the reference's way: pl_signaling.cc
    differential mode)."""
    ts_in, iq = vcm_waveform((PLS_AP,), [0], n_pkts=700, esn0_db=13.0,
                             seed=31, freq_offset=0.01)
    eng = engine((PLS_AP,), coarse_period=10)
    ts_out = eng.receive(iq)
    assert eng.stats.coarse_corrected
    assert abs(eng.stats.cum_freq_offset - 0.02) < 5e-4
    check_ts_subset(ts_in, ts_out, min_packets=100)


def test_vcm_stream_dropout_relock():
    """Mid-stream dropout: unlock via weak walk metrics, device-side
    masked re-acquisition from the rolling raw-block history, seq-gap
    skip in the host reorderer."""
    ts_a, iq_a = vcm_waveform((PLS_A, PLS_B), [0, 1], n_pkts=300, seed=71)
    ts_b, iq_b = vcm_waveform((PLS_A, PLS_B), [0, 1], n_pkts=300, seed=72)
    rng = np.random.default_rng(75)
    gap_len = 120000
    gap = (0.2 * (rng.normal(size=gap_len) + 1j * rng.normal(size=gap_len))
           / np.sqrt(2)).astype(np.complex64)
    iq = np.concatenate([iq_a, gap, iq_b])
    eng = engine((PLS_A, PLS_B))
    ts_out = eng.receive(iq)
    assert eng.stats.unlock_cnt >= 1 or eng.reacquired >= 1
    assert eng.reacquired >= 1
    out_pkts = ts_out.reshape(-1, 188)
    in_b = ts_b.reshape(-1, 188)
    hits_b = sum((in_b == p).all(axis=1).any() for p in out_pkts)
    assert hits_b >= 100, f"only {hits_b} packets from the post-gap burst"


def test_vcm_stream_clock_offset():
    """±40 ppm symbol-clock offset: ffsync slips absorbed by the walk's
    per-header 3-point discriminator."""
    ts_in, iq0 = vcm_waveform((PLS_A, PLS_B), [0, 1], n_pkts=400, seed=81)
    ppm = 40e-6
    t_out = np.arange(int(iq0.size / (1 + ppm))) * (1 + ppm)
    base = np.arange(iq0.size)
    iq = (np.interp(t_out, base, iq0.real)
          + 1j * np.interp(t_out, base, iq0.imag)).astype(np.complex64)
    eng = engine((PLS_A, PLS_B))
    ts_out = eng.receive(iq)
    assert eng.stats.unlock_cnt == 0, "clock drift broke the chain walk"
    check_ts_subset(ts_in, ts_out, min_packets=250)


def test_vcm_stream_vs_host_acm_receiver():
    """The stream engine and the host ACMReceiver recover the same TS
    payload from the same waveform (different batching, same math; frame
    results are composition-independent)."""
    from dvbs2rx_tpu.rx.receiver import ACMReceiver

    ts_in, iq = vcm_waveform((PLS_A, PLS_B), [0, 1], n_pkts=300, seed=41)
    eng = engine((PLS_A, PLS_B))
    ts_s = eng.receive(iq)
    host = ACMReceiver(RxConfig(
        modcod="qpsk1/2", frame_size="short", acm_vcm=True,
        pls_expected=(PLS_A, PLS_B), fec_batch=4,
    ))
    ts_h = host.receive(iq)
    n_s = check_ts_subset(ts_in, ts_s, min_packets=200)
    n_h = check_ts_subset(ts_in, ts_h, min_packets=200)
    # both recover essentially the whole stream (alignment may differ by
    # the acquisition prefix)
    assert abs(n_s - n_h) <= 12


def test_vcm_stream_snr_refinement():
    """Post-decoder SNR refinement: once decoded batches feed back, the
    per-(channel, PLS) refined N0 engages (n0_refined > 0) and get_stats
    reports a per-PLS SNR near the channel's true Es/N0 (the reference's
    LLR-PDU loop, xfecframe_demapper_cb_impl.cc:188-318)."""
    esn0_db = 12.0
    ts_in, iq = vcm_waveform((PLS_A, PLS_B), [0, 1], n_pkts=400,
                             esn0_db=esn0_db, seed=55)
    eng = engine((PLS_A, PLS_B))
    ts_out = eng.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=250)
    n0_ref = np.asarray(eng._n0_ref)
    assert (n0_ref > 0).all(), "refined N0 never engaged"
    stats = eng.get_stats()
    per_fec = stats["fec"]["per_pls"]
    assert set(per_fec) == {PLS_A, PLS_B}
    for pls, sec in per_fec.items():
        assert sec["frames"] > 10 and sec["errors"] == 0
        # refined SNR within 1 dB of the channel's true Es/N0
        assert abs(sec["snr"] - esn0_db) < 1.0, (pls, sec["snr"])


def test_vcm_stream_mixed_frame_sizes(monkeypatch):
    """Normal + short FECFRAMEs interleaved in ONE stream: per-PLS queues
    pad to the larger code; the chain walk and both FEC branches handle
    the size mix (the reference decodes whatever PLS arrives,
    plsync_cc_impl.cc:805-955)."""
    PLS_N = make_pls(4, False, False)     # qpsk1/2 normal
    monkeypatch.setitem(
        CFGS, PLS_N, TxConfig(modcod="qpsk1/2", frame_size="normal")
    )
    ts_in, iq = vcm_waveform((PLS_A, PLS_N), [0, 1], n_pkts=700, seed=91)
    cfg = RxConfig(modcod="qpsk1/2", frame_size="short", acm_vcm=True,
                   pls_expected=(PLS_A, PLS_N))
    eng = VCMStreamEngine(cfg, n_channels=1, frames_per_step=2,
                          fec_lanes=4)
    ts_out = eng.receive(iq)
    check_ts_subset(ts_in, ts_out, min_packets=400)
    assert eng.stats.bch_frame_errors == 0
    per_fec = eng.get_stats()["fec"]["per_pls"]
    assert per_fec[PLS_A]["frames"] > 4 and per_fec[PLS_N]["frames"] > 4


def test_vcm_stream_rejects_bad_config():
    with pytest.raises(ValueError):
        VCMStreamReceiver(
            RxConfig(modcod="qpsk1/2", frame_size="short", acm_vcm=True),
            n_channels=1,
        )  # no expected PLS set


def test_dirty_batch_resets_refined_n0():
    """A drained FEC batch whose lanes ALL fail BCH for a channel drops
    that channel's refined-N0 carry back to data-aided (r4 advisor,
    medium: a stale overconfident N0 latched before an SNR drop would
    otherwise keep FEC failing until a full unlock)."""
    import jax
    import jax.numpy as jnp

    cfg = RxConfig(modcod="qpsk1/2", frame_size="short", acm_vcm=True,
                   pls_expected=(PLS_A,), ldpc_max_trials=2)
    sr = VCMStreamReceiver(cfg, n_channels=2, frames_per_step=2,
                           fec_lanes=4)
    state = sr.init_state_np()
    rng = np.random.default_rng(0)
    # undecodable garbage LLRs in a full 4-lane queue, 2 lanes per channel
    state["qllr"][0, :, : sr.B_fec] = rng.integers(
        -30, 31, (sr.n_ldpc, sr.B_fec), dtype=np.int8
    )
    state["qmeta"][0, : sr.B_fec, 0] = [0, 0, 1, 1]
    state["qfill"][0] = sr.B_fec
    state["n0_refined"][:] = 0.05            # stale engaged carry
    state = jax.device_put(state)

    B = sr.B_lanes
    zero8 = jnp.zeros((sr.n_ldpc, B), jnp.int8)
    zerox = jnp.zeros((sr.R_SUB * 2, B), jnp.int8)
    meta = jnp.zeros((B, 2), jnp.int32)
    sels = jnp.zeros((sr.S, B), bool)
    state, outputs, _ = sr._step_b[0](state, zero8, zerox, meta, sels)
    assert bool(np.asarray(outputs["fired"]).any())
    assert (np.asarray(outputs["n_corr"])[
        np.asarray(outputs["fired"]).astype(bool)
    ] < 0).all(), "garbage LLRs unexpectedly decoded"
    n0_ref = np.asarray(state["n0_refined"])
    assert (n0_ref[:, 0] == 0).all(), n0_ref


def test_sharded_vcm_matches_unsharded():
    """VCM step over a 2-device channel mesh: identical per-(channel, seq)
    decoded frames as the single-device engine (pooling is per-shard, so
    only drain cadence differs; per-lane convergence freezing keeps frame
    results composition-independent)."""
    import jax

    from dvbs2rx_tpu.parallel.vcm_shard import ShardedVCMStreamReceiver
    from dvbs2rx_tpu.parallel.batch import make_channel_mesh
    from dvbs2rx_tpu.ops import cplx

    C, D, W = 4, 2, 8
    ts_in, iq1 = vcm_waveform((PLS_A, PLS_B), [0, 1], n_pkts=400, seed=55)
    iq = np.stack([iq1] * C)
    cfg = RxConfig(modcod="qpsk1/2", frame_size="short", acm_vcm=True,
                   pls_expected=(PLS_A, PLS_B))
    mesh = make_channel_mesh(jax.devices()[:D])
    ssr = ShardedVCMStreamReceiver(cfg, n_channels=C, mesh=mesh,
                                   frames_per_step=2, fec_lanes=8)
    usr = VCMStreamReceiver(cfg, n_channels=C, frames_per_step=2,
                            fec_lanes=8)

    def collect(sr, state, n_drain):
        got = {}
        for i in range(W):
            blk = cplx.from_np(
                iq[:, sr._n_fe + i * sr.n_in: sr._n_fe + (i + 1) * sr.n_in]
            ).astype(np.float32)
            state, outputs, stats = sr.step(state, blk)
            kb = np.asarray(outputs["kb"])
            meta = np.asarray(outputs["meta"])
            nc = np.asarray(outputs["n_corr"])
            fired = np.asarray(outputs["fired"])
            for si in range(sr.S):
                for d in range(n_drain):
                    if not fired[si, d]:
                        continue
                    assert (nc[si, d] >= 0).all(), "BCH failure"
                    for j in range(kb.shape[2]):
                        c, seq = int(meta[si, d, j, 0]), int(meta[si, d, j, 1])
                        got[(c, seq, si)] = kb[si, d, j].tobytes()
        return got

    st_s = ssr.prime(iq[:, : ssr._n_fe])
    assert ssr.prime_ok.all()
    st_u = usr.prime(iq[:, : usr._n_fe])
    got_s = collect(ssr, st_s, ssr.DRAIN)
    got_u = collect(usr, st_u, usr.DRAIN)
    # every frame the unsharded engine decoded in-window must match;
    # cadence differences may leave a few frames still queued in one of
    # the two at the cut-off
    common = set(got_s) & set(got_u)
    assert len(common) >= max(8, int(0.7 * len(got_u)))
    for k in common:
        assert got_s[k] == got_u[k], f"frame {k} diverged"


def test_vcm_piloted_normal_steady_state():
    """The bench operating point at small scale: piloted qpsk1/2 + 8psk3/5
    NORMAL frames, enough steps to pass the first coarse-CFO fire (~step
    12). Guards the r5 closed-loop regression: an unnecessary coarse
    application used to latch a rotator residual beyond the pilotless
    fine aliasing limit and kill FEC from step ~12 on — with pilots the
    loop must hold |cum_foffset| ~1e-6 and decode clean throughout."""
    import jax
    import jax.numpy as jnp

    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.spec.pls import parse_pls

    pls_a = make_pls(4, False, True)     # qpsk1/2 normal, pilots
    pls_b = make_pls(12, False, True)    # 8psk3/5 normal, pilots
    cfg = RxConfig(modcod="qpsk1/2", frame_size="normal", acm_vcm=True,
                   pls_expected=(pls_a, pls_b))
    sr = VCMStreamReceiver(cfg, n_channels=1, frames_per_step=2,
                           fec_lanes=8)
    vtx = VCMTransmitter([
        TxConfig(modcod="qpsk1/2", frame_size="normal", pilots=True),
        TxConfig(modcod="8psk3/5", frame_size="normal", pilots=True),
    ])
    pair = parse_pls(pls_a).plframe_len + parse_pls(pls_b).plframe_len
    n_pairs = max(2, -(-sr._n_fe // (pair * 2)) + 1)
    rng = np.random.default_rng(11)
    df = sum(t.df_bytes for t in vtx.txs)
    pkts = make_ts((n_pairs * df) // 188 + 2, seed=11)
    syms = vtx.modulate_ts(pkts, [0, 1])[: n_pairs * pair]
    wave3 = vtx.txs[0].pulse_shape(np.tile(syms, 3))
    period = n_pairs * pair * 2
    mid = wave3[period: 2 * period]
    esn0 = 10 ** (13.0 / 10)
    noise = rng.normal(0, np.sqrt(2 / esn0 / 2), (period, 2))
    wave = (mid + noise @ np.array([1, 1j])).astype(np.complex64)

    state = sr.prime(np.resize(wave, sr._n_fe)[None])
    assert sr.prime_ok.all()
    off0 = sr._n_fe % period
    src2 = jnp.asarray(cplx.from_np(
        np.concatenate([wave, wave[: sr.n_in]])).astype(np.float32))

    fired_total = errs = 0
    for i in range(18):
        off = (off0 + i * sr.n_in) % period
        blk = jax.lax.dynamic_slice(src2, (off, 0), (sr.n_in, 2))
        state, outputs, stats = sr.step(state, blk[None])
        fired = np.asarray(outputs["fired"]).astype(bool)
        nc = np.asarray(outputs["n_corr"])
        fired_total += int(fired.sum())
        errs += int((nc[fired] < 0).sum())
    assert fired_total >= 4, "too few FEC drains fired"
    assert errs == 0, f"{errs} BCH failures after the coarse fire"
    assert abs(float(np.asarray(stats["cum_foffset"])[0])) < 1e-5
    assert bool(np.asarray(stats["locked"]).all())
