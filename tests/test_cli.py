"""CLI smoke tests: the dvbs2-tx | dvbs2-rx pipe (reference docs/usage.md
tier-3 oracle) driven through the actual executables with subprocesses."""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
APPS = os.path.join(ROOT, "apps")

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", ""),
)


def _make_ts(path, n_pkts, seed=0):
    rng = np.random.default_rng(seed)
    pkts = rng.integers(0, 256, (n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    pkts.tofile(path)
    return pkts


def _assert_consecutive(out, pkts, min_pkts):
    """Output must be a consecutive run of the input packets, starting at
    any offset (the stream engine, like the reference, emits nothing until
    frame lock, so the first frames' packets are consumed by acquisition)."""
    assert out.size % 188 == 0 and out.size >= min_pkts * 188, out.size
    n = out.size // 188
    o = out.reshape(n, 188)
    w = np.where((pkts == o[0]).all(axis=1))[0]
    assert w.size == 1, "first output packet not found in input"
    k = int(w[0])
    np.testing.assert_array_equal(o, pkts[k: k + n])


def _run(app, *args, stdin=None, stdout=None):
    return subprocess.run(
        [sys.executable, os.path.join(APPS, app), *args],
        env=ENV, check=True, stdin=stdin, stdout=stdout,
        stderr=subprocess.PIPE, timeout=600,
    )


@pytest.mark.slow
def test_cli_tx_rx_file_loopback(tmp_path):
    ts_in = tmp_path / "in.ts"
    iq = tmp_path / "iq.fc32"
    ts_out = tmp_path / "out.ts"
    pkts = _make_ts(ts_in, 80, seed=7)
    _run("dvbs2-tx", "--in-file", str(ts_in), "--out-file", str(iq),
         "--modcod", "qpsk1/2", "--frame-size", "short", "--snr", "12")
    r = _run("dvbs2-rx", "--in-file", str(iq), "--out-file", str(ts_out),
             "--modcod", "qpsk1/2", "--frame-size", "short",
             "--log", "--log-period", "0")
    out = np.fromfile(ts_out, np.uint8)
    _assert_consecutive(out, pkts, 55)
    stderr = r.stderr.decode()
    # --log prints the reference-format one-line summary periodically
    assert any(line.startswith("Lock=") for line in stderr.splitlines())
    # final stats JSON goes to stderr
    import json
    stats = json.loads(stderr.strip().splitlines()[-1])
    assert stats["locked"] and stats["bch_frame_errors"] == 0


@pytest.mark.slow
def test_cli_stdin_stdout_pipe(tmp_path):
    """cat in.ts | dvbs2-tx | dvbs2-rx > out.ts"""
    ts_in = tmp_path / "in.ts"
    pkts = _make_ts(ts_in, 80, seed=11)
    with open(ts_in, "rb") as f:
        tx = subprocess.Popen(
            [sys.executable, os.path.join(APPS, "dvbs2-tx"),
             "--modcod", "qpsk1/2", "--frame-size", "short", "--snr", "12"],
            env=ENV, stdin=f, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )
        rx = subprocess.run(
            [sys.executable, os.path.join(APPS, "dvbs2-rx"),
             "--modcod", "qpsk1/2", "--frame-size", "short",
             "--stream", "off"],    # keep the host Receiver path CLI-covered
            env=ENV, stdin=tx.stdout, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, timeout=600,
        )
        assert tx.wait(timeout=60) == 0 and rx.returncode == 0
    out = np.frombuffer(rx.stdout, np.uint8)
    n = out.size // 188
    assert n >= 60
    np.testing.assert_array_equal(out[: n * 188].reshape(n, 188), pkts[:n])


@pytest.mark.slow
def test_cli_fractional_samp_rate(tmp_path):
    """Tx and Rx at samp-rate/sym-rate = 2.5: the Tx arbitrary resampler and
    the Rx rational pre-resampler in one pipe (reference fractional-ratio
    paths: apps/dvbs2-tx:638-686, apps/dvbs2-rx:887-916)."""
    ts_in = tmp_path / "in.ts"
    iq = tmp_path / "iq.fc32"
    ts_out = tmp_path / "out.ts"
    pkts = _make_ts(ts_in, 80, seed=13)
    _run("dvbs2-tx", "--in-file", str(ts_in), "--out-file", str(iq),
         "--modcod", "qpsk1/2", "--frame-size", "short", "--snr", "15",
         "--samp-rate", "2.5M", "--sym-rate", "1M")
    _run("dvbs2-rx", "--in-file", str(iq), "--out-file", str(ts_out),
         "--modcod", "qpsk1/2", "--frame-size", "short",
         "--samp-rate", "2.5M", "--sym-rate", "1M")
    out = np.fromfile(ts_out, np.uint8)
    assert out.size % 188 == 0 and out.size >= 50 * 188
    # strip any leading TEI-marked packets (pre-lock convergence)
    while out.size and (out[1] & 0x80):
        out = out[188:]
    n = out.size // 188
    flat = pkts.reshape(-1)
    first = out[:188]
    starts = np.where((pkts == first).all(axis=1))[0]
    assert starts.size == 1
    ref = flat[starts[0] * 188: starts[0] * 188 + n * 188]
    np.testing.assert_array_equal(out[: ref.size], ref)


@pytest.mark.slow
def test_cli_rec_and_replay(tmp_path):
    """dvbs2-rec captures IQ into a SigMF pair with dvbs2 extension
    metadata; tools/iqrec.py replays it through dvbs2-rx to bit-exact TS
    (reference dvbs2-rec + util/iqrec roles)."""
    import json

    ts_in = tmp_path / "in.ts"
    iq = tmp_path / "iq.fc32"
    pkts = _make_ts(ts_in, 60, seed=13)
    _run("dvbs2-tx", "--in-file", str(ts_in), "--out-file", str(iq),
         "--modcod", "qpsk1/2", "--frame-size", "short", "--snr", "13")

    base = tmp_path / "cap1"
    _run("dvbs2-rec", "--in-file", str(iq), "--out", str(base),
         "--modcod", "qpsk1/2", "--frame-size", "short",
         "--samp-rate", "2e6", "--sym-rate", "1e6", "--rolloff", "0.2")
    meta = json.load(open(str(base) + ".sigmf-meta"))
    ann = meta["annotations"][0]
    assert ann["dvbs2:modcod"] == "qpsk1/2"
    assert ann["dvbs2:fecframe_size"] == "short"
    assert meta["global"]["core:datatype"].startswith("cf32")
    data = np.fromfile(str(base) + ".sigmf-data", np.complex64)
    assert np.array_equal(data, np.fromfile(iq, np.complex64))

    ts_out = tmp_path / "replay.ts"
    r = subprocess.run(
        [sys.executable, os.path.join(APPS, "..", "tools", "iqrec.py"),
         "replay", str(base), "--out", str(ts_out)],
        env=ENV, check=True, capture_output=True, timeout=600,
    )
    out = np.fromfile(ts_out, np.uint8).reshape(-1, 188)
    assert out.shape[0] >= 40
    starts = np.where((pkts == out[0]).all(axis=1))[0]
    assert starts.size == 1
    i = starts[0]
    n = min(len(pkts) - i, out.shape[0])
    np.testing.assert_array_equal(out[:n], pkts[i:i + n])


@pytest.mark.slow
def test_cli_multistream_dummy_frames(tmp_path):
    """--multistream on: CCM/MIS stream with dummy PLFRAMEs interleaved
    between data frames (reference plsync_cc_impl.cc:102-141 expected_plsc
    dummies) — dummies counted and skipped, data bit-exact."""
    import json

    ts_in = tmp_path / "in.ts"
    iq = tmp_path / "iq.fc32"
    ts_out = tmp_path / "out.ts"
    pkts = _make_ts(ts_in, 60, seed=17)

    gen = (
        "import sys; sys.path.insert(0, %r)\n"
        "import numpy as np\n"
        "from dvbs2rx_tpu.tx import TxConfig\n"
        "from dvbs2rx_tpu.tx.vcm import VCMTransmitter\n"
        "tx = VCMTransmitter([TxConfig(modcod='qpsk1/2', frame_size='short')])\n"
        "ts = np.fromfile(%r, np.uint8)\n"
        "iq = tx.ts_to_iq(ts, schedule=[0, -1])\n"
        "iq.astype(np.complex64).tofile(%r)\n" % (ROOT, str(ts_in), str(iq))
    )
    subprocess.run([sys.executable, "-c", gen], env=ENV, check=True,
                   timeout=600)
    r = _run("dvbs2-rx", "--in-file", str(iq), "--out-file", str(ts_out),
             "--modcod", "qpsk1/2", "--frame-size", "short",
             "--multistream", "on")
    stats = json.loads(r.stderr.decode().strip().splitlines()[-1])
    assert stats["dummy_cnt"] >= 5 and stats["bch_frame_errors"] == 0
    out = np.fromfile(ts_out, np.uint8).reshape(-1, 188)
    assert out.shape[0] >= 40
    starts = np.where((pkts == out[0]).all(axis=1))[0]
    assert starts.size == 1
    i = starts[0]
    n = min(len(pkts) - i, out.shape[0])
    np.testing.assert_array_equal(out[:n], pkts[i:i + n])


@pytest.mark.slow
def test_cli_stream_engine_batched(tmp_path):
    """--channels 2: the batched device-resident stream engine decodes two
    independent captures in lockstep, one TS output per channel (VERDICT r2
    item 4: the stream engine is the product CLI path)."""
    import json

    ins, iqs, outs, pkts = [], [], [], []
    for c in range(2):
        ts_in = tmp_path / f"in{c}.ts"
        iq = tmp_path / f"iq{c}.fc32"
        pkts.append(_make_ts(ts_in, 80, seed=20 + c))
        _run("dvbs2-tx", "--in-file", str(ts_in), "--out-file", str(iq),
             "--modcod", "qpsk1/2", "--frame-size", "short", "--snr", "12",
             "--seed", str(30 + c))
        ins.append(str(ts_in))
        iqs.append(str(iq))
        outs.append(str(tmp_path / f"out{c}.ts"))
    r = _run("dvbs2-rx", "--in-file", ",".join(iqs),
             "--out-file", ",".join(outs),
             "--modcod", "qpsk1/2", "--frame-size", "short",
             "--stream", "on", "--channels", "2")
    for c in range(2):
        out = np.fromfile(outs[c], np.uint8)
        _assert_consecutive(out, pkts[c], 55)
    stats = json.loads(r.stderr.decode().strip().splitlines()[-1])
    assert stats["locked"] and stats["bch_frame_errors"] == 0
