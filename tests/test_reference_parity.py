"""A/B parity test against the reference's own LDPC decoder.

Compiles the reference's standalone generic int8 layered decoder
(``lib/ldpc_decoder``) from the read-only reference tree into an oracle
binary and feeds both decoders identical QPSK-demapped LLRs near the
waterfall. Skipped when the reference tree or a C++ toolchain is absent.

Measured result (recorded 2026-08-17): FER/BER match at every point —
both decoders close the QPSK 1/2 normal-frame waterfall at ~2.0 dB Es/N0
with 25 iterations (the int8 offset-min-sum operating bound, ~1 dB from
the float-BP ideal).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF = "/root/reference/lib/ldpc_decoder"
MAIN = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                    "ldpc_oracle_main.cc")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and shutil.which("g++")),
    reason="reference tree or g++ unavailable",
)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    out = tmp_path_factory.mktemp("oracle") / "oracle"
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF}", "-I/root/reference/lib",
         "-o", str(out), MAIN],
        check=True,
    )
    return str(out)


def test_ldpc_matches_reference_decoder(oracle):
    import jax.numpy as jnp

    from dvbs2rx_tpu.spec.ldpc_tables import get_code
    from dvbs2rx_tpu.spec.constellations import map_bits
    from dvbs2rx_tpu.ops import cplx
    from dvbs2rx_tpu.ops.demap import demap
    from dvbs2rx_tpu.ops.ldpc import LDPCDecoder

    code = get_code("S2_B4")
    rng = np.random.default_rng(0)
    W = 16
    info = rng.integers(0, 2, (W, code.K)).astype(np.uint8)
    cw = code.encode(info)
    dec = LDPCDecoder(code, max_trials=25)
    for esn0_db, expect_clean in [(1.5, False), (2.2, True)]:
        esn0 = 10 ** (esn0_db / 10)
        n0 = 1 / esn0
        sigma = np.sqrt(n0 / 2)
        rows = []
        for i in range(W):
            syms = map_bits(cw[i], "QPSK", "1/2").astype(np.complex64)
            noisy = syms + (
                rng.normal(0, sigma, (syms.size, 2)) @ [1, 1j]
            ).astype(np.complex64)
            llr = demap(
                jnp.asarray(cplx.from_np(noisy))[None],
                jnp.asarray([np.float32(n0)]),
                "QPSK", "1/2",
            )
            rows.append(np.asarray(llr)[0])
        llrs = np.stack(rows)
        p = subprocess.run([oracle, "25"], input=llrs.tobytes(),
                           capture_output=True, check=True)
        ref_hard = np.frombuffer(p.stdout, np.uint8).reshape(W, code.N)
        hard, _, _, _ = dec(llrs)
        ref_ber = np.mean(ref_hard != cw)
        our_ber = np.mean(np.asarray(hard) != cw)
        # identical operating behavior: both clean above the waterfall, and
        # statistically equal residual BER below it
        if expect_clean:
            assert ref_ber == 0.0 and our_ber == 0.0
        else:
            assert abs(ref_ber - our_ber) < 0.15 * max(ref_ber, 1e-9)


@pytest.fixture(scope="module")
def bch_oracle(tmp_path_factory):
    d = tmp_path_factory.mktemp("bch_oracle")
    stub = d / "gnuradio" / "dvbs2rx"
    stub.mkdir(parents=True)
    (stub / "api.h").write_text("#pragma once\n#define DVBS2RX_API\n")
    out = d / "oracle"
    main = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                        "bch_oracle_main.cc")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{d}", "-I/root/reference/lib",
         "-o", str(out), main, "/root/reference/lib/bch.cc",
         "/root/reference/lib/gf.cc"],
        check=True,
    )
    return str(out)


def test_bch_matches_reference_codec(bch_oracle):
    from dvbs2rx_tpu.spec import bch_spec
    from dvbs2rx_tpu.ops.bch import BCHDecoder

    fs, t, n, k = "normal", 12, 16200, 16008
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 256, (4, k // 8), dtype=np.uint8)

    # encode: bit-exact
    p = subprocess.run([bch_oracle, "enc", fs, str(t), str(n)],
                       input=msgs.tobytes(), capture_output=True, check=True)
    ref_cw = np.frombuffer(p.stdout, np.uint8).reshape(4, n // 8)
    ours_cw = np.stack([
        np.concatenate([m, bch_spec.bch_encode_bytes(m, fs, t)]) for m in msgs
    ])
    assert np.array_equal(ref_cw, ours_cw)

    # decode: identical correction counts and outputs (correctable frames)
    dec = BCHDecoder(fs, t, n, k)
    cw_bits = np.unpackbits(ours_cw, axis=1)
    bad = cw_bits.copy()
    n_err = [0, 3, 12, 20]
    for i, e in enumerate(n_err):
        pos = rng.choice(n, e, replace=False)
        bad[i, pos] ^= 1
    p = subprocess.run([bch_oracle, "dec", fs, str(t), str(n)],
                       input=np.packbits(bad, axis=1).tobytes(),
                       capture_output=True, check=True)
    step = k // 8 + 4
    hard, corr = dec(bad)
    ours_msg = np.packbits(np.asarray(hard)[:, :k], axis=1)
    for i in range(4):
        chunk = p.stdout[i * step:(i + 1) * step]
        ref_corr = int.from_bytes(chunk[k // 8:], "little", signed=True)
        assert int(np.asarray(corr)[i]) == ref_corr
        if ref_corr >= 0:  # failed-frame contents are unspecified
            assert np.array_equal(
                ours_msg[i], np.frombuffer(chunk[: k // 8], np.uint8)
            )


@pytest.fixture(scope="module")
def pl_oracle(tmp_path_factory):
    d = tmp_path_factory.mktemp("pl_oracle")
    out = d / "oracle"
    root = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle")
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{root}/stubs", "-I/root/reference/lib",
         "-include", "volk/volk.h", "-o", str(out),
         os.path.join(root, "pl_oracle_main.cc"),
         "/root/reference/lib/pi2_bpsk.cc",
         "/root/reference/lib/reed_muller.cc",
         "/root/reference/lib/pl_descrambler.cc",
         "/root/reference/lib/pl_signaling.cc"],
        check=True,
    )
    return str(out)


def _run(oracle, *args, inp=None):
    return subprocess.run([oracle, *map(str, args)], input=inp,
                          capture_output=True, check=True).stdout


def test_pl_primitives_match_reference(pl_oracle):
    """pi/2-BPSK map/demap/diff-demap, RM(1,6) encode/decode, and the PL
    descrambling sequence are bit/sample-exact vs the reference classes."""
    from dvbs2rx_tpu.spec import pi2_bpsk, reed_muller, pl_defs
    from dvbs2rx_tpu.spec.scramblers import pl_descrambling_sequence

    rng = np.random.default_rng(0)

    code = int(rng.integers(0, 2 ** 62, dtype=np.uint64)) << 1
    bits = pl_defs.u64_to_bits(code, 64)
    ref = np.frombuffer(_run(pl_oracle, "pi2map", f"{code:016x}", 64),
                        np.complex64)
    assert np.array_equal(ref, pi2_bpsk.map_bpsk(bits))

    syms = pi2_bpsk.map_bpsk(np.concatenate([[0], bits]).astype(np.uint8)[:65])
    noisy = (syms + 0.2 * (rng.normal(size=65) + 1j * rng.normal(size=65))
             ).astype(np.complex64)
    ref_hex = _run(pl_oracle, "pi2demap", 64, inp=noisy.tobytes()).decode().strip()
    assert ref_hex == f"{pl_defs.bits_to_u64(pi2_bpsk.demap_bpsk(noisy[1:])):016x}"
    ref_hex = _run(pl_oracle, "pi2demapdiff", 64, inp=noisy.tobytes()).decode().strip()
    assert ref_hex == f"{pl_defs.bits_to_u64(pi2_bpsk.demap_bpsk_diff(noisy)):016x}"

    for i in range(128):
        r = int(_run(pl_oracle, "rmenc", i).decode().strip(), 16)
        assert r == pl_defs.bits_to_u64(reed_muller.encode(i))

    flip = (1.0 - 2.0 * pl_defs.PLSC_SCRAMBLER_BITS).astype(np.float32)
    for trial in range(20):
        pls = int(rng.integers(0, 128))
        bits_s = reed_muller.encode(pls) ^ pl_defs.PLSC_SCRAMBLER_BITS
        soft = (1.0 - 2.0 * bits_s + rng.normal(0, 0.7, 64)).astype(np.float32)
        # the bare reference decoder uses unscrambled images; ours folds the
        # scrambler in - equivalent up to elementwise sign flips
        r = int(_run(pl_oracle, "rmdec_soft",
                     inp=(soft * flip).astype(np.float32).tobytes()
                     ).decode().strip())
        assert r == reed_muller.decode_soft(soft)

    for gold in [0, 1, 174]:
        ref = np.frombuffer(_run(pl_oracle, "plscramble", gold, 2000),
                            np.complex64)
        assert np.allclose(ref, pl_descrambling_sequence(gold)[:2000])


def test_plsc_decoder_modes_match_reference(pl_oracle):
    """Full plsc_decoder::decode parity for every supported (coherent, soft)
    mode combination (``pl_signaling.cc:114-152``) against the batched ops
    (``ops/plsync.plsc_decode_{soft,hard,diff}``) on noisy rotated headers."""
    from dvbs2rx_tpu.ops import cplx, plsync
    from dvbs2rx_tpu.spec import pi2_bpsk, pl_defs, reed_muller

    rng = np.random.default_rng(42)
    modes = [
        ((1, 1), plsync.plsc_decode_soft),
        ((1, 0), plsync.plsc_decode_hard),
        ((0, 0), plsync.plsc_decode_diff),
    ]
    for trial in range(25):
        pls = int(rng.integers(0, 128))
        bits = np.concatenate([
            pl_defs.SOF_BITS,
            reed_muller.codeword_bits()[pls] ^ pl_defs.PLSC_SCRAMBLER_BITS,
        ])
        hdr = pi2_bpsk.map_bpsk(bits)
        # noise + a small static rotation (common phase) both modes tolerate
        hdr = hdr * np.exp(1j * rng.uniform(-0.15, 0.15))
        hdr = (hdr + 0.25 * (rng.normal(size=90) + 1j * rng.normal(size=90))
               ).astype(np.complex64)
        tail = hdr[pl_defs.SOF_LEN - 1:]              # last SOF sym + PLSC
        for (coherent, soft), op in modes:
            ref = int(_run(pl_oracle, "plscdec", coherent, soft,
                           inp=tail.astype(np.complex64).tobytes()
                           ).decode().strip())
            ours, _ = op(cplx.from_np(hdr))
            assert int(ours) == ref, (trial, coherent, soft)
