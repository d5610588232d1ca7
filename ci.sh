#!/usr/bin/env bash
# CI entry point (the analog of the reference's .github/workflows/test.yml):
# build the native extension, then run the test suite on CPU. The TPU Pallas
# kernel paths fall back to the bit-identical XLA implementations on CPU;
# multi-device sharding tests run on a virtual 8-device CPU mesh (the test
# conftest sets xla_force_host_platform_device_count).
#
# Usage: ./ci.sh [extra pytest args]
#   FAST=1 ./ci.sh     skip the slow (normal-FECFRAME compile) tests
set -euo pipefail
cd "$(dirname "$0")"

python -c "import jax, numpy, pytest" || {
    echo "missing deps: pip install jax numpy pytest" >&2; exit 1; }

# native extension (optional: numpy fallbacks exist, but CI should build it)
(cd native && python setup.py -q build_ext --inplace)

MARK=()
if [[ "${FAST:-0}" == "1" ]]; then MARK=(-m "not slow"); fi
JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}" python -m pytest tests/ -q "${MARK[@]}" "$@"

# on-hardware tier (tests/test_tpu_hw.py): compiled Pallas kernels + real
# stream steps, run only when a TPU is actually reachable
if DVBS2RX_TEST_TPU=1 python -c \
    "import jax,sys; sys.exit(0 if jax.devices()[0].platform=='tpu' else 1)" \
    2>/dev/null; then
    echo "TPU detected: running the on-hardware tier (-m tpu)"
    DVBS2RX_TEST_TPU=1 python -m pytest tests/ -q -m tpu "$@"
else
    echo "no TPU reachable: skipping the on-hardware tier"
fi
