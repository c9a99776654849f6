"""The compiled C ABI (native/libckzg_tpu.so): a real C program links the
library and runs blob -> commit -> prove -> verify plus the error-handling
probes (parity: run-c-kzg-4844-tests.sh + kzg-bench/src/tests/c_bindings.rs).

Slow (embedded interpreter + CPU JAX compiles); skipped unless the binary
exists. Build with: sh native/build_abi.sh
"""

import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(ROOT, "native", "test_c_abi")
SETUP = os.path.join(ROOT, "tests", "trusted_setup.txt")


@pytest.mark.skipif(not os.path.exists(BIN), reason="native/test_c_abi not built")
@pytest.mark.skipif(
    os.environ.get("KZG_RUN_C_ABI", "0") != "1",
    reason="set KZG_RUN_C_ABI=1 (runs an embedded-interpreter binary, ~minutes)",
)
def test_c_abi_binary_end_to_end():
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [BIN, SETUP], capture_output=True, text=True, timeout=1800, env=env
    )
    assert "ALL C ABI TESTS PASSED" in out.stdout, out.stdout + out.stderr
