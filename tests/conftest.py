"""Shared test configuration.

Forces 8 virtual CPU devices to exist (alongside any real TPU) so that
multi-chip sharding tests run anywhere, mirroring the reference's approach of
instantiating one generic suite per backend
(/root/reference/kzg-bench/src/tests/).
"""

import os

# Must run before jax is imported anywhere.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep the CPU platform registered alongside any accelerator so the virtual
# 8-device mesh tests can request jax.devices("cpu").
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"
# Persistent compilation cache: the limb-arithmetic graphs are cheap to run
# but slow for XLA:CPU to compile; cache them across test sessions. The
# partition logic (forced-CPU -> host-fingerprinted local dir; accelerator
# behind a remote compile service -> "remote") lives in kzg_tpu/__init__,
# which is importable before jax (it only reads env vars here).
import kzg_tpu as _kzg_tpu

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _kzg_tpu.compile_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# A site hook may have imported jax already (snapshotting config defaults
# with the cache disabled); apply through jax.config — see kzg_tpu/__init__.py.
try:
    import jax as _jax

    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update(
            "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

# KZG_TPU_TESTS_CPU=1 pins the whole test session to the (8-virtual-device)
# CPU platform at the CONFIG level. The env var alone is not enough in axon
# sessions: the site hook force-sets jax_platforms="axon,cpu" at interpreter
# start, and the remote TPU compile service has been observed to wedge
# mid-suite on large programs -- local XLA:CPU compiles are slower but
# bounded, and the persistent cache makes them one-time.
if os.environ.get("KZG_TPU_TESTS_CPU") == "1":
    try:
        import jax as _jax2

        if _jax2.config.jax_platforms != "cpu":
            _jax2.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import pytest


@pytest.fixture(scope="session")
def oracle_settings():
    from kzg_tpu.oracle.kzg import load_trusted_setup_file
    from kzg_tpu.utils.vectors import trusted_setup_path

    return load_trusted_setup_file(trusted_setup_path())


@pytest.fixture(scope="session")
def device_settings():
    from kzg_tpu.settings import load_settings

    return load_settings()


def pytest_addoption(parser):
    parser.addoption(
        "--all-vectors",
        action="store_true",
        default=os.environ.get("KZG_ALL_VECTORS", "") == "1",
        help="run every consensus-spec vector (slow on the oracle backend)",
    )


@pytest.fixture(scope="session")
def all_vectors(request):
    return request.config.getoption("--all-vectors")
