"""kzg_tpu: a TPU-native KZG polynomial-commitment framework
(EIP-4844 Proto-Danksharding + EIP-7594 PeerDAS) built on JAX/XLA/Pallas."""

import os as _os

# Persistent XLA compilation cache: the limb-arithmetic programs are cheap to
# run but expensive to compile; cache them across processes (the runtime
# analog of the reference's precompute disk cache,
# /root/reference/kzg/src/msm/diskcache.rs). Must be set before jax init.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "kzg_tpu", "jax_cache"),
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

__version__ = "0.1.0"
