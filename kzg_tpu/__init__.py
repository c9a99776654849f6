"""kzg_tpu: a TPU-native KZG polynomial-commitment framework
(EIP-4844 Proto-Danksharding + EIP-7594 PeerDAS) built on JAX/XLA/Pallas."""

import os as _os

# Persistent XLA compilation cache: the limb-arithmetic programs are cheap to
# run but expensive to compile; cache them across processes (the runtime
# analog of the reference's precompute disk cache,
# /root/reference/kzg/src/msm/diskcache.rs). Must be set before jax init.
#
# The cache is partitioned by compile mode: sessions that use a remote XLA
# compile service produce XLA:CPU AOT executables tuned for the *remote*
# host's CPU; executing those locally can spin forever. Keeping remote- and
# local-compiled artifacts in separate directories makes each cache
# self-consistent.
_cache_mode = "remote" if _os.environ.get("PALLAS_AXON_POOL_IPS") else "local"
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(
        _os.path.expanduser("~"), ".cache", "kzg_tpu", f"jax_cache_{_cache_mode}"
    ),
)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

__version__ = "0.1.0"
