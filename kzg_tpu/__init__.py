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

# The env vars above only take effect if they are set before `import jax` --
# but a site hook (axon's sitecustomize) imports jax at interpreter start in
# TPU sessions, snapshotting the config defaults with the cache DISABLED.
# jax.config.update works after import, so apply the values through it.
# (The remote-attached TPU client advertises "SerializedExecutable /
# compile-cache" support in its platform_version; with the dir actually
# configured, compiled TPU executables persist across processes and a warm
# process skips every remote compile.)
try:  # pragma: no cover - exercised by every device test session
    import jax as _jax

    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update(
            "jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # noqa: BLE001 - cache is an optimization, never fatal
    pass

__version__ = "0.1.0"
