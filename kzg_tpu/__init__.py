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
# host's CPU; executing those locally can spin forever (cpu_aot_loader
# machine-feature mismatch -> SIGILL risk). Partition rules:
#   - forced-CPU runs (JAX_PLATFORMS leading entry == cpu, e.g. the driver's
#     multi-chip dryrun and the test suite) ALWAYS use a host-local
#     partition, even when remote-compile env vars are present -- XLA:CPU
#     code must match this host's CPU, full stop;
#   - the local partition name embeds a fingerprint of this host's CPU
#     model+flags so AOT artifacts produced by any other machine are
#     invisible here (this is what poisoned the round-4 dryrun cache);
#   - accelerator sessions behind a remote compile service keep a shared
#     "remote" partition (the executables target the accelerator, not a CPU).


def _cache_partition() -> str:
    plat = _os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip().lower()
    forced_cpu = plat == "cpu"
    if not forced_cpu and _os.environ.get("PALLAS_AXON_POOL_IPS"):
        return "remote"
    import hashlib

    h = hashlib.sha256()
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                # only boot-stable identity lines (clock/bogomips vary);
                # stop after the first core's flags -- cores are homogeneous
                if line.startswith((b"model name", b"flags", b"cpu family", b"model\t")):
                    h.update(line)
                    if line.startswith(b"flags"):
                        break
    except OSError:
        import platform

        h.update(platform.processor().encode() or b"unknown")
    return "local_" + h.hexdigest()[:12]


def compile_cache_dir() -> str:
    """Path of the persistent XLA compile cache partition for this process
    (runtime analog of the reference's precompute disk cache,
    /root/reference/kzg/src/msm/diskcache.rs)."""
    return _os.path.join(
        _os.path.expanduser("~"), ".cache", "kzg_tpu", f"jax_cache_{_cache_partition()}"
    )


_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", compile_cache_dir())
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
