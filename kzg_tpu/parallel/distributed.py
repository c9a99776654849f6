"""Multi-host distributed execution: DCN-spanning meshes for the sharded
KZG programs.

The reference is single-node (rayon threads + channels,
/root/reference/kzg/src/msm/thread_pool.rs); the TPU-native scaling story
is single-controller JAX: every host calls `initialize()` once, builds ONE
global mesh over all hosts' devices, and runs the same sharded entry
points (`parallel.sharded_msm`, `eip4844.*_batch(mesh=...)`). XLA routes
the collectives over ICI within a slice and DCN across slices -- the blob
axis should map to the DCN dimension (embarrassingly parallel, one
all-gather of single points at the end) and the point axis to ICI.

Single-chip hardware here means multi-host runs are validated structurally
(mesh construction, axis layout) plus the N-virtual-device dryrun; the
code path is identical on a real multi-host slice.
"""

from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX distributed (idempotent). On TPU pods the arguments
    auto-populate from the environment; on CPU/GPU clusters pass them
    explicitly (parity in role: the reference's global thread pool init,
    msm/thread_pool.rs:11-20 -- here the 'pool' is every chip on every
    host)."""
    import jax

    if getattr(initialize, "_done", False):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized (e.g. by the launcher)
    initialize._done = True


def global_mesh(
    blob_axis_size: Optional[int] = None,
    axis_names: Tuple[str, str] = ("blobs", "points"),
):
    """One mesh over every device of every process.

    Layout rule: the FIRST axis ("blobs") spans hosts (DCN) -- independent
    MSM batches never exchange limb data, only the final sub-100-byte
    partial sums -- and the SECOND axis ("points") stays within a host
    (ICI), where bucket-partial all-gathers are bandwidth-relevant.
    blob_axis_size defaults to the number of processes (one blob shard per
    host)."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    n = devs.size
    if blob_axis_size is None:
        blob_axis_size = max(1, jax.process_count())
    if n % blob_axis_size != 0:
        raise ValueError(f"{n} devices not divisible by blob axis {blob_axis_size}")
    return Mesh(devs.reshape(blob_axis_size, n // blob_axis_size), axis_names)


def blobs_mesh():
    """A 1-D mesh over all devices with a single "blobs" axis (the layout
    the batch protocol entry points take via mesh=...)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("blobs",))
