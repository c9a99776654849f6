"""Multi-chip MSM: points and blob batches sharded over a device mesh.

The reference's parallelism is shared-memory threads (2-D point x window
tile grid on a thread pool, /root/reference/kzg/src/msm/
tiling_parallel_pippenger.rs:70-186). The TPU-native equivalent:

  - mesh axis "blobs" (data parallel): independent MSMs of a batch shard
    embarrassingly -- exactly the reference's per-core blob chunking
    (/root/reference/kzg/src/eip_4844.rs:770-816).
  - mesh axis "points" (model parallel): each chip runs Pippenger bucket
    accumulation on its point shard; per-shard partial sums are combined
    with an all_gather over ICI followed by a log-depth on-chip reduction
    (point addition is not a ring `psum`, and the payload is a single
    point -- latency-bound, so one small collective beats clever overlap).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import g1
from ..ops import msm as m
from ..ops import pallas_msm
from ..ops.g1 import G1Aff, G1XYZZ


def _combine_gathered(part: G1XYZZ, axis_name: str, unroll: bool) -> G1XYZZ:
    """all_gather per-shard partial sums and add them up on every chip.

    unroll follows the MESH platform (like the field-op form): unrolled
    halving adds on TPU, the one-traced-add fori_loop form on a CPU mesh
    where XLA:CPU compile time is the binding constraint (the multi-chip
    dryrun budget)."""
    gathered = jax.tree.map(
        lambda a: jax.lax.all_gather(a, axis_name, axis=a.ndim, tiled=False),
        part,
    )  # leaves: (..., n_dev)
    return g1.tree_reduce(G1XYZZ(*gathered), unroll=unroll)


def msm_fixed_sharded(
    table: m.FixedBaseTable,
    scalars: jnp.ndarray,
    mesh: Mesh,
    blob_axis: str = "blobs",
    point_axis: str = "points",
) -> G1XYZZ:
    """Fixed-base MSM family with the blob batch sharded over `blob_axis`
    and the 4096 base points sharded over `point_axis`.

    table arrays: x/y (L, w, n), inf (w, n); scalars (16, B, n) canonical.
    Returns replicated-over-points, blob-sharded XYZZ results (…, B).
    """
    c = table.c
    # Gate the Pallas kernel on the MESH platform, not the process default
    # backend: a CPU mesh in a TPU-default process must not trace the kernel.
    use_pallas = pallas_msm.enabled_for(mesh)

    def shard_fn(tx, ty, tinf, sc):
        part = m.msm_fixed_core(
            m.FixedBaseTable(tx, ty, tinf, c), sc, use_pallas=use_pallas
        )
        full = _combine_gathered(part, point_axis, unroll=use_pallas)
        return G1XYZZ(*(a[..., 0] for a in full))

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        check_rep=False,
        in_specs=(
            P(None, None, point_axis),
            P(None, None, point_axis),
            P(None, point_axis),
            P(None, blob_axis, point_axis),
        ),
        out_specs=G1XYZZ(
            P(None, blob_axis), P(None, blob_axis), P(None, blob_axis), P(None, blob_axis)
        ),
    )
    return jax.jit(fn)(table.x, table.y, table.inf, scalars)


def msm_sharded(
    points: G1Aff,
    scalars: jnp.ndarray,
    mesh: Mesh,
    point_axis: str = "points",
    c: Optional[int] = None,
) -> G1XYZZ:
    """Variable-base MSM with points sharded over `point_axis`.
    points: (L, n) affine; scalars (16, n) canonical. Returns one point."""
    n = points.x.shape[-1]
    n_dev = mesh.shape[point_axis]
    if c is None:
        c = m.default_window(max(1, n // n_dev), fixed_base=False)
    use_pallas = pallas_msm.enabled_for(mesh)

    def shard_fn(px, py, pinf, sc):
        part = m.msm_core(G1Aff(px, py, pinf), sc, c, use_pallas=use_pallas)
        full = _combine_gathered(part, point_axis, unroll=use_pallas)
        return G1XYZZ(*(a[..., 0] for a in full))

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        check_rep=False,
        in_specs=(
            P(None, point_axis),
            P(None, point_axis),
            P(point_axis),
            P(None, point_axis),
        ),
        out_specs=G1XYZZ(P(None), P(None), P(None), P(None)),
    )
    return jax.jit(fn)(points.x, points.y, points.inf, scalars)
