"""Microbenchmark: strategies for the MSM coordinate gather (the current
pipeline bottleneck, ~28 ms of the 58 ms B=8 fixed-base MSM batch).

Variants:
  xla_row      -- current production path: one (E, 24)-row gather from HBM
                  + transpose + 16-bit unpack (ops/msm.py msm_fixed_core).
  xla_row_raw  -- the row gather alone (no transpose/unpack) to split
                  random-access cost from relayout cost.
  onehot_mxu   -- gather-via-matmul: per 4096-row source block, int8 one-hot
                  @ byte-view of the rows on the MXU (classic TPU trick;
                  viable when each destination block sources from a single
                  <=4K-row slice, i.e. per-window blocks).
  pallas_dg    -- Pallas kernel holding one 4096-row table slice in VMEM and
                  issuing tpu.dynamic_gather (take_along_axis) rounds.

Usage: python benches/gather_micro.py [variant ...]
"""

import os
import sys
import time
from functools import partial

import numpy as np


def fence(x):
    return np.asarray(x).sum()


def bench(fn, args, iters=20):
    """fn must end in a tiny in-graph reduction -- the fence reads back a
    few bytes, not the gathered tensor (63 MB over the tunnel would dwarf
    the kernel)."""
    import jax.numpy as jnp

    r = fn(*args)
    fence(r)  # compile + warm
    t0 = time.time()
    outs = [fn(*args) for _ in range(iters)]
    fence(outs[-1])
    return (time.time() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    variants = sys.argv[1:] or ["xla_row_raw", "xla_row", "onehot_mxu"]

    # Shapes of the real problem: E elements gathered from ROWS source rows
    # of 24 u32 (96 B); per-window blocks gather N_BLK elements from a
    # 4096-row slice.
    ROWS = 81920  # w=20 windows x 4096 points
    E = 655360  # 8 blobs x 20 windows x 4096
    N = 4096
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 2**32, (ROWS, 24), dtype=np.uint32))
    src = jnp.asarray(rng.integers(0, ROWS, E, dtype=np.int32))
    # per-window-block sources: E elements in E//N blocks, block b gathers
    # from rows [(b % 20)*N, ...)
    srcb = jnp.asarray(rng.integers(0, N, (E // N, N), dtype=np.int32))

    if "xla_row_raw" in variants:

        @jax.jit
        def row_raw(tab, src):
            return jnp.sum(tab[src], dtype=jnp.uint32)

        dt = bench(row_raw, (tab, src))
        print(f"xla_row_raw : {dt:7.2f} ms  ({E*96/dt/1e6:.1f} GB/s)")

    if "xla_row" in variants:

        @jax.jit
        def row_full(tab, src):
            g = tab[src].T  # (24, E)
            lo = g & jnp.uint32(0xFFFF)
            hi = g >> 16
            out = jnp.stack([lo, hi], axis=1).reshape(48, g.shape[-1])
            return jnp.sum(out, dtype=jnp.uint32)

        dt = bench(row_full, (tab, src))
        print(f"xla_row     : {dt:7.2f} ms  ({E*96/dt/1e6:.1f} GB/s)")

    if "xla_row_pad32" in variants:
        tab32 = jnp.pad(tab, ((0, 0), (0, 8)))  # 128-byte rows

        @jax.jit
        def row32(t, src):
            return jnp.sum(t[src], dtype=jnp.uint32)

        dt = bench(row32, (tab32, src))
        print(f"xla_row_pad32: {dt:6.2f} ms  ({E*96/dt/1e6:.1f} GB/s useful)")

    if "xla_row_pad128" in variants:
        tab128 = jnp.pad(tab, ((0, 0), (0, 104)))  # 512-byte rows

        @jax.jit
        def row128(t, src):
            return jnp.sum(t[src], dtype=jnp.uint32)

        dt = bench(row128, (tab128, src))
        print(f"xla_row_pad128: {dt:5.2f} ms  ({E*96/dt/1e6:.1f} GB/s useful)")

    if "xla_lane" in variants:
        tabT = tab.T  # (24, ROWS): gather along the minor (lane) dim

        @jax.jit
        def lane(t, src):
            return jnp.sum(jnp.take(t, src, axis=1), dtype=jnp.uint32)

        dt = bench(lane, (tabT, src))
        print(f"xla_lane    : {dt:7.2f} ms  ({E*96/dt/1e6:.1f} GB/s)")

    if "xla_one" in variants:
        # single-u32-per-row random read: per-row overhead floor
        flat = tab[:, 0]

        @jax.jit
        def one(t, src):
            return jnp.sum(t[src], dtype=jnp.uint32)

        dt = bench(one, (flat, src))
        print(f"xla_one     : {dt:7.2f} ms  ({E*4/dt/1e6:.1f} GB/s, {E/dt/1e3:.0f}M rows/s)")

    if "onehot_mxu" in variants:

        @jax.jit
        def onehot(tab, srcb):
            nb = srcb.shape[0]
            # block b sources from window (b % 20)'s slice
            t3 = tab.reshape(20, N, 24)
            # byte view (20, N, 96) as int8
            b0 = (t3 & 0xFF).astype(jnp.int8)
            b1 = ((t3 >> 8) & 0xFF).astype(jnp.int8)
            b2 = ((t3 >> 16) & 0xFF).astype(jnp.int8)
            b3 = (t3 >> 24).astype(jnp.int8)
            tb = jnp.stack([b0, b1, b2, b3], axis=-1).reshape(20, N, 96)
            oh = (
                srcb.reshape(nb // 20, 20, N)[..., None]
                == jnp.arange(N, dtype=jnp.int32)
            ).astype(jnp.int8)  # (nb/20, 20, N, N)
            g = jnp.einsum(
                "bwen,wnc->bwec", oh, tb, preferred_element_type=jnp.int32
            )
            g = (g & 0xFF).astype(jnp.uint32).reshape(nb // 20, 20, N, 24, 4)
            out = (
                g[..., 0]
                | (g[..., 1] << 8)
                | (g[..., 2] << 16)
                | (g[..., 3] << 24)
            )
            return jnp.sum(out, dtype=jnp.uint32)

        dt = bench(onehot, (tab, srcb))
        print(f"onehot_mxu  : {dt:7.2f} ms  ({E*96/dt/1e6:.1f} GB/s)")

    if "pallas_dg" in variants:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        # One window slice (N, 24) resident in VMEM, lanes = 24 limbs
        # replicated 5x (120 of 128 lanes); each grid step gathers 4096
        # elements x 5 blocks via take_along_axis along the sublane dim.
        REP = 5

        def kernel(tab_ref, idx_ref, out_ref):
            t = tab_ref[...]  # (N, 24)
            tr = jnp.concatenate([t] * REP, axis=1)  # (N, 120)
            idx = idx_ref[0]  # (N, 120)
            out_ref[0] = jnp.take_along_axis(tr, idx, axis=0)

        grid = E // (N * REP)

        @jax.jit
        def pdg(tab, src):
            idx = jnp.broadcast_to(
                (src % N).reshape(grid, REP, N).transpose(0, 2, 1)[..., None],
                (grid, N, REP, 24),
            ).reshape(grid, N, REP * 24)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((grid, N, REP * 24), jnp.uint32),
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((N, 24), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, N, REP * 24), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, N, REP * 24), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            )(tab[:N], idx)
        dt = bench(pdg, (tab, src))
        print(f"pallas_dg   : {dt:7.2f} ms  ({E*96/dt/1e6:.1f} GB/s)")


if __name__ == "__main__":
    main()
