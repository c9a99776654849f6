"""Pallas kernel for the MSM scan hot loop.

Phase 1 of the segmented scan (`ops/msm.py:_seg_scan_chunked`) is the bulk
of the MSM's point work: K sequential mixed adds per chunk, vectorized over
chunk lanes. Two things make this kernel fast where XLA (and the round-1
kernel) were not:

  1. Full VPU tiles: every limb is a 2-D (S, 128) block (S sublane rows x
     128 lanes), so each vector op processes S*128 chunk lanes. The round-1
     kernel ran limb ops on (128,)-shaped batches -- one sublane row, ~1/8
     of the VPU.
  2. Streaming grid: the grid is (lane_tiles, K) with the K axis innermost;
     each step's coordinate tile is DMA'd HBM->VMEM by the pipeline while
     the previous step computes, and the XYZZ accumulator lives in VMEM
     scratch across the whole K-loop. VMEM holds only O(1) steps, so K (and
     the MSM size) is unbounded.

Gating: msm.py resolves `use_pallas` per call site (process default backend
for plain jit, mesh platform for shard_map -- see enabled/enabled_for).
Bit-exact against the jnp path (tests/test_pallas_msm.py).
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp

from . import field as fl
from . import g1
from .field import FP
from .g1 import G1Aff, G1XYZZ

S = 16  # sublane rows per tile: S*128 = 2048 chunk lanes per grid program


def enabled() -> bool:
    """Default-on when the PROCESS-DEFAULT backend is a TPU;
    KZG_TPU_PALLAS_SCAN=0 disables. Only valid for computations that run on
    the default device set -- for an explicit mesh use enabled_for(mesh)."""
    if os.environ.get("KZG_TPU_PALLAS_SCAN", "1") != "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def enabled_for(mesh) -> bool:
    """Whether the Pallas scan kernel may run on the devices of `mesh`
    (a jax.sharding.Mesh). The process default backend is irrelevant here:
    a CPU mesh under a TPU-default process must NOT trace the TPU kernel."""
    if os.environ.get("KZG_TPU_PALLAS_SCAN", "1") != "1":
        return False
    try:
        import numpy as _np

        platforms = {d.platform for d in _np.asarray(mesh.devices).flat}
        return bool(platforms) and "cpu" not in platforms
    except Exception:
        return False


@lru_cache(maxsize=None)
def _phase1_call(K: int, MS: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = FP.n_limbs

    def kernel(
        ax_ref,
        ay_ref,
        ainf_ref,
        first_ref,
        ox_ref,
        oy_ref,
        ozz_ref,
        ozzz_ref,
        accx,
        accy,
        acczz,
        acczzz,
    ):
        t = pl.program_id(1)
        with fl.unrolled_ops():
            axt = ax_ref[0]  # (L, S, 128)
            ayt = ay_ref[0]
            inft = ainf_ref[0] != 0  # (S, 128)
            firstt = first_ref[0] != 0
            cur = G1Aff(axt, ayt, inft)
            acc = G1XYZZ(accx[...], accy[...], acczz[...], acczzz[...])
            comb = g1.madd_unified(acc, cur)
            # chunk start (t == 0) resets the scan regardless of flags; the
            # scratch accumulator holds the previous lane-tile's tail there.
            reset = jnp.logical_or(firstt, t == 0)
            newc = g1.select_point(reset, g1.from_affine(cur), comb)
            ox_ref[0] = newc.x
            oy_ref[0] = newc.y
            ozz_ref[0] = newc.zz
            ozzz_ref[0] = newc.zzz
            accx[...] = newc.x
            accy[...] = newc.y
            acczz[...] = newc.zz
            acczzz[...] = newc.zzz

    coord = lambda: pl.BlockSpec(
        (1, L, S, 128), lambda i, t: (t, 0, i, 0), memory_space=pltpu.VMEM
    )
    mask = lambda: pl.BlockSpec(
        (1, S, 128), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM
    )

    interpret = os.environ.get("KZG_TPU_PALLAS_INTERPRET", "0") == "1"

    @jax.jit
    def call(ax, ay, ainf, first):
        # ax/ay: (K, L, MS, 128); ainf/first: (K, MS, 128)
        outs = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(ax.shape, ax.dtype)] * 4,
            grid=(MS // S, K),
            in_specs=[coord(), coord(), mask(), mask()],
            out_specs=[coord()] * 4,
            scratch_shapes=[pltpu.VMEM((L, S, 128), jnp.uint32)] * 4,
            interpret=interpret,
        )(ax, ay, ainf, first)
        return G1XYZZ(*outs)

    return call


def seg_scan_phase1(aff_x, aff_y, aff_inf, first) -> G1XYZZ:
    """Within-chunk inclusive segmented scan, Pallas-fused.

    aff_x/aff_y: (L, m, K) Montgomery limbs; aff_inf/first: (m, K) bool.
    Returns scanned XYZZ (L, m, K). m is padded to S*128 lanes internally.
    """
    L = FP.n_limbs
    m, K = first.shape
    lanes = S * 128
    pad = (-m) % lanes
    mp = m + pad
    MS = mp // 128

    def to_coord(a):  # (L, m, K) -> (K, L, MS, 128)
        a = a.transpose(2, 0, 1)  # (K, L, m)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
        return a.reshape(K, L, MS, 128)

    def to_mask(a):  # (m, K) bool -> (K, MS, 128) u32
        a = a.astype(jnp.uint32).T  # (K, m)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)), constant_values=1)
        return a.reshape(K, MS, 128)

    out = _phase1_call(K, MS)(
        to_coord(aff_x), to_coord(aff_y), to_mask(aff_inf), to_mask(first)
    )

    def back(a):  # (K, L, MS, 128) -> (L, m, K)
        a = a.reshape(K, L, mp)[:, :, :m]
        return a.transpose(1, 2, 0)

    return G1XYZZ(*(back(c) for c in out))
