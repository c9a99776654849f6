"""Pallas kernel for the MSM scan hot loop.

Phase 1 of the segmented scan (`ops/msm.py:_seg_scan_chunked`) is ~half the
MSM's point work: K sequential mixed adds per chunk, vectorized over chunks.
The XLA path spills every limb intermediate between fused regions; this
kernel keeps the XYZZ accumulator and the whole madd dataflow in
VMEM/registers for the full K-step loop.

Enabled by default on TPU backends (KZG_TPU_PALLAS_SCAN=0 disables);
bit-exact against the jnp path (tests/test_pallas_msm.py).
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp

from . import field as fl
from . import g1
from .field import FP
from .g1 import G1Aff, G1XYZZ

TM = 128  # chunk lanes per grid program


def enabled() -> bool:
    """Default-on for TPU backends; KZG_TPU_PALLAS_SCAN=0 disables."""
    if os.environ.get("KZG_TPU_PALLAS_SCAN", "1") != "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@lru_cache(maxsize=None)
def _phase1_call(K: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = FP.n_limbs

    def kernel(ax_ref, ay_ref, ainf_ref, first_ref, ox_ref, oy_ref, ozz_ref, ozzz_ref):
        # layout: coords (K, L, TM); masks (K, 1, TM) -- every per-step
        # memory access is a 2-D (L, TM) / (1, TM) tile.
        with fl.unrolled_ops():

            def step(t, acc):
                axt = ax_ref[t]
                ayt = ay_ref[t]
                ainft = ainf_ref[t][0] != 0
                firstt = first_ref[t][0] != 0
                cur = G1Aff(axt, ayt, ainft)
                comb = g1.madd_unified(acc, cur)
                newc = g1.select_point(firstt, g1.from_affine(cur), comb)
                ox_ref[t] = newc.x
                oy_ref[t] = newc.y
                ozz_ref[t] = newc.zz
                ozzz_ref[t] = newc.zzz
                return newc

            acc0 = g1.infinity((TM,))
            jax.lax.fori_loop(0, K, step, acc0)

    @jax.jit
    def call(ax, ay, ainf, first):
        # ax/ay: (K, L, m); ainf/first: (K, 1, m)
        m = ax.shape[-1]
        grid = m // TM
        coord = lambda: pl.BlockSpec((K, L, TM), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        mask = lambda: pl.BlockSpec((K, 1, TM), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(ax.shape, ax.dtype)] * 4,
            grid=(grid,),
            in_specs=[coord(), coord(), mask(), mask()],
            out_specs=[coord()] * 4,
        )(ax, ay, ainf, first)
        return G1XYZZ(*outs)

    return call


def seg_scan_phase1(aff_x, aff_y, aff_inf, first) -> G1XYZZ:
    """Within-chunk inclusive segmented scan, Pallas-fused.

    aff_x/aff_y: (24, m, K) Montgomery limbs; aff_inf/first: (m, K) bool.
    Returns scanned XYZZ (…, m, K). m is padded to the TM tile internally.
    """
    m, K = first.shape
    pad = (-m) % TM
    if pad:
        aff_x = jnp.pad(aff_x, ((0, 0), (0, pad), (0, 0)))
        aff_y = jnp.pad(aff_y, ((0, 0), (0, pad), (0, 0)))
        aff_inf = jnp.pad(aff_inf, ((0, pad), (0, 0)), constant_values=True)
        first = jnp.pad(first, ((0, pad), (0, 0)), constant_values=True)
    out = _phase1_call(K)(
        aff_x.transpose(2, 0, 1),  # (K, L, m)
        aff_y.transpose(2, 0, 1),
        aff_inf.astype(jnp.uint32).T[:, None, :],  # (K, 1, m)
        first.astype(jnp.uint32).T[:, None, :],
    )
    out = G1XYZZ(*(c.transpose(1, 2, 0) for c in out))  # back to (L, m, K)
    if pad:
        out = G1XYZZ(*(c[:, :m, :] for c in out))
    return out
