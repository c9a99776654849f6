"""Pallas kernels for the MSM scan hot loop.

Phase 1 of the segmented scan (`ops/msm.py:_bucket_sums_mem`) is the bulk
of the MSM's point work: K sequential mixed adds per chunk, vectorized over
chunk lanes. Three things make this kernel fast where XLA (and the round-1
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
  3. Zero relayout: the kernel consumes the coordinate gather's output
     layout as-is (packed 16-bit limb pairs, element tiles in mem order)
     and unpacks in-register -- the measured bottleneck of the previous
     design was not the random-access gather (~3 ms for 63 MB on v5e) but
     the limb-major transposes and unpack restacks around it (~20 ms).

Gating: msm.py resolves `use_pallas` per call site (process default backend
for plain jit, mesh platform for shard_map -- see enabled/enabled_for).
Bit-exact against the jnp path (tests/test_pallas_msm.py).
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import field as fl
from . import g1
from .field import FP
from .g1 import G1Aff, G1XYZZ

S = 16  # sublane rows per tile: S*128 = 2048 chunk lanes per grid program


def _mxu_on() -> bool:
    """Route the in-kernel Montgomery reductions through the MXU
    (field.mont_mul_mxu); KZG_TPU_MXU=1 enables. Default OFF: measured
    slightly SLOWER than the pure-VPU kernel on v5e (the stack/cast
    relayouts around the byte-band matmuls cost more than the saved
    multiplies); kept for future tuning."""
    return os.environ.get("KZG_TPU_MXU", "0") == "1"


def enabled() -> bool:
    """Default-on when the PROCESS-DEFAULT backend is a TPU;
    KZG_TPU_PALLAS_SCAN=0 disables. Only valid for computations that run on
    the default device set -- for an explicit mesh use enabled_for(mesh)."""
    if os.environ.get("KZG_TPU_PALLAS_SCAN", "1") != "1":
        return False
    try:
        # TPU only (Mosaic lowering); "axon" = remote-attached TPU platform
        return jax.default_backend() in ("tpu", "axon")
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
        return bool(platforms) and platforms <= {"tpu", "axon"}
    except Exception:
        return False


def _kernel_mont(npT, n8T):
    """mont_mul replacement for kernel bodies: MXU byte-band reduction for
    Fp (the only field inside G1 kernels), with the matrices bound to
    in-kernel values."""

    def mont(spec, a, b):
        if spec is not FP:
            return fl.mont_mul_unrolled(spec, a, b)
        return fl.mont_mul_mxu(spec, a, b, mats=(npT, n8T))

    return mont


@lru_cache(maxsize=None)
def _phase1_packed_call(K: int, MS: int, mxu: bool):
    """Phase-1 scan kernel over PACKED gathered rows.

    Input g: (2*LP+1, K, MS, 128) u32 -- per element, LP=L/2 words of packed
    x (two 16-bit limbs per u32), LP words of packed y (digit sign already
    folded: the row table carries a negated-y copy), and one inf word. The
    16-bit unpack happens in-register here, so the XLA-side pipeline never
    materializes the 2x-bigger unpacked coordinate arrays, and the gather
    that feeds this kernel needs no relayout at all (its output IS this
    kernel's input layout). Outputs are written in (L, K, MS, 128) --
    limb-major over the mem layout downstream phases index directly."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = FP.n_limbs
    LP = L // 2

    def kernel(
        npT_ref,
        n8T_ref,
        g_ref,
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
        mont = _kernel_mont(npT_ref[...], n8T_ref[...]) if mxu else None
        with fl.unrolled_ops(mont=mont):
            gb = g_ref[:, 0]  # (2*LP+1, S, 128)

            def unpack(p):  # (LP, S, 128) -> (L, S, 128), limb order 0..L-1
                cols = []
                for k in range(LP):
                    cols.append(p[k] & jnp.uint32(0xFFFF))
                    cols.append(p[k] >> 16)
                return jnp.stack(cols)

            cur = G1Aff(unpack(gb[:LP]), unpack(gb[LP : 2 * LP]), gb[2 * LP] != 0)
            firstt = first_ref[0] != 0
            acc = G1XYZZ(accx[...], accy[...], acczz[...], acczzz[...])
            comb = g1.madd_unified(acc, cur)
            # chunk start (t == 0) resets the scan regardless of flags; the
            # scratch accumulator holds the previous lane-tile's tail there.
            reset = jnp.logical_or(firstt, t == 0)
            newc = g1.select_point(reset, g1.from_affine(cur), comb)
            ox_ref[:, 0] = newc.x
            oy_ref[:, 0] = newc.y
            ozz_ref[:, 0] = newc.zz
            ozzz_ref[:, 0] = newc.zzz
            accx[...] = newc.x
            accy[...] = newc.y
            acczz[...] = newc.zz
            acczzz[...] = newc.zzz

    gspec = lambda: pl.BlockSpec(
        (2 * LP + 1, 1, S, 128),
        lambda i, t: (0, t, i, 0),
        memory_space=pltpu.VMEM,
    )
    mask = lambda: pl.BlockSpec(
        (1, S, 128), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM
    )
    ocoord = lambda: pl.BlockSpec(
        (L, 1, S, 128), lambda i, t: (0, t, i, 0), memory_space=pltpu.VMEM
    )
    matspec = lambda shape: pl.BlockSpec(
        shape, lambda i, t: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    interpret = os.environ.get("KZG_TPU_PALLAS_INTERPRET", "0") == "1"

    @jax.jit
    def call(g, first):
        # g: (2*LP+1, K, MS, 128); first: (K, MS, 128)
        npT, n8T = fl.mxu_mats(FP.name)
        outs = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((L, K, MS, 128), jnp.uint32)
            ]
            * 4,
            grid=(MS // S, K),
            in_specs=[
                matspec(npT.shape),
                matspec(n8T.shape),
                gspec(),
                mask(),
            ],
            out_specs=[ocoord()] * 4,
            scratch_shapes=[pltpu.VMEM((L, S, 128), jnp.uint32)] * 4,
            interpret=interpret,
        )(npT, n8T, g, first)
        return G1XYZZ(*outs)

    return call


def seg_scan_phase1_mem(g: jnp.ndarray, first_mem: jnp.ndarray) -> G1XYZZ:
    """Within-chunk inclusive segmented scan over packed gathered rows, in
    mem layout (element e = t*m + lane; rank r = lane*K + t).

    g: (2*(L//2)+1, K, MS, 128) packed rows; first_mem: (K, MS, 128) u32.
    Returns XYZZ coords of shape (L, K, MS*128)."""
    K, MS = g.shape[1], g.shape[2]
    out = _phase1_packed_call(K, MS, _mxu_on())(g, first_mem)
    return G1XYZZ(*(c.reshape(FP.n_limbs, K, MS * 128) for c in out))


@lru_cache(maxsize=None)
def _add_call():
    """Fixed-shape (L, S, 128) elementwise complete-addition kernel.

    XLA's generated code for wide add_unified chains runs ~10x below the
    VPU ceiling (every limb intermediate spills between fused regions);
    this kernel keeps the whole 23-mul dataflow in registers. The shape is
    FIXED at S*128 lanes so the Mosaic kernel compiles exactly once;
    arbitrary sizes are tiled by add_points_tiled via lax.map."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = FP.n_limbs

    def kernel(px, py, pzz, pzzz, qx, qy, qzz, qzzz, ox, oy, ozz, ozzz):
        with fl.unrolled_ops():
            p = G1XYZZ(px[...], py[...], pzz[...], pzzz[...])
            q = G1XYZZ(qx[...], qy[...], qzz[...], qzzz[...])
            # add_unified_jnp: the module-global add_unified may be swapped
            # to the tiled router while this kernel traces (recursion!)
            r = g1.add_unified_jnp(p, q)
            ox[...] = r.x
            oy[...] = r.y
            ozz[...] = r.zz
            ozzz[...] = r.zzz

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    interpret = os.environ.get("KZG_TPU_PALLAS_INTERPRET", "0") == "1"

    @jax.jit
    def call(p, q):
        outs = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((L, S, 128), jnp.uint32)] * 4,
            in_specs=[spec] * 8,
            out_specs=[spec] * 4,
            interpret=interpret,
        )(*p, *q)
        return G1XYZZ(*outs)

    return call


def add_points_tiled(p: G1XYZZ, q: G1XYZZ) -> G1XYZZ:
    """Complete XYZZ addition over arbitrary batch shapes through the
    fixed-shape Pallas kernel: flatten, pad to S*128-lane chunks, lax.map
    the kernel over chunks (one compiled executable regardless of size)."""
    L = FP.n_limbs
    shape = jnp.broadcast_shapes(p.x.shape, q.x.shape)
    batch = shape[1:]
    M = int(np.prod(batch)) if batch else 1
    lanes = S * 128
    T = -(-M // lanes)
    pad = T * lanes - M

    def prep(c):
        c = jnp.broadcast_to(c, shape).reshape(L, M)
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad)))
        return c.reshape(L, T, S, 128).transpose(1, 0, 2, 3)  # (T, L, S, 128)

    pc = [prep(c) for c in p]
    qc = [prep(c) for c in q]
    call = _add_call()

    if T == 1:
        out = call([c[0] for c in pc], [c[0] for c in qc])
        outs = [c[None] for c in out]
    else:
        stacked = tuple(pc) + tuple(qc)

        def one(args):
            return tuple(call(args[:4], args[4:]))

        outs = jax.lax.map(one, stacked)
    res = []
    for c in outs:
        c = c.transpose(1, 0, 2, 3).reshape(L, T * lanes)
        res.append(c[:, :M].reshape((L,) + batch))
    return G1XYZZ(*res)


# Above this batch size adds route to the kernel; below it the jnp path
# wins. Small (loop-mode XLA point ops on tiny lanes are surprisingly slow
# on TPU -- a padded 2048-lane kernel dispatch is ~0.12 ms flat).
_TILED_MIN_LANES = 128


def tiled_add_unified(p: G1XYZZ, q: G1XYZZ) -> G1XYZZ:
    """add_unified that routes big batches through the Pallas kernel and
    small ones through the jnp path."""
    shape = jnp.broadcast_shapes(p.x.shape, q.x.shape)
    M = int(np.prod(shape[1:])) if len(shape) > 1 else 1
    if M >= _TILED_MIN_LANES:
        return add_points_tiled(p, q)
    return g1.add_unified_jnp(p, q)


@lru_cache(maxsize=None)
def _horner_call(w: int, c: int):
    """Window combination acc = sum_j 2^(c*j) W_j as one kernel: the XLA
    loop form pays ~255 dispatch-granular tiny-lane doublings (~1 ms each);
    here the whole doubling chain stays VMEM-resident. Grid streams the
    windows high-to-low; lanes are one (8, 128) tile (the nb batch is tiny
    -- 1..3 MSMs -- and doublings don't vectorize across windows anyway)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = FP.n_limbs

    def kernel(wx, wy, wzz, wzzz, ox, oy, ozz, ozzz, ax, ay, azz, azzz):
        t = pl.program_id(0)
        with fl.unrolled_ops():
            win = G1XYZZ(wx[0], wy[0], wzz[0], wzzz[0])  # (L, 8, 128)
            acc = G1XYZZ(ax[...], ay[...], azz[...], azzz[...])

            def dstep(_, a):
                return g1.dbl(a)

            doubled = jax.lax.fori_loop(0, c, dstep, acc)
            combined = g1.add_unified_jnp(doubled, win)
            new = g1.select_point(
                jnp.broadcast_to(t == 0, win.x.shape[1:]), win, combined
            )
            ax[...] = new.x
            ay[...] = new.y
            azz[...] = new.zz
            azzz[...] = new.zzz
            ox[...] = new.x
            oy[...] = new.y
            ozz[...] = new.zz
            ozzz[...] = new.zzz

    # stream windows HIGH to LOW: grid step t reads window w-1-t
    spec = lambda: pl.BlockSpec(
        (1, L, 8, 128), lambda t: (w - 1 - t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(memory_space=pltpu.VMEM)
    interpret = os.environ.get("KZG_TPU_PALLAS_INTERPRET", "0") == "1"

    @jax.jit
    def call(wx, wy, wzz, wzzz):
        # inputs (w, L, 8, 128)
        outs = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((L, 8, 128), jnp.uint32)] * 4,
            grid=(w,),
            in_specs=[spec()] * 4,
            out_specs=[ospec] * 4,
            scratch_shapes=[pltpu.VMEM((L, 8, 128), jnp.uint32)] * 4,
            interpret=interpret,
        )(wx, wy, wzz, wzzz)
        return G1XYZZ(*outs)

    return call


def horner_windows(win: G1XYZZ, c: int) -> G1XYZZ:
    """acc = sum_j 2^(c*j) * win[..., j] over the last axis via the
    VMEM-resident doubling-chain kernel. win leaves: (L, nb, w)."""
    L = FP.n_limbs
    nb = win.x.shape[1]
    w = win.x.shape[2]
    lanes = 8 * 128
    assert nb <= lanes, "horner kernel supports up to 1024 lanes"

    def prep(a):  # (L, nb, w) -> (w, L, 8, 128)
        a = jnp.pad(a, ((0, 0), (0, lanes - nb), (0, 0)))
        return a.transpose(2, 0, 1).reshape(w, L, 8, 128)

    out = _horner_call(w, c)(*(prep(a) for a in win))
    return G1XYZZ(*(a.reshape(L, lanes)[:, :nb] for a in out))
