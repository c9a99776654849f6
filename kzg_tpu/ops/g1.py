"""Batched G1 point arithmetic on extended XYZZ coordinates (TPU backend).

Representation (structure-of-arrays so everything vmaps/shards):
  - XYZZ point batch: (x, y, zz, zzz), each a (24, *batch) uint32 limb array
    in Montgomery form; the identity is encoded as zz == 0.
    (x = X/ZZ, y = Y/ZZZ with ZZ^3 = ZZZ^2 -- the same coordinate system as
    the reference's MSM hot loop, /root/reference/kzg/src/msm/pippenger_utils.rs:7)
  - Affine point batch: (x, y, inf) with inf a (*batch,) bool mask.

All additions are *unified*: exceptional cases (identity operands, P == Q,
P == -Q) are resolved with masked selects, never branches, so batches of
arbitrary adversarial points are safe on SIMD hardware.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import G1_GENERATOR_X, G1_GENERATOR_Y
from . import field as fl
from .field import FP


class G1XYZZ(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    zz: jnp.ndarray
    zzz: jnp.ndarray


class G1Aff(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray  # bool, batch shape


def _mul(a, b):
    return fl.mont_mul(FP, a, b)


def _sqr(a):
    return fl.mont_mul(FP, a, a)


def _add(a, b):
    return fl.add(FP, a, b)


def _sub(a, b):
    return fl.sub(FP, a, b)


def infinity(batch_shape) -> G1XYZZ:
    z = jnp.zeros((FP.n_limbs,) + tuple(batch_shape), jnp.uint32)
    return G1XYZZ(z, z, z, z)


def is_inf(p: G1XYZZ) -> jnp.ndarray:
    return fl.is_zero(FP, p.zz)


def select_point(mask, a: G1XYZZ, b: G1XYZZ) -> G1XYZZ:
    return G1XYZZ(
        fl.select(mask, a.x, b.x),
        fl.select(mask, a.y, b.y),
        fl.select(mask, a.zz, b.zz),
        fl.select(mask, a.zzz, b.zzz),
    )


def neg(p: G1XYZZ) -> G1XYZZ:
    return G1XYZZ(p.x, fl.neg(FP, p.y), p.zz, p.zzz)


def from_affine(a: G1Aff) -> G1XYZZ:
    # built from scalar constants so the same body works inside Pallas
    # kernels (captured array constants are rejected there)
    one = jnp.stack(
        [jnp.full(a.x.shape[1:], int(v), jnp.uint32) for v in FP.one_mont]
    )
    z = jnp.zeros_like(a.x)
    zz = jnp.where(a.inf[None], z, one)
    return G1XYZZ(a.x, a.y, zz, zz)


def dbl(p: G1XYZZ) -> G1XYZZ:
    """XYZZ doubling (dbl-2008-s, a=0): 6M + 3S arranged as 4 stacked
    multiplication rounds. Identity doubles to identity automatically
    (zz3 = V * zz = 0)."""
    u = _add(p.y, p.y)
    v, xx = fl.mul_many(FP, [(u, u), (p.x, p.x)])
    w, s = fl.mul_many(FP, [(u, v), (p.x, v)])
    m = _add(_add(xx, xx), xx)
    mm, wy, zz3, zzz3 = fl.mul_many(
        FP, [(m, m), (w, p.y), (v, p.zz), (w, p.zzz)]
    )
    x3 = _sub(mm, _add(s, s))
    (y3a,) = fl.mul_many(FP, [(m, _sub(s, x3))])
    y3 = _sub(y3a, wy)
    return G1XYZZ(x3, y3, zz3, zzz3)


def _dbl_rounds(p: G1XYZZ):
    """The four multiplication rounds of `dbl`, expressed as stackable pair
    lists so add_unified can fuse them with its own rounds."""
    u = _add(p.y, p.y)
    state = {}

    def r1():
        return [(u, u), (p.x, p.x)]

    def r2(v, xx):
        state["v"], state["xx"] = v, xx
        return [(u, v), (p.x, v)]

    def r3(w, s):
        state["w"], state["s"] = w, s
        m = _add(_add(state["xx"], state["xx"]), state["xx"])
        state["m"] = m
        return [(m, m), (w, p.y), (state["v"], p.zz), (w, p.zzz)]

    def r4(mm, wy, zz3, zzz3):
        state["wy"], state["zz3"], state["zzz3"] = wy, zz3, zzz3
        x3 = _sub(mm, _add(state["s"], state["s"]))
        state["x3"] = x3
        return [(state["m"], _sub(state["s"], x3))]

    def finish(y3a):
        return G1XYZZ(
            state["x3"], _sub(y3a, state["wy"]), state["zz3"], state["zzz3"]
        )

    return r1, r2, r3, r4, finish


def add_unified(p: G1XYZZ, q: G1XYZZ) -> G1XYZZ:
    """Branchless complete XYZZ addition (add-2008-s + doubling fallback),
    arranged as 4 stacked multiplication rounds (the doubling path's rounds
    are fused into the same mont_mul calls).

    P == -Q lands on the identity automatically (PP == 0 -> zz3 == 0);
    P == Q is routed through the doubling formulas; identity operands are
    selected through."""
    d1, d2, d3, d4, dfin = _dbl_rounds(p)

    out = fl.mul_many(
        FP, [(p.x, q.zz), (q.x, p.zz), (p.y, q.zzz), (q.y, p.zzz)] + d1()
    )
    u1, u2, s1, s2 = out[:4]
    pd = _sub(u2, u1)
    r = _sub(s2, s1)

    inf1 = is_inf(p)
    inf2 = is_inf(q)
    x_eq = fl.is_zero(FP, pd)
    y_eq = fl.is_zero(FP, r)
    both = jnp.logical_and(jnp.logical_not(inf1), jnp.logical_not(inf2))
    need_dbl = jnp.logical_and(both, jnp.logical_and(x_eq, y_eq))

    out = fl.mul_many(FP, [(pd, pd)] + d2(*out[4:]))
    pp = out[0]
    out = fl.mul_many(
        FP,
        [(pd, pp), (u1, pp), (p.zz, q.zz), (p.zzz, q.zzz), (r, r)] + d3(*out[1:]),
    )
    ppp, q0, zza, zzza, rr = out[:5]
    x3 = _sub(_sub(rr, ppp), _add(q0, q0))
    out = fl.mul_many(
        FP,
        [(r, _sub(q0, x3)), (s1, ppp), (zza, pp), (zzza, ppp)] + d4(*out[5:]),
    )
    y3a, sppp, zz3, zzz3 = out[:4]
    res = G1XYZZ(x3, _sub(y3a, sppp), zz3, zzz3)

    res = select_point(need_dbl, dfin(out[4]), res)
    res = select_point(inf2, p, res)
    res = select_point(inf1, q, res)
    return res


# stable alias: the Pallas router (pallas_msm.tiled_add_unified) falls back
# to this when the module-global add_unified has been swapped
add_unified_jnp = add_unified


class _TiledPallasAdds:
    """Context manager: route module-level add_unified through the
    fixed-shape Pallas elementwise kernel for large batches (XLA's spilled
    codegen for the 23-mul unified add runs ~10x below the VPU ceiling).
    Only for XLA-level code on a TPU -- never inside another kernel trace."""

    def __enter__(self):
        global add_unified
        from . import pallas_msm

        self._saved = add_unified
        add_unified = pallas_msm.tiled_add_unified

    def __exit__(self, *exc):
        global add_unified
        add_unified = self._saved
        return False


tiled_pallas_adds = _TiledPallasAdds


def madd_unified(p: G1XYZZ, a: G1Aff) -> G1XYZZ:
    """Branchless mixed addition XYZZ + affine (madd-2008-s): 8M + 2S on the
    main path. The P == Q fallback doubles the AFFINE operand (mdbl: ZZ3 and
    ZZZ3 come out as V and W for free), which is 2 muls cheaper than fusing
    the projective doubling of the accumulator -- if the x-coordinates
    match with both points finite, 2a == 2P either way."""
    U = _add(a.y, a.y)
    u2, s2, V, xx = fl.mul_many(
        FP, [(a.x, p.zz), (a.y, p.zzz), (U, U), (a.x, a.x)]
    )
    pd = _sub(u2, p.x)
    r = _sub(s2, p.y)

    inf1 = is_inf(p)
    inf2 = a.inf
    x_eq = fl.is_zero(FP, pd)
    y_eq = fl.is_zero(FP, r)
    both = jnp.logical_and(jnp.logical_not(inf1), jnp.logical_not(inf2))
    need_dbl = jnp.logical_and(both, jnp.logical_and(x_eq, y_eq))

    pp, W, Sd = fl.mul_many(FP, [(pd, pd), (U, V), (a.x, V)])
    M = _add(_add(xx, xx), xx)
    ppp, q0, rr, MM = fl.mul_many(
        FP, [(pd, pp), (p.x, pp), (r, r), (M, M)]
    )
    x3 = _sub(_sub(rr, ppp), _add(q0, q0))
    x3d = _sub(MM, _add(Sd, Sd))
    y3a, sppp, zz3, zzz3, msd, wy = fl.mul_many(
        FP,
        [
            (r, _sub(q0, x3)),
            (p.y, ppp),
            (p.zz, pp),
            (p.zzz, ppp),
            (M, _sub(Sd, x3d)),
            (W, a.y),
        ],
    )
    res = G1XYZZ(x3, _sub(y3a, sppp), zz3, zzz3)
    dbl_res = G1XYZZ(x3d, _sub(msd, wy), V, W)

    res = select_point(need_dbl, dbl_res, res)
    res = select_point(inf2, p, res)
    res = select_point(inf1, from_affine(a), res)
    return res


def to_affine(p: G1XYZZ) -> G1Aff:
    """Batch conversion to affine via one shared inversion
    (parity: batch affine conversion, msm/tiling_parallel_pippenger.rs:26-68)."""
    inf = is_inf(p)
    t = fl.mont_mul(FP, p.zz, p.zzz)
    batch = t.shape[1:]
    flat = t.reshape(FP.n_limbs, -1)
    tinv, _ = fl.batch_inv_tree(FP, flat, zero_to_one=True)
    tinv = tinv.reshape((FP.n_limbs,) + batch)
    zz_inv = fl.mont_mul(FP, tinv, p.zzz)  # 1/zz
    zzz_inv = fl.mont_mul(FP, tinv, p.zz)  # 1/zzz
    x = fl.mont_mul(FP, p.x, zz_inv)
    y = fl.mont_mul(FP, p.y, zzz_inv)
    zeros = jnp.zeros_like(x)
    return G1Aff(
        jnp.where(inf[None], zeros, x), jnp.where(inf[None], zeros, y), inf
    )


# ---------------------------------------------------------------------------
# Scalar multiplication / small MSM (double-and-add ladder over the batch)
# ---------------------------------------------------------------------------


def scalar_mul(a: G1Aff, scalar_limbs: jnp.ndarray, nbits: int = 255) -> G1XYZZ:
    """Per-lane scalar multiplication: out[i] = scalar[i] * a[i].

    scalar_limbs: (16, *batch) canonical (non-Montgomery) Fr limbs.
    MSB-first double-and-add with a fori_loop body (graph: 1 dbl + 1 madd)."""
    batch = a.x.shape[1:]
    acc0 = infinity(batch)

    def body(i, acc):
        bit_idx = nbits - 1 - i
        limb = scalar_limbs[bit_idx // 16]
        bit = (limb >> (bit_idx % 16)) & 1
        acc = dbl(acc)
        added = madd_unified(acc, a)
        return select_point(bit == 1, added, acc)

    return jax.lax.fori_loop(0, nbits, body, acc0)


def tree_reduce(p: G1XYZZ, unroll: bool = False) -> G1XYZZ:
    """Sum all points along the last batch axis in log depth.

    unroll=True: halving adds, n-1 point-op work, log n traced adds (use on
    TPU / inside Pallas-backed paths). unroll=False: recursive-doubling with
    rolls inside a fori_loop -- one traced add, n log n work (use where
    compile time dominates, e.g. XLA:CPU tests)."""
    n = p.x.shape[-1]
    m = 1 << max(0, (n - 1)).bit_length()
    if m != n:
        pad = [(0, 0)] * (p.x.ndim - 1) + [(0, m - n)]
        p = G1XYZZ(*(jnp.pad(c, pad) for c in p))
    if m == 1:
        return p
    if unroll:
        while m > 1:
            h = m // 2
            lo = G1XYZZ(*(c[..., :h] for c in p))
            hi = G1XYZZ(*(c[..., h : 2 * h] for c in p))
            p = add_unified(lo, hi)
            m = h
        return p

    levels = m.bit_length() - 1

    def body(k, pt):
        shift = -(jnp.int32(1) << k)
        rolled = G1XYZZ(*(jnp.roll(c, shift, axis=-1) for c in pt))
        return add_unified(pt, rolled)

    p = jax.lax.fori_loop(0, levels, body, p)
    return G1XYZZ(*(c[..., :1] for c in p))


def suffix_scan_add(p: G1XYZZ) -> G1XYZZ:
    """Inclusive reverse (suffix) cumulative point sum along the last axis.

    Hillis-Steele with jnp.roll inside a fori_loop: one traced addition for
    the whole scan (n log n work, log n depth) -- chosen for compile-time
    economy over the work-efficient recursion; the scanned axis here is the
    bucket axis, which is small relative to the element axis."""
    n = p.x.shape[-1]
    if n == 1:
        return p
    rounds = (n - 1).bit_length()
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(d, q):
        s = jnp.int32(1) << d
        rolled = G1XYZZ(*(jnp.roll(c, -s, axis=-1) for c in q))
        added = add_unified(q, rolled)
        keep = idx <= jnp.int32(n - 1) - s  # lanes with a valid right partner
        return select_point(keep, added, q)

    return jax.lax.fori_loop(0, rounds, body, p)


def msm_ladder(points: G1Aff, scalar_limbs: jnp.ndarray) -> G1XYZZ:
    """MSM for small n: per-lane ladder then tree reduction. Returns a
    single-point batch of shape (..., 1)."""
    prods = scalar_mul(points, scalar_limbs)
    return tree_reduce(prods)


# ---------------------------------------------------------------------------
# Host conversions (oracle <-> device)
# ---------------------------------------------------------------------------


def affine_host_limbs(points):
    """List of oracle affine points -> HOST numpy (x_limbs, y_limbs, inf),
    for callers that pack several arrays into one fused device upload."""
    xs, ys, infs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(0)
            infs.append(True)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            infs.append(False)
    return FP.encode_host(xs), FP.encode_host(ys), np.array(infs)


def affine_from_ints(points) -> G1Aff:
    """List of oracle affine points ((x, y) ints or None) -> device batch."""
    xs, ys, infs = affine_host_limbs(points)
    return G1Aff(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(infs))


def affine_to_ints(a: G1Aff):
    """Device affine batch -> list of oracle affine points.

    All three components come back in ONE host transfer (each read-back
    through a remote-attached device costs a full round trip)."""
    L = FP.n_limbs
    if hasattr(a.x, "devices"):  # device arrays: fuse the read-back
        packed = np.asarray(
            _pack_affine_jit(a.x, a.y, a.inf)
        )  # (2L+1, *batch)
        xs = FP.decode(packed[:L])
        ys = FP.decode(packed[L : 2 * L])
        infs = packed[2 * L].reshape(-1) != 0
    else:
        xs = FP.decode(a.x)
        ys = FP.decode(a.y)
        infs = np.asarray(a.inf).reshape(-1)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


@jax.jit
def _pack_affine_jit(x, y, inf):
    return jnp.concatenate([x, y, inf.astype(jnp.uint32)[None]], axis=0)


_to_affine_jit = None


def xyzz_to_ints(p: G1XYZZ):
    global _to_affine_jit
    if _to_affine_jit is None:
        _to_affine_jit = jax.jit(to_affine)
    return affine_to_ints(_to_affine_jit(p))
