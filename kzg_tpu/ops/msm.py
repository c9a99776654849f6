"""Device (TPU) multi-scalar multiplication: Pippenger reformulated for SIMD.

The reference's MSM hot loop (/root/reference/kzg/src/msm/) is a branchy,
data-dependent bucket scatter on a thread pool -- unusable on a vector
machine. The TPU-native formulation used here:

  1. Scalars -> signed window digits (integer limb ops, fully vectorized).
  2. Bucket accumulation = sort-by-bucket + *segmented tree reduction*: sort
     the (window, bucket) keys once, then reduce runs of equal keys with a
     log-depth `jax.lax.associative_scan` over the complete-addition monoid.
     Every step is a batched unified XYZZ add over the full element set --
     no scatter conflicts, no branches.
  3. Bucket integration (sum_b b * S_b) = one reversed associative scan over
     the bucket axis plus a log-depth tree reduction.
  4. Window combination = Horner with c doublings per window (variable-base),
     or eliminated entirely by a fixed-base precomputed table holding
     2^(c*j) * P_i for every window j (the BGMW analog,
     /root/reference/kzg/src/msm/bgmw.rs -- HBM is plentiful on TPU).

Leading batch dimensions (many independent MSMs, e.g. the 128 FK20 column
MSMs or the 3 batch-verification MSMs) are folded into the sort key, so a
whole family of MSMs runs as ONE sort + ONE scan.
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import field as fl
from . import g1
from .field import FP, FR
from .g1 import G1Aff, G1XYZZ


def default_window(n: int, fixed_base: bool) -> int:
    """Window-size heuristic (cost model analog of
    /root/reference/kzg/src/msm/bgmw.rs:102-135). Segmented-scan work is
    ~2*(n*w) + 2*2^(c-1) unified adds; minimize over c, avoiding c | 255."""
    best_c, best_cost = 4, float("inf")
    for c in range(4, 17):
        if 255 % c == 0:
            continue
        w = -(-255 // c)
        cost = 2 * n * w + 2 * (1 << (c - 1))
        if not fixed_base:
            cost += 255 + w  # Horner doubling chain
        if cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def num_windows(c: int) -> int:
    w = -(-255 // c)
    assert 255 % c != 0, "255 % c == 0 would overflow the top signed digit"
    return w


def signed_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """Canonical Fr limbs (16, *batch) -> signed window digits (w, *batch).

    Digits lie in [-2^(c-1), 2^(c-1)] (booth-style: digit > 2^(c-1) borrows
    from the next window; the top window absorbs the carry without
    overflowing because 255 % c != 0).
    """
    w = num_windows(c)
    half = 1 << (c - 1)
    full = 1 << c
    digits = []
    for j in range(w):
        bit_lo = c * j
        limb = bit_lo // 16
        sh = bit_lo % 16
        raw = scalars[limb] >> sh
        have = 16 - sh
        k = 1
        while have < c and limb + k < scalars.shape[0]:
            raw = raw | (scalars[limb + k] << have)
            have += 16
            k += 1
        digits.append((raw & (full - 1)).astype(jnp.int32))
    out = []
    carry = jnp.zeros_like(digits[0])
    for j in range(w):
        d = digits[j] + carry
        wrap = d > half
        out.append(jnp.where(wrap, d - full, d))
        carry = wrap.astype(jnp.int32)
    return jnp.stack(out, axis=0)


# ---------------------------------------------------------------------------
# Segmented reduction over the complete-addition monoid
# ---------------------------------------------------------------------------


def _seg_scan_hs(points: G1XYZZ, flags: jnp.ndarray) -> G1XYZZ:
    """Inclusive segmented scan along the last axis, Hillis-Steele with
    jnp.roll in a fori_loop (ONE traced addition; n log n work). flags marks
    segment starts. Used only at the small chunk-aggregate level."""
    n = flags.shape[-1]
    if n == 1:
        return points
    rounds = (n - 1).bit_length()
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(d, carry):
        p, f = carry
        s = jnp.int32(1) << d
        rp = G1XYZZ(*(jnp.roll(c, s, axis=-1) for c in p))
        rf = jnp.roll(f, s, axis=-1)
        valid = idx >= s
        combined = g1.add_unified(rp, p)
        newp = g1.select_point(jnp.logical_and(valid, jnp.logical_not(f)), combined, p)
        newf = jnp.where(valid, jnp.logical_or(f, rf), f)
        return newp, newf

    out, _ = jax.lax.fori_loop(0, rounds, body, (points, flags))
    return out


def _seg_scan_chunked(aff: G1Aff, first: jnp.ndarray, chunk: int) -> G1XYZZ:
    """Inclusive segmented scan over E sorted AFFINE elements in three
    phases: (1) sequential within-chunk scan with MIXED adds (the running
    sum is XYZZ but every incoming element is affine: madd costs 10M vs the
    14M of a full add) -- one traced add, work E, depth K;
    (2) segmented Hillis-Steele over the E/K chunk aggregates;
    (3) one carry-in add for each chunk's head piece.
    Work ~2E + (E/K)log(E/K) point adds with a constant-size traced graph --
    the compile-time/work sweet spot the tree recursions miss."""
    E = first.shape[-1]
    K = min(chunk, E)
    pad = (-E) % K
    if pad:
        aff = G1Aff(
            jnp.pad(aff.x, [(0, 0)] * (aff.x.ndim - 1) + [(0, pad)]),
            jnp.pad(aff.y, [(0, 0)] * (aff.y.ndim - 1) + [(0, pad)]),
            jnp.pad(aff.inf, (0, pad), constant_values=True),
        )
        first = jnp.pad(first, (0, pad), constant_values=True)
    m = (E + pad) // K
    ax = aff.x.reshape(aff.x.shape[:-1] + (m, K))
    ay = aff.y.reshape(aff.y.shape[:-1] + (m, K))
    ainf = aff.inf.reshape(m, K)
    fl2 = first.reshape(m, K)

    # phase 1: sequential inclusive scan within each chunk (lanes = chunks)
    from . import pallas_msm

    if pallas_msm.enabled() and ax.ndim == 3:
        pts = pallas_msm.seg_scan_phase1(ax, ay, ainf, fl2)
        return _seg_scan_tail(pts, fl2, m, K, E, pad)

    col0 = g1.from_affine(G1Aff(ax[..., 0], ay[..., 0], ainf[..., 0]))
    pts = G1XYZZ(
        *(
            jnp.zeros_like(c).at[..., 0].set(c0)
            for c, c0 in zip((ax, ay, ax, ay), col0)
        )
    )

    def p1(t, p):
        prev = G1XYZZ(*(jax.lax.dynamic_index_in_dim(c, t - 1, c.ndim - 1, False) for c in p))
        cur_aff = G1Aff(
            jax.lax.dynamic_index_in_dim(ax, t, ax.ndim - 1, False),
            jax.lax.dynamic_index_in_dim(ay, t, ay.ndim - 1, False),
            jax.lax.dynamic_index_in_dim(ainf, t, 1, False),
        )
        comb = g1.madd_unified(prev, cur_aff)
        newc = g1.select_point(fl2[:, t], g1.from_affine(cur_aff), comb)
        return G1XYZZ(
            *(
                jax.lax.dynamic_update_index_in_dim(c, nc, t, c.ndim - 1)
                for c, nc in zip(p, newc)
            )
        )

    pts = jax.lax.fori_loop(1, K, p1, pts)
    return _seg_scan_tail(pts, fl2, m, K, E, pad)


def _seg_scan_tail(pts: G1XYZZ, fl2, m: int, K: int, E: int, pad: int) -> G1XYZZ:
    # phase 2: scan the chunk aggregates (last column) with chunk-level flags
    agg = G1XYZZ(*(c[..., K - 1] for c in pts))  # (…, m)
    fchunk = fl2.any(axis=-1)  # (m,)
    scanned = _seg_scan_hs(agg, fchunk)
    # exclusive carry into chunk i = inclusive scan at i-1 (identity for i=0)
    carry = G1XYZZ(*(jnp.roll(c, 1, axis=-1) for c in scanned))
    carry = g1.select_point(
        jnp.arange(m, dtype=jnp.int32) == 0, g1.infinity((m,)), carry
    )

    # phase 3: apply the carry to each chunk's head piece (elements before
    # the first segment start of their chunk)
    head = jnp.cumsum(fl2.astype(jnp.int32), axis=-1) == 0  # (m, K)
    carry_b = G1XYZZ(*(c[..., :, None] for c in carry))
    added = g1.add_unified(carry_b, pts)
    pts = g1.select_point(head, added, pts)

    out = G1XYZZ(*(c.reshape(c.shape[:-2] + (m * K,)) for c in pts))
    if pad:
        out = G1XYZZ(*(c[..., :E] for c in out))
    return out


def segment_sum_points(
    points: G1Aff, keys: jnp.ndarray, n_keys: int, chunk: int = 64
) -> G1XYZZ:
    """Sum AFFINE points sharing the same key. `keys` must be SORTED
    ascending, shape (E,); points have batch shape (E,). Returns
    (…, n_keys) XYZZ sums (identity for empty keys)."""
    first = jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    scanned = _seg_scan_chunked(points, first, chunk)
    last = jnp.concatenate([keys[1:] != keys[:-1], jnp.ones((1,), bool)])
    # scatter each segment's total (at its last position) into the key slot;
    # non-last positions go to a dump slot n_keys.
    idx = jnp.where(last, keys, n_keys)
    out = g1.infinity((n_keys + 1,))
    out = G1XYZZ(
        out.x.at[:, idx].set(scanned.x),
        out.y.at[:, idx].set(scanned.y),
        out.zz.at[:, idx].set(scanned.zz),
        out.zzz.at[:, idx].set(scanned.zzz),
    )
    return G1XYZZ(*(c[..., :n_keys] for c in out))


def integrate_buckets(buckets: G1XYZZ) -> G1XYZZ:
    """sum_b b * buckets[..., b] over the last axis, where index 0 has weight
    0 (parity: bucket integration, msm/tiling_pippenger_ops.rs:21-45).
    Suffix-scan formulation: sum_b b*S_b = sum_{k>=1} (sum_{b>=k} S_b)."""
    tail = G1XYZZ(*(c[..., 1:] for c in buckets))
    suffix = g1.suffix_scan_add(tail)
    return g1.tree_reduce(suffix)


def _dbl_n(p: G1XYZZ, n: int) -> G1XYZZ:
    if n <= 3:
        for _ in range(n):
            p = g1.dbl(p)
        return p
    # fori_loop keeps the traced graph at one doubling regardless of n
    return jax.lax.fori_loop(0, n, lambda _, q: g1.dbl(q), p)


# ---------------------------------------------------------------------------
# MSM entry points
# ---------------------------------------------------------------------------


def msm(
    points: G1Aff,
    scalars: jnp.ndarray,
    c: Optional[int] = None,
) -> G1XYZZ:
    """Variable-base MSM. points: affine batch (…, *batch, n); scalars:
    canonical Fr limbs (16, *batch, n). Returns XYZZ sums of batch shape
    (*batch,). All leading batch dims are independent MSMs fused into one
    sort + one scan.
    (parity: msm() /root/reference/kzg/src/msm/msm_impls.rs:113-148)"""
    n = points.x.shape[-1]
    if n < 8 and points.x.ndim == 2:
        # tiny inputs: per-lane ladder + tree reduce beats the sort machinery
        # (parity: the reference's naive loop below 8 points)
        return _msm_ladder_jit(points, scalars)
    if c is None:
        c = default_window(n, fixed_base=False)
    return _msm_jit(points, scalars, c)


@jax.jit
def _msm_ladder_jit(points: G1Aff, scalars: jnp.ndarray) -> G1XYZZ:
    out = g1.msm_ladder(points, scalars)
    return G1XYZZ(*(cc[..., 0] for cc in out))


@partial(jax.jit, static_argnames=("c",))
def _msm_jit(points: G1Aff, scalars: jnp.ndarray, c: int) -> G1XYZZ:
    return msm_core(points, scalars, c)


def msm_core(points: G1Aff, scalars: jnp.ndarray, c: int) -> G1XYZZ:
    """Unjitted variable-base MSM body (composable under shard_map/jit)."""
    n = points.x.shape[-1]
    batch = points.x.shape[1:-1]
    nb = int(np.prod(batch)) if batch else 1
    w = num_windows(c)
    half = 1 << (c - 1)

    digits = signed_digits(scalars, c)  # (w, *batch, n)
    digits = digits.reshape(w, nb, n)
    xs = points.x.reshape(FP.n_limbs, nb, n)
    ys = points.y.reshape(FP.n_limbs, nb, n)
    infs = points.inf.reshape(nb, n)

    E = nb * w * n
    # element e = (b, j, i): key = ((b * w + j) * (half + 1)) + bucket
    sign = digits < 0
    bucket = jnp.abs(digits)  # (w, nb, n)
    yneg = fl.neg(FP, ys)
    # broadcast points across windows: (L, w, nb, n)
    ex = jnp.broadcast_to(xs[:, None], (FP.n_limbs, w, nb, n))
    ey = jnp.where(sign[None], yneg[:, None], ys[:, None])
    einf = jnp.broadcast_to(infs[None], (w, nb, n))

    seg = (
        jnp.arange(nb, dtype=jnp.int32)[None, :, None] * w
        + jnp.arange(w, dtype=jnp.int32)[:, None, None]
    )
    keys = seg * (half + 1) + bucket  # (w, nb, n)

    flat_keys = keys.reshape(E)
    order = jnp.argsort(flat_keys)
    sorted_keys = flat_keys[order]
    px = ex.reshape(FP.n_limbs, E)[:, order]
    py = ey.reshape(FP.n_limbs, E)[:, order]
    pinf = einf.reshape(E)[order]

    n_keys = nb * w * (half + 1)
    sums = segment_sum_points(G1Aff(px, py, pinf), sorted_keys, n_keys)
    buckets = G1XYZZ(*(cc.reshape((FP.n_limbs, nb, w, half + 1)) for cc in sums))

    win = integrate_buckets(buckets)  # (L, nb, w, 1)
    win = G1XYZZ(*(cc[..., 0] for cc in win))  # (L, nb, w)

    # Horner over windows, high to low: one traced (c doublings + add) body
    acc0 = G1XYZZ(*(cc[..., w - 1] for cc in win))

    def horner_step(i, acc):
        j = w - 2 - i
        acc = _dbl_n(acc, c)
        wj = G1XYZZ(
            *(jax.lax.dynamic_index_in_dim(cc, j, cc.ndim - 1, False) for cc in win)
        )
        return g1.add_unified(acc, wj)

    acc = jax.lax.fori_loop(0, w - 1, horner_step, acc0)
    if batch:
        return G1XYZZ(*(cc.reshape((FP.n_limbs,) + batch) for cc in acc))
    return G1XYZZ(*(cc[..., 0] for cc in acc))


class FixedBaseTable(NamedTuple):
    """Precomputed window multiples 2^(c*j) * P_i (BGMW analog,
    /root/reference/kzg/src/msm/bgmw.rs:206). x/y: (L, w, n); inf: (w, n)."""

    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray
    c: int

    @property
    def n(self) -> int:
        return self.x.shape[-1]


def build_fixed_base_table(points: G1Aff, c: Optional[int] = None) -> FixedBaseTable:
    """One-time per-setup precompute: w batched doubling chains + a single
    batch affine conversion (tree batch-inverse)."""
    n = points.x.shape[-1]
    if c is None:
        c = default_window(n, fixed_base=True)
    x, y, inf = _build_table_jit(points, c)
    return FixedBaseTable(x, y, inf, c)


@partial(jax.jit, static_argnames=("c",))
def _build_table_jit(points: G1Aff, c: int):
    w = num_windows(c)
    cur = g1.from_affine(points)
    rows = [cur]
    for _ in range(w - 1):
        cur = _dbl_n(cur, c)
        rows.append(cur)
    stacked = G1XYZZ(*(jnp.stack([r[k] for r in rows], axis=1) for k in range(4)))
    aff = g1.to_affine(stacked)
    return aff.x, aff.y, aff.inf


def msm_fixed(table: FixedBaseTable, scalars: jnp.ndarray) -> G1XYZZ:
    """Fixed-base MSM against a precomputed table: window combination is
    free (the table already holds 2^(c*j)-multiples), so the whole MSM is
    one segmented reduction over a single bucket space -- no doubling chain.

    scalars: canonical Fr limbs (16, *batch, n) with n == table.n; leading
    batch dims are independent MSMs over the same base points."""
    return _msm_fixed_jit(table.x, table.y, table.inf, scalars, table.c)


@partial(jax.jit, static_argnames=("c",))
def _msm_fixed_jit(
    tab_x: jnp.ndarray,
    tab_y: jnp.ndarray,
    tab_inf: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int,
) -> G1XYZZ:
    return msm_fixed_core(FixedBaseTable(tab_x, tab_y, tab_inf, c), scalars)


def msm_fixed_core(table: FixedBaseTable, scalars: jnp.ndarray) -> G1XYZZ:
    """Unjitted fixed-base MSM body (composable under shard_map/jit).

    The table may carry its own trailing batch dims (distinct base-point
    sets, e.g. the 128 FK20 columns): table.x (L, w, *tbatch, n) with tbatch
    broadcastable against the scalars' batch dims from the right."""
    c = table.c
    w = num_windows(c)
    half = 1 << (c - 1)
    n = table.n
    batch = scalars.shape[1:-1]
    nb = int(np.prod(batch)) if batch else 1

    digits = signed_digits(scalars, c).reshape(w, nb, n)
    sign = digits < 0
    bucket = jnp.abs(digits)

    L = FP.n_limbs
    tb = table.x.shape[2:-1]  # table's own batch dims
    pad = (1,) * (len(batch) - len(tb))
    tshape = lambda a, lead: lead + pad + tb + (n,)
    tx = jnp.broadcast_to(
        table.x.reshape(tshape(table.x, (L, w))), (L, w) + batch + (n,)
    ).reshape(L, w, nb, n)
    ty = jnp.broadcast_to(
        table.y.reshape(tshape(table.y, (L, w))), (L, w) + batch + (n,)
    ).reshape(L, w, nb, n)
    tinf = jnp.broadcast_to(
        table.inf.reshape(tshape(table.inf, (w,))), (w,) + batch + (n,)
    ).reshape(w, nb, n)

    tyneg = fl.neg(FP, ty)
    ex = tx
    ey = jnp.where(sign[None], tyneg, ty)
    einf = tinf

    # key space: per-batch buckets (windows share buckets -- the table rows
    # already carry the 2^(c*j) factor)
    bidx = jnp.arange(nb, dtype=jnp.int32)[None, :, None]
    keys = bidx * (half + 1) + bucket

    E = nb * w * n
    flat_keys = keys.reshape(E)
    order = jnp.argsort(flat_keys)
    sorted_keys = flat_keys[order]
    px = ex.reshape(FP.n_limbs, E)[:, order]
    py = ey.reshape(FP.n_limbs, E)[:, order]
    pinf = einf.reshape(E)[order]

    sums = segment_sum_points(G1Aff(px, py, pinf), sorted_keys, nb * (half + 1))
    buckets = G1XYZZ(*(cc.reshape((FP.n_limbs, nb, half + 1)) for cc in sums))

    acc = integrate_buckets(buckets)  # (L, nb, 1)
    acc = G1XYZZ(*(cc[..., 0] for cc in acc))
    if batch:
        return G1XYZZ(*(cc.reshape((FP.n_limbs,) + batch) for cc in acc))
    return G1XYZZ(*(cc[..., 0] for cc in acc))
