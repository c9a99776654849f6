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
from . import pallas_msm
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


def _pick_chunk(E: int) -> int:
    """Chunk length K so the chunk-lane count m = E/K lands on 2048 (16
    sublane rows x 128 lanes -- a full VPU tile set for the Pallas phase-1
    kernel) whenever the element count allows it."""
    return max(1, -(-E // 2048))


def _seg_scan_chunked(
    aff: G1Aff,
    first: jnp.ndarray,
    last: jnp.ndarray,
    chunk: int,
) -> G1XYZZ:
    """Segmented scan over E sorted AFFINE elements, valid at segment-LAST
    positions only (all the caller consumes). jnp path (CPU tests / oracle
    cross-checks); the production TPU pipeline is _bucket_sums_mem. Three
    phases: (1) sequential within-chunk inclusive scan with MIXED adds (the
    running sum is XYZZ but every incoming element is affine: madd costs
    10M vs the 14M of a full add) -- one traced add, work E, depth K; (2)
    segmented Hillis-Steele over the E/K chunk aggregates; (3) ONE carry-in
    add per chunk, applied at the chunk's first segment-end (the only
    position in the chunk's head piece that downstream reads) -- E/K adds,
    not E. Work ~E mixed + ~2(E/K)log(E/K) full point adds."""
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
        last = jnp.pad(last, (0, pad), constant_values=True)
    m = (E + pad) // K
    ax = aff.x.reshape(aff.x.shape[:-1] + (m, K))
    ay = aff.y.reshape(aff.y.shape[:-1] + (m, K))
    ainf = aff.inf.reshape(m, K)
    fl2 = first.reshape(m, K)
    la2 = last.reshape(m, K)

    # phase 1: sequential inclusive scan within each chunk (lanes = chunks)
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
    return _seg_scan_tail(pts, fl2, la2, m, K, E, pad)


def _seg_scan_tail(
    pts: G1XYZZ, fl2, la2, m: int, K: int, E: int, pad: int
) -> G1XYZZ:
    # phase 2: scan the chunk aggregates (last column) with chunk-level flags
    agg = G1XYZZ(*(c[..., K - 1] for c in pts))  # (…, m)
    fchunk = fl2.any(axis=-1)  # (m,)
    scanned = _seg_scan_hs(agg, fchunk)
    # exclusive carry into chunk i = inclusive scan at i-1 (identity for i=0)
    carry = G1XYZZ(*(jnp.roll(c, 1, axis=-1) for c in scanned))
    carry = g1.select_point(
        jnp.arange(m, dtype=jnp.int32) == 0, g1.infinity((m,)), carry
    )

    # phase 3: of the head-piece positions (before the chunk's first segment
    # start) only segment-LAST ones are ever consumed, and at most one per
    # chunk exists (the chunk's first segment-end). Correct that single
    # position with the carry: m point adds instead of E.
    head = jnp.cumsum(fl2.astype(jnp.int32), axis=-1) == 0  # (m, K)
    hl = jnp.logical_and(head, la2)
    has = hl.any(axis=-1)  # (m,)
    pos = jnp.argmax(hl, axis=-1)  # (m,) first True (0 if none)
    rows = jnp.arange(m, dtype=jnp.int32)
    gathered = G1XYZZ(*(c[..., rows, pos] for c in pts))  # (…, m)
    corrected = g1.add_unified(carry, gathered)
    newv = g1.select_point(has, corrected, gathered)
    pts = G1XYZZ(
        *(c.at[..., rows, pos].set(v) for c, v in zip(pts, newv))
    )

    out = G1XYZZ(*(c.reshape(c.shape[:-2] + (m * K,)) for c in pts))
    if pad:
        out = G1XYZZ(*(c[..., :E] for c in out))
    return out


def segment_sum_points(
    points: G1Aff,
    keys: jnp.ndarray,
    n_keys: int,
    chunk: Optional[int] = None,
) -> G1XYZZ:
    """Sum AFFINE points sharing the same key. `keys` must be SORTED
    ascending, shape (E,); points have batch shape (E,). Returns
    (…, n_keys) XYZZ sums (identity for empty keys)."""
    if chunk is None:
        chunk = _pick_chunk(keys.shape[-1])
    first = jnp.concatenate([jnp.ones((1,), bool), keys[1:] != keys[:-1]])
    last = jnp.concatenate([keys[1:] != keys[:-1], jnp.ones((1,), bool)])
    scanned = _seg_scan_chunked(points, first, last, chunk)
    # Dense bucket array WITHOUT a scatter (XLA scatter serializes on TPU):
    # for each key slot, binary-search the sorted keys for its last element
    # and gather the scan value there; empty slots select identity.
    slots = jnp.arange(n_keys, dtype=keys.dtype)
    pos = jnp.searchsorted(keys, slots, side="right") - 1  # (n_keys,)
    pos_c = jnp.clip(pos, 0, keys.shape[-1] - 1)
    hit = jnp.logical_and(pos >= 0, keys[pos_c] == slots)
    out = G1XYZZ(*(c[..., pos_c] for c in scanned))
    return g1.select_point(hit, out, g1.infinity((n_keys,)))


def _bucket_sums_mem(
    rows_packed: jnp.ndarray,
    flat_keys: jnp.ndarray,
    aug_src: jnp.ndarray,
    n_keys: int,
) -> G1XYZZ:
    """Bucket accumulation for the Pallas path, engineered around the
    measured bottleneck: NOT the random access itself (~3 ms for the 63 MB
    row gather on v5e) but the layout churn around it (limb-major
    transposes, 16-bit unpack restacks, and the rank->tile transposes
    feeding the scan kernel used to cost ~20 ms more).

    Layout plan: the 4-byte/element index arrays do all the relayout work
    and the 96-byte/element coordinates move exactly once --
      * sort carries the row index as a payload (lax.sort multi-operand),
        with the digit sign pre-folded as an offset into a negated-y row
        copy, so neither sign nor sorted keys need a gather;
      * ONE lane-axis take produces packed rows directly in the scan
        kernel's (K, MS, 128) mem-tile layout (element e = t*m + lane,
        rank r = lane*K + t -- the index array is transposed, not the data);
      * the kernel unpacks 16-bit limbs in-register and writes XYZZ in the
        limb-major mem layout phases 2/3 and the bucket gather consume.

    rows_packed: (R2, 2*(L//2)+1) u32 point rows [packed x | packed y |
    inf], with rows [R2/2:) holding the negated-y copies.
    flat_keys/aug_src: (E,) i32 in natural element order; aug_src is the
    row index with +R2/2 folded in for negative digits.
    Returns (L, n_keys) XYZZ bucket sums (identity for empty keys)."""
    E = flat_keys.shape[0]
    L = FP.n_limbs
    sorted_keys, src_sorted = jax.lax.sort((flat_keys, aug_src), num_keys=1)
    diff = sorted_keys[1:] != sorted_keys[:-1]
    first = jnp.concatenate([jnp.ones((1,), bool), diff])
    last = jnp.concatenate([diff, jnp.ones((1,), bool)])
    K = _pick_chunk(E)
    lanes = pallas_msm.S * 128
    m_p = -(-(-(-E // K)) // lanes) * lanes
    E2 = m_p * K
    pad = E2 - E
    if pad:
        # padded ranks sit at the tail (highest lanes); first=True isolates
        # them in their own segments, and no bucket key resolves to them
        src_sorted = jnp.pad(src_sorted, (0, pad))
        first = jnp.pad(first, (0, pad), constant_values=True)
        last = jnp.pad(last, (0, pad), constant_values=True)
    fl2 = first.reshape(m_p, K)
    la2 = last.reshape(m_p, K)
    MS = m_p // 128
    idx_mem = src_sorted.reshape(m_p, K).T.reshape(K, MS, 128)
    first_mem = fl2.astype(jnp.uint32).T.reshape(K, MS, 128)
    g = jnp.take(rows_packed.T, idx_mem, axis=1)  # (2LP+1, K, MS, 128)
    pts = pallas_msm.seg_scan_phase1_mem(g, first_mem)  # coords (L, K, m_p)

    # phase 2: scan the chunk aggregates (step K-1 plane) with chunk flags
    agg = G1XYZZ(*(c[:, K - 1, :] for c in pts))  # (L, m_p)
    fchunk = fl2.any(axis=-1)
    scanned = _seg_scan_hs(agg, fchunk)
    carry = G1XYZZ(*(jnp.roll(c, 1, axis=-1) for c in scanned))
    carry = g1.select_point(
        jnp.arange(m_p, dtype=jnp.int32) == 0, g1.infinity((m_p,)), carry
    )

    # phase 3: one carry-in correction per chunk, at the chunk's first
    # segment-end inside the head piece (the only consumed head position)
    head = jnp.cumsum(fl2.astype(jnp.int32), axis=-1) == 0  # (m_p, K)
    hl = jnp.logical_and(head, la2)
    has = hl.any(axis=-1)
    pos = jnp.argmax(hl, axis=-1)  # (m_p,) step index per lane
    rows = jnp.arange(m_p, dtype=jnp.int32)
    gathered = G1XYZZ(*(c[:, pos, rows] for c in pts))  # (L, m_p)
    corrected = g1.add_unified(carry, gathered)
    newv = g1.select_point(has, corrected, gathered)
    pts = G1XYZZ(*(c.at[:, pos, rows].set(v) for c, v in zip(pts, newv)))

    # bucket extraction: binary-search rank positions, convert rank->mem
    flat = G1XYZZ(*(c.reshape(L, E2) for c in pts))
    slots = jnp.arange(n_keys, dtype=sorted_keys.dtype)
    pos_r = jnp.searchsorted(sorted_keys, slots, side="right") - 1
    pos_c = jnp.clip(pos_r, 0, E - 1)
    hit = jnp.logical_and(pos_r >= 0, sorted_keys[pos_c] == slots)
    f = (pos_c % K) * m_p + pos_c // K
    out = G1XYZZ(*(c[:, f] for c in flat))
    return g1.select_point(hit, out, g1.infinity((n_keys,)))


def _pack_point_rows(xs: jnp.ndarray, ys: jnp.ndarray, infs: jnp.ndarray):
    """(L, …) x/y limb arrays + (…,) inf mask -> (2R, L+1) packed row table
    [packed x | packed y | inf] with negated-y copies in the top half (sign
    folding: digit sign selects the row half, so the sort payload carries
    everything the scan kernel needs)."""
    L = FP.n_limbs
    R = int(np.prod(xs.shape[1:]))

    def pack(a):  # (L, …) -> (R, L/2)
        p = a[0::2] | (a[1::2] << 16)
        return p.reshape(L // 2, R).T

    xr = pack(xs)
    infc = infs.reshape(R, 1).astype(jnp.uint32)
    pos = jnp.concatenate([xr, pack(ys), infc], axis=1)
    neg = jnp.concatenate([xr, pack(fl.neg(FP, ys)), infc], axis=1)
    return jnp.concatenate([pos, neg], axis=0), R


def _weighted_index_sum(p: G1XYZZ) -> G1XYZZ:
    """sum_k k * p[..., k] over a SMALL last axis via suffix scan:
    sum_k k*S_k = sum_{j>=1} (sum_{k>=j} S_k). Returns (..., 1)."""
    tail = G1XYZZ(*(c[..., 1:] for c in p))
    suffix = g1.suffix_scan_add(tail)
    return g1.tree_reduce(suffix)


def integrate_buckets(buckets: G1XYZZ) -> G1XYZZ:
    """sum_b b * buckets[..., b] over the last axis, where index 0 has weight
    0 (parity: bucket integration, msm/tiling_pippenger_ops.rs:21-45).

    Split the bucket index b = hi*G + lo (G ~ sqrt(B)):
      sum_b b*S_b = G * sum_hi hi*A_hi + sum_lo lo*B_lo,
      A_hi = sum_lo S_{hi,lo},  B_lo = sum_hi S_{hi,lo}.
    The two groupings are log-depth tree reductions (~2B wide adds) and the
    two weighted sums are suffix scans over ~sqrt(B) lanes -- ~6x less point
    work than a suffix scan over the whole bucket axis, and the doubling
    chain for the G factor is only log2(G) long."""
    B = buckets.x.shape[-1]
    if B <= 32:
        return _weighted_index_sum(buckets)
    g_bits = (B - 1).bit_length() // 2
    G = 1 << g_bits
    H = -(-B // G)
    pad = H * G - B
    if pad:
        buckets = G1XYZZ(
            *(jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, pad)]) for c in buckets)
        )
    sq = G1XYZZ(*(c.reshape(c.shape[:-1] + (H, G)) for c in buckets))
    a_hi = g1.tree_reduce(sq, unroll=True)  # (..., H, 1)
    a_hi = G1XYZZ(*(c[..., 0] for c in a_hi))  # (..., H)
    b_lo = g1.tree_reduce(
        G1XYZZ(*(jnp.swapaxes(c, -1, -2) for c in sq)), unroll=True
    )
    b_lo = G1XYZZ(*(c[..., 0] for c in b_lo))  # (..., G)
    wa = _weighted_index_sum(a_hi)  # (..., 1)
    wb = _weighted_index_sum(b_lo)  # (..., 1)
    wa = _dbl_n(G1XYZZ(*(c[..., 0] for c in wa)), g_bits)
    out = g1.add_unified(wa, G1XYZZ(*(c[..., 0] for c in wb)))
    return G1XYZZ(*(c[..., None] for c in out))


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
    use_pallas: Optional[bool] = None,
) -> G1XYZZ:
    """Variable-base MSM. points: affine batch (…, *batch, n); scalars:
    canonical Fr limbs (16, *batch, n). Returns XYZZ sums of batch shape
    (*batch,). All leading batch dims are independent MSMs fused into one
    sort + one scan.

    use_pallas selects the Pallas scan kernel; None resolves from the
    process default backend -- callers executing on an explicit non-default
    mesh (shard_map) must pass it explicitly, since the devices actually
    running the computation may differ from jax.default_backend().
    (parity: msm() /root/reference/kzg/src/msm/msm_impls.rs:113-148)"""
    n = points.x.shape[-1]
    if use_pallas is None:
        use_pallas = pallas_msm.enabled()
    if n < 8 and points.x.ndim == 2:
        # tiny inputs: per-lane ladder + tree reduce beats the sort machinery
        # (parity: the reference's naive loop below 8 points)
        return _msm_ladder_jit(points, scalars)
    if c is None:
        c = default_window(n, fixed_base=False)
    return _msm_jit(points, scalars, c, use_pallas)


@jax.jit
def _msm_ladder_jit(points: G1Aff, scalars: jnp.ndarray) -> G1XYZZ:
    out = g1.msm_ladder(points, scalars)
    return G1XYZZ(*(cc[..., 0] for cc in out))


@partial(jax.jit, static_argnames=("c", "use_pallas"))
def _msm_jit(
    points: G1Aff, scalars: jnp.ndarray, c: int, use_pallas: bool
) -> G1XYZZ:
    return msm_core(points, scalars, c, use_pallas)


def msm_core(
    points: G1Aff, scalars: jnp.ndarray, c: int, use_pallas: Optional[bool] = None
) -> G1XYZZ:
    """Unjitted variable-base MSM body (composable under shard_map/jit).

    use_pallas=None resolves from the process default backend at trace time
    -- correct for jit on the default device set; shard_map callers on an
    explicit mesh must pass a bool (the mesh platform may differ)."""
    if use_pallas is None:
        use_pallas = pallas_msm.enabled()
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

    seg = (
        jnp.arange(nb, dtype=jnp.int32)[None, :, None] * w
        + jnp.arange(w, dtype=jnp.int32)[:, None, None]
    )
    keys = seg * (half + 1) + bucket  # (w, nb, n)
    n_keys = nb * w * (half + 1)
    L = FP.n_limbs

    if use_pallas:
        rows_packed, R0 = _pack_point_rows(xs, ys, infs)
        src_nat = jnp.broadcast_to(
            jnp.arange(nb * n, dtype=jnp.int32).reshape(1, nb, n), (w, nb, n)
        )
        aug = jnp.where(sign, src_nat + R0, src_nat).reshape(E)
        with g1.tiled_pallas_adds():
            sums = _bucket_sums_mem(rows_packed, keys.reshape(E), aug, n_keys)
            buckets = G1XYZZ(
                *(cc.reshape((L, nb, w, half + 1)) for cc in sums)
            )
            win = integrate_buckets(buckets)  # (L, nb, w, 1)
    else:
        flat_keys = keys.reshape(E)
        order = jnp.argsort(flat_keys)
        sorted_keys = flat_keys[order]
        einf = jnp.broadcast_to(infs[None], (w, nb, n)).reshape(E)
        pinf = einf[order]
        yneg = fl.neg(FP, ys)
        ex = jnp.broadcast_to(xs[:, None], (L, w, nb, n)).reshape(L, E)
        ey = jnp.where(sign[None], yneg[:, None], ys[:, None]).reshape(L, E)
        px = ex[:, order]
        py = ey[:, order]

        sums = segment_sum_points(G1Aff(px, py, pinf), sorted_keys, n_keys)
        buckets = G1XYZZ(
            *(cc.reshape((FP.n_limbs, nb, w, half + 1)) for cc in sums)
        )

        win = integrate_buckets(buckets)  # (L, nb, w, 1)
    win = G1XYZZ(*(cc[..., 0] for cc in win))  # (L, nb, w)

    # Horner over windows, high to low
    if use_pallas and nb <= 1024:
        # VMEM-resident doubling chain (the XLA loop form costs ~1 ms per
        # tiny-lane doubling dispatch -- ~250 ms for the whole chain)
        acc = pallas_msm.horner_windows(win, c)
    else:
        acc0 = G1XYZZ(*(cc[..., w - 1] for cc in win))

        def horner_step(i, a):
            j = w - 2 - i
            a = _dbl_n(a, c)
            wj = G1XYZZ(
                *(
                    jax.lax.dynamic_index_in_dim(cc, j, cc.ndim - 1, False)
                    for cc in win
                )
            )
            return g1.add_unified(a, wj)

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

    # lax.scan keeps the traced graph at ONE c-fold doubling chain however
    # many windows there are (an unrolled chain is w*c doublings of HLO --
    # minutes of XLA:CPU compile time for production c).
    def step(carry, _):
        return _dbl_n(carry, c), carry

    _, rows = jax.lax.scan(step, cur, None, length=w)
    stacked = G1XYZZ(*(jnp.moveaxis(rows[k], 0, 1) for k in range(4)))
    aff = g1.to_affine(stacked)
    return aff.x, aff.y, aff.inf


def msm_fixed(
    table: FixedBaseTable,
    scalars: jnp.ndarray,
    use_pallas: Optional[bool] = None,
) -> G1XYZZ:
    """Fixed-base MSM against a precomputed table: window combination is
    free (the table already holds 2^(c*j)-multiples), so the whole MSM is
    one segmented reduction over a single bucket space -- no doubling chain.

    scalars: canonical Fr limbs (16, *batch, n) with n == table.n; leading
    batch dims are independent MSMs over the same base points."""
    if use_pallas is None:
        use_pallas = pallas_msm.enabled()
    return _msm_fixed_jit(
        table.x, table.y, table.inf, scalars, table.c, use_pallas
    )


@partial(jax.jit, static_argnames=("c", "use_pallas"))
def _msm_fixed_jit(
    tab_x: jnp.ndarray,
    tab_y: jnp.ndarray,
    tab_inf: jnp.ndarray,
    scalars: jnp.ndarray,
    c: int,
    use_pallas: bool,
) -> G1XYZZ:
    return msm_fixed_core(
        FixedBaseTable(tab_x, tab_y, tab_inf, c), scalars, use_pallas
    )


def msm_fixed_core(
    table: FixedBaseTable, scalars: jnp.ndarray, use_pallas: Optional[bool] = None
) -> G1XYZZ:
    """Unjitted fixed-base MSM body (composable under shard_map/jit).

    The table may carry its own trailing batch dims (distinct base-point
    sets, e.g. the 128 FK20 columns): table.x (L, w, *tbatch, n) with tbatch
    broadcastable against the scalars' batch dims from the right.
    use_pallas semantics as in msm_core."""
    if use_pallas is None:
        use_pallas = pallas_msm.enabled()
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

    # key space: per-batch buckets (windows share buckets -- the table rows
    # already carry the 2^(c*j) factor)
    bidx = jnp.arange(nb, dtype=jnp.int32)[None, :, None]
    keys = bidx * (half + 1) + bucket

    E = nb * w * n
    n_keys = nb * (half + 1)
    tshape = lambda lead: lead + (1,) * (len(batch) - len(tb)) + tb + (n,)
    Tb = int(np.prod(tb)) if tb else 1

    if use_pallas:
        # source row for element e of the (w, *batch, n) flattening: the
        # batch dims broadcast over the table's own *tb dims from the right
        rows_packed, R0 = _pack_point_rows(table.x, table.y, table.inf)
        src_nat = (
            jnp.arange(w, dtype=jnp.int32).reshape(w, 1, 1) * Tb
            + (jnp.arange(nb, dtype=jnp.int32) % Tb).reshape(1, nb, 1)
        ) * n + jnp.arange(n, dtype=jnp.int32).reshape(1, 1, n)
        aug = jnp.where(sign, src_nat + R0, src_nat).reshape(E)
        with g1.tiled_pallas_adds():
            sums = _bucket_sums_mem(rows_packed, keys.reshape(E), aug, n_keys)
            buckets = G1XYZZ(*(cc.reshape((L, nb, half + 1)) for cc in sums))
            acc = integrate_buckets(buckets)  # (L, nb, 1)
    else:
        flat_keys = keys.reshape(E)
        order = jnp.argsort(flat_keys)
        sorted_keys = flat_keys[order]

        def unpack(g):  # (L/2, E') -> (L, E')
            lo = g & jnp.uint32(0xFFFF)
            hi = g >> 16
            return jnp.stack([lo, hi], axis=1).reshape(L, g.shape[-1])

        tinf = jnp.broadcast_to(
            table.inf.reshape(tshape((w,))), (w,) + batch + (n,)
        ).reshape(E)

        def pack(a):  # (L, w, *tb, n) -> broadcast packed (L/2, E)
            p = a[0::2] | (a[1::2] << 16)
            return jnp.broadcast_to(
                p.reshape(tshape((L // 2, w))), (L // 2, w) + batch + (n,)
            ).reshape(L // 2, E)

        px = unpack(pack(table.x)[:, order])
        py = unpack(pack(table.y)[:, order])
        pinf = tinf[order]
        sign_s = sign.reshape(E)[order]
        py = jnp.where(sign_s[None], fl.neg(FP, py), py)

        sums = segment_sum_points(G1Aff(px, py, pinf), sorted_keys, n_keys)
        buckets = G1XYZZ(*(cc.reshape((FP.n_limbs, nb, half + 1)) for cc in sums))

        acc = integrate_buckets(buckets)  # (L, nb, 1)
    acc = G1XYZZ(*(cc[..., 0] for cc in acc))
    if batch:
        return G1XYZZ(*(cc.reshape((FP.n_limbs,) + batch) for cc in acc))
    return G1XYZZ(*(cc[..., 0] for cc in acc))
