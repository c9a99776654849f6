"""Device radix-2 FFT over G1 points.

The reference's fft_g1 (/root/reference/blst/src/fft_g1.rs) is the same
butterfly recursion as fft_fr except the twiddle multiply is a full scalar
multiplication. TPU-first formulation here:

  - iterative stage loop (log2 n stages, static shapes);
  - the per-stage twiddle scalars are HOST CONSTANTS (roots of unity), so
    their signed window digits are precomputed into small device tables and
    the scalar-mul ladder becomes: build 2^(c-1) batched multiples of the
    half being twiddled (15 unified adds at c=5), then a fori_loop over
    windows doing [c doublings + one digit-gathered mixed add] on all lanes
    at once;
  - everything batches over leading dims, so the FK20 pipeline runs its
    G1 FFTs for a whole family of blobs in one traced program.

FK20 keeps these FFTs at size 128 (the reference's 18.8s fft_g1 at 2^15 is
exactly the path this design avoids, see SURVEY.md section 6).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_MOD as R, root_of_unity
from . import field as fl
from . import g1
from .field import FP
from .g1 import G1XYZZ

TWIDDLE_WINDOW = 5  # digits in [-16, 16]

# ---------------------------------------------------------------------------
# GLV endomorphism: phi(x, y) = (beta*x, y) satisfies phi(P) = lambda*P with
# lambda = x_bls^2 - 1 (a primitive 6th-root relation of the BLS parameter:
# r = x^4 - x^2 + 1 => lambda^2 + lambda + 1 = 0 mod r). Fixed scalars
# decompose as t = t1 + t2*lambda via plain divmod (t1 < lambda ~ 2^127,
# t2 <= r/lambda ~ 2^129), halving the ladder depth.
# (role parity: the arkmsm GLV port, /root/reference/kzg/src/msm/arkmsm/glv.rs)
# ---------------------------------------------------------------------------

from ..constants import BLS_X, P_MOD

GLV_LAMBDA = (BLS_X * BLS_X - 1) % R
assert (GLV_LAMBDA * GLV_LAMBDA + GLV_LAMBDA + 1) % R == 0


@lru_cache(maxsize=None)
def _glv_beta_mont():
    """The cube root of unity in Fp matching lambda, as Montgomery limbs."""
    from ..oracle.curve import G1, G1_GENERATOR
    from .field import FP

    g = 2
    while pow(g, (P_MOD - 1) // 3, P_MOD) == 1:
        g += 1
    root = pow(g, (P_MOD - 1) // 3, P_MOD)
    gx, gy = G1_GENERATOR
    lam_g = G1.mul_scalar(G1_GENERATOR, GLV_LAMBDA)
    for beta in (root, root * root % P_MOD):
        if lam_g == (beta * gx % P_MOD, gy):
            return FP.const(beta)
    raise AssertionError("no matching GLV beta")


def _glv_digits_host(value: int, c: int = TWIDDLE_WINDOW):
    """Fixed scalar -> (digits1, digits2) for t = t1 + t2*lambda."""
    t2, t1 = divmod(value % R, GLV_LAMBDA)
    w = -(-130 // c)  # both halves < 2^129

    def dig(v):
        half, full = 1 << (c - 1), 1 << c
        out, carry = [], 0
        for j in range(w):
            d = ((v >> (c * j)) & (full - 1)) + carry
            if d > half:
                d -= full
                carry = 1
            else:
                carry = 0
            out.append(d)
        assert carry == 0 and sum(x << (c * j) for j, x in enumerate(out)) == v
        return out

    return dig(t1), dig(t2)


def _signed_digits_host(value: int, c: int):
    """Booth-style signed c-bit windows of a 255-bit scalar, host-side.

    Uses ceil(256/c) windows so the top window always has headroom for the
    final borrow carry (with exactly ceil(255/c) windows and c | 255 the
    carry would be silently dropped for ~half of all scalars)."""
    w = -(-256 // c)
    half, full = 1 << (c - 1), 1 << c
    digits = []
    carry = 0
    for j in range(w):
        d = ((value >> (c * j)) & (full - 1)) + carry
        if d > half:
            d -= full
            carry = 1
        else:
            carry = 0
        digits.append(d)
    assert carry == 0, "signed digit encoding overflowed"
    assert sum(x << (c * j) for j, x in enumerate(digits)) == value
    return digits


@lru_cache(maxsize=None)
def _stage_digit_tables(log_n: int, inverse: bool, c: int = TWIDDLE_WINDOW):
    """Per-stage (w, h) bucket-index and sign tables for the twiddle scalars
    w^0..w^(h-1) of stage s (h = 2^s)."""
    out = []
    for s in range(log_n):
        h = 1 << s
        wroot = root_of_unity(s + 1)
        if inverse:
            wroot = pow(wroot, R - 2, R)
        tw = 1
        digs, signs = [], []
        for _ in range(h):
            d = _signed_digits_host(tw, c)
            digs.append([abs(x) for x in d])
            signs.append([x < 0 for x in d])
            tw = tw * wroot % R
        # shape (w, h)
        out.append(
            (
                np.array(digs, dtype=np.int32).T.copy(),
                np.array(signs, dtype=bool).T.copy(),
            )
        )
    return tuple(out)


def _mul_fixed_scalars(p: G1XYZZ, digits: np.ndarray, signs: np.ndarray) -> G1XYZZ:
    """Multiply each lane of p (batch …, h) by a per-lane fixed scalar given
    as signed window digits ((w, h) host constants), windowed double-and-add
    over precomputed multiples."""
    c = TWIDDLE_WINDOW
    half = 1 << (c - 1)
    w = digits.shape[0]
    h = digits.shape[1]
    batch = p.x.shape[1:]

    # multiples[m] = m * p for m in 0..half, built with one traced add
    zero = g1.infinity((half + 1,) + batch)

    def mult_body(i, acc):
        prev = G1XYZZ(
            *(jax.lax.dynamic_index_in_dim(a, i - 1, 1, False) for a in acc)
        )
        nxt = g1.add_unified(prev, p)
        return G1XYZZ(
            *(
                jax.lax.dynamic_update_index_in_dim(a, v, i, 1)
                for a, v in zip(acc, nxt)
            )
        )

    mult = jax.lax.fori_loop(1, half + 1, mult_body, zero)
    # leaves: (L, half+1, …, h)

    digs = jnp.asarray(digits)  # (w, h)
    sgns = jnp.asarray(signs)

    def gather(m, idx):
        # m: (L, half+1, …, h); idx: (h,) -> (L, …, h)
        idxb = jnp.broadcast_to(idx, m.shape[:1] + (1,) + m.shape[2:])
        return jnp.take_along_axis(m, idxb, axis=1)[:, 0]

    def window_step(i, acc):
        j = w - 1 - i
        acc = jax.lax.fori_loop(0, c, lambda _, q: g1.dbl(q), acc)
        idx = jax.lax.dynamic_index_in_dim(digs, j, 0, False)
        sg = jax.lax.dynamic_index_in_dim(sgns, j, 0, False)
        sel = G1XYZZ(*(gather(m, idx) for m in mult))
        sel = G1XYZZ(
            sel.x, fl.select(sg, fl.neg(FP, sel.y), sel.y), sel.zz, sel.zzz
        )
        return g1.add_unified(acc, sel)

    return jax.lax.fori_loop(0, w, window_step, g1.infinity(batch))


def _mul_fixed_scalars_glv(p: G1XYZZ, digs1, sgns1, digs2, sgns2) -> G1XYZZ:
    """GLV-split fixed-scalar multiply: each lane times t1 + t2*lambda with
    one shared multiples table (phi maps multiples for free: x *= beta)."""
    c = TWIDDLE_WINDOW
    half = 1 << (c - 1)
    w = digs1.shape[0]
    batch = p.x.shape[1:]

    zero = g1.infinity((half + 1,) + batch)

    def mult_body(i, acc):
        prev = G1XYZZ(*(jax.lax.dynamic_index_in_dim(a, i - 1, 1, False) for a in acc))
        nxt = g1.add_unified(prev, p)
        return G1XYZZ(
            *(jax.lax.dynamic_update_index_in_dim(a, v, i, 1) for a, v in zip(acc, nxt))
        )

    mult = jax.lax.fori_loop(1, half + 1, mult_body, zero)
    beta = jnp.asarray(_glv_beta_mont()).reshape((fl.FP.n_limbs,) + (1,) * (mult.x.ndim - 1))
    mult_phi = G1XYZZ(
        fl.mont_mul(fl.FP, mult.x, jnp.broadcast_to(beta, mult.x.shape)),
        mult.y,
        mult.zz,
        mult.zzz,
    )

    d1, s1 = jnp.asarray(digs1), jnp.asarray(sgns1)
    d2, s2 = jnp.asarray(digs2), jnp.asarray(sgns2)

    def gather(m, idx):
        idxb = jnp.broadcast_to(idx, m.shape[:1] + (1,) + m.shape[2:])
        return jnp.take_along_axis(m, idxb, axis=1)[:, 0]

    def select_from(table, idx, sg):
        sel = G1XYZZ(*(gather(m, idx) for m in table))
        return G1XYZZ(sel.x, fl.select(sg, fl.neg(FP, sel.y), sel.y), sel.zz, sel.zzz)

    def window_step(i, acc):
        j = w - 1 - i
        acc = jax.lax.fori_loop(0, c, lambda _, q: g1.dbl(q), acc)
        acc = g1.add_unified(
            acc,
            select_from(
                mult,
                jax.lax.dynamic_index_in_dim(d1, j, 0, False),
                jax.lax.dynamic_index_in_dim(s1, j, 0, False),
            ),
        )
        acc = g1.add_unified(
            acc,
            select_from(
                mult_phi,
                jax.lax.dynamic_index_in_dim(d2, j, 0, False),
                jax.lax.dynamic_index_in_dim(s2, j, 0, False),
            ),
        )
        return acc

    return jax.lax.fori_loop(0, w, window_step, g1.infinity(batch))


def fft_g1(p: G1XYZZ, inverse: bool = False) -> G1XYZZ:
    """Radix-2 FFT over G1 along the last axis; n a power of two.
    Semantics parity: fft_g1 /root/reference/blst/src/fft_g1.rs:54-83."""
    n = p.x.shape[-1]
    assert n & (n - 1) == 0
    log_n = n.bit_length() - 1
    batch = p.x.shape[1:-1]

    from .fft import brp_indices

    idx = jnp.asarray(brp_indices(n))
    p = G1XYZZ(*(jnp.take(c, idx, axis=-1) for c in p))
    tables = _stage_digit_tables(log_n, inverse)

    for s in range(log_n):
        h = 1 << s
        blocks = n >> (s + 1)
        parts = [c.reshape(c.shape[:-1] + (blocks, 2, h)) for c in p]
        a = G1XYZZ(*(c[..., 0, :] for c in parts))
        b = G1XYZZ(*(c[..., 1, :] for c in parts))
        digs, sgns = tables[s]
        t = _mul_fixed_scalars(b, digs, sgns)
        lo = g1.add_unified(a, t)
        hi = g1.add_unified(a, g1.neg(t))
        # (…, blocks, 2, h) -> (…, n): restores the in-place DIT layout
        p = G1XYZZ(
            *(
                jnp.stack([l, hh], axis=-2).reshape(
                    l.shape[:-2] + (l.shape[-2] * 2 * l.shape[-1],)
                )
                for l, hh in zip(lo, hi)
            )
        )
    if inverse:
        p = _ifft_scale(p, pow(n, R - 2, R))
    return p


@partial(jax.jit, static_argnames=("inverse", "use_pallas", "unroll"))
def _fft_g1_jit(x, y, zz, zzz, inverse: bool, use_pallas: bool, unroll: bool):
    import contextlib

    adds = g1.tiled_pallas_adds() if use_pallas else contextlib.nullcontext()
    with adds, fl.maybe_unrolled(unroll):
        return tuple(fft_g1(G1XYZZ(x, y, zz, zzz), inverse))


def fft_g1_standalone(p: G1XYZZ, inverse: bool = False) -> G1XYZZ:
    """Jitted standalone G1 FFT on the process-default backend, with the
    platform-best point/field op forms (Pallas tiled adds + unrolled limb
    dataflow on TPU). This is the large-n capability path the reference
    benches at scale 12-15 (blst fft_g1: 18.8 s single-core at 2^15,
    BASELINE.md) -- FK20 itself stays at size 128 by design."""
    from . import pallas_msm

    use = pallas_msm.enabled()
    return G1XYZZ(*_fft_g1_jit(p.x, p.y, p.zz, p.zzz, inverse, use, fl.unroll_default()))


def _ifft_scale(p: G1XYZZ, ninv: int) -> G1XYZZ:
    """Scale every lane by the fixed scalar 1/n."""
    n = p.x.shape[-1]
    d = np.array(_signed_digits_host(ninv, TWIDDLE_WINDOW), dtype=np.int32)
    digits = np.broadcast_to(d[:, None], (d.shape[0], n)).copy()
    signs = digits < 0
    return _mul_fixed_scalars(p, np.abs(digits), signs)


# ---------------------------------------------------------------------------
# FK20 half-zeroing convolution: FFT . zero_top_half . IFFT as one circulant
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _half_conv_taps(n: int):
    """Taps of the circulant M = F . diag([1]*n/2 + [0]*n/2) . F^{-1}:
    m[0] = 1/2, m[d] = 0 for even d != 0, m[d] = -(2/n)/(w^d - 1) for odd d.
    Returns (offsets (n/2+1,), digit table (w, n/2+1), sign table)."""
    w_root = root_of_unity(n.bit_length() - 1)
    half_n_inv = pow(2, R - 2, R)
    two_over_n = 2 * pow(n, R - 2, R) % R
    offsets = [0] + [d for d in range(1, n) if d % 2 == 1]
    taps = [half_n_inv]
    for d in offsets[1:]:
        taps.append((-two_over_n) * pow(pow(w_root, d, R) - 1, R - 2, R) % R)
    d1s, s1s, d2s, s2s = [], [], [], []
    for t in taps:
        dd1, dd2 = _glv_digits_host(t)
        d1s.append([abs(x) for x in dd1])
        s1s.append([x < 0 for x in dd1])
        d2s.append([abs(x) for x in dd2])
        s2s.append([x < 0 for x in dd2])
    return (
        np.array(offsets, dtype=np.int64),
        np.array(d1s, dtype=np.int32).T.copy(),
        np.array(s1s, dtype=bool).T.copy(),
        np.array(d2s, dtype=np.int32).T.copy(),
        np.array(s2s, dtype=bool).T.copy(),
    )


def fk20_half_convolution(h_ext: G1XYZZ) -> G1XYZZ:
    """Compute fft_g1(zero_top_half(ifft_g1(h_ext))) as ONE circulant
    convolution with n/2+1 fixed taps: out[k] = sum_d m[d] * h_ext[k-d].

    Replaces the two sequential G1 FFT butterfly networks of the reference's
    FK20 (toeplitz_part_3 + fft_g1, /root/reference/blst/src/fk20_proofs.rs
    :53-62) with a single depth-~340 ladder over n*(n/2+1) parallel lanes --
    ~13x less sequential depth on a vector machine.
    """
    n = h_ext.x.shape[-1]
    offsets, d1, s1, d2, s2 = _half_conv_taps(n)
    k = jnp.arange(n)[:, None]  # (n, 1)
    src = (k - jnp.asarray(offsets)[None, :]) % n  # (n, taps)
    gathered = G1XYZZ(
        *(jnp.take(c, src.reshape(-1), axis=-1) for c in h_ext)
    )  # (..., n*taps)
    taps = offsets.shape[0]

    def tile(t):
        return np.tile(t[:, None, :], (1, n, 1)).reshape(t.shape[0], n * taps)

    prods = _mul_fixed_scalars_glv(gathered, tile(d1), tile(s1), tile(d2), tile(s2))
    prods = G1XYZZ(*(c.reshape(c.shape[:-1] + (n, taps)) for c in prods))
    out = g1.tree_reduce(prods)
    return G1XYZZ(*(c[..., 0] for c in out))
