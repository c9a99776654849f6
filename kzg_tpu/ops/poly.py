"""Device (TPU) polynomial arithmetic over Fr: batched coefficient-form
kernels in Montgomery limb layout (L=16 u32 radix-2^16 limbs, leading batch
dims vmap/shard naturally).

Role parity: the reference's Poly machinery
(/root/reference/blst/src/types/poly.rs -- mul_fft :340, inverse :86 via
Newton doubling, fast_div :216-249 via flip + power-series inverse) and the
vanishing-polynomial builder (/root/reference/blst/src/zero_poly.rs).
Design differences for the TPU: all sizes are STATIC (padded to powers of
two) so every step jit-compiles once -- degree normalization
(`poly_norm_len`) is the caller's contract (pass the divisor's true length;
the protocol divisors -- x^n - z^n, vanishing polys -- have known degree),
and the tree product over linear factors replaces the reference's
sequential partial/reduce machinery with log-depth batched FFT multiplies.

Differentially tested against oracle/poly.py (tests/test_device_poly.py).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_MOD as R
from . import field as fl
from .fft import fft as dfft, ifft as difft
from .field import FR

L = FR.n_limbs


def _pow2_at_least(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


@lru_cache(maxsize=None)
def _one_mont_np() -> np.ndarray:
    r = 1 << (16 * L)
    return fl.ints_to_limbs([r % R], L)[:, 0]


def _pad_last(x: jnp.ndarray, n: int) -> jnp.ndarray:
    pad = n - x.shape[-1]
    if pad <= 0:
        return x[..., :n]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def poly_mul_fft(a: jnp.ndarray, b: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Product of Montgomery-form coefficient arrays (L, *batch, na/nb),
    truncated/zero-padded to out_len (parity: poly.rs mul_fft:340)."""
    n = _pow2_at_least(a.shape[-1] + b.shape[-1])
    fa = dfft(_pad_last(a, n))
    fb = dfft(_pad_last(b, n))
    prod = difft(fl.mont_mul(FR, fa, fb))
    return _pad_last(prod, out_len)


def poly_inverse(a: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Power-series inverse mod x^out_len by Newton doubling (parity:
    poly.rs inverse:86; the doubling ladder is unrolled at trace time --
    log2(out_len) batched FFT multiplies). a: (L, *batch, n) Montgomery
    with a[..., 0] invertible."""
    inv0, _ = fl.batch_inv_tree(FR, a[..., :1])  # (L, *batch, 1)
    acc = inv0
    k = 1
    two = jnp.asarray(
        fl.ints_to_limbs([2 * ((1 << (16 * L)) % R) % R], L)[:, 0]
    ).reshape((L,) + (1,) * (a.ndim - 1))
    while k < out_len:
        k = min(2 * k, out_len)
        # acc <- acc * (2 - a*acc) mod x^k
        t = poly_mul_fft(_pad_last(a, min(k, a.shape[-1])), acc, k)
        t = fl.neg(FR, t)
        t = t.at[..., 0].set(fl.add(FR, t[..., :1], jnp.broadcast_to(two, t[..., :1].shape))[..., 0])
        acc = poly_mul_fft(acc, t, k)
    return _pad_last(acc, out_len)


def poly_fast_div(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """Quotient num/den via reversal + power-series inverse (parity:
    poly.rs fast_div:216-249). Static-shape contract: den's length IS its
    degree+1 (leading coefficient nonzero); num length >= den length.
    Returns the (L, *batch, nl-dl+1) quotient."""
    nl, dl = num.shape[-1], den.shape[-1]
    if dl > nl:
        raise ValueError("poly_fast_div: divisor longer than dividend")
    if dl == 1:
        dinv, _ = fl.batch_inv_tree(FR, den[..., :1])
        return fl.mont_mul(FR, num, jnp.broadcast_to(dinv, num.shape))
    qlen = nl - dl + 1
    nf = jnp.flip(num, axis=-1)
    df = jnp.flip(den, axis=-1)
    dinv = poly_inverse(df, qlen)
    qf = poly_mul_fft(nf, dinv, qlen)
    return jnp.flip(qf, axis=-1)


def poly_eval(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate at a point: log-depth powers-of-x then weighted tree sum
    (Horner is sequential depth n; this is depth log n -- same result,
    parity: poly.rs eval). coeffs: (L, *batch, n); x: (L, *batch, 1)
    Montgomery. Returns (L, *batch, 1)."""
    n = coeffs.shape[-1]
    np2 = _pow2_at_least(max(n, 1))
    coeffs = _pad_last(coeffs, np2)
    # powers[i] = x^i for i < np2 by binary composition: log2 rounds of
    # "append block * x^(2^k)"
    one = jnp.asarray(_one_mont_np()).reshape((L,) + (1,) * (x.ndim - 1))
    pows = jnp.broadcast_to(one, x.shape)  # (L, *batch, 1)
    sq = x
    while pows.shape[-1] < np2:
        shifted = fl.mont_mul(FR, pows, jnp.broadcast_to(sq, pows.shape))
        pows = jnp.concatenate([pows, shifted], axis=-1)
        sq = fl.mont_mul(FR, sq, sq)
    terms = fl.mont_mul(FR, coeffs, pows)
    return fl.sum_tree(FR, terms)


def vanishing_poly(roots: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Monic vanishing polynomial prod_i (x - r_i) over the masked roots,
    as a log-depth tree of batched FFT multiplies (role parity:
    zero_poly.rs -- partial products + FFT reduction; here every level is
    ONE batched multiply). roots: (L, *batch, m) Montgomery; valid:
    (*batch, m) bool (False slots contribute the factor 1, so variable
    missing-counts run under one static shape). Returns (L, *batch, m+1)
    with degree = popcount(valid)."""
    m = roots.shape[-1]
    mp = _pow2_at_least(max(m, 1))
    batch = roots.shape[1:-1]
    one = jnp.asarray(_one_mont_np()).reshape((L,) + (1,) * (roots.ndim - 1))
    # leaf factors: valid -> (x - r) = [-r, 1]; invalid -> [1, 0]
    negr = fl.neg(FR, _pad_last(roots, mp))
    validp = _pad_last(
        valid.astype(jnp.uint32).reshape(batch + (m,)), mp
    ).astype(bool)
    c0 = jnp.where(validp[None], negr, jnp.broadcast_to(one, negr.shape))
    c1 = jnp.where(
        validp[None],
        jnp.broadcast_to(one, negr.shape),
        jnp.zeros_like(negr),
    )
    # polys: (L, *batch, mp, 2) -- mp factors of length 2
    polys = jnp.stack([c0, c1], axis=-1)
    width = 2
    count = mp
    while count > 1:
        a = polys[..., 0::2, :]
        b = polys[..., 1::2, :]
        polys = poly_mul_fft(a, b, 2 * width - 1)
        # degree(product of two monic-or-constant factors) < 2*width-1;
        # keep full length so the final result carries the top coefficient
        width = 2 * width - 1
        count //= 2
    out = polys[..., 0, :]
    return _pad_last(out, m + 1)


@partial(jax.jit, static_argnames=("out_len",))
def poly_mul_fft_jit(a, b, out_len):
    with fl.maybe_unrolled(fl.unroll_default()):
        return poly_mul_fft(a, b, out_len)


@partial(jax.jit, static_argnames=("out_len",))
def poly_inverse_jit(a, out_len):
    with fl.maybe_unrolled(fl.unroll_default()):
        return poly_inverse(a, out_len)


@jax.jit
def poly_fast_div_jit(num, den):
    with fl.maybe_unrolled(fl.unroll_default()):
        return poly_fast_div(num, den)


@jax.jit
def poly_eval_jit(coeffs, x):
    with fl.maybe_unrolled(fl.unroll_default()):
        return poly_eval(coeffs, x)


@jax.jit
def vanishing_poly_jit(roots, valid):
    with fl.maybe_unrolled(fl.unroll_default()):
        return vanishing_poly(roots, valid)
