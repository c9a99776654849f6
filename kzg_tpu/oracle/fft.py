"""Pure-Python radix-2 FFT over Fr and over G1 (oracle backend).

Semantics parity: /root/reference/blst/src/fft_fr.rs, fft_g1.rs,
data_availability_sampling.rs. The slow O(n^2) DFT mirrors `fft_fr_slow`,
which exists purely as a test oracle.
"""

from ..constants import R_MOD as R, root_of_unity
from .curve import G1, Affine


def is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def reverse_bit_order(values):
    """Bit-reversal permutation of a power-of-two-length list
    (parity: /root/reference/kzg/src/common_utils.rs:6-34)."""
    n = len(values)
    if not is_pow2(n):
        raise ValueError("reverse_bit_order: length must be a power of two")
    bits = n.bit_length() - 1
    out = [None] * n
    for i, v in enumerate(values):
        out[int(format(i, f"0{bits}b")[::-1], 2) if bits else 0] = v
    return out


def _fft_recursive(vals, w):
    n = len(vals)
    if n == 1:
        return list(vals)
    even = _fft_recursive(vals[0::2], w * w % R)
    odd = _fft_recursive(vals[1::2], w * w % R)
    out = [0] * n
    wk = 1
    half = n // 2
    for k in range(half):
        t = odd[k] * wk % R
        out[k] = (even[k] + t) % R
        out[k + half] = (even[k] - t) % R
        wk = wk * w % R
    return out


def fft_fr(vals, inverse: bool = False):
    n = len(vals)
    if not is_pow2(n):
        raise ValueError("fft_fr: length must be a power of two")
    w = root_of_unity(n.bit_length() - 1)
    if inverse:
        w = pow(w, R - 2, R)
    out = _fft_recursive([v % R for v in vals], w)
    if inverse:
        ninv = pow(n, R - 2, R)
        out = [v * ninv % R for v in out]
    return out


def fft_fr_slow(vals, inverse: bool = False):
    """O(n^2) DFT used as the oracle for the oracle."""
    n = len(vals)
    w = root_of_unity(n.bit_length() - 1)
    if inverse:
        w = pow(w, R - 2, R)
    out = []
    for k in range(n):
        acc = 0
        for j in range(n):
            acc += vals[j] * pow(w, j * k, R)
        out.append(acc % R)
    if inverse:
        ninv = pow(n, R - 2, R)
        out = [v * ninv % R for v in out]
    return out


# ---------------------------------------------------------------------------
# FFT over G1 ("twiddle multiply" is a scalar multiplication)
# ---------------------------------------------------------------------------


def _fft_g1_recursive(pts, w):
    n = len(pts)
    if n == 1:
        return list(pts)
    even = _fft_g1_recursive(pts[0::2], w * w % R)
    odd = _fft_g1_recursive(pts[1::2], w * w % R)
    out = [None] * n
    wk = 1
    half = n // 2
    for k in range(half):
        t = G1.mul_scalar(odd[k], wk)
        out[k] = G1.affine_add(even[k], t)
        out[k + half] = G1.affine_add(even[k], G1.affine_neg(t) if t else None)
        wk = wk * w % R
    return out


def fft_g1(pts, inverse: bool = False):
    n = len(pts)
    if not is_pow2(n):
        raise ValueError("fft_g1: length must be a power of two")
    w = root_of_unity(n.bit_length() - 1)
    if inverse:
        w = pow(w, R - 2, R)
    out = _fft_g1_recursive(pts, w)
    if inverse:
        ninv = pow(n, R - 2, R)
        out = [G1.mul_scalar(p, ninv) for p in out]
    return out


# ---------------------------------------------------------------------------
# DAS extension (parity: blst/src/data_availability_sampling.rs:14-101):
# given the even-indexed evaluations of a degree < n polynomial over the
# 2n-domain, compute the odd-indexed evaluations.
# ---------------------------------------------------------------------------


def das_fft_extension(evens):
    n = len(evens)
    coeffs = fft_fr(evens, inverse=True)
    full = fft_fr(coeffs + [0] * n)
    # sanity: even positions reproduce input
    assert full[0::2] == [v % R for v in evens]
    return full[1::2]
