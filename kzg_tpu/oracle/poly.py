"""Oracle polynomial arithmetic over Fr (coefficient form).

Semantics parity with the reference's Poly trait and blst implementation
(/root/reference/kzg/src/lib.rs:492-533, /root/reference/blst/src/types/
poly.rs): Horner eval, direct & FFT multiplication, long & fast (Newton)
division, power-series inverse, Toeplitz coefficient striding.
"""

from typing import List

from ..constants import R_MOD as R
from .fft import fft_fr, is_pow2


def poly_eval(coeffs: List[int], x: int) -> int:
    """Horner evaluation (parity: poly.rs eval)."""
    if not coeffs:
        return 0
    acc = coeffs[-1] % R
    for c in reversed(coeffs[:-1]):
        acc = (acc * x + c) % R
    return acc


def poly_norm_len(coeffs: List[int]) -> int:
    """Length ignoring trailing zeros (degree + 1)."""
    n = len(coeffs)
    while n > 0 and coeffs[n - 1] % R == 0:
        n -= 1
    return n


def poly_mul_direct(a: List[int], b: List[int], out_len: int) -> List[int]:
    """Schoolbook product truncated/padded to out_len (parity: poly.rs mul_direct)."""
    out = [0] * out_len
    for i, ai in enumerate(a):
        if ai % R == 0:
            continue
        for j, bj in enumerate(b):
            if i + j >= out_len:
                break
            out[i + j] = (out[i + j] + ai * bj) % R
    return out


def poly_mul_fft(a: List[int], b: List[int], out_len: int) -> List[int]:
    """FFT product truncated/padded to out_len (parity: poly.rs mul_fft)."""
    n = 1
    while n < len(a) + len(b):
        n *= 2
    fa = fft_fr([c % R for c in a] + [0] * (n - len(a)))
    fb = fft_fr([c % R for c in b] + [0] * (n - len(b)))
    prod = fft_fr([x * y % R for x, y in zip(fa, fb)], inverse=True)
    return (prod + [0] * out_len)[:out_len]


def poly_mul(a: List[int], b: List[int], out_len: int) -> List[int]:
    """Pick direct vs FFT like the reference (poly.rs mul: direct below 64)."""
    if len(a) < 64 or len(b) < 64 or out_len < 128:
        return poly_mul_direct(a, b, out_len)
    return poly_mul_fft(a, b, out_len)


def poly_long_div(num: List[int], den: List[int]) -> List[int]:
    """Quotient of the long division num/den (parity: poly.rs long_div)."""
    dl = poly_norm_len(den)
    if dl == 0:
        raise ValueError("poly_long_div: division by zero polynomial")
    nl = len(num)
    if dl > nl:
        return [0]
    out = [0] * (nl - dl + 1)
    rem = [c % R for c in num]
    dinv = pow(den[dl - 1] % R, R - 2, R)
    for i in range(nl - dl, -1, -1):
        q = rem[i + dl - 1] * dinv % R
        out[i] = q
        for j in range(dl):
            rem[i + j] = (rem[i + j] - q * den[j]) % R
    return out


def poly_inverse(coeffs: List[int], out_len: int) -> List[int]:
    """Power-series inverse mod x^out_len by Newton doubling
    (parity: poly.rs inverse)."""
    if not coeffs or coeffs[0] % R == 0:
        raise ValueError("poly_inverse: constant term must be nonzero")
    acc = [pow(coeffs[0] % R, R - 2, R)]
    k = 1
    while k < out_len:
        k = min(2 * k, out_len)
        # acc <- acc * (2 - a * acc) mod x^k
        t = poly_mul(coeffs[:k], acc, k)
        t = [(-c) % R for c in t]
        t[0] = (t[0] + 2) % R
        acc = poly_mul(acc, t, k)
    return acc[:out_len]


def poly_flip(coeffs: List[int]) -> List[int]:
    return list(reversed(coeffs))


def poly_fast_div(num: List[int], den: List[int]) -> List[int]:
    """Division via reversal + power-series inverse (parity: poly.rs fast_div)."""
    dl = poly_norm_len(den)
    if dl == 0:
        raise ValueError("poly_fast_div: division by zero polynomial")
    nl = len(num)
    if dl > nl:
        return [0]
    if dl == 1:
        dinv = pow(den[0] % R, R - 2, R)
        return [c * dinv % R for c in num]
    qlen = nl - dl + 1
    num_flipped = poly_flip(num)
    den_flipped = poly_flip(den[:dl])
    den_inv = poly_inverse(den_flipped, qlen)
    q_flipped = poly_mul(num_flipped, den_inv, qlen)
    return poly_flip(q_flipped)


def poly_div(num: List[int], den: List[int]) -> List[int]:
    """Long division below the fast-division cutoff (parity: poly.rs div:151-157)."""
    if poly_norm_len(den) >= 128:
        return poly_fast_div(num, den)
    return poly_long_div(num, den)


def toeplitz_coeffs_stride_legacy(
    coeffs: List[int], offset: int, stride: int
) -> List[int]:
    """Legacy FK20 coefficient striding (parity: poly.rs toeplitz_coeffs_stride;
    note this differs from the EIP-7594 variant in das.rs:631-658)."""
    n = len(coeffs)
    k = n // stride
    k2 = 2 * k
    out = [coeffs[n - 1 - offset] % R]
    num_zeros = (k + 1) if k + 2 < k2 else (k2 - 1)
    out += [0] * num_zeros
    i = k + 2
    j = 2 * stride - offset - 1
    while i < k2:
        out.append(coeffs[j] % R)
        i += 1
        j += stride
    return out
