"""Oracle zero (vanishing) polynomial of missing domain indices.

Semantics parity with /root/reference/blst/src/zero_poly.rs: direct product
accumulation for up to DEGREE_OF_PARTIAL-1 roots, FFT-multiplied partial
reduction above, returning (evaluations over the domain, coefficients padded
to domain_size).
"""

from typing import List, Tuple

from ..constants import R_MOD as R
from .fft import fft_fr

DEGREE_OF_PARTIAL = 256
REDUCTION_FACTOR = 4


def do_zero_poly_mul_partial(fft_settings, idxs: List[int], stride: int) -> List[int]:
    """Product of (x - w_{idx*stride}) by coefficient accumulation
    (parity: zero_poly.rs:55-90)."""
    if not idxs:
        raise ValueError("idx array must not be empty")
    roots = fft_settings.roots_of_unity
    coeffs = [(-roots[idxs[0] * stride]) % R]
    for i in range(1, len(idxs)):
        neg = (-roots[idxs[i] * stride]) % R
        coeffs.append((neg + coeffs[i - 1]) % R)
        for j in range(i - 1, 0, -1):
            coeffs[j] = (coeffs[j] * neg + coeffs[j - 1]) % R
        coeffs[0] = coeffs[0] * neg % R
    coeffs.append(1)
    return coeffs


def reduce_partials(domain_size: int, partials: List[List[int]]) -> List[int]:
    """Multiply a set of partials together via padded FFTs
    (parity: zero_poly.rs reduce_partials)."""
    out_degree = sum(len(p) - 1 for p in partials)
    if out_degree + 1 > domain_size:
        raise ValueError("Out degree is longer than possible polynomial size")
    acc = fft_fr(partials[0] + [0] * (domain_size - len(partials[0])))
    for p in partials[1:]:
        ev = fft_fr(p + [0] * (domain_size - len(p)))
        acc = [a * b % R for a, b in zip(acc, ev)]
    coeffs = fft_fr(acc, inverse=True)
    return coeffs[: out_degree + 1]


def zero_poly_via_multiplication(
    fft_settings, domain_size: int, missing_idxs: List[int]
) -> Tuple[List[int], List[int]]:
    """(parity: zero_poly.rs zero_poly_via_multiplication)"""
    if not missing_idxs:
        return [], []
    if len(missing_idxs) >= domain_size:
        raise ValueError("Missing idxs greater than domain size")
    if domain_size > fft_settings.max_width:
        raise ValueError("Domain size greater than fft_settings.max_width")
    if domain_size & (domain_size - 1):
        raise ValueError("Domain size must be a power of 2")

    missing_per_partial = DEGREE_OF_PARTIAL - 1
    stride = fft_settings.max_width // domain_size

    if len(missing_idxs) <= missing_per_partial:
        zero_poly = do_zero_poly_mul_partial(fft_settings, missing_idxs, stride)
    else:
        partials = [
            do_zero_poly_mul_partial(
                fft_settings, missing_idxs[i : i + missing_per_partial], stride
            )
            for i in range(0, len(missing_idxs), missing_per_partial)
        ]
        while len(partials) > 1:
            reduced = []
            for i in range(0, len(partials), REDUCTION_FACTOR):
                group = partials[i : i + REDUCTION_FACTOR]
                if len(group) == 1:
                    reduced.append(group[0])
                    continue
                out_degree = sum(len(p) - 1 for p in group)
                # smallest power of two holding the product, capped at domain
                size = 1
                while size < out_degree + 1:
                    size *= 2
                size = min(size, domain_size)
                reduced.append(reduce_partials(size, group))
            partials = reduced
        zero_poly = partials[0]

    if len(zero_poly) < domain_size:
        zero_poly = zero_poly + [0] * (domain_size - len(zero_poly))
    else:
        zero_poly = zero_poly[:domain_size]

    zero_eval = fft_fr(zero_poly)
    return zero_eval, zero_poly
