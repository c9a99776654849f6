"""Oracle polynomial recovery from samples with missing entries (legacy
coset-scaling path).

Semantics parity with /root/reference/blst/src/recovery.rs: vanishing poly
of missing indices, scale by the coset factor 5, FFT divide, unscale.
"""

from typing import List, Optional

from ..constants import LEGACY_RECOVERY_SCALE_FACTOR as K, R_MOD as R
from .fft import fft_fr
from .zero_poly import zero_poly_via_multiplication

_K_INV = pow(K, R - 2, R)


def scale_poly(p: List[int]) -> List[int]:
    out = list(p)
    f = 1
    for i in range(1, len(out)):
        f = f * _K_INV % R
        out[i] = out[i] * f % R
    return out


def unscale_poly(p: List[int]) -> List[int]:
    out = list(p)
    f = 1
    for i in range(1, len(out)):
        f = f * K % R
        out[i] = out[i] * f % R
    return out


def recover_poly_coeffs_from_samples(
    samples: List[Optional[int]], fft_settings
) -> List[int]:
    """(parity: recovery.rs recover_poly_coeffs_from_samples)"""
    n = len(samples)
    if n & (n - 1):
        raise ValueError("Samples must have a length that is a power of two")
    missing = [i for i, s in enumerate(samples) if s is None]
    if len(missing) > n // 2:
        raise ValueError("Impossible to recover, too many shards are missing")

    zero_eval, zero_poly = zero_poly_via_multiplication(fft_settings, n, missing)
    if not missing:
        zero_eval = [0] * n
        zero_poly = [0] * n

    evals_with_zero = [
        0 if s is None else s * z % R for s, z in zip(samples, zero_eval)
    ] if missing else [s % R for s in samples]

    if not missing:
        return fft_fr(evals_with_zero, inverse=True)

    poly_with_zero = fft_fr(evals_with_zero, inverse=True)
    scaled_poly_with_zero = scale_poly(poly_with_zero)
    scaled_zero_poly = scale_poly(zero_poly)

    ev_pwz = fft_fr(scaled_poly_with_zero)
    ev_zp = fft_fr(scaled_zero_poly)
    ev_reconstructed = [
        a * pow(b, R - 2, R) % R for a, b in zip(ev_pwz, ev_zp)
    ]
    scaled_reconstructed = fft_fr(ev_reconstructed, inverse=True)
    return unscale_poly(scaled_reconstructed)


def recover_poly_from_samples(
    samples: List[Optional[int]], fft_settings
) -> List[int]:
    """Returns the recovered EVALUATIONS (parity: recovery.rs
    recover_poly_from_samples)."""
    coeffs = recover_poly_coeffs_from_samples(samples, fft_settings)
    data = fft_fr(coeffs)
    for s, d in zip(samples, data):
        assert s is None or s % R == d
    return data
