"""Pure-Python Pippenger MSM over G1 (oracle backend).

Mirrors the role of /root/reference/kzg/src/msm/msm_impls.rs:113-148:
naive double-and-add below 8 points, windowed bucket method above.
"""

from ..constants import R_MOD as R
from .curve import G1, Affine


def msm_naive(points, scalars) -> Affine:
    acc = None
    for p, s in zip(points, scalars):
        acc = G1.affine_add(acc, G1.mul_scalar(p, s))
    return acc


def msm(points, scalars) -> Affine:
    """G1 multi-scalar multiplication: sum_i scalars[i] * points[i]."""
    n = len(points)
    assert len(scalars) == n
    if n == 0:
        return None
    if n < 8:
        return msm_naive(points, scalars)

    c = 8  # window size in bits
    num_windows = (255 + c - 1) // c
    scalars = [s % R for s in scalars]

    # Jacobian accumulation throughout; convert once at the end.
    window_sums = []
    for w in range(num_windows):
        buckets = [None] * (1 << c)
        shift = w * c
        for p, s in zip(points, scalars):
            d = (s >> shift) & ((1 << c) - 1)
            if d and p is not None:
                buckets[d] = (
                    G1.jac_add(buckets[d], G1.to_jacobian(p))
                    if buckets[d] is not None
                    else G1.to_jacobian(p)
                )
        # running-sum bucket integration
        acc = None
        total = None
        for d in range((1 << c) - 1, 0, -1):
            if buckets[d] is not None:
                acc = G1.jac_add(acc, buckets[d]) if acc is not None else buckets[d]
            if acc is not None:
                total = G1.jac_add(total, acc) if total is not None else acc
        window_sums.append(total)

    # combine windows: result = sum_w 2^(cw) S_w, Horner from the top
    result = None
    for total in reversed(window_sums):
        if result is not None:
            for _ in range(c):
                result = G1.jac_double(result)
        if total is not None:
            result = G1.jac_add(result, total) if result is not None else total
    return G1.from_jacobian(result) if result is not None else None
