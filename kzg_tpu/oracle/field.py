"""Pure-Python BLS12-381 field tower: Fp, Fp2, Fp6, Fp12.

This is the *oracle* backend: arbitrary-precision Python integers, written
for obvious correctness, used as the differential-testing reference for the
TPU kernels (the same role `fft_fr_slow` / the `ckzg` crate play in the
reference: /root/reference/kzg-bench/src/tests/fft_fr.rs:5).

Representation:
  Fp   -- int in [0, P)
  Fp2  -- (c0, c1) meaning c0 + c1*u, u^2 = -1
  Fp6  -- (a0, a1, a2) of Fp2, meaning a0 + a1*v + a2*v^2, v^3 = xi = 1 + u
  Fp12 -- (b0, b1) of Fp6, meaning b0 + b1*w, w^2 = v
"""

from ..constants import P_MOD as P, R_MOD as R

# ---------------------------------------------------------------------------
# Fp
# ---------------------------------------------------------------------------


def fp_inv(a: int) -> int:
    return pow(a, P - 2, P)


def fp_sqrt(a: int):
    """Square root in Fp (p = 3 mod 4); returns None if a is not a square."""
    c = pow(a, (P + 1) // 4, P)
    return c if c * c % P == a % P else None


# ---------------------------------------------------------------------------
# Fp2:  c0 + c1*u,  u^2 = -1
# ---------------------------------------------------------------------------

FP2_ZERO = (0, 0)
FP2_ONE = (1, 0)
# The sextic twist constant xi = 1 + u (v^3 = xi in Fp6).
XI = (1, 1)


def fp2_add(a, b):
    return ((a[0] + b[0]) % P, (a[1] + b[1]) % P)


def fp2_sub(a, b):
    return ((a[0] - b[0]) % P, (a[1] - b[1]) % P)


def fp2_neg(a):
    return ((-a[0]) % P, (-a[1]) % P)


def fp2_mul(a, b):
    # Karatsuba: (a0+a1 u)(b0+b1 u) = a0b0 - a1b1 + ((a0+a1)(b0+b1)-a0b0-a1b1) u
    t0 = a[0] * b[0]
    t1 = a[1] * b[1]
    t2 = (a[0] + a[1]) * (b[0] + b[1])
    return ((t0 - t1) % P, (t2 - t0 - t1) % P)


def fp2_sq(a):
    # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
    t = a[0] * a[1]
    return ((a[0] + a[1]) * (a[0] - a[1]) % P, (t + t) % P)


def fp2_scalar(a, k: int):
    return (a[0] * k % P, a[1] * k % P)


def fp2_conj(a):
    return (a[0], (-a[1]) % P)


def fp2_inv(a):
    # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)
    norm = (a[0] * a[0] + a[1] * a[1]) % P
    ninv = fp_inv(norm)
    return (a[0] * ninv % P, (-a[1]) * ninv % P)


def fp2_pow(a, e: int):
    result = FP2_ONE
    base = a
    while e > 0:
        if e & 1:
            result = fp2_mul(result, base)
        base = fp2_sq(base)
        e >>= 1
    return result


def fp2_sqrt(a):
    """Square root in Fp2 (Adj-Savas for p = 3 mod 4); None if non-residue."""
    if a == FP2_ZERO:
        return FP2_ZERO
    a1 = fp2_pow(a, (P - 3) // 4)
    x0 = fp2_mul(a1, a)
    alpha = fp2_mul(a1, x0)
    if alpha == ((-1) % P, 0):
        x = (P - x0[1], x0[0])  # u * x0
    else:
        b = fp2_pow(fp2_add(FP2_ONE, alpha), (P - 1) // 2)
        x = fp2_mul(b, x0)
    return x if fp2_sq(x) == a else None


def fp2_mul_by_xi(a):
    # (c0 + c1 u) * (1 + u) = (c0 - c1) + (c0 + c1) u
    return ((a[0] - a[1]) % P, (a[0] + a[1]) % P)


# ---------------------------------------------------------------------------
# Fp6:  a0 + a1 v + a2 v^2,  v^3 = xi
# ---------------------------------------------------------------------------

FP6_ZERO = (FP2_ZERO, FP2_ZERO, FP2_ZERO)
FP6_ONE = (FP2_ONE, FP2_ZERO, FP2_ZERO)


def fp6_add(a, b):
    return (fp2_add(a[0], b[0]), fp2_add(a[1], b[1]), fp2_add(a[2], b[2]))


def fp6_sub(a, b):
    return (fp2_sub(a[0], b[0]), fp2_sub(a[1], b[1]), fp2_sub(a[2], b[2]))


def fp6_neg(a):
    return (fp2_neg(a[0]), fp2_neg(a[1]), fp2_neg(a[2]))


def fp6_mul(a, b):
    t0 = fp2_mul(a[0], b[0])
    t1 = fp2_mul(a[1], b[1])
    t2 = fp2_mul(a[2], b[2])
    c0 = fp2_add(t0, fp2_mul_by_xi(fp2_sub(fp2_mul(fp2_add(a[1], a[2]), fp2_add(b[1], b[2])), fp2_add(t1, t2))))
    c1 = fp2_add(fp2_sub(fp2_mul(fp2_add(a[0], a[1]), fp2_add(b[0], b[1])), fp2_add(t0, t1)), fp2_mul_by_xi(t2))
    c2 = fp2_add(fp2_sub(fp2_mul(fp2_add(a[0], a[2]), fp2_add(b[0], b[2])), fp2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fp6_sq(a):
    return fp6_mul(a, a)


def fp6_mul_by_v(a):
    # (a0 + a1 v + a2 v^2) * v = xi a2 + a0 v + a1 v^2
    return (fp2_mul_by_xi(a[2]), a[0], a[1])


def fp6_inv(a):
    # Standard tower inversion.
    c0 = fp2_sub(fp2_sq(a[0]), fp2_mul_by_xi(fp2_mul(a[1], a[2])))
    c1 = fp2_sub(fp2_mul_by_xi(fp2_sq(a[2])), fp2_mul(a[0], a[1]))
    c2 = fp2_sub(fp2_sq(a[1]), fp2_mul(a[0], a[2]))
    t = fp2_add(
        fp2_mul(a[0], c0),
        fp2_mul_by_xi(fp2_add(fp2_mul(a[2], c1), fp2_mul(a[1], c2))),
    )
    tinv = fp2_inv(t)
    return (fp2_mul(c0, tinv), fp2_mul(c1, tinv), fp2_mul(c2, tinv))


# ---------------------------------------------------------------------------
# Fp12:  b0 + b1 w,  w^2 = v
# ---------------------------------------------------------------------------

FP12_ZERO = (FP6_ZERO, FP6_ZERO)
FP12_ONE = (FP6_ONE, FP6_ZERO)


def fp12_add(a, b):
    return (fp6_add(a[0], b[0]), fp6_add(a[1], b[1]))


def fp12_sub(a, b):
    return (fp6_sub(a[0], b[0]), fp6_sub(a[1], b[1]))


def fp12_mul(a, b):
    t0 = fp6_mul(a[0], b[0])
    t1 = fp6_mul(a[1], b[1])
    c0 = fp6_add(t0, fp6_mul_by_v(t1))
    c1 = fp6_sub(fp6_sub(fp6_mul(fp6_add(a[0], a[1]), fp6_add(b[0], b[1])), t0), t1)
    return (c0, c1)


def fp12_sq(a):
    return fp12_mul(a, a)


def fp12_conj(a):
    """Conjugation = Frobenius^6 (inverse for cyclotomic-subgroup elements)."""
    return (a[0], fp6_neg(a[1]))


def fp12_inv(a):
    t = fp6_inv(fp6_sub(fp6_sq(a[0]), fp6_mul_by_v(fp6_sq(a[1]))))
    return (fp6_mul(a[0], t), fp6_neg(fp6_mul(a[1], t)))


def fp12_pow(a, e: int):
    if e < 0:
        return fp12_pow(fp12_inv(a), -e)
    result = FP12_ONE
    base = a
    while e > 0:
        if e & 1:
            result = fp12_mul(result, base)
        base = fp12_sq(base)
        e >>= 1
    return result


# Frobenius coefficients, derived numerically:
#   frob(b0 + b1 w) = frob6(b0) + frob6(b1) * w^p,  w^p = w * w^(p-1),
#   w^(p-1) = v^((p-1)/2) = xi^((p-1)/6)  (an Fp2 constant).
# For Fp6 over Fp2: frob(a0 + a1 v + a2 v^2)
#   = conj(a0) + conj(a1) xi^((p-1)/3) v + conj(a2) xi^((2(p-1))/3) v^2.
FROB_GAMMA_12 = fp2_pow(XI, (P - 1) // 6)  # w coefficient
FROB_GAMMA_6_1 = fp2_pow(XI, (P - 1) // 3)  # v coefficient
FROB_GAMMA_6_2 = fp2_pow(XI, 2 * (P - 1) // 3)  # v^2 coefficient


def fp6_frobenius(a):
    return (
        fp2_conj(a[0]),
        fp2_mul(fp2_conj(a[1]), FROB_GAMMA_6_1),
        fp2_mul(fp2_conj(a[2]), FROB_GAMMA_6_2),
    )


def fp12_frobenius(a):
    b0 = fp6_frobenius(a[0])
    b1 = fp6_frobenius(a[1])
    # multiply b1 componentwise by gamma (scalar in Fp2)
    b1 = (
        fp2_mul(b1[0], FROB_GAMMA_12),
        fp2_mul(b1[1], FROB_GAMMA_12),
        fp2_mul(b1[2], FROB_GAMMA_12),
    )
    return (b0, b1)
