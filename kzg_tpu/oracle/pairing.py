"""Pure-Python optimal ate pairing on BLS12-381 (oracle backend).

Written for obvious correctness: G2 points are mapped through the untwist
isomorphism to E(Fp12) and the Miller loop runs with affine formulas over
Fp12. The TPU framework calls pairings only on the (latency-bound, once per
verification) host path, mirroring the reference's use of blst's pairing
(/root/reference/blst/src/kzg_proofs.rs:74-100).
"""

from ..constants import BLS_X, P_MOD as P, R_MOD as R
from . import field as F
from .curve import Affine

# ---------------------------------------------------------------------------
# Untwist: E'(Fp2) -> E(Fp12)
#
# Twist curve: y^2 = x^3 + 4*xi with xi = 1 + u; Fp12 = Fp6[w]/(w^2 - v),
# Fp6 = Fp2[v]/(v^3 - xi). Map: (x, y) -> (x * v^{-1}, y * (w^3)^{-1})
#   x * v^{-1} = (x/xi) v^2          -> Fp12 coeff slot (b0, v^2)
#   y * w^{-3} = (y/xi) w v          -> Fp12 coeff slot (b1, v)
# ---------------------------------------------------------------------------

_XI_INV = F.fp2_inv(F.XI)


def untwist(q: Affine):
    x, y = q
    xs = F.fp2_mul(x, _XI_INV)
    ys = F.fp2_mul(y, _XI_INV)
    X = ((F.FP2_ZERO, F.FP2_ZERO, xs), F.FP6_ZERO)
    Y = (F.FP6_ZERO, (F.FP2_ZERO, ys, F.FP2_ZERO))
    return (X, Y)


def _embed_fp(a: int):
    return (((a % P, 0), F.FP2_ZERO, F.FP2_ZERO), F.FP6_ZERO)


def _line(t, q_or_none, p12):
    """Evaluate at P the line through T (tangent if q_or_none is None)."""
    tx, ty = t
    px, py = p12
    if q_or_none is None:
        # tangent: lambda = 3 x^2 / 2 y
        num = F.fp12_mul(F.fp12_sq(tx), _embed_fp(3))
        den = F.fp12_add(ty, ty)
    else:
        qx, qy = q_or_none
        num = F.fp12_sub(qy, ty)
        den = F.fp12_sub(qx, tx)
    lam = F.fp12_mul(num, F.fp12_inv(den))
    # l(P) = (P.y - T.y) - lambda (P.x - T.x)
    l = F.fp12_sub(F.fp12_sub(py, ty), F.fp12_mul(lam, F.fp12_sub(px, tx)))
    # new point T' = T + Q (or 2T)
    ox, oy = q_or_none if q_or_none is not None else t
    x3 = F.fp12_sub(F.fp12_sub(F.fp12_sq(lam), tx), ox)
    y3 = F.fp12_sub(F.fp12_mul(lam, F.fp12_sub(tx, x3)), ty)
    return l, (x3, y3)


def miller_loop(p: Affine, q: Affine):
    """Optimal ate Miller loop f_{|x|,Q}(P); returns an Fp12 element.

    Identity inputs return 1 (so the product-of-pairings check treats them
    as neutral, matching blst's behavior for infinity points).
    """
    if p is None or q is None:
        return F.FP12_ONE
    p12 = (_embed_fp(p[0]), _embed_fp(p[1]))
    q12 = untwist(q)
    t = q12
    f = F.FP12_ONE
    x = -BLS_X  # positive loop count
    for bit_idx in range(x.bit_length() - 2, -1, -1):
        l, t = _line(t, None, p12)
        f = F.fp12_mul(F.fp12_sq(f), l)
        if (x >> bit_idx) & 1:
            l, t = _line(t, q12, p12)
            f = F.fp12_mul(f, l)
    # BLS parameter is negative: conjugate (cheap inverse in the
    # cyclotomic subgroup happens only after the easy part; here use conj
    # of the full Miller value, which is the standard f_{-x} adjustment
    # since f^(p^6) = conj(f) and the easy part kills the difference).
    return F.fp12_conj(f)


# Hard-part exponent e = (p^4 - p^2 + 1) // r decomposed in base p:
# f^e = prod_i frob^i(f)^lam_i, computed with a 4-way Shamir multi-exp.
_E_HARD = (P**4 - P**2 + 1) // R
_LAMBDAS = []
_tmp = _E_HARD
for _ in range(4):
    _LAMBDAS.append(_tmp % P)
    _tmp //= P
assert _tmp == 0


def final_exponentiation(f):
    # Easy part: f^((p^6 - 1)(p^2 + 1))
    m = F.fp12_mul(F.fp12_conj(f), F.fp12_inv(f))  # f^(p^6 - 1)
    m2 = m
    for _ in range(2):
        m2 = F.fp12_frobenius(m2)
    m = F.fp12_mul(m2, m)  # ^(p^2 + 1)
    # Hard part via base-p decomposition + Shamir 4-way multi-exponentiation.
    bases = [m]
    for _ in range(3):
        bases.append(F.fp12_frobenius(bases[-1]))
    # 16-entry table of products of subsets of bases
    table = [F.FP12_ONE] * 16
    for mask in range(1, 16):
        low = mask & (-mask)
        table[mask] = F.fp12_mul(table[mask ^ low], bases[low.bit_length() - 1])
    nbits = max(l.bit_length() for l in _LAMBDAS)
    acc = F.FP12_ONE
    for i in range(nbits - 1, -1, -1):
        acc = F.fp12_sq(acc)
        mask = 0
        for j in range(4):
            mask |= ((_LAMBDAS[j] >> i) & 1) << j
        if mask:
            acc = F.fp12_mul(acc, table[mask])
    return acc


def pairing(p: Affine, q: Affine):
    return final_exponentiation(miller_loop(p, q))


def pairings_verify(a1: Affine, a2: Affine, b1: Affine, b2: Affine) -> bool:
    """Check e(a1, a2) == e(b1, b2) with one shared final exponentiation
    (parity: /root/reference/blst/src/kzg_proofs.rs:74-100)."""
    from .curve import G1

    f = F.fp12_mul(miller_loop(G1.affine_neg(a1), a2), miller_loop(b1, b2))
    return final_exponentiation(f) == F.FP12_ONE
