"""Pure-Python BLS12-381 G1/G2 group arithmetic (oracle backend).

Points are affine tuples (x, y) over the coordinate field, or None for the
identity. Internally scalar multiplication uses Jacobian coordinates.

Generic over the coordinate field so the same code serves G1 (Fp) and
G2 (Fp2), mirroring how the reference writes group algorithms once against
traits (/root/reference/kzg/src/lib.rs:77-136).
"""

from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

from ..constants import (
    B_COEFF,
    G1_GENERATOR_X,
    G1_GENERATOR_Y,
    G2_GENERATOR_X_C0,
    G2_GENERATOR_X_C1,
    G2_GENERATOR_Y_C0,
    G2_GENERATOR_Y_C1,
    P_MOD as P,
    R_MOD as R,
)
from . import field as F

Affine = Optional[Tuple[Any, Any]]


@dataclass(frozen=True)
class CurveOps:
    """Field ops bundle + curve b coefficient."""

    add: Callable
    sub: Callable
    mul: Callable
    sq: Callable
    neg: Callable
    inv: Callable
    zero: Any
    one: Any
    b: Any

    # ---- affine/jacobian arithmetic -------------------------------------

    def is_on_curve(self, pt: Affine) -> bool:
        if pt is None:
            return True
        x, y = pt
        return self.sq(y) == self.add(self.mul(self.sq(x), x), self.b)

    def affine_neg(self, pt: Affine) -> Affine:
        if pt is None:
            return None
        return (pt[0], self.neg(pt[1]))

    def affine_add(self, p: Affine, q: Affine) -> Affine:
        if p is None:
            return q
        if q is None:
            return p
        x1, y1 = p
        x2, y2 = q
        if x1 == x2:
            if y1 != y2 or y1 == self.zero:
                return None  # P + (-P) = O ; also y=0 can't occur on BLS12-381
            # doubling
            lam = self.mul(
                self.mul(self.sq(x1), _int_to_field(self, 3)),
                self.inv(self.add(y1, y1)),
            )
        else:
            lam = self.mul(self.sub(y2, y1), self.inv(self.sub(x2, x1)))
        x3 = self.sub(self.sq(lam), self.add(x1, x2))
        y3 = self.sub(self.mul(lam, self.sub(x1, x3)), y1)
        return (x3, y3)

    # Jacobian: (X, Y, Z), x = X/Z^2, y = Y/Z^3; Z = zero means identity.

    def to_jacobian(self, pt: Affine):
        if pt is None:
            return (self.one, self.one, self.zero)
        return (pt[0], pt[1], self.one)

    def from_jacobian(self, pt) -> Affine:
        X, Y, Z = pt
        if Z == self.zero:
            return None
        zinv = self.inv(Z)
        zinv2 = self.sq(zinv)
        return (self.mul(X, zinv2), self.mul(Y, self.mul(zinv2, zinv)))

    def jac_double(self, p):
        X1, Y1, Z1 = p
        if Z1 == self.zero:
            return p
        A = self.sq(X1)
        B = self.sq(Y1)
        C = self.sq(B)
        D = self.sub(self.sub(self.sq(self.add(X1, B)), A), C)
        D = self.add(D, D)
        E = self.add(self.add(A, A), A)
        Fv = self.sq(E)
        X3 = self.sub(Fv, self.add(D, D))
        C8 = self.add(self.add(C, C), self.add(C, C))
        C8 = self.add(C8, C8)
        Y3 = self.sub(self.mul(E, self.sub(D, X3)), C8)
        Z3 = self.mul(self.add(Y1, Y1), Z1)
        return (X3, Y3, Z3)

    def jac_add(self, p, q):
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        if Z1 == self.zero:
            return q
        if Z2 == self.zero:
            return p
        Z1Z1 = self.sq(Z1)
        Z2Z2 = self.sq(Z2)
        U1 = self.mul(X1, Z2Z2)
        U2 = self.mul(X2, Z1Z1)
        S1 = self.mul(self.mul(Y1, Z2), Z2Z2)
        S2 = self.mul(self.mul(Y2, Z1), Z1Z1)
        if U1 == U2:
            if S1 != S2:
                return (self.one, self.one, self.zero)
            return self.jac_double(p)
        H = self.sub(U2, U1)
        I = self.sq(self.add(H, H))
        J = self.mul(H, I)
        r = self.sub(S2, S1)
        r = self.add(r, r)
        V = self.mul(U1, I)
        X3 = self.sub(self.sub(self.sq(r), J), self.add(V, V))
        Y3 = self.sub(self.mul(r, self.sub(V, X3)), self.add(self.mul(S1, J), self.mul(S1, J)))
        Z3 = self.mul(self.mul(Z1, Z2), self.add(H, H))
        return (X3, Y3, Z3)

    def mul_scalar_raw(self, pt: Affine, k: int) -> Affine:
        """Scalar multiplication without reducing k mod r."""
        if pt is None or k == 0:
            return None
        acc = (self.one, self.one, self.zero)
        base = self.to_jacobian(pt)
        while k:
            if k & 1:
                acc = self.jac_add(acc, base)
            base = self.jac_double(base)
            k >>= 1
        return self.from_jacobian(acc)

    def mul_scalar(self, pt: Affine, k: int) -> Affine:
        return self.mul_scalar_raw(pt, k % R)

    def in_subgroup(self, pt: Affine) -> bool:
        return self.is_on_curve(pt) and self.mul_scalar_raw(pt, R) is None


def _int_to_field(ops: CurveOps, n: int):
    acc = ops.zero
    one = ops.one
    for _ in range(n):
        acc = ops.add(acc, one)
    return acc


G1 = CurveOps(
    add=lambda a, b: (a + b) % P,
    sub=lambda a, b: (a - b) % P,
    mul=lambda a, b: a * b % P,
    sq=lambda a: a * a % P,
    neg=lambda a: (-a) % P,
    inv=F.fp_inv,
    zero=0,
    one=1,
    b=B_COEFF,
)

G2 = CurveOps(
    add=F.fp2_add,
    sub=F.fp2_sub,
    mul=F.fp2_mul,
    sq=F.fp2_sq,
    neg=F.fp2_neg,
    inv=F.fp2_inv,
    zero=F.FP2_ZERO,
    one=F.FP2_ONE,
    b=F.fp2_mul_by_xi((B_COEFF, 0)),  # 4 * (1 + u)
)

G1_GENERATOR: Affine = (G1_GENERATOR_X, G1_GENERATOR_Y)
G2_GENERATOR: Affine = (
    (G2_GENERATOR_X_C0, G2_GENERATOR_X_C1),
    (G2_GENERATOR_Y_C0, G2_GENERATOR_Y_C1),
)

assert G1.is_on_curve(G1_GENERATOR)
assert G2.is_on_curve(G2_GENERATOR)
