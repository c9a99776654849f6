"""BLS12-381 point and scalar (de)serialization, ZCash/ETH2 format.

Behavioral parity with the reference's `from_bytes`/`to_bytes`
(/root/reference/blst/src/types/g1.rs, fr.rs): compressed points with flag
bits in the top three bits of the first byte, canonical big-endian scalars.

All functions raise ValueError on invalid encodings (the reference returns
Err(String); the C-ABI layer maps both to C_KZG_BADARGS).
"""

from ..constants import P_MOD as P, R_MOD as R
from . import field as F
from .curve import G1, G2, Affine

_COMPRESSED = 0x80
_INFINITY = 0x40
_SIGN = 0x20
_HALF_P = (P - 1) // 2


# ---------------------------------------------------------------------------
# Scalars (Fr)
# ---------------------------------------------------------------------------


def fr_from_bytes(b: bytes) -> int:
    """Canonical big-endian 32-byte scalar; rejects values >= r."""
    if len(b) != 32:
        raise ValueError("bytes_to_bls_field: expected 32 bytes")
    v = int.from_bytes(b, "big")
    if v >= R:
        raise ValueError("bytes_to_bls_field: scalar not canonical")
    return v


def fr_from_bytes_unchecked(b: bytes) -> int:
    """Non-validating variant (reduces mod r), parity with
    Fr::from_bytes_unchecked (/root/reference/kzg/src/lib.rs:28-32)."""
    if len(b) != 32:
        raise ValueError("expected 32 bytes")
    return int.from_bytes(b, "big") % R


def fr_to_bytes(v: int) -> bytes:
    return (v % R).to_bytes(32, "big")


# ---------------------------------------------------------------------------
# G1
# ---------------------------------------------------------------------------


def g1_to_bytes(pt: Affine) -> bytes:
    if pt is None:
        return bytes([_COMPRESSED | _INFINITY]) + bytes(47)
    x, y = pt
    out = bytearray(x.to_bytes(48, "big"))
    out[0] |= _COMPRESSED
    if y > _HALF_P:
        out[0] |= _SIGN
    return bytes(out)


def g1_from_bytes(b: bytes, subgroup_check: bool = True) -> Affine:
    if len(b) != 48:
        raise ValueError("g1: expected 48 bytes")
    flags = b[0]
    if not flags & _COMPRESSED:
        raise ValueError("g1: uncompressed encoding not accepted")
    if flags & _INFINITY:
        if flags != (_COMPRESSED | _INFINITY) or any(b[1:]):
            raise ValueError("g1: malformed infinity encoding")
        return None
    x = int.from_bytes(b, "big") & ((1 << 381) - 1)
    if x >= P:
        raise ValueError("g1: x not canonical")
    y2 = (x * x % P * x + 4) % P
    y = F.fp_sqrt(y2)
    if y is None:
        raise ValueError("g1: x not on curve")
    if bool(flags & _SIGN) != (y > _HALF_P):
        y = P - y
    pt = (x, y)
    if subgroup_check and not G1.in_subgroup(pt):
        raise ValueError("g1: point not in subgroup")
    return pt


# ---------------------------------------------------------------------------
# G2
# ---------------------------------------------------------------------------


def _fp2_lex_larger(y) -> bool:
    """Lexicographic order on Fp2: compare c1 first, then c0."""
    if y[1] != 0:
        return y[1] > _HALF_P
    return y[0] > _HALF_P


def g2_to_bytes(pt: Affine) -> bytes:
    if pt is None:
        return bytes([_COMPRESSED | _INFINITY]) + bytes(95)
    x, y = pt
    out = bytearray(x[1].to_bytes(48, "big") + x[0].to_bytes(48, "big"))
    out[0] |= _COMPRESSED
    if _fp2_lex_larger(y):
        out[0] |= _SIGN
    return bytes(out)


def g2_from_bytes(b: bytes, subgroup_check: bool = True) -> Affine:
    if len(b) != 96:
        raise ValueError("g2: expected 96 bytes")
    flags = b[0]
    if not flags & _COMPRESSED:
        raise ValueError("g2: uncompressed encoding not accepted")
    if flags & _INFINITY:
        if flags != (_COMPRESSED | _INFINITY) or any(b[1:]):
            raise ValueError("g2: malformed infinity encoding")
        return None
    x_c1 = int.from_bytes(b[:48], "big") & ((1 << 381) - 1)
    x_c0 = int.from_bytes(b[48:], "big")
    if x_c1 >= P or x_c0 >= P:
        raise ValueError("g2: x not canonical")
    x = (x_c0, x_c1)
    y2 = F.fp2_add(F.fp2_mul(F.fp2_sq(x), x), G2.b)
    y = F.fp2_sqrt(y2)
    if y is None:
        raise ValueError("g2: x not on curve")
    if bool(flags & _SIGN) != _fp2_lex_larger(y):
        y = F.fp2_neg(y)
    pt = (x, y)
    if subgroup_check and not G2.in_subgroup(pt):
        raise ValueError("g2: point not in subgroup")
    return pt
