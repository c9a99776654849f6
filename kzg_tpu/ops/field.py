"""Batched prime-field arithmetic for the TPU in radix-2^16 limbs.

Design (TPU-first, not a port):
  - A field element batch is a uint32 array of shape (L, *batch): limbs on
    axis 0 (little-endian, each < 2^16), batch dims trailing so the large
    batch axis lands on the VPU lane dimension.
  - All values live in Montgomery form (R = 2^(16 L) mod m).
  - Multiplication is schoolbook column accumulation with lo/hi-16 splitting
    (every partial product < 2^32 stays exact in uint32; column sums stay
    < 2^23), followed by radix-2^16 Montgomery reduction -- no 64-bit ops,
    everything vectorizes over the batch on the VPU.
  - The column accumulator walks a (2L+1, batch) array with static slice
    updates, keeping the traced graph small; the same body runs inside
    Pallas kernels (see pallas_msm.py) via the unrolled forms below.

The reference delegates this layer to blst's C/assembly
(/root/reference/blst/src/types/fr.rs, fp.rs); here it is the compute path
itself. Only Python-int literals are used for constants so the body is
Pallas-compatible.
"""

import os
from dataclasses import dataclass
from functools import cached_property, lru_cache, partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    FP_LIMBS,
    FP_N0_INV,
    FP_R2,
    FR_LIMBS,
    FR_N0_INV,
    FR_R2,
    LIMB_BITS,
    LIMB_MASK,
    P_MOD,
    R_MOD,
)


def int_to_limbs(v: int, n_limbs: int) -> np.ndarray:
    """Host-side: python int -> little-endian 16-bit limb vector."""
    return np.array(
        [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n_limbs)], dtype=np.uint32
    )


def ints_to_limbs(vs, n_limbs: int) -> np.ndarray:
    """Host-side: list of ints -> (L, B) limb array."""
    out = np.empty((n_limbs, len(vs)), dtype=np.uint32)
    for b, v in enumerate(vs):
        for i in range(n_limbs):
            out[i, b] = (v >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_ints(a) -> List[int]:
    """Host-side: (L, *batch) limb array -> flat list of python ints."""
    a = np.asarray(a, dtype=np.uint64)
    L = a.shape[0]
    flat = a.reshape(L, -1)
    out = []
    for b in range(flat.shape[1]):
        v = 0
        for i in range(L - 1, -1, -1):
            v = (v << LIMB_BITS) | int(flat[i, b])
        out.append(v)
    return out


@dataclass(frozen=True)
class FieldSpec:
    """A prime field in limb representation, plus Montgomery constants."""

    name: str
    modulus: int
    n_limbs: int
    r2: int
    n0_inv: int

    @cached_property
    def mod_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus, self.n_limbs)

    @cached_property
    def mod_limb_ints(self):
        return tuple(int(x) for x in self.mod_limbs)

    @cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.r2, self.n_limbs)

    @cached_property
    def one_mont(self) -> np.ndarray:
        # R mod m in limbs (Montgomery representation of 1)
        r = (1 << (LIMB_BITS * self.n_limbs)) % self.modulus
        return int_to_limbs(r, self.n_limbs)

    @cached_property
    def zero(self) -> np.ndarray:
        return np.zeros(self.n_limbs, dtype=np.uint32)

    def const(self, v: int) -> np.ndarray:
        """Host: Montgomery-form limb vector of a python int constant."""
        r = 1 << (LIMB_BITS * self.n_limbs)
        return int_to_limbs((v % self.modulus) * r % self.modulus, self.n_limbs)

    # ---- host encode/decode ------------------------------------------------

    def encode_host(self, vs) -> np.ndarray:
        """Python ints -> Montgomery-form limbs (L, B) as HOST numpy (for
        callers that pack several arrays into one fused device upload)."""
        if isinstance(vs, int):
            vs = [vs]
        r = 1 << (LIMB_BITS * self.n_limbs)
        reduced = [v % self.modulus * r % self.modulus for v in vs]
        return ints_to_limbs(reduced, self.n_limbs)

    def encode(self, vs) -> jnp.ndarray:
        """Python ints -> Montgomery-form device limbs (L, B)."""
        return jnp.asarray(self.encode_host(vs))

    def decode(self, a) -> List[int]:
        """Montgomery-form device limbs -> python ints."""
        rinv = pow(1 << (LIMB_BITS * self.n_limbs), -1, self.modulus)
        return [v * rinv % self.modulus for v in limbs_to_ints(np.asarray(a))]


FR = FieldSpec("Fr", R_MOD, FR_LIMBS, FR_R2, FR_N0_INV)
FP = FieldSpec("Fp", P_MOD, FP_LIMBS, FP_R2, FP_N0_INV)


# ---------------------------------------------------------------------------
# Shared limb bodies (work on jnp arrays OR inside Pallas kernels; constants
# are python ints only)
# ---------------------------------------------------------------------------


def carry_propagate(cols, n_limbs: int):
    """Sequential carry chain over per-limb uint32 columns.
    Returns n_limbs normalized limbs (< 2^16) plus the final carry."""
    out = []
    carry = None
    for k in range(n_limbs):
        t = cols[k] if carry is None else cols[k] + carry
        out.append(t & 0xFFFF)
        carry = t >> 16
    return out, carry


def cond_sub_mod(spec: FieldSpec, limbs, top_carry=None):
    """Subtract the modulus where the value is >= modulus (value < 2*modulus).
    `limbs` is a list of (batch,) uint32 arrays each < 2^16."""
    m = spec.mod_limb_ints
    borrow = None
    diff = []
    for k in range(spec.n_limbs):
        t = limbs[k] + (0x10000 - m[k])
        if borrow is not None:
            t = t - borrow
        diff.append(t & 0xFFFF)
        borrow = 1 - (t >> 16)  # 1 if borrowed
    ge = borrow == 0
    if top_carry is not None:
        ge = jnp.logical_or(ge, top_carry != 0)
    return [jnp.where(ge, d, l) for d, l in zip(diff, limbs)]


class ColsArray:
    """Functional column accumulator over a stacked jnp array."""

    def __init__(self, shape_batch, n_cols):
        self.arr = jnp.zeros((n_cols,) + shape_batch, jnp.uint32)

    def add_slice(self, lo, hi, val):
        self.arr = self.arr.at[lo:hi].add(val)

    def add_at(self, idx, val):
        self.arr = self.arr.at[idx].add(val)

    def get(self, idx):
        return self.arr[idx]


class ColsRef:
    """In-place column accumulator over a Pallas VMEM scratch ref."""

    def __init__(self, ref):
        self.ref = ref
        self.ref[...] = jnp.zeros_like(ref)

    def add_slice(self, lo, hi, val):
        self.ref[lo:hi] += val

    def add_at(self, idx, val):
        self.ref[idx] += val

    def get(self, idx):
        return self.ref[idx]


def mont_mul_body(spec: FieldSpec, a, b, mvec, cols):
    """Shared Montgomery-product body; returns the list of result limbs.

    a, b: (L, *batch) uint32; mvec: modulus limbs shaped (L, 1...) for
    broadcasting; cols: ColsArray or ColsRef accumulator with 2L+1 columns.
    """
    L = spec.n_limbs
    n0 = int(spec.n0_inv)
    # 1. schoolbook product columns
    for i in range(L):
        p = a[i][None] * b
        cols.add_slice(i, i + L, p & 0xFFFF)
        cols.add_slice(i + 1, i + L + 1, p >> 16)
    # 2. Montgomery reduction, one limb per step
    for k in range(L):
        mk = (cols.get(k) * n0) & 0xFFFF
        t = mk[None] * mvec
        cols.add_slice(k, k + L, t & 0xFFFF)
        cols.add_slice(k + 1, k + L + 1, t >> 16)
        cols.add_at(k + 1, cols.get(k) >> 16)
    # 3. carry propagation + conditional subtract
    limbs, carry = carry_propagate([cols.get(L + i) for i in range(L)], L)
    top = cols.get(2 * L) + carry
    return cond_sub_mod(spec, limbs, top_carry=top)


def add_body(spec: FieldSpec, a, b):
    cols = [a[k] + b[k] for k in range(spec.n_limbs)]
    limbs, carry = carry_propagate(cols, spec.n_limbs)
    return cond_sub_mod(spec, limbs, top_carry=carry)


def sub_body(spec: FieldSpec, a, b):
    m = spec.mod_limb_ints
    borrow = None
    diff = []
    for k in range(spec.n_limbs):
        t = a[k] + 0x10000 - b[k]
        if borrow is not None:
            t = t - borrow
        diff.append(t & 0xFFFF)
        borrow = 1 - (t >> 16)
    underflow = borrow != 0
    carry = None
    out = []
    for k in range(spec.n_limbs):
        t = diff[k] + jnp.where(underflow, jnp.uint32(m[k]), jnp.uint32(0))
        if carry is not None:
            t = t + carry
        out.append(t & 0xFFFF)
        carry = t >> 16
    return out


# ---------------------------------------------------------------------------
# Public jnp ops (shapes (L, *batch))
# ---------------------------------------------------------------------------


def _stack(limbs) -> jnp.ndarray:
    return jnp.stack(limbs, axis=0)


def _carry_loop(cols):
    """Loop-mode carry chain over axis 0; returns (normalized, final carry)."""
    L = cols.shape[0]
    batch = cols.shape[1:]

    def step(k, state):
        out, carry = state
        t = cols[k] + carry
        out = jax.lax.dynamic_update_index_in_dim(out, t & 0xFFFF, k, 0)
        return out, t >> 16

    out0 = jnp.zeros_like(cols)
    return jax.lax.fori_loop(0, L, step, (out0, jnp.zeros(batch, jnp.uint32)))


def _borrow_sub_loop(a, bvec):
    """Loop-mode a - b over axis 0 with borrow; returns (diff, final borrow).
    bvec may be (L,) constants or (L, *batch)."""
    L = a.shape[0]
    batch = a.shape[1:]

    def step(k, state):
        diff, borrow = state
        t = a[k] + 0x10000 - bvec[k] - borrow
        diff = jax.lax.dynamic_update_index_in_dim(diff, t & 0xFFFF, k, 0)
        return diff, 1 - (t >> 16)

    d0 = jnp.zeros_like(a)
    return jax.lax.fori_loop(0, L, step, (d0, jnp.zeros(batch, jnp.uint32)))


def _add_loop(a, bvec, mask=None):
    """Loop-mode a + b over axis 0 (b gated by mask if given); drops carry out
    only if the caller guarantees no overflow past limb L."""
    L = a.shape[0]
    batch = a.shape[1:]

    def step(k, state):
        out, carry = state
        bk = bvec[k]
        if mask is not None:
            bk = jnp.where(mask, bk, jnp.uint32(0))
        t = a[k] + bk + carry
        out = jax.lax.dynamic_update_index_in_dim(out, t & 0xFFFF, k, 0)
        return out, t >> 16

    out0 = jnp.zeros_like(a)
    out, carry = jax.lax.fori_loop(0, L, step, (out0, jnp.zeros(batch, jnp.uint32)))
    return out, carry


def add(spec: FieldSpec, a, b) -> jnp.ndarray:
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    L = spec.n_limbs
    s = jnp.broadcast_to(a, (L,) + batch) + jnp.broadcast_to(b, (L,) + batch)
    out, carry = _carry_loop(s)
    mconst = jnp.asarray(spec.mod_limbs)
    diff, borrow = _borrow_sub_loop(out, mconst)
    ge = jnp.logical_or(borrow == 0, carry != 0)
    return jnp.where(ge[None], diff, out)


def sub(spec: FieldSpec, a, b) -> jnp.ndarray:
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    L = spec.n_limbs
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)
    diff, borrow = _borrow_sub_loop(a, b)
    under = borrow != 0
    mconst = jnp.asarray(spec.mod_limbs)
    mvec = jnp.broadcast_to(mconst.reshape((L,) + (1,) * len(batch)), (L,) + batch)
    out, _ = _add_loop(diff, mvec, mask=under)
    return out


def neg(spec: FieldSpec, a) -> jnp.ndarray:
    z = is_zero(spec, a)
    L = spec.n_limbs
    batch = a.shape[1:]
    mvec = jnp.broadcast_to(
        jnp.asarray(spec.mod_limbs).reshape((L,) + (1,) * len(batch)), (L,) + batch
    )
    diff, _ = _borrow_sub_loop(mvec, a)
    return jnp.where(z[None], jnp.zeros_like(a), diff)


def mont_mul_unrolled(spec: FieldSpec, a, b) -> jnp.ndarray:
    """Fully-unrolled Montgomery product with SCALAR python-int constants
    only (Pallas kernels reject captured array constants; too many HLO ops
    for XLA:CPU -- the loop-mode mont_mul is the default there)."""
    L = spec.n_limbs
    n0 = int(spec.n0_inv)
    m = spec.mod_limb_ints
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)
    zero = jnp.zeros(batch, jnp.uint32)
    cols = [zero] * (2 * L + 1)
    for i in range(L):
        ai = a[i]
        for j in range(L):
            p = ai * b[j]
            cols[i + j] = cols[i + j] + (p & 0xFFFF)
            cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
    for k in range(L):
        mk = (cols[k] * n0) & 0xFFFF
        for j in range(L):
            t = mk * m[j]
            cols[k + j] = cols[k + j] + (t & 0xFFFF)
            cols[k + j + 1] = cols[k + j + 1] + (t >> 16)
        cols[k + 1] = cols[k + 1] + (cols[k] >> 16)
    limbs, carry = carry_propagate(cols[L : 2 * L], L)
    top = cols[2 * L] + carry
    return _stack(cond_sub_mod(spec, limbs, top_carry=top))


def _abs_diff_chain(x, y, h: int):
    """|x - y| over h-limb operands (lists of (batch,) uint32 < 2^16) via a
    borrow chain + conditional two's-complement negation. Returns
    (limbs nonneg < 2^16, sign) with sign = 1 where x < y."""
    borrow = None
    d = []
    for k in range(h):
        t = x[k] + (0x10000 - y[k])
        if borrow is not None:
            t = t - borrow
        d.append(t & 0xFFFF)
        borrow = 1 - (t >> 16)  # 1 if borrowed
    s = borrow  # 1 iff x < y; then d holds (x - y) mod 2^(16h)
    carry = s
    out = []
    for k in range(h):
        nk = (d[k] ^ 0xFFFF) + carry
        neg = nk & 0xFFFF
        carry = nk >> 16
        out.append(jnp.where(s != 0, neg, d[k]))
    return out, s


def _half_prod_cols(x, y, h: int, zero):
    """Schoolbook h x h limb product as 2h lazy uint32 columns."""
    cols = [zero] * (2 * h)
    for i in range(h):
        xi = x[i]
        for j in range(h):
            p = xi * y[j]
            cols[i + j] = cols[i + j] + (p & 0xFFFF)
            cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
    return cols


def mont_mul_karatsuba(spec: FieldSpec, a, b) -> jnp.ndarray:
    """mont_mul_unrolled with a one-level Karatsuba product phase:
    3*(L/2)^2 limb multiplies instead of L^2 (576 -> 432 for Fp) -- the VPU
    u32-multiply chain is the measured bottleneck of the MSM scan kernel
    (PERF.md), and multiplies cost ~1.8x what shifts/adds do there.

    The middle term uses the subtractive form z1 = z0 + z2 - (A1-A0)(B1-B0),
    which keeps every limb product of two < 2^16 values (no u32 overflow)
    but makes middle columns SIGNED: columns are accumulated in int32
    two's-complement and every carry uses an arithmetic shift (exact for
    values divisible by 2^16). Column magnitudes stay < 2^24, far inside
    int32. Reduction phase and conditional subtract are unchanged except for
    the signed carries. Bit-exact vs mont_mul_unrolled
    (tests/test_device_field.py)."""
    L = spec.n_limbs
    assert L % 2 == 0
    h = L // 2
    n0 = int(spec.n0_inv)
    m = spec.mod_limb_ints
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)
    zero = jnp.zeros(batch, jnp.uint32)
    A0 = [a[k] for k in range(h)]
    A1 = [a[h + k] for k in range(h)]
    B0 = [b[k] for k in range(h)]
    B1 = [b[h + k] for k in range(h)]
    z0 = _half_prod_cols(A0, B0, h, zero)
    z2 = _half_prod_cols(A1, B1, h, zero)
    dA, sA = _abs_diff_chain(A1, A0, h)
    dB, sB = _abs_diff_chain(B1, B0, h)
    zm = _half_prod_cols(dA, dB, h, zero)
    # (A1-A0)(B1-B0) = (-1)^(sA^sB) * zm; z1 = z0 + z2 - (A1-A0)(B1-B0)
    add_zm = (sA ^ sB) != 0  # signs differ -> product negative -> zm added
    i32 = jnp.int32
    cols = [jnp.zeros(batch, i32) for _ in range(2 * L + 1)]
    for k in range(2 * h):
        zmk = zm[k].astype(i32)
        mid = z0[k].astype(i32) + z2[k].astype(i32)
        mid = mid + jnp.where(add_zm, zmk, -zmk)
        cols[k] = cols[k] + z0[k].astype(i32)
        cols[h + k] = cols[h + k] + mid
        cols[L + k] = cols[L + k] + z2[k].astype(i32)
    for k in range(L):
        # low 16 bits of a wraparound int32 product are exact
        mk = ((cols[k] * n0) & 0xFFFF).astype(jnp.uint32)
        for j in range(L):
            t = mk * m[j]
            cols[k + j] = cols[k + j] + (t & 0xFFFF).astype(i32)
            cols[k + j + 1] = cols[k + j + 1] + (t >> 16).astype(i32)
        cols[k + 1] = cols[k + 1] + (cols[k] >> 16)  # arithmetic shift
    limbs, carry = carry_propagate(cols[L : 2 * L], L)
    top = cols[2 * L] + carry
    out = cond_sub_mod(spec, limbs, top_carry=top)
    return _stack([l.astype(jnp.uint32) for l in out])


def _mxu_mats_np(spec: FieldSpec):
    """Byte-band (Toeplitz) matrices of the FIXED reduction constants, for
    the MXU formulation of the Montgomery reduction (mont_mul_mxu):
      NpT[p, j] = byte (p-j) of N' = -m^-1 mod 2^(16L)   (2L x 2L)
      N8T[q, j] = byte (q-j) of m                        (4L x 2L)
    Values are 0..255 -- exactly representable in bfloat16, and every MXU
    accumulation stays below 2^24, so the bf16 matmul is exact."""
    L = spec.n_limbs
    Rm = 1 << (16 * L)
    nprime = (-pow(spec.modulus, -1, Rm)) % Rm
    npb = nprime.to_bytes(2 * L, "little")
    nb = spec.modulus.to_bytes(2 * L, "little")
    K = 2 * L
    NpT = np.zeros((K, K), np.float32)
    N8T = np.zeros((2 * K, K), np.float32)
    for j in range(K):
        for p in range(j, K):
            NpT[p, j] = npb[p - j]
        for q in range(j, j + K):
            N8T[q, j] = nb[q - j]
    return NpT, N8T


@lru_cache(maxsize=None)
def mxu_mats(name: str):
    # Keep the cache in NUMPY (bf16 via ml_dtypes): converting with jnp
    # inside a trace would cache a tracer and leak it into later traces.
    import ml_dtypes

    spec = FR if name == "Fr" else FP
    NpT, N8T = _mxu_mats_np(spec)
    return (
        NpT.astype(ml_dtypes.bfloat16),
        N8T.astype(ml_dtypes.bfloat16),
    )


def mont_mul_mxu(spec: FieldSpec, a, b, mats=None) -> jnp.ndarray:
    """Montgomery product with the REDUCTION on the MXU.

    The schoolbook product columns stay on the VPU (both operands vary),
    but the two reduction multiplies have one FIXED operand each:
        m  = T_lo * N' mod R     -> byte-band matmul vs NpT
        T' = (T + m * m_mod) / R -> byte-band matmul vs N8T
    which moves ~half the multiply work to a unit with ~100x headroom.
    Exactness: all matrix/vector entries are bytes, f32 accumulators stay
    below 2^24 (48 terms x 255^2 ~= 3.1M). Differential-tested against
    mont_mul (tests/test_device_field.py)."""
    L = spec.n_limbs
    K2 = 2 * L
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)
    if mats is None:
        mats = mxu_mats(spec.name)
    NpT, N8T = mats

    # 1. product columns (VPU)
    zero = jnp.zeros(batch, jnp.uint32)
    cols = [zero] * (K2 + 1)
    for i in range(L):
        ai = a[i]
        for j in range(L):
            p = ai * b[j]
            cols[i + j] = cols[i + j] + (p & 0xFFFF)
            cols[i + j + 1] = cols[i + j + 1] + (p >> 16)

    # 2. normalize the low half to 16-bit limbs (T mod R)
    t = []
    carry = zero
    for k in range(L):
        s = cols[k] + carry
        t.append(s & 0xFFFF)
        carry = s >> 16
    col_l = cols[L] + carry

    # 3. m = (T mod R) * N' mod R on the MXU (byte granularity)
    vb = []
    for limb in t:
        vb.append(limb & 0xFF)
        vb.append(limb >> 8)
    # Mosaic has no u32->bf16 or f32->u32 casts; bounce through int32
    # (all values fit comfortably).
    v = jnp.stack(vb).astype(jnp.int32).astype(jnp.bfloat16)  # (2L, *batch)
    m8 = jax.lax.dot_general(
        NpT, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32).astype(jnp.uint32)

    # 4. normalize m to bytes
    mb = []
    carry = zero
    for p in range(K2):
        s = m8[p] + carry
        mb.append(s & 0xFF)
        carry = s >> 8
    mv = jnp.stack(mb).astype(jnp.int32).astype(jnp.bfloat16)

    # 5. m * modulus on the MXU -> byte columns (4L)
    mn8 = jax.lax.dot_general(
        N8T, mv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32).astype(jnp.uint32)

    # 6. (T + m*modulus) / R: low half folds to a carry, high half to limbs
    carry = zero
    for j in range(L):
        mn16 = mn8[2 * j] + (mn8[2 * j + 1] << 8)
        s = t[j] + mn16 + carry
        carry = s >> 16
    out = []
    for j in range(L, K2):
        mn16 = mn8[2 * j] + (mn8[2 * j + 1] << 8)
        base = col_l if j == L else cols[j]
        s = base + mn16 + carry
        out.append(s & 0xFFFF)
        carry = s >> 16
    top = cols[K2] + carry
    return _stack(cond_sub_mod(spec, out, top_carry=top))


def mont_mul(spec: FieldSpec, a, b) -> jnp.ndarray:
    """Montgomery product a * b * R^{-1} mod m, vectorized over batch.

    Loop-mode formulation: fori_loops over limb indices keep the traced graph
    at ~100 ops independent of L, so XLA compiles it quickly on every
    platform. The TPU hot path uses the Pallas kernels instead
    (ops/pallas_msm.py)."""
    L = spec.n_limbs
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)
    mvec = jnp.asarray(spec.mod_limbs).reshape((L,) + (1,) * len(batch))
    n0 = int(spec.n0_inv)
    start0 = (0,) * len(batch)
    cols = jnp.zeros((2 * L + 1,) + batch, jnp.uint32)

    def add_rows(cols, val, row):
        cur = jax.lax.dynamic_slice(cols, (row,) + start0, (L,) + batch)
        return jax.lax.dynamic_update_slice(cols, cur + val, (row,) + start0)

    def phase1(i, cols):
        p = jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=True) * b
        cols = add_rows(cols, p & 0xFFFF, i)
        return add_rows(cols, p >> 16, i + 1)

    cols = jax.lax.fori_loop(0, L, phase1, cols)

    def phase2(k, cols):
        ck = jax.lax.dynamic_index_in_dim(cols, k, 0, keepdims=False)
        mk = (ck * n0) & 0xFFFF
        t = mk[None] * mvec
        cols = add_rows(cols, t & 0xFFFF, k)
        cols = add_rows(cols, t >> 16, k + 1)
        ck = jax.lax.dynamic_index_in_dim(cols, k, 0, keepdims=False)
        return jax.lax.dynamic_update_index_in_dim(
            cols,
            jax.lax.dynamic_index_in_dim(cols, k + 1, 0, keepdims=False)
            + (ck >> 16),
            k + 1,
            0,
        )

    cols = jax.lax.fori_loop(0, L, phase2, cols)

    # carry propagation over the upper limbs, as a loop
    def carry_step(k, state):
        out, carry = state
        t = cols[L + k] + carry
        out = jax.lax.dynamic_update_index_in_dim(out, t & 0xFFFF, k, 0)
        return out, t >> 16

    out0 = jnp.zeros((L,) + batch, jnp.uint32)
    out, carry = jax.lax.fori_loop(0, L, carry_step, (out0, jnp.zeros(batch, jnp.uint32)))
    top = cols[2 * L] + carry

    # conditional subtract, as a loop (per-k modulus constants via gather)
    mconst = jnp.asarray(spec.mod_limbs)

    def sub_step2(k, state):
        diff, borrow = state
        t = out[k] + 0x10000 - mconst[k] - borrow
        diff = jax.lax.dynamic_update_index_in_dim(diff, t & 0xFFFF, k, 0)
        return diff, 1 - (t >> 16)

    diff, borrow = jax.lax.fori_loop(
        0, L, sub_step2, (out0, jnp.zeros(batch, jnp.uint32))
    )
    ge = jnp.logical_or(borrow == 0, top != 0)
    return jnp.where(ge[None], diff, out)


def mont_sqr(spec: FieldSpec, a) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def add_unrolled(spec: FieldSpec, a, b) -> jnp.ndarray:
    """Fully-unrolled modular add (Pallas-kernel-friendly dataflow)."""
    L = spec.n_limbs
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)
    return _stack(add_body(spec, [a[k] for k in range(L)], [b[k] for k in range(L)]))


def sub_unrolled(spec: FieldSpec, a, b) -> jnp.ndarray:
    """Fully-unrolled modular sub (Pallas-kernel-friendly dataflow)."""
    L = spec.n_limbs
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L,) + batch)
    b = jnp.broadcast_to(b, (L,) + batch)
    return _stack(sub_body(spec, [a[k] for k in range(L)], [b[k] for k in range(L)]))


def neg_unrolled(spec: FieldSpec, a) -> jnp.ndarray:
    z = is_zero(spec, a)
    L = spec.n_limbs
    batch = a.shape[1:]
    m = jnp.asarray(spec.mod_limbs).reshape((L,) + (1,) * len(batch))
    mvec = jnp.broadcast_to(m, (L,) + batch)
    d = _stack(sub_body(spec, [mvec[k] for k in range(L)], [a[k] for k in range(L)]))
    return jnp.where(z[None], jnp.zeros_like(a), d)


class _UnrolledFieldOps:
    """Context manager: swap the module-level field ops for the unrolled
    dataflow forms while tracing a Pallas kernel body (the loop-mode forms
    use dynamic_update_slice loops that Mosaic handles poorly).

    mont: optional replacement for mont_mul (e.g. the MXU-reduction form
    with the band matrices bound to in-kernel refs)."""

    def __init__(self, mont=None):
        self._mont = mont

    def __enter__(self):
        global mont_mul, add, sub, neg
        self._saved = (mont_mul, add, sub, neg)
        default = (
            mont_mul_karatsuba
            if os.environ.get("KZG_TPU_KARATSUBA", "1") == "1"
            else mont_mul_unrolled
        )
        mont_mul = self._mont if self._mont is not None else default
        add = add_unrolled
        sub = sub_unrolled
        neg = neg_unrolled

    def __exit__(self, *exc):
        global mont_mul, add, sub, neg
        mont_mul, add, sub, neg = self._saved
        return False


unrolled_ops = _UnrolledFieldOps


def maybe_unrolled(flag: bool):
    """unrolled_ops() when flag else a no-op context.

    The loop-mode forms keep the traced graph tiny (XLA:CPU compiles them in
    seconds; the unrolled graphs take minutes) but run each limb phase as a
    separate while-loop iteration with full HBM round trips -- ~10-30x off
    the VPU ceiling on TPU, where XLA instead fuses the unrolled dataflow
    into a handful of elementwise passes. Protocol programs that always
    execute on the process-default backend wrap their traced bodies in
    maybe_unrolled(default_backend() != "cpu"); mesh-explicit (shard_map)
    callers pass their mesh's platform instead (a CPU mesh in a TPU process
    must keep the loop forms or the multi-chip dryrun compile blows up)."""
    import contextlib

    return unrolled_ops() if flag else contextlib.nullcontext()


def unroll_default() -> bool:
    """True when the process-default backend wants the unrolled field ops
    (everything except XLA:CPU)."""
    if os.environ.get("KZG_TPU_UNROLL"):
        return os.environ["KZG_TPU_UNROLL"] == "1"
    return jax.default_backend() != "cpu"


def mul_many(spec: FieldSpec, pairs):
    """Compute many independent products with ONE mont_mul call by stacking
    them along the last batch axis. All operands must share a batch shape.
    Keeps the traced graph small and feeds the VPU bigger batches."""
    k = len(pairs)
    if k == 1:
        return [mont_mul(spec, *pairs[0])]
    batch = jnp.broadcast_shapes(*[jnp.broadcast_shapes(a.shape[1:], b.shape[1:]) for a, b in pairs])
    L = spec.n_limbs
    aa = jnp.concatenate(
        [jnp.broadcast_to(a, (L,) + batch) for a, _ in pairs], axis=-1
    )
    bb = jnp.concatenate(
        [jnp.broadcast_to(b, (L,) + batch) for _, b in pairs], axis=-1
    )
    out = mont_mul(spec, aa, bb)
    n = batch[-1] if batch else 1
    return [out[..., i * n : (i + 1) * n] for i in range(k)]


def mul_const(spec: FieldSpec, a, c_mont: np.ndarray) -> jnp.ndarray:
    """Multiply a batch by a single Montgomery-form constant."""
    c = jnp.asarray(c_mont).reshape((spec.n_limbs,) + (1,) * (a.ndim - 1))
    return mont_mul(spec, a, jnp.broadcast_to(c, a.shape))


def is_zero(spec: FieldSpec, a) -> jnp.ndarray:
    acc = a[0]
    for k in range(1, spec.n_limbs):
        acc = acc | a[k]
    return acc == 0


def eq(spec: FieldSpec, a, b) -> jnp.ndarray:
    acc = a[0] ^ b[0]
    for k in range(1, spec.n_limbs):
        acc = acc | (a[k] ^ b[k])
    return acc == 0


def select(mask, a, b) -> jnp.ndarray:
    """Elementwise select: mask ? a : b. mask has the batch shape."""
    return jnp.where(mask[None], a, b)


def pow_fixed(spec: FieldSpec, a, exponent: int) -> jnp.ndarray:
    """a^exponent for a host-known exponent, as a fori_loop over bits
    (graph stays O(1) muls regardless of exponent size)."""
    nbits = max(1, exponent.bit_length())
    bits = jnp.asarray(
        np.array([(exponent >> i) & 1 for i in range(nbits)], dtype=np.uint32)
    )
    one = jnp.broadcast_to(
        jnp.asarray(spec.one_mont).reshape((spec.n_limbs,) + (1,) * (a.ndim - 1)),
        a.shape,
    )

    def body(i, carry):
        acc, base = carry
        take = bits[i] == 1
        acc = jnp.where(take, mont_mul(spec, acc, base), acc)
        base = mont_mul(spec, base, base)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
    return acc


def inv(spec: FieldSpec, a) -> jnp.ndarray:
    """Fermat inverse a^(m-2); maps 0 to 0."""
    return pow_fixed(spec, a, spec.modulus - 2)


def sum_tree(spec: FieldSpec, a) -> jnp.ndarray:
    """Sum along the last axis in log depth; returns (..., 1)."""
    n = a.shape[-1]
    m = 1 << max(0, (n - 1)).bit_length()
    if m != n:
        pad = [(0, 0)] * (a.ndim - 1) + [(0, m - n)]
        a = jnp.pad(a, pad)
    while m > 1:
        h = m // 2
        a = add(spec, a[..., :h], a[..., h : 2 * h])
        m = h
    return a


def to_canonical(spec: FieldSpec, a) -> jnp.ndarray:
    """Montgomery form -> canonical limbs (multiply by 1 = Montgomery reduce)."""
    one_raw = np.zeros(spec.n_limbs, dtype=np.uint32)
    one_raw[0] = 1
    c = jnp.asarray(one_raw).reshape((spec.n_limbs,) + (1,) * (a.ndim - 1))
    return mont_mul(spec, a, jnp.broadcast_to(c, a.shape))


def from_canonical(spec: FieldSpec, a) -> jnp.ndarray:
    """Canonical limbs -> Montgomery form (multiply by R^2)."""
    return mul_const(spec, a, spec.r2_limbs)


@partial(jax.jit, static_argnames=("name", "to"))
def _conv_jit(a, name: str, to: bool):
    spec = FR if name == "Fr" else FP
    return to_canonical(spec, a) if to else from_canonical(spec, a)


def from_canonical_jit(spec: FieldSpec, a) -> jnp.ndarray:
    return _conv_jit(jnp.asarray(a), spec.name, False)


def to_canonical_jit(spec: FieldSpec, a) -> jnp.ndarray:
    return _conv_jit(jnp.asarray(a), spec.name, True)


def batch_inv_tree(spec: FieldSpec, a, zero_to_one: bool = False):
    """Batch inversion over the last axis in log depth (product tree).

    The classic Montgomery trick (batch_inv below) is a sequential chain --
    fine on a CPU, latency-disastrous for a 100k-lane device batch. Here:
    up-sweep pairwise products (log n batched muls), one Fermat inversion at
    the root, down-sweep distributing inverses (2 muls per level).
    Work ~3n muls, depth ~2 log n + one pow.

    Returns (inverses, was_zero); zeros are replaced by one before inversion.
    """
    L = spec.n_limbs
    was_zero = is_zero(spec, a)
    onec = jnp.asarray(spec.one_mont).reshape((L,) + (1,) * (a.ndim - 1))
    safe = jnp.where(was_zero[None], jnp.broadcast_to(onec, a.shape), a)

    n = a.shape[-1]
    m = 1 << max(0, (n - 1)).bit_length()
    if m != n:
        pad_width = [(0, 0)] * (a.ndim - 1) + [(0, m - n)]
        pad_ones = jnp.broadcast_to(onec, a.shape[:-1] + (m - n,))
        safe = jnp.concatenate([safe, pad_ones], axis=-1)

    # up-sweep: levels[k] has m >> k entries
    levels = [safe]
    cur = safe
    while cur.shape[-1] > 1:
        cur = mont_mul(spec, cur[..., 0::2], cur[..., 1::2])
        levels.append(cur)

    inv_cur = inv(spec, levels[-1])
    for k in range(len(levels) - 2, -1, -1):
        lvl = levels[k]
        # inv of left child = parent_inv * right child; right = parent_inv * left
        left, right = lvl[..., 0::2], lvl[..., 1::2]
        inv_left = mont_mul(spec, inv_cur, right)
        inv_right = mont_mul(spec, inv_cur, left)
        inv_cur = jnp.stack([inv_left, inv_right], axis=-1).reshape(lvl.shape)

    out = inv_cur[..., :n]
    if zero_to_one:
        out = jnp.where(was_zero[None], jnp.broadcast_to(onec, a.shape), out)
    return out, was_zero


def batch_inv(spec: FieldSpec, a, zero_to_one: bool = False):
    """Montgomery-trick batch inversion over the last axis.

    Returns (inverses, was_zero). Zeros are replaced by one before inversion
    (their outputs are meaningless; callers mask with was_zero).
    (parity: fr_batch_inv /root/reference/kzg/src/eip_4844.rs:882-914)
    """
    L = spec.n_limbs
    was_zero = is_zero(spec, a)
    onec = jnp.asarray(spec.one_mont).reshape((L,) + (1,) * (a.ndim - 1))
    safe = jnp.where(was_zero[None], jnp.broadcast_to(onec, a.shape), a)

    n = a.shape[-1]

    def fwd(i, prods):
        prev = jax.lax.dynamic_index_in_dim(prods, i - 1, axis=-1, keepdims=False)
        cur = jax.lax.dynamic_index_in_dim(safe, i, axis=-1, keepdims=False)
        return jax.lax.dynamic_update_index_in_dim(
            prods, mont_mul(spec, prev, cur), i, axis=-1
        )

    prods = jax.lax.fori_loop(1, n, fwd, safe)
    total_inv = inv(spec, prods[..., -1])

    def bwd(idx, carry):
        i = n - 1 - idx
        acc, out = carry
        prev = jax.lax.dynamic_index_in_dim(prods, i - 1, axis=-1, keepdims=False)
        inv_i = mont_mul(spec, acc, prev)
        out = jax.lax.dynamic_update_index_in_dim(out, inv_i, i, axis=-1)
        cur = jax.lax.dynamic_index_in_dim(safe, i, axis=-1, keepdims=False)
        acc = mont_mul(spec, acc, cur)
        return acc, out

    out0 = jnp.zeros_like(a)
    acc, out = jax.lax.fori_loop(0, n - 1, bwd, (total_inv, out0))
    out = jax.lax.dynamic_update_index_in_dim(out, acc, 0, axis=-1)
    if zero_to_one:
        out = jnp.where(was_zero[None], jnp.broadcast_to(onec, a.shape), out)
    return out, was_zero
