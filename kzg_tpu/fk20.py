"""Device FK20 single/multi settings — the legacy chunked-proof API.

Semantics parity with the reference's FsFK20SingleSettings /
FsFK20MultiSettings (/root/reference/blst/src/types/fk20_single_settings.rs
:1-112, fk20_multi_settings.rs:20-176) and the toeplitz_part_1/2/3 pipeline
(fk20_proofs.rs:16-93). TPU-first formulation:

  - toeplitz_part_1 (the x_ext_fft columns) runs ONCE at settings build as a
    device G1 FFT (constant-twiddle digit ladders, ops/g1fft.py);
  - per data_availability call, ONE fused device program does: coefficient
    striding (host-precomputed gather indices), the Fr FFTs for every
    chunk offset at once, the per-lane variable-scalar point multiplies
    (batched double-and-add over all chunk_len x k2 lanes), the reduction
    over chunk files, and toeplitz_part_3 + the final G1 FFT fused as the
    single circulant half-convolution (ops/g1fft.fk20_half_convolution) —
    two sequential G1 butterfly networks collapse into one ladder;
  - the production EIP-7594 cell path keeps its own specialised pipeline
    (eip7594.py); this module serves the reference's legacy API surface
    (chunk sizes 2x-16x, kzg-bench/src/tests/fk20_proofs.rs:12-321).
"""

from functools import lru_cache, partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import R_MOD as R
from .ops import field as fl
from .ops import fft as dfft
from .ops import g1 as dg1
from .ops.field import FR
from .ops.g1 import G1Aff, G1XYZZ
from .ops.g1fft import fft_g1, fk20_half_convolution
from .settings import DeviceKZGSettings


def _brp(xs: list) -> list:
    """Bit-reversal permutation of a list (parity: reverse_bit_order,
    /root/reference/kzg/src/common_utils.rs:6-34)."""
    n = len(xs)
    bits = n.bit_length() - 1
    out = [None] * n
    for i in range(n):
        r = 0
        for b in range(bits):
            r |= ((i >> b) & 1) << (bits - 1 - b)
        out[r] = xs[i]
    return out


def _toeplitz_gather(n: int, offset: int, stride: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-precomputed (index, keep-mask) pair reproducing
    toeplitz_coeffs_stride (legacy layout, parity:
    /root/reference/blst/src/fk20_proofs.rs toeplitz_coeffs_stride):
    tc[0] = c[n-1-offset]; tc[1..k+2] = 0; tc[k+2+j] = c[2*stride-offset-1+j*stride]."""
    k = n // stride
    k2 = 2 * k
    idx = np.zeros(k2, dtype=np.int64)
    keep = np.zeros(k2, dtype=bool)
    idx[0], keep[0] = n - 1 - offset, True
    i, j = k + 2, 2 * stride - offset - 1
    while i < k2:
        idx[i], keep[i] = j, True
        i += 1
        j += stride
    return idx, keep


@partial(jax.jit, static_argnames=("chunk_len",))
def _fk20_da_kernel(poly_limbs, gather_idx, keep, xs, ys, xinf, chunk_len: int):
    """One fused program: poly (16, n) canonical limbs -> extended proof
    batch (affine packed), for chunk_len stride files at once.

    gather_idx/keep: (chunk_len, k2) toeplitz striding tables;
    xs/ys/xinf: (12|1, k2, chunk_len) affine x_ext_fft columns."""
    # toeplitz coefficient files: (16, chunk_len, k2)
    tc = jnp.take(poly_limbs, gather_idx.reshape(-1), axis=-1).reshape(
        (FR.n_limbs,) + gather_idx.shape
    )
    tc = jnp.where(keep[None], tc, jnp.zeros_like(tc))
    tc_m = fl.from_canonical(FR, tc)
    cfft = dfft.fft_body(tc_m)  # (16, chunk_len, k2)
    cfft_can = fl.to_canonical(FR, cfft)
    # per-lane variable-scalar multiply: lanes (k2, chunk_len)
    scalars = jnp.moveaxis(cfft_can, 1, -1)  # (16, k2, chunk_len)
    prods = dg1.scalar_mul(G1Aff(xs, ys, xinf), scalars)
    h_ext = dg1.tree_reduce(prods)  # reduce over the chunk-file axis
    h_ext = G1XYZZ(*(c[..., 0] for c in h_ext))  # (…, k2)
    out = fk20_half_convolution(h_ext)  # == fft(zero_top_half(ifft(.)))
    aff = dg1.to_affine(out)
    return jnp.concatenate(
        [aff.x, aff.y, aff.inf.astype(jnp.uint32)[None]], axis=0
    )


class FK20MultiSettings:
    """Device FK20 multi-proof generator (parity: FsFK20MultiSettings,
    fk20_multi_settings.rs:46-176)."""

    def __init__(self, s: DeviceKZGSettings, n2: int, chunk_len: int):
        if n2 > s.oracle.fft.max_width:
            raise ValueError("n2 must be less than or equal to kzg settings max width")
        if n2 & (n2 - 1) or n2 < 2:
            raise ValueError("n2 must be a power of two >= 2")
        if chunk_len > n2 // 2 or chunk_len < 1 or chunk_len & (chunk_len - 1):
            raise ValueError("chunk_len must be a power of two <= n2/2")
        n = n2 // 2
        k = n // chunk_len
        self.n2, self.chunk_len, self.settings = n2, chunk_len, s
        g1m = s.oracle.g1_monomial
        files = []
        for offset in range(chunk_len):
            start = n - chunk_len - 1 - offset if n >= chunk_len + 1 + offset else 0
            x, j = [], start
            for _ in range(k - 1):
                x.append(g1m[j])
                j = j - chunk_len if j >= chunk_len else 0
            x.append(None)
            files.append(x + [None] * k)  # toeplitz_part_1 zero padding
        # ONE device G1 FFT over all files: batch axis = chunk offset;
        # lanes stored as (…, k2, chunk_len) for the per-call kernel
        pts = [p for f in files for p in f]
        aff = dg1.affine_from_ints(pts)
        aff = G1Aff(*(c.reshape(c.shape[:-1] + (chunk_len, 2 * k)) for c in aff))
        self._xs, self._ys, self._xinf = _fft_g1_batch(aff.x, aff.y, aff.inf)
        gi, km = zip(*(_toeplitz_gather(n, o, chunk_len) for o in range(chunk_len)))
        self._gather = jnp.asarray(np.stack(gi))
        self._keep = jnp.asarray(np.stack(km))

    def data_availability_optimized(self, poly_coeffs: Sequence[int]) -> List:
        n = len(poly_coeffs)
        if 2 * n != self.n2:
            raise ValueError("polynomial length must be n2/2")
        limbs = jnp.asarray(fl.ints_to_limbs([c % R for c in poly_coeffs], FR.n_limbs))
        packed = np.asarray(
            _fk20_da_kernel(
                limbs, self._gather, self._keep,
                self._xs, self._ys, self._xinf, self.chunk_len,
            )
        )
        return _unpack_affine(packed)

    def data_availability(self, poly_coeffs: Sequence[int]) -> List:
        """(parity: data_availability, fk20_multi_settings.rs — BRP output)"""
        return _brp(self.data_availability_optimized(poly_coeffs))


class FK20SingleSettings(FK20MultiSettings):
    """Device FK20 single-proof generator (parity: FsFK20SingleSettings,
    fk20_single_settings.rs:20-112). The single path is the multi path at
    chunk_len=1 with the x column x[i] = g1_monomial[n-2-i]."""

    def __init__(self, s: DeviceKZGSettings, n2: int):
        super().__init__(s, n2, 1)

    # fk20_single's x column differs from multi's chunk_len=1 column by one
    # index shift; the reference keeps two constructors. At chunk_len=1:
    # multi start = n-2-offset = n-2 and steps of 1 — identical, so the
    # shared constructor already builds the right table.


@jax.jit
def _fft_g1_batch(x, y, inf):
    """toeplitz_part_1 for every chunk file in one program: G1 FFT along the
    last axis, back to affine, lane axes swapped to (…, k2, chunk_len)."""
    out = fft_g1(dg1.from_affine(G1Aff(x, y, inf)))
    aff = dg1.to_affine(out)
    return (
        jnp.moveaxis(aff.x, -2, -1),
        jnp.moveaxis(aff.y, -2, -1),
        jnp.moveaxis(aff.inf, -2, -1),
    )


def _unpack_affine(packed: np.ndarray) -> List[Optional[Tuple[int, int]]]:
    from .ops.field import FP

    L = FP.n_limbs
    xs = FP.decode(packed[:L])
    ys = FP.decode(packed[L : 2 * L])
    infs = packed[2 * L] != 0
    return [None if infs[i] else (xs[i], ys[i]) for i in range(packed.shape[1])]
