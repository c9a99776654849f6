"""Device multi-point KZG openings (coset proofs).

Role parity: the reference's KZGSettings::{compute_proof_multi,
check_proof_multi} (/root/reference/blst/src/types/kzg_settings.rs:198-277)
-- an opening of a monomial-form polynomial on the size-n coset x * <w_n>,
proved with the single quotient q = p / (X^n - x^n).

TPU-first design differences:
- the quotient comes from `ops/poly.poly_fast_div` (flip + Newton power
  series inverse + FFT multiply -- log-depth batched device ops) instead of
  the reference's sequential sparse long division;
- the verifier's coset interpolation is the device iFFT + a fused unscale
  multiply, and its commitment rides the precomputed monomial fixed-base
  table (sliced to the first n columns);
- the pairing check is rearranged as
      e(C - I + x^n * proof, H) == e(proof, [s^n]_2)
  so the one variable scalar lands on the (cheap, host-native) G1 side and
  both G2 arguments are fixed setup points -- same rearrangement as
  eip4844._check_proof_single.

Differentially tested against oracle.kzg.KZGSettingsOracle.{compute,check}_
proof_multi in tests/test_device_multiproof.py.
"""

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .constants import R_MOD as R
from . import native
from .oracle.curve import G1, G2_GENERATOR, G1_GENERATOR
from .ops import field as fl
from .ops import g1 as dg1
from .ops import msm as dmsm
from .ops import poly as dpoly
from .ops.fft import ifft as difft
from .ops.field import FR
from .settings import DeviceKZGSettings

L = FR.n_limbs


@partial(jax.jit, static_argnames=("c",))
def _proof_multi_kernel(num_m, den_m, tab_x, tab_y, tab_inf, c):
    """q = p / (X^n - x^n) then commit q on the monomial base, one device
    program returning the affine proof point."""
    with fl.maybe_unrolled(fl.unroll_default()):
        q = dpoly.poly_fast_div(num_m, den_m)  # (L, 1, len(p) - n)
        q_can = fl.to_canonical(FR, q)[:, 0, :]
    pad = tab_x.shape[-1] - q_can.shape[-1]
    if pad > 0:  # zero scalars contribute the identity
        q_can = jnp.pad(q_can, [(0, 0), (0, pad)])
    table = dmsm.FixedBaseTable(tab_x, tab_y, tab_inf, c)
    return dg1.to_affine(dmsm.msm_fixed_core(table, q_can))


@partial(jax.jit, static_argnames=("c",))
def _interp_commit_kernel(ys_m, xinv_pows_m, tab_x, tab_y, tab_inf, c):
    """Coset interpolation I = commit(unscale(ifft(ys))) as one device
    program (parity: check_proof_multi interpolation,
    kzg_settings.rs:236-277)."""
    with fl.maybe_unrolled(fl.unroll_default()):
        coeffs = difft(ys_m)  # (L, 1, n)
        unscaled = fl.mont_mul(FR, coeffs, xinv_pows_m)
        sc = fl.to_canonical(FR, unscaled)[:, 0, :]
    table = dmsm.FixedBaseTable(tab_x, tab_y, tab_inf, c)
    return dg1.to_affine(dmsm.msm_fixed_core(table, sc))


def compute_kzg_proof_multi(
    poly_coeffs: Sequence[int], x: int, n: int, s: DeviceKZGSettings
) -> bytes:
    """Proof that p agrees with its evaluations on the coset x * <w_n>.

    poly_coeffs: monomial coefficients (canonical ints, len 4096 typical);
    n: coset size (power of two). Returns the compressed 48-byte proof.
    """
    p_len = len(poly_coeffs)
    if n <= 0 or n & (n - 1):
        raise ValueError("compute_kzg_proof_multi: n must be a power of two")
    if p_len < n + 1:
        raise ValueError("compute_kzg_proof_multi: polynomial too short")
    x_pow_n = pow(x % R, n, R)
    num = fl.ints_to_limbs([c % R for c in poly_coeffs], L)[:, None, :]
    den_ints = [0] * (n + 1)
    den_ints[0] = (R - x_pow_n) % R
    den_ints[n] = 1
    den = fl.ints_to_limbs(den_ints, L)[:, None, :]
    t = s.monomial_table
    if p_len - n > t.n:
        raise ValueError("compute_kzg_proof_multi: quotient exceeds setup")
    aff = _proof_multi_kernel(
        fl.from_canonical_jit(FR, jnp.asarray(num)),
        fl.from_canonical_jit(FR, jnp.asarray(den)),
        t.x,
        t.y,
        t.inf,
        t.c,
    )
    return native.g1_compress_batch(dg1.affine_to_ints(aff))[0]


def verify_kzg_proof_multi(
    commitment_bytes: bytes,
    proof_bytes: bytes,
    x: int,
    ys: Sequence[int],
    s: DeviceKZGSettings,
) -> bool:
    """Check an n-point coset opening: interpolate ys over x * <w_n> on
    device, then e(C - I + x^n*proof, H) == e(proof, [s^n]_2) on the host.
    """
    n = len(ys)
    if n <= 0 or n & (n - 1):
        raise ValueError("verify_kzg_proof_multi: len(ys) must be a power of two")
    if n >= len(s.oracle.g2_monomial):
        raise ValueError("verify_kzg_proof_multi: not enough G2 setup points")
    commitment, proof = native.g1_decompress_batch(commitment_bytes + proof_bytes)
    x = x % R
    xinv = pow(x, R - 2, R)
    r_mont = 1 << (16 * L)
    xinv_pows = fl.ints_to_limbs(
        [pow(xinv, i, R) * r_mont % R for i in range(n)], L
    )[:, None, :]
    ys_m = fl.from_canonical_jit(
        FR, jnp.asarray(fl.ints_to_limbs([y % R for y in ys], L)[:, None, :])
    )
    t = s.monomial_table
    aff = _interp_commit_kernel(
        ys_m,
        jnp.asarray(xinv_pows),
        t.x[..., :n],
        t.y[..., :n],
        t.inf[..., :n],
        t.c,
    )
    interp = dg1.affine_to_ints(aff)[0]
    # e(C - I + x^n*proof, H) == e(proof, [s^n]_2)
    x_pow = pow(x, n, R)
    lhs = native.g1_add(
        native.g1_add(commitment, G1.affine_neg(interp)),
        native.g1_mul(proof, x_pow),
    )
    return native.pairings_verify(lhs, G2_GENERATOR, proof, s.oracle.g2_monomial[n])
