"""Pallas TPU kernels for the field hot loop.

The jnp limb path (ops/field.py) leaves fusion to XLA; these kernels pin
the whole Montgomery product -- schoolbook columns, radix-2^16 reduction,
carry chain, conditional subtract -- in one VMEM-resident kernel so the
(2L+1)-row column accumulator never touches HBM. Layout: (L, N) uint32 with
N on the lane axis, tiled 512 lanes per program.

Enabled on TPU backends (env KZG_TPU_PALLAS=0 to disable); the jnp path is
the fallback everywhere else.
"""

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from . import field as fl
from .field import FieldSpec

_LANES = 512


def _mont_mul_kernel(spec: FieldSpec):
    L = spec.n_limbs
    n0 = int(spec.n0_inv)
    m = spec.mod_limb_ints

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        # schoolbook columns in registers (unrolled; every value < 2^32)
        cols = [jnp.zeros_like(a[0])] * (2 * L + 1)
        for i in range(L):
            ai = a[i]
            for j in range(L):
                p = ai * b[j]
                cols[i + j] = cols[i + j] + (p & 0xFFFF)
                cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
        # Montgomery reduction, one limb per step
        for k in range(L):
            mk = (cols[k] * n0) & 0xFFFF
            for j in range(L):
                t = mk * m[j]
                cols[k + j] = cols[k + j] + (t & 0xFFFF)
                cols[k + j + 1] = cols[k + j + 1] + (t >> 16)
            cols[k + 1] = cols[k + 1] + (cols[k] >> 16)
        # carry propagation over the upper limbs
        out = []
        carry = jnp.zeros_like(cols[0])
        for k in range(L):
            t = cols[L + k] + carry
            out.append(t & 0xFFFF)
            carry = t >> 16
        top = cols[2 * L] + carry
        # conditional subtract of the modulus
        borrow = jnp.zeros_like(top)
        diff = []
        for k in range(L):
            t = out[k] + (0x10000 - m[k]) - borrow
            diff.append(t & 0xFFFF)
            borrow = 1 - (t >> 16)
        ge = jnp.logical_or(borrow == 0, top != 0)
        for k in range(L):
            o_ref[k] = jnp.where(ge, diff[k], out[k])

    return kernel


@lru_cache(maxsize=None)
def _mont_mul_call(spec_name: str, n_limbs: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = fl.FR if spec_name == "Fr" else fl.FP
    kernel = _mont_mul_kernel(spec)

    @jax.jit
    def call(a, b):
        n = a.shape[-1]
        grid = n // _LANES
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((n_limbs, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_limbs, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (n_limbs, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        )(a, b)

    return call


def mont_mul_pallas(spec: FieldSpec, a, b) -> jnp.ndarray:
    """Montgomery product via the Pallas kernel; operands any batch shape,
    broadcast, flattened to (L, N) and padded to the lane tile."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    L = spec.n_limbs
    a = jnp.broadcast_to(a, (L,) + batch).reshape(L, -1)
    b = jnp.broadcast_to(b, (L,) + batch).reshape(L, -1)
    n = a.shape[-1]
    npad = (-n) % _LANES
    if npad:
        a = jnp.pad(a, ((0, 0), (0, npad)))
        b = jnp.pad(b, ((0, 0), (0, npad)))
    out = _mont_mul_call(spec.name, L)(a, b)
    if npad:
        out = out[:, :n]
    return out.reshape((L,) + batch)


def enabled() -> bool:
    if os.environ.get("KZG_TPU_PALLAS", "") == "0":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
