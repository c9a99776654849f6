"""Differential tests: TPU/JAX limb field core vs python-int arithmetic.

(mirrors the role of kzg-bench's bls12_381 field tests,
/root/reference/kzg-bench/src/tests/bls12_381.rs:14-180)
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kzg_tpu.constants import P_MOD, R_MOD
from kzg_tpu.ops import field as fl

rng = random.Random(42)


def _cases(mod, n=32):
    xs = [rng.randrange(mod) for _ in range(n)]
    xs[0], xs[1], xs[2] = 0, 1, mod - 1
    return xs


@pytest.mark.parametrize("spec,mod", [(fl.FR, R_MOD), (fl.FP, P_MOD)], ids=["fr", "fp"])
class TestFieldOps:
    def test_encode_decode_roundtrip(self, spec, mod):
        xs = _cases(mod)
        assert spec.decode(spec.encode(xs)) == xs

    def test_add_sub_neg(self, spec, mod):
        xs, ys = _cases(mod), _cases(mod)[::-1]
        a, b = spec.encode(xs), spec.encode(ys)
        assert spec.decode(jax.jit(lambda a, b: fl.add(spec, a, b))(a, b)) == [
            (x + y) % mod for x, y in zip(xs, ys)
        ]
        assert spec.decode(jax.jit(lambda a, b: fl.sub(spec, a, b))(a, b)) == [
            (x - y) % mod for x, y in zip(xs, ys)
        ]
        assert spec.decode(jax.jit(lambda a: fl.neg(spec, a))(a)) == [
            (-x) % mod for x in xs
        ]

    def test_mont_mul(self, spec, mod):
        xs, ys = _cases(mod), _cases(mod)[::-1]
        a, b = spec.encode(xs), spec.encode(ys)
        exp = [x * y % mod for x, y in zip(xs, ys)]
        assert spec.decode(jax.jit(lambda a, b: fl.mont_mul(spec, a, b))(a, b)) == exp
        assert (
            spec.decode(jax.jit(lambda a, b: fl.mont_mul_unrolled(spec, a, b))(a, b))
            == exp
        )

    def test_mont_mul_karatsuba(self, spec, mod):
        """Karatsuba form bit-exact vs schoolbook, incl. the sign edge cases
        of the middle-term abs-difference (equal halves, 0, mod-1)."""
        rng = np.random.default_rng(11)
        xs = _cases(mod, 8) + [int.from_bytes(rng.bytes(48), "big") % mod for _ in range(24)]
        # force A1 == A0 (zero difference) and lopsided halves
        half_bits = 16 * (spec.n_limbs // 2)
        lo = (1 << half_bits) - 1
        xs += [(v << half_bits | v) % mod for v in (0, 1, lo)] + [lo, lo << half_bits]
        ys = xs[::-1]
        a, b = spec.encode([x % mod for x in xs]), spec.encode([y % mod for y in ys])
        exp = [(x % mod) * (y % mod) % mod for x, y in zip(xs, ys)]
        # no jit: XLA:CPU takes minutes to compile the unrolled graph
        got = spec.decode(fl.mont_mul_karatsuba(spec, a, b))
        assert got == exp

    def test_mul_many_stacking(self, spec, mod):
        xs, ys = _cases(mod, 8), _cases(mod, 8)[::-1]
        a, b = spec.encode(xs), spec.encode(ys)
        r1, r2 = jax.jit(lambda a, b: fl.mul_many(spec, [(a, b), (b, b)]))(a, b)
        assert spec.decode(r1) == [x * y % mod for x, y in zip(xs, ys)]
        assert spec.decode(r2) == [y * y % mod for y in ys]

    def test_inv_and_pow(self, spec, mod):
        xs = _cases(mod, 8)
        a = spec.encode(xs)
        assert spec.decode(jax.jit(lambda a: fl.inv(spec, a))(a)) == [
            pow(x, mod - 2, mod) if x else 0 for x in xs
        ]
        assert spec.decode(jax.jit(lambda a: fl.pow_fixed(spec, a, 12345))(a)) == [
            pow(x, 12345, mod) for x in xs
        ]

    def test_batch_inv(self, spec, mod):
        xs = _cases(mod, 16)
        a = spec.encode(xs)
        invs, wz = jax.jit(lambda a: fl.batch_inv(spec, a))(a)
        got = spec.decode(invs)
        for g, x, z in zip(got, xs, np.asarray(wz)):
            if x == 0:
                assert z
            else:
                assert g == pow(x, mod - 2, mod) and not z

    def test_predicates(self, spec, mod):
        xs = _cases(mod, 8)
        a = spec.encode(xs)
        z = np.asarray(jax.jit(lambda a: fl.is_zero(spec, a))(a))
        assert list(z) == [x == 0 for x in xs]
        e = np.asarray(jax.jit(lambda a, b: fl.eq(spec, a, b))(a, a))
        assert all(e)
