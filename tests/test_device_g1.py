"""Differential tests: batched XYZZ G1 ops vs the oracle curve.

(mirrors /root/reference/kzg-bench/src/tests/bls12_381.rs:184-405)
"""

import random

import jax
import jax.numpy as jnp
import pytest

from kzg_tpu.constants import R_MOD
from kzg_tpu.ops import field as fl
from kzg_tpu.ops import g1 as g
from kzg_tpu.oracle.curve import G1 as OG1, G1_GENERATOR
from kzg_tpu.oracle.msm import msm_naive

rng = random.Random(99)
B = 12


@pytest.fixture(scope="module")
def pts():
    pts = [OG1.mul_scalar(G1_GENERATOR, rng.randrange(R_MOD)) for _ in range(B)]
    pts[3] = None  # infinity in batch
    return pts


@pytest.fixture(scope="module")
def qts(pts):
    q = [OG1.mul_scalar(G1_GENERATOR, rng.randrange(R_MOD)) for _ in range(B)]
    q[0] = pts[0]  # equal -> doubling path
    q[1] = OG1.affine_neg(pts[1])  # negation -> infinity
    q[2] = None  # infinity operand
    return q


def test_affine_roundtrip(pts):
    a = g.affine_from_ints(pts)
    back = g.affine_to_ints(jax.jit(g.to_affine)(g.from_affine(a)))
    assert back == pts


def test_dbl(pts):
    p = g.from_affine(g.affine_from_ints(pts))
    got = g.affine_to_ints(jax.jit(lambda p: g.to_affine(g.dbl(p)))(p))
    assert got == [OG1.affine_add(q, q) if q else None for q in pts]


def test_add_unified_all_cases(pts, qts):
    p = g.from_affine(g.affine_from_ints(pts))
    q = g.from_affine(g.affine_from_ints(qts))
    got = g.affine_to_ints(jax.jit(lambda p, q: g.to_affine(g.add_unified(p, q)))(p, q))
    assert got == [OG1.affine_add(x, y) for x, y in zip(pts, qts)]


def test_madd_unified_all_cases(pts, qts):
    p = g.from_affine(g.affine_from_ints(pts))
    aq = g.affine_from_ints(qts)
    got = g.affine_to_ints(jax.jit(lambda p, q: g.to_affine(g.madd_unified(p, q)))(p, aq))
    assert got == [OG1.affine_add(x, y) for x, y in zip(pts, qts)]


def test_scalar_mul_and_msm_ladder(pts):
    a = g.affine_from_ints(pts)
    sc = [rng.randrange(R_MOD) for _ in range(B)]
    sc[5] = 0
    limbs = jnp.asarray(fl.ints_to_limbs(sc, 16))
    got = g.affine_to_ints(jax.jit(lambda a, l: g.to_affine(g.scalar_mul(a, l)))(a, limbs))
    assert got == [OG1.mul_scalar(x, k) for x, k in zip(pts, sc)]

    total = g.affine_to_ints(
        jax.jit(lambda a, l: g.to_affine(g.msm_ladder(a, l)))(a, limbs)
    )
    assert total == [msm_naive(pts, sc)]


def test_tree_reduce_unroll_matches_loop(pts):
    p = g.from_affine(g.affine_from_ints(pts))
    r1 = g.affine_to_ints(jax.jit(lambda p: g.to_affine(g.tree_reduce(p, unroll=True)))(p))
    r2 = g.affine_to_ints(jax.jit(lambda p: g.to_affine(g.tree_reduce(p)))(p))
    expected = None
    for q in pts:
        expected = OG1.affine_add(expected, q)
    assert r1 == [expected] and r2 == [expected]
