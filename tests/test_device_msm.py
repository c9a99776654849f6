"""Device Pippenger MSM vs the oracle MSM, including the zero/infinity edge
cases the reference fuzzes (/root/reference/fuzz/fuzz_targets/*.rs).
"""

import random

import numpy as np
import pytest

from kzg_tpu.constants import R_MOD as R
from kzg_tpu.oracle.curve import G1, G1_GENERATOR
from kzg_tpu.oracle.msm import msm as oracle_msm
from kzg_tpu.ops import g1 as dg1
from kzg_tpu.ops import msm as dmsm
from kzg_tpu.ops.field import ints_to_limbs

rng = random.Random(99)


def rand_points(n, with_inf=False):
    pts = []
    for i in range(n):
        if with_inf and rng.random() < 0.2:
            pts.append(None)
        else:
            pts.append(G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R)))
    return pts


def scalars_device(scalars):
    return np.asarray(ints_to_limbs(scalars, 16))


def run_device_msm(points, scalars, **kw):
    aff = dg1.affine_from_ints(points)
    out = dmsm.msm(aff, scalars_device(scalars), **kw)
    return dg1.xyzz_to_ints(out)[0]


@pytest.mark.parametrize("n", [2, 7, 64])
def test_msm_matches_oracle(n):
    pts = rand_points(n)
    scalars = [rng.randrange(R) for _ in range(n)]
    assert run_device_msm(pts, scalars) == oracle_msm(pts, scalars)


def test_msm_zeros_and_infinities():
    n = 32
    pts = rand_points(n, with_inf=True)
    scalars = [0 if rng.random() < 0.3 else rng.randrange(R) for _ in range(n)]
    assert run_device_msm(pts, scalars) == oracle_msm(pts, scalars)


def test_msm_all_zero():
    n = 8
    pts = rand_points(n)
    assert run_device_msm(pts, [0] * n) is None


def test_msm_batched():
    n, b = 16, 3
    ptss = [rand_points(n) for _ in range(b)]
    scss = [[rng.randrange(R) for _ in range(n)] for _ in range(b)]
    xs = np.stack([np.asarray(dg1.affine_from_ints(p).x) for p in ptss], axis=1)
    ys = np.stack([np.asarray(dg1.affine_from_ints(p).y) for p in ptss], axis=1)
    infs = np.stack([np.asarray(dg1.affine_from_ints(p).inf) for p in ptss], axis=0)
    sc = np.stack([scalars_device(s) for s in scss], axis=1)
    out = dmsm.msm(dg1.G1Aff(xs, ys, infs), sc)
    got = dg1.xyzz_to_ints(out)
    for i in range(b):
        assert got[i] == oracle_msm(ptss[i], scss[i])


@pytest.mark.parametrize("n", [16, 64])
def test_msm_fixed_base(n):
    pts = rand_points(n)
    table = dmsm.build_fixed_base_table(dg1.affine_from_ints(pts), c=8)
    scalars = [rng.randrange(R) for _ in range(n)]
    out = dmsm.msm_fixed(table, scalars_device(scalars))
    assert dg1.xyzz_to_ints(out)[0] == oracle_msm(pts, scalars)


def test_msm_fixed_base_batched():
    n, b = 16, 2
    pts = rand_points(n)
    table = dmsm.build_fixed_base_table(dg1.affine_from_ints(pts), c=9)
    scss = [[rng.randrange(R) for _ in range(n)] for _ in range(b)]
    sc = np.stack([scalars_device(s) for s in scss], axis=1)
    out = dmsm.msm_fixed(table, sc)
    got = dg1.xyzz_to_ints(out)
    for i in range(b):
        assert got[i] == oracle_msm(pts, scss[i])


def test_signed_digits_reconstruct():
    c = 13
    scalars = [rng.randrange(R) for _ in range(5)] + [0, 1, R - 1]
    d = np.asarray(dmsm.signed_digits(scalars_device(scalars), c)).astype(object)
    for i, s in enumerate(scalars):
        v = sum(int(d[j, i]) << (c * j) for j in range(d.shape[0]))
        assert v == s
