"""Differential fuzzing: device MSM / FFT vs the oracle on randomized
inputs, including the zero/infinity-heavy cases.

Mirrors the reference's fuzz targets (/root/reference/fuzz/fuzz_targets/
{fixed_msm,fixed_msm_with_zeros,variable_msm}.rs) as seeded pytest cases;
NPOW/SEED env override like fuzz/src/lib.rs:27-40.
"""

import os
import random

import numpy as np
import pytest

from kzg_tpu.constants import R_MOD as R
from kzg_tpu.oracle.curve import G1, G1_GENERATOR
from kzg_tpu.oracle.fft import fft_fr
from kzg_tpu.oracle.msm import msm as oracle_msm
from kzg_tpu.ops import fft as dfft
from kzg_tpu.ops import g1 as dg1
from kzg_tpu.ops import msm as dmsm
from kzg_tpu.ops.field import FR, ints_to_limbs

NPOW = int(os.environ.get("NPOW", "5"))
SEED = int(os.environ.get("SEED", "20260816"))
rng = random.Random(SEED)


def rand_points(n, p_inf=0.0):
    return [
        None
        if rng.random() < p_inf
        else G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R))
        for _ in range(n)
    ]


def scalar_mix(n):
    """Adversarial scalar mix: zeros, ones, r-1, tiny, full-range."""
    pool = [0, 1, 2, R - 1, R - 2, 1 << 128, (1 << 255) % R]
    return [
        pool[rng.randrange(len(pool))] if rng.random() < 0.4 else rng.randrange(R)
        for _ in range(n)
    ]


@pytest.mark.parametrize("trial", range(3))
def test_variable_msm_fuzz(trial):
    n = 1 << NPOW
    pts = rand_points(n, p_inf=0.15)
    scalars = scalar_mix(n)
    aff = dg1.affine_from_ints(pts)
    out = dmsm.msm(aff, np.asarray(ints_to_limbs(scalars, 16)))
    assert dg1.xyzz_to_ints(out)[0] == oracle_msm(pts, scalars)


@pytest.mark.parametrize("trial", range(2))
def test_fixed_msm_fuzz(trial):
    n = 1 << NPOW
    pts = rand_points(n)
    table = dmsm.build_fixed_base_table(dg1.affine_from_ints(pts), c=9)
    scalars = scalar_mix(n)
    out = dmsm.msm_fixed(table, np.asarray(ints_to_limbs(scalars, 16)))
    assert dg1.xyzz_to_ints(out)[0] == oracle_msm(pts, scalars)


def test_fft_fuzz():
    n = 1 << (NPOW + 3)
    vals = scalar_mix(n)
    got = FR.decode(dfft.fft(FR.encode(vals)))
    assert got == fft_fr(vals)
