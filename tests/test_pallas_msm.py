"""Pallas fused scan kernel vs the jnp scan path: bit-exact equivalence."""

import random

import numpy as np
import pytest

from kzg_tpu.constants import R_MOD as R
from kzg_tpu.oracle.curve import G1, G1_GENERATOR
from kzg_tpu.oracle.msm import msm as oracle_msm
from kzg_tpu.ops import g1 as dg1
from kzg_tpu.ops import msm as dmsm
from kzg_tpu.ops import pallas_msm
from kzg_tpu.ops.field import ints_to_limbs

rng = random.Random(606)


@pytest.mark.skipif(not pallas_msm.enabled(), reason="pallas scan disabled/CPU")
def test_pallas_scan_msm_matches_oracle():
    n = 32
    pts = [
        G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R)) if rng.random() > 0.1 else None
        for _ in range(n)
    ]
    scalars = [0 if rng.random() < 0.2 else rng.randrange(R) for _ in range(n)]
    aff = dg1.affine_from_ints(pts)
    out = dmsm.msm(aff, np.asarray(ints_to_limbs(scalars, 16)))
    assert dg1.xyzz_to_ints(out)[0] == oracle_msm(pts, scalars)
