"""Multi-chip sharding tests on the virtual 8-device CPU mesh: bit-exact
invariance of sharded vs single-chip results (SURVEY.md section 4.7).
"""

import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from jax.sharding import Mesh  # noqa: E402

from kzg_tpu.constants import R_MOD as R  # noqa: E402
from kzg_tpu.oracle.fft import fft_fr  # noqa: E402
from kzg_tpu.oracle.msm import msm as oracle_msm  # noqa: E402
from kzg_tpu.oracle.curve import G1, G1_GENERATOR  # noqa: E402
from kzg_tpu.ops import g1 as dg1  # noqa: E402
from kzg_tpu.ops import msm as dmsm  # noqa: E402
from kzg_tpu.ops.field import FR, ints_to_limbs  # noqa: E402
from kzg_tpu.parallel.sharded_fft import fft_sharded, ifft_sharded  # noqa: E402
from kzg_tpu.parallel.sharded_msm import msm_fixed_sharded, msm_sharded  # noqa: E402

rng = random.Random(31337)


def cpu_mesh(n, names=("points",), shape=None):
    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        pytest.skip("no CPU backend")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    arr = np.array(devs[:n]).reshape(shape or (n,))
    return Mesh(arr, names)


def test_fft_sharded_matches_single_chip():
    mesh = cpu_mesh(4)
    n = 1 << 10
    vals = [rng.randrange(R) for _ in range(n)]
    x = np.asarray(FR.encode(vals))
    got = FR.decode(np.asarray(fft_sharded(x, mesh)))
    assert got == fft_fr(vals)


def test_ifft_sharded_roundtrip():
    mesh = cpu_mesh(4)
    n = 1 << 8
    vals = [rng.randrange(R) for _ in range(n)]
    x = np.asarray(FR.encode(vals))
    back = FR.decode(np.asarray(ifft_sharded(np.asarray(fft_sharded(x, mesh)), mesh)))
    assert back == vals


def test_msm_sharded_matches_oracle():
    mesh = cpu_mesh(4)
    n = 32
    pts = [G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    aff = dg1.G1Aff(*(np.asarray(c) for c in dg1.affine_from_ints(pts)))
    out = msm_sharded(aff, np.asarray(ints_to_limbs(scalars, 16)), mesh)
    got = dg1.xyzz_to_ints(out)[0]
    assert got == oracle_msm(pts, scalars)


def test_msm_sharded_cpu_mesh_with_pallas_default_on(monkeypatch):
    """Regression (VERDICT r1 weak #2): with the process-default Pallas gate
    forced ON (as when a TPU is the default backend), an MSM on an explicit
    CPU mesh must still route to the jnp scan path -- the kernel gate must
    follow the mesh platform, not jax.default_backend()."""
    from kzg_tpu.ops import pallas_msm

    monkeypatch.setattr(pallas_msm, "enabled", lambda: True)
    mesh = cpu_mesh(4)
    n = 32
    pts = [G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
    scalars = [rng.randrange(R) for _ in range(n)]
    aff = dg1.G1Aff(*(np.asarray(c) for c in dg1.affine_from_ints(pts)))
    out = msm_sharded(aff, np.asarray(ints_to_limbs(scalars, 16)), mesh)
    got = dg1.xyzz_to_ints(out)[0]
    assert got == oracle_msm(pts, scalars)


def test_msm_fixed_sharded_matches_oracle():
    mesh = cpu_mesh(8, names=("blobs", "points"), shape=(2, 4))
    n, b = 16, 4
    pts = [G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
    scss = [[rng.randrange(R) for _ in range(n)] for _ in range(b)]
    # c=4 keeps integrate_buckets on its compact (<=32 buckets) path --
    # the split path costs ~2 extra minutes of XLA:CPU compile here
    table = dmsm.build_fixed_base_table(dg1.affine_from_ints(pts), c=4)
    table = dmsm.FixedBaseTable(
        np.asarray(table.x), np.asarray(table.y), np.asarray(table.inf), table.c
    )
    sc = np.stack([ints_to_limbs(s, 16) for s in scss], axis=1)
    out = msm_fixed_sharded(table, sc, mesh)
    got = dg1.xyzz_to_ints(out)
    for i in range(b):
        assert got[i] == oracle_msm(pts, scss[i])
