"""Pallas FFT kernel vs the XLA FFT path (bit-exact).

On non-TPU hosts the kernel runs in interpreter mode
(KZG_TPU_PALLAS_INTERPRET=1 below); the unrolled limb graphs take XLA:CPU
minutes to compile the FIRST time, then hit the persistent cache, so the
size matrix is kept minimal: one AB-only size, one with the tile kernel,
one inverse (exercises the 1/n in-kernel scale), one batched."""

import os

import numpy as np
import pytest

os.environ.setdefault("KZG_TPU_PALLAS_INTERPRET", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kzg_tpu.constants import R_MOD as R  # noqa: E402
from kzg_tpu.ops import fft as dfft  # noqa: E402
from kzg_tpu.ops import pallas_fft  # noqa: E402
from kzg_tpu.ops.field import FR  # noqa: E402


def _rand_fr(n, seed=0):
    rng = np.random.default_rng(seed)
    return [int.from_bytes(rng.bytes(32), "big") % R for _ in range(n)]


@pytest.mark.parametrize(
    "log_n,inverse",
    # log_n=15 is the production blob-FFT size (tb=4): exercises kernel C's
    # multi-tile per-stage tiling and the full VMEM footprint
    [(8, False), (13, False), (12, True), (15, False)],
)
def test_matches_xla_fft(log_n, inverse):
    n = 1 << log_n
    vals = _rand_fr(n, seed=log_n)
    x = FR.encode(vals)
    want = np.asarray(dfft.fft(x, inverse=inverse))
    got = np.asarray(
        jax.jit(lambda a: pallas_fft.fft_pallas(a, inverse=inverse))(x)
    )
    np.testing.assert_array_equal(got, want)


def test_batched_bpt_packing():
    # n=128: 16 batch elements pack into the sublane rows of each program,
    # batch 3 exercises the pad-to-BPT path
    n = 1 << 7
    cols = [FR.encode(_rand_fr(n, seed=s)) for s in range(3)]
    x = jnp.stack(cols, axis=1)  # (L, 3, n)
    want = np.asarray(dfft.fft(x))
    got = np.asarray(jax.jit(pallas_fft.fft_pallas)(x))
    np.testing.assert_array_equal(got, want)
