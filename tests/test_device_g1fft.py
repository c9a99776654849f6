"""Device G1 FFT vs the oracle, forward and inverse, with identity points
(mirrors /root/reference/kzg-bench/src/tests/fft_g1.rs)."""

import random

import jax
import pytest

from kzg_tpu.constants import R_MOD as R
from kzg_tpu.oracle.curve import G1, G1_GENERATOR
from kzg_tpu.oracle.fft import fft_g1 as oracle_fft_g1
from kzg_tpu.ops import g1 as dg1
from kzg_tpu.ops.g1fft import fft_g1 as device_fft_g1, _signed_digits_host

rng = random.Random(2024)


@pytest.mark.parametrize("inverse", [False, True])
def test_fft_g1_matches_oracle(inverse):
    n = 8
    pts = [
        G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R)) if rng.random() > 0.15 else None
        for _ in range(n)
    ]
    p = dg1.from_affine(dg1.affine_from_ints(pts))
    out = jax.jit(device_fft_g1, static_argnames=("inverse",))(p, inverse=inverse)
    assert dg1.xyzz_to_ints(out) == oracle_fft_g1(pts, inverse=inverse)


def test_fft_g1_roundtrip():
    n = 8
    pts = [G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
    p = dg1.from_affine(dg1.affine_from_ints(pts))
    roundtrip = jax.jit(lambda q: device_fft_g1(device_fft_g1(q), inverse=True))
    assert dg1.xyzz_to_ints(roundtrip(p)) == pts


def test_fft_g1_standalone_matches_oracle():
    """The jitted large-n entry point (fft_g1_standalone) is bit-exact vs
    the oracle at n=16 (the 2^12-2^15 bench path, BASELINE.md fft_g1)."""
    from kzg_tpu.ops.g1fft import fft_g1_standalone

    n = 16
    pts = [G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
    p = dg1.from_affine(dg1.affine_from_ints(pts))
    out = fft_g1_standalone(p)
    assert dg1.xyzz_to_ints(out) == oracle_fft_g1(pts)


def test_signed_digit_host_encoding_exact():
    """Regression: the top-window carry must never be dropped (the c=5
    encoding loses 2^255 for ~45% of scalars with ceil(255/c) windows)."""
    for v in [0, 1, R - 1, R - 2, 17 << 250, (1 << 255) - 1 - ((1 << 255) - R)]:
        for c in (4, 5, 6, 8):
            d = _signed_digits_host(v % R, c)
            assert sum(x << (c * j) for j, x in enumerate(d)) == v % R
