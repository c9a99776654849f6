"""Device Fr FFT vs the oracle FFT (and the O(n^2) slow DFT).

Mirrors the reference's test strategy of checking the fast FFT against the
slow DFT plus roundtrips (/root/reference/kzg-bench/src/tests/fft_fr.rs).
"""

import random

import numpy as np
import pytest

from kzg_tpu.constants import R_MOD as R
from kzg_tpu.oracle.fft import das_fft_extension, fft_fr, fft_fr_slow
from kzg_tpu.ops import fft as dfft
from kzg_tpu.ops.field import FR

rng = random.Random(1234)


def rand_frs(n):
    return [rng.randrange(R) for _ in range(n)]


@pytest.mark.parametrize("n", [4, 32, 256])
def test_fft_matches_slow_dft(n):
    vals = rand_frs(n)
    want = fft_fr_slow(vals)
    got = FR.decode(dfft.fft(FR.encode(vals)))
    assert got == want


@pytest.mark.parametrize("n", [16, 128])
def test_ifft_matches_oracle(n):
    vals = rand_frs(n)
    want = fft_fr(vals, inverse=True)
    got = FR.decode(dfft.ifft(FR.encode(vals)))
    assert got == want


def test_roundtrip_4096():
    vals = rand_frs(4096)
    x = FR.encode(vals)
    back = FR.decode(dfft.ifft(dfft.fft(x)))
    assert back == vals


def test_batched_fft():
    n, b = 64, 3
    batches = [rand_frs(n) for _ in range(b)]
    x = np.stack([np.asarray(FR.encode(v)) for v in batches], axis=1)  # (L,B,n)
    out = dfft.fft(np.asarray(x))
    for i in range(b):
        assert FR.decode(out[:, i, :]) == fft_fr(batches[i])


def test_scan_form_matches_staged():
    """The compact (lax.scan) stage form used inside big fused kernels is
    bit-exact vs the unrolled-stage form, forward and inverse."""
    import jax.numpy as jnp
    import numpy as np

    from kzg_tpu.constants import R_MOD as R
    from kzg_tpu.ops import fft as F
    from kzg_tpu.ops.field import FR

    rng = np.random.RandomState(5)
    vals = FR.encode([int(x) % R for x in rng.randint(0, 2**62, 256)])
    for inverse in (False, True):
        a = np.asarray(F._fft_jit(vals, inverse, False, False, False))
        b = np.asarray(F._fft_jit(vals, inverse, False, True, False))
        assert (a == b).all()


def test_das_extension_matches_oracle():
    n = 128
    evens = rand_frs(n)
    want = das_fft_extension(evens)
    got = FR.decode(dfft.das_extension(FR.encode(evens)))
    assert got == want
