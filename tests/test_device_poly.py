"""Device polynomial machinery vs the oracle (parity:
/root/reference/kzg-bench/src/tests/poly.rs -- random mul/div/inverse
cross-checks, incl. the long-vs-fast division agreement test)."""

import random

import numpy as np
import pytest

from kzg_tpu.constants import R_MOD as R
from kzg_tpu.oracle import poly as opoly
from kzg_tpu.oracle.das import compute_vanishing_polynomial_from_roots
from kzg_tpu.ops import poly as dpoly
from kzg_tpu.ops.fft import fr_from_ints, fr_to_ints

rng = random.Random(7594)


def rand_poly(n, monic=False):
    c = [rng.randrange(R) for _ in range(n)]
    if monic:
        c[-1] = 1 + rng.randrange(R - 1)
    return c


def test_poly_mul_fft_matches_oracle():
    a = rand_poly(37)
    b = rand_poly(91)
    out = fr_to_ints(dpoly.poly_mul_fft_jit(fr_from_ints(a), fr_from_ints(b), 127))
    assert out == opoly.poly_mul_fft(a, b, 127)


def test_poly_inverse_matches_oracle():
    a = rand_poly(64)
    a[0] |= 1  # nonzero constant term
    out = fr_to_ints(dpoly.poly_inverse_jit(fr_from_ints(a), 64))
    assert out == opoly.poly_inverse(a, 64)


def test_fast_div_matches_long_div():
    num = rand_poly(200)
    den = rand_poly(67, monic=True)
    q = fr_to_ints(dpoly.poly_fast_div_jit(fr_from_ints(num), fr_from_ints(den)))
    assert q == opoly.poly_long_div(num, den)
    assert q == opoly.poly_fast_div(num, den)


def test_fast_div_exact_product():
    qref = rand_poly(50)
    den = rand_poly(30, monic=True)
    num = opoly.poly_mul(den, qref, 79)
    q = fr_to_ints(dpoly.poly_fast_div_jit(fr_from_ints(num), fr_from_ints(den)))
    assert q == qref


def test_poly_eval_matches_oracle():
    c = rand_poly(100)
    x = rng.randrange(R)
    out = fr_to_ints(dpoly.poly_eval_jit(fr_from_ints(c), fr_from_ints([x])))
    assert out[0] == opoly.poly_eval(c, x)


@pytest.mark.parametrize("n_roots", [1, 5, 12])
def test_vanishing_poly_matches_oracle(n_roots):
    m = 16
    roots = [rng.randrange(1, R) for _ in range(n_roots)]
    valid = np.zeros(m, bool)
    valid[:n_roots] = True
    padded = roots + [0] * (m - n_roots)
    out = fr_to_ints(
        dpoly.vanishing_poly_jit(fr_from_ints(padded), np.asarray(valid))
    )
    ref = compute_vanishing_polynomial_from_roots(roots)
    assert out[: len(ref)] == ref
    assert all(v == 0 for v in out[len(ref) :])
