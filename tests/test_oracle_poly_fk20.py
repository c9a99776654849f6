"""Oracle tests for poly arithmetic, zero poly, legacy recovery, and legacy
FK20 single/multi (mirrors /root/reference/kzg-bench/src/tests/{poly,
zero_poly,recover,fk20_proofs}.rs at reduced sizes).
"""

import random

import pytest

from kzg_tpu.constants import R_MOD as R
from kzg_tpu.oracle import poly as P
from kzg_tpu.oracle.fft import fft_fr, reverse_bit_order
from kzg_tpu.oracle.fk20 import FK20MultiSettingsOracle, FK20SingleSettingsOracle
from kzg_tpu.oracle.kzg import FFTSettingsOracle, settings_from_secret
from kzg_tpu.oracle.recovery import recover_poly_from_samples
from kzg_tpu.oracle.zero_poly import zero_poly_via_multiplication

rng = random.Random(42)


def rand_poly(n):
    return [rng.randrange(R) for _ in range(n)]


# ---------------------------------------------------------------------------
# poly (parity: kzg-bench tests/poly.rs)
# ---------------------------------------------------------------------------


def test_poly_eval():
    coeffs = [1, 2, 3]
    x = 5
    assert P.poly_eval(coeffs, x) == (1 + 2 * 5 + 3 * 25) % R


def test_poly_mul_direct_vs_fft():
    a = rand_poly(70)
    b = rand_poly(80)
    out_len = 149
    assert P.poly_mul_direct(a, b, out_len) == P.poly_mul_fft(a, b, out_len)


def test_poly_div_long_vs_fast_random():
    """(parity: poly.rs random cross-check of long vs fast division)"""
    for _ in range(3):
        dlen = rng.randrange(2, 140)
        nlen = dlen + rng.randrange(0, 50)
        den = rand_poly(dlen)
        den[-1] = den[-1] or 1
        num = rand_poly(nlen)
        assert P.poly_long_div(num, den) == P.poly_fast_div(num, den)


def test_poly_div_exact():
    a = rand_poly(17)
    b = rand_poly(9)
    a[-1] = a[-1] or 1
    b[-1] = b[-1] or 1
    prod = P.poly_mul_direct(a, b, len(a) + len(b) - 1)
    assert P.poly_div(prod, a) == b
    assert P.poly_div(prod, b) == a


def test_poly_inverse():
    a = rand_poly(32)
    a[0] = a[0] or 1
    inv = P.poly_inverse(a, 32)
    prod = P.poly_mul_direct(a, inv, 32)
    assert prod[0] == 1 and all(c == 0 for c in prod[1:])


# ---------------------------------------------------------------------------
# zero poly (parity: kzg-bench tests/zero_poly.rs)
# ---------------------------------------------------------------------------


def test_zero_poly_known_answer_small():
    fs = FFTSettingsOracle.new(4)
    missing = [1, 5, 7, 11]
    zero_eval, zero_poly = zero_poly_via_multiplication(fs, 16, missing)
    for i in range(16):
        expected_zero = i in missing
        assert (zero_eval[i] == 0) == expected_zero
    # poly really vanishes on the missing roots
    for i in missing:
        assert P.poly_eval(zero_poly, fs.roots_of_unity[i]) == 0


def test_zero_poly_252_of_256():
    """(parity: zero_poly.rs test with 252 of 256 missing -- exercises the
    partial-reduction path since 252 > 255 is false... use 300+ on 512)"""
    fs = FFTSettingsOracle.new(9)
    missing = [i for i in range(512) if i % 4 != 0][:300]
    zero_eval, zero_poly = zero_poly_via_multiplication(fs, 512, missing)
    for i in missing:
        assert zero_eval[i] == 0
    present = [i for i in range(512) if i not in set(missing)]
    for i in present[:10]:
        assert zero_eval[i] != 0


# ---------------------------------------------------------------------------
# recovery (parity: kzg-bench tests/recover.rs)
# ---------------------------------------------------------------------------


def test_recover_simple_and_random():
    fs = FFTSettingsOracle.new(6)
    n = 64
    # degree < n/2: the erasure-code redundancy that makes <= n/2 holes
    # recoverable (parity: kzg-bench tests/recover.rs zero-padded polys)
    data = rand_poly(n // 2) + [0] * (n // 2)
    evals = fft_fr(data)
    samples = list(evals)
    holes = rng.sample(range(n), n // 2)
    for h in holes:
        samples[h] = None
    recovered = recover_poly_from_samples(samples, fs)
    assert recovered == [v % R for v in evals]


def test_recover_too_many_missing():
    fs = FFTSettingsOracle.new(4)
    samples = [1] * 7 + [None] * 9
    with pytest.raises(ValueError):
        recover_poly_from_samples(samples, fs)


# ---------------------------------------------------------------------------
# FK20 legacy (parity: kzg-bench tests/fk20_proofs.rs fk_single / fk_multi)
# ---------------------------------------------------------------------------


def test_fk20_single():
    coeffs = [1, 2, 3, 4, 7, 7, 7, 7, 13, 13, 13, 13, 13, 13, 13, 13]
    poly_len = len(coeffs)
    n = 5
    s = settings_from_secret(1 << n, 1927409816240961209460912649124, n)
    fk = FK20SingleSettingsOracle(s, 2 * poly_len)
    commitment = s.commit_to_poly_monomial(coeffs)
    all_proofs = fk.data_availability(coeffs)
    from kzg_tpu.oracle.das import reverse_bits_limited

    for i in range(2 * poly_len):
        x = s.fft.roots_of_unity[i]
        y = P.poly_eval(coeffs, x)
        proof = all_proofs[reverse_bits_limited(2 * poly_len, i)]
        assert s.check_proof_single(commitment, proof, x, y), i


def test_fk20_multi_chunk():
    """(parity: fk_multi_case, kzg-bench tests/fk20_proofs.rs:160-262)"""
    n = 16
    chunk_len = 4
    chunk_count = n // chunk_len
    scale = (2 * n).bit_length() - 1
    s = settings_from_secret(2 * n, 1927409816240961209460912649124, scale)
    coeffs = rand_poly(n)
    fk = FK20MultiSettingsOracle(s, 2 * n, chunk_len)
    commitment = s.commit_to_poly_monomial(coeffs)
    all_proofs = fk.data_availability(coeffs)

    extended_fft = reverse_bit_order(fft_fr(coeffs + [0] * n))
    from kzg_tpu.oracle.das import reverse_bits_limited

    domain_stride = s.fft.max_width // (2 * n)
    for pos in range(2 * chunk_count):
        domain_pos = reverse_bits_limited(2 * chunk_count, pos)
        x = s.fft.roots_of_unity[domain_pos * domain_stride]
        ys = reverse_bit_order(
            extended_fft[chunk_len * pos : chunk_len * (pos + 1)]
        )
        assert s.check_proof_multi(commitment, all_proofs[pos], x, ys, chunk_len), pos
