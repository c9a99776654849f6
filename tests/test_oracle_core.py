"""Oracle backend unit tests: field tower, curve, pairing, serialization, FFT.

Mirrors the reference's generic math suites
(/root/reference/kzg-bench/src/tests/{bls12_381,fft_fr,fft_g1,das}.rs).
"""

import random

import pytest

from kzg_tpu.constants import R_MOD as R, P_MOD as P, root_of_unity
from kzg_tpu.oracle import field as F
from kzg_tpu.oracle import fft as FT
from kzg_tpu.oracle import pairing as PR
from kzg_tpu.oracle import serialization as S
from kzg_tpu.oracle.curve import G1, G2, G1_GENERATOR, G2_GENERATOR
from kzg_tpu.oracle.msm import msm, msm_naive

rng = random.Random(1234)


def rand_fr():
    return rng.randrange(R)


def rand_g1():
    return G1.mul_scalar(G1_GENERATOR, rand_fr())


class TestFieldTower:
    def test_fp2_axioms(self):
        a = (rng.randrange(P), rng.randrange(P))
        b = (rng.randrange(P), rng.randrange(P))
        assert F.fp2_mul(a, F.fp2_inv(a)) == F.FP2_ONE
        assert F.fp2_mul(a, b) == F.fp2_mul(b, a)
        assert F.fp2_sq(a) == F.fp2_mul(a, a)

    def test_fp6_fp12_inverse(self):
        a = tuple((rng.randrange(P), rng.randrange(P)) for _ in range(3))
        assert F.fp6_mul(a, F.fp6_inv(a)) == F.FP6_ONE
        x = (a, tuple((rng.randrange(P), rng.randrange(P)) for _ in range(3)))
        assert F.fp12_mul(x, F.fp12_inv(x)) == F.FP12_ONE

    def test_frobenius_is_p_power(self):
        a = (rng.randrange(P), rng.randrange(P))
        x = ((a, F.FP2_ZERO, a), (F.FP2_ZERO, a, F.FP2_ZERO))
        assert F.fp12_frobenius(x) == F.fp12_pow(x, P)

    def test_fp2_sqrt(self):
        a = (rng.randrange(P), rng.randrange(P))
        sq = F.fp2_sq(a)
        r = F.fp2_sqrt(sq)
        assert r in (a, F.fp2_neg(a))


class TestCurve:
    def test_generator_subgroup(self):
        assert G1.in_subgroup(G1_GENERATOR)
        assert G2.in_subgroup(G2_GENERATOR)

    def test_add_commutes_and_doubles(self):
        p = rand_g1()
        q = rand_g1()
        assert G1.affine_add(p, q) == G1.affine_add(q, p)
        assert G1.affine_add(p, p) == G1.from_jacobian(
            G1.jac_double(G1.to_jacobian(p))
        )

    def test_identity_and_negation(self):
        p = rand_g1()
        assert G1.affine_add(p, None) == p
        assert G1.affine_add(p, G1.affine_neg(p)) is None

    def test_scalar_mul_matches_addition_chain(self):
        p = rand_g1()
        acc = None
        for k in range(1, 6):
            acc = G1.affine_add(acc, p)
            assert G1.mul_scalar(p, k) == acc


class TestPairing:
    def test_bilinearity(self):
        a, b = rand_fr(), rand_fr()
        e1 = PR.pairing(
            G1.mul_scalar(G1_GENERATOR, a), G2.mul_scalar(G2_GENERATOR, b)
        )
        e2 = PR.pairing(G1.mul_scalar(G1_GENERATOR, a * b % R), G2_GENERATOR)
        assert e1 == e2
        assert e1 != F.FP12_ONE

    def test_pairings_verify(self):
        a, b = rand_fr(), rand_fr()
        assert PR.pairings_verify(
            G1.mul_scalar(G1_GENERATOR, a),
            G2.mul_scalar(G2_GENERATOR, b),
            G1.mul_scalar(G1_GENERATOR, b),
            G2.mul_scalar(G2_GENERATOR, a),
        )
        assert not PR.pairings_verify(
            G1.mul_scalar(G1_GENERATOR, a),
            G2.mul_scalar(G2_GENERATOR, b),
            G1.mul_scalar(G1_GENERATOR, b + 1),
            G2.mul_scalar(G2_GENERATOR, a),
        )


class TestSerialization:
    def test_g1_roundtrip(self):
        for k in [0, 1, 7, rand_fr()]:
            p = G1.mul_scalar(G1_GENERATOR, k)
            assert S.g1_from_bytes(S.g1_to_bytes(p)) == p

    def test_g2_roundtrip(self):
        for k in [0, 1, 7]:
            q = G2.mul_scalar(G2_GENERATOR, k)
            assert S.g2_from_bytes(S.g2_to_bytes(q)) == q

    def test_invalid_rejected(self):
        with pytest.raises(ValueError):
            S.g1_from_bytes(bytes(48))  # no compressed bit
        with pytest.raises(ValueError):
            S.g1_from_bytes(bytes([0xC0, 1]) + bytes(46))  # dirty infinity
        with pytest.raises(ValueError):
            S.fr_from_bytes(R.to_bytes(32, "big"))  # non-canonical scalar

    def test_fr_roundtrip(self):
        v = rand_fr()
        assert S.fr_from_bytes(S.fr_to_bytes(v)) == v


class TestFFT:
    @pytest.mark.parametrize("n", [2, 8, 64])
    def test_matches_slow_dft(self, n):
        vals = [rand_fr() for _ in range(n)]
        assert FT.fft_fr(vals) == FT.fft_fr_slow(vals)
        assert FT.fft_fr(vals, inverse=True) == FT.fft_fr_slow(vals, inverse=True)

    def test_roundtrip(self):
        vals = [rand_fr() for _ in range(128)]
        assert FT.fft_fr(FT.fft_fr(vals), inverse=True) == vals

    def test_root_orders(self):
        for k in range(1, 12):
            w = root_of_unity(k)
            assert pow(w, 1 << k, R) == 1
            assert pow(w, 1 << (k - 1), R) != 1

    def test_fft_g1_matches_scalar_structure(self):
        # FFT over G1 of [k_i * G] equals [fft(k)_i * G]
        ks = [rand_fr() for _ in range(8)]
        pts = [G1.mul_scalar(G1_GENERATOR, k) for k in ks]
        out = FT.fft_g1(pts)
        expect = [G1.mul_scalar(G1_GENERATOR, v) for v in FT.fft_fr(ks)]
        assert out == expect

    def test_das_extension_consistency(self):
        evens = [rand_fr() for _ in range(16)]
        odds = FT.das_fft_extension(evens)
        # recombined evaluations must come from a degree<16 polynomial
        full = [None] * 32
        full[0::2] = evens
        full[1::2] = odds
        coeffs = FT.fft_fr(full, inverse=True)
        assert all(c == 0 for c in coeffs[16:])


class TestMSM:
    def test_msm_matches_naive(self):
        pts = [rand_g1() for _ in range(20)]
        scalars = [rand_fr() for _ in range(20)]
        assert msm(pts, scalars) == msm_naive(pts, scalars)

    def test_msm_zeros_and_infinity(self):
        pts = [rand_g1(), None, rand_g1()]
        scalars = [0, rand_fr(), 5]
        # pad to >= 8 points to exercise pippenger
        pts += [rand_g1() for _ in range(6)]
        scalars += [0] * 6
        assert msm(pts, scalars) == msm_naive(pts, scalars)
