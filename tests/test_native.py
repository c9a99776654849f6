"""Differential tests: native C++ core vs the pure-Python oracle.

Mirrors the reference's differential-fuzzing discipline
(/root/reference/fuzz/src/lib.rs) at the unit level.
"""

import hashlib
import random

import pytest

from kzg_tpu import native
from kzg_tpu.constants import R_MOD as R
from kzg_tpu.oracle import serialization as ser
from kzg_tpu.oracle.curve import G1, G2, G1_GENERATOR, G2_GENERATOR
from kzg_tpu.oracle.pairing import pairings_verify as oracle_pv

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (native/build.sh)"
)

rng = random.Random(77)


def rand_g1(allow_inf=False):
    if allow_inf and rng.random() < 0.2:
        return None
    return G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R))


def test_sha256():
    for n in [0, 1, 55, 56, 63, 64, 65, 1000, 131072]:
        data = bytes(rng.randrange(256) for _ in range(min(n, 2048))) * (
            1 if n <= 2048 else n // 2048
        )
        data = data[:n] if len(data) >= n else data + bytes(n - len(data))
        assert native.sha256(data) == hashlib.sha256(data).digest()


def test_g1_roundtrip():
    pts = [rand_g1(allow_inf=True) for _ in range(16)]
    compressed = b"".join(ser.g1_to_bytes(p) for p in pts)
    got = native.g1_decompress_batch(compressed)
    assert got == pts
    back = native.g1_compress_batch(pts)
    assert b"".join(back) == compressed


def test_g1_rejects_bad():
    good = ser.g1_to_bytes(rand_g1())
    bad_cases = [
        bytes(48),  # no compressed flag
        bytes([0xC0]) + bytes(46) + b"\x01",  # malformed infinity
        bytes([0xE0]) + bytes(47),  # infinity with sign bit
        b"\x9f" + b"\xff" * 47,  # x >= p
    ]
    for bad in bad_cases:
        with pytest.raises(ValueError):
            native.g1_decompress_batch(good + bad)


def test_g1_subgroup_rejection():
    # a point on the curve but outside the r-subgroup
    from kzg_tpu.constants import P_MOD as P
    from kzg_tpu.oracle import field as F

    x = 4
    while True:
        y = F.fp_sqrt((x * x * x + 4) % P)
        if y is not None and not G1.in_subgroup((x, y)):
            break
        x += 1
    b = ser.g1_to_bytes((x, y))
    with pytest.raises(ValueError):
        native.g1_decompress_batch(b, subgroup_check=True)
    assert native.g1_decompress_batch(b, subgroup_check=False) == [(x, y)]


def test_g2_roundtrip():
    pts = [G2.mul_scalar(G2_GENERATOR, rng.randrange(1, R)) for _ in range(4)] + [None]
    compressed = b"".join(ser.g2_to_bytes(p) for p in pts)
    got = native.g2_decompress_batch(compressed)
    assert got == pts


def test_g1_mul_add():
    p = rand_g1()
    q = rand_g1()
    k = rng.randrange(R)
    assert native.g1_mul(p, k) == G1.mul_scalar(p, k)
    assert native.g1_add(p, q) == G1.affine_add(p, q)
    assert native.g1_add(p, None) == p
    assert native.g1_add(p, G1.affine_neg(p)) is None
    assert native.g1_mul(p, 0) is None


def test_ifma_mul_differential():
    """8-lane AVX-512 IFMA Montgomery multiplier vs Python ints: random +
    edge products through the full pack -> mont52 -> mul -> unpack pipeline.
    Skips on hosts without AVX512IFMA (the scalar path serves there)."""
    import ctypes

    lib = native._lib
    if not lib.kzgn_ifma_available():
        pytest.skip("built without AVX512IFMA")
    n8 = 8
    a = [rng.randrange(R) for _ in range(n8 * 8)]
    b = [rng.randrange(R) for _ in range(n8 * 8)]
    a[0], b[1], a[2], b[2], a[3], b[4] = 0, 0, R - 1, R - 1, 1, 1
    out = ctypes.create_string_buffer(32 * n8 * 8)
    rc = lib.kzgn_ifma_mul_test(
        b"".join(x.to_bytes(32, "big") for x in a),
        b"".join(x.to_bytes(32, "big") for x in b),
        n8,
        out,
    )
    assert rc == 0
    for i in range(n8 * 8):
        got = int.from_bytes(out.raw[32 * i : 32 * (i + 1)], "big")
        assert got == a[i] * b[i] % R, i


def test_eval_blobs_batch_differential(oracle_settings):
    """Native batch barycentric (IFMA 8-lane or scalar) vs the oracle
    evaluator, covering lane padding (n=3), full groups (n=8), in-domain
    points, and non-canonical scalar rejection."""
    s = oracle_settings
    rmont = 1 << 256
    roots = s.fft.brp_roots_of_unity[:4096]
    roots_bytes = b"".join(
        (v * rmont % R).to_bytes(32, "little") for v in roots
    )
    from kzg_tpu.oracle import eip4844 as okzg

    for n in (1, 3, 8):
        blobs = [
            b"".join(rng.randrange(R).to_bytes(32, "big") for _ in range(4096))
            for _ in range(n)
        ]
        zs = [rng.randrange(R) for _ in range(n)]
        if n >= 3:
            zs[1] = roots[7]  # in-domain branch
        ys = native.eval_blobs_batch(b"".join(blobs), n, zs, roots_bytes)
        want = [
            okzg.evaluate_polynomial_in_evaluation_form(
                okzg.bytes_to_blob(b), z, s
            )
            for b, z in zip(blobs, zs)
        ]
        assert ys == want, n
    bad = (R).to_bytes(32, "big") * 4096
    with pytest.raises(ValueError):
        native.eval_blobs_batch(bad, 1, [5], roots_bytes)


def test_pairings_verify_bilinear():
    a = rng.randrange(1, R)
    b = rng.randrange(1, R)
    pa = G1.mul_scalar(G1_GENERATOR, a)
    qb = G2.mul_scalar(G2_GENERATOR, b)
    pab = G1.mul_scalar(G1_GENERATOR, a * b % R)
    # e(aG, bH) == e(abG, H)
    assert native.pairings_verify(pa, qb, pab, G2_GENERATOR)
    # and the negative case
    assert not native.pairings_verify(pa, qb, G1_GENERATOR, G2_GENERATOR)


def test_pairings_verify_vs_oracle_random():
    for _ in range(2):
        a1, b1 = rand_g1(True), rand_g1(True)
        a2 = G2.mul_scalar(G2_GENERATOR, rng.randrange(R))
        b2 = G2.mul_scalar(G2_GENERATOR, rng.randrange(R))
        assert native.pairings_verify(a1, a2, b1, b2) == oracle_pv(a1, a2, b1, b2)


def test_g1_msm_size_sweep():
    """Every point count 1..20 vs the oracle MSM. Regression for the c=4
    window family (n=8..17): the top signed-digit window shifted an
    __int128 by exactly 128 bits -- UB that produced wrong sums for those
    sizes only."""
    for n in range(1, 21):
        pts = [G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R)) for _ in range(n)]
        scs = [rng.randrange(R) for _ in range(n)]
        assert native.g1_msm(pts, scs) == oracle_msm_ref(pts, scs), n


def oracle_msm_ref(pts, scs):
    from kzg_tpu.oracle.msm import msm

    return msm(pts, scs)


def test_prepared_g2_cache_interleave():
    """Cycle >4 distinct G2 points through the 4-entry prepared-line cache
    in hit/miss interleavings. Regression for the round-robin eviction bug:
    when the first lookup of a verification HIT the slot that round-robin
    eviction chose for the second lookup's MISS, the first pairing read the
    wrong line tables and the verdict was silently wrong. Uses
    e(v*G, u*H) == e(u*G, v*H) so every (i, j) combination has a known
    verdict."""
    us = [rng.randrange(1, R) for _ in range(6)]
    qs = [G2.mul_scalar(G2_GENERATOR, u) for u in us]
    ps = [G1.mul_scalar(G1_GENERATOR, u) for u in us]
    for i in range(6):
        for j in range(6):
            if i == j:
                continue
            assert native.pairings_verify(ps[j], qs[i], ps[i], qs[j]), (i, j)
    # and a few negative cases through the same (now fully cycled) cache
    assert not native.pairings_verify(ps[0], qs[1], ps[2], qs[3])
    assert not native.pairings_verify(G1_GENERATOR, qs[4], G1_GENERATOR, qs[5])


def test_verify_blob_batch_tail_linear_poly(oracle_settings):
    """Fused batch tail (decompress + folded MSMs + dual pairing in one
    native call) on hand-built linear polynomials p_i(x) = a_i + b_i x:
    commitment = a G + b [s]G, proof = b G, y = a + b z -- no oracle MSMs
    needed, so the full true/false/badargs matrix runs in seconds."""
    from kzg_tpu.eip4844 import _batch_challenge_r
    from kzg_tpu.oracle.serialization import g1_to_bytes

    s = oracle_settings
    s1g = s.g1_monomial[1]  # [s]G1
    n = 3
    abs_ = [(rng.randrange(1, R), rng.randrange(1, R)) for _ in range(n)]
    zs = [rng.randrange(R) for _ in range(n)]
    cs, ps, ys = [], [], []
    for (a, b), z in zip(abs_, zs):
        c_pt = G1.affine_add(
            G1.mul_scalar(G1_GENERATOR, a), G1.mul_scalar(s1g, b)
        )
        cs.append(g1_to_bytes(c_pt))
        ps.append(g1_to_bytes(G1.mul_scalar(G1_GENERATOR, b)))
        ys.append((a + b * z) % R)
    r = _batch_challenge_r(cs, zs, ys, ps)
    assert (
        native.verify_blob_batch_tail(
            b"".join(cs), b"".join(ps), n, zs, ys, r, s.g2_monomial[1]
        )
        is True
    )
    # wrong y -> False
    ys_bad = [ys[0], (ys[1] + 1) % R, ys[2]]
    r2 = _batch_challenge_r(cs, zs, ys_bad, ps)
    assert (
        native.verify_blob_batch_tail(
            b"".join(cs), b"".join(ps), n, zs, ys_bad, r2, s.g2_monomial[1]
        )
        is False
    )
    # malformed proof -> ValueError naming the index
    bad = b"\xc0" + b"\x11" * 47
    with pytest.raises(ValueError):
        native.verify_blob_batch_tail(
            b"".join(cs), b"".join(ps[:2]) + bad, n, zs, ys, r, s.g2_monomial[1]
        )


def test_pairings_infinity_semantics():
    p = rand_g1()
    q = G2.mul_scalar(G2_GENERATOR, 5)
    assert native.pairings_verify(None, q, None, G2_GENERATOR) == oracle_pv(
        None, q, None, G2_GENERATOR
    )
    assert native.pairings_verify(p, q, None, None) == oracle_pv(p, q, None, None)


def _rand_curve_point(in_subgroup: bool):
    """Random on-curve affine point; in_subgroup=False yields a point of the
    full E(Fp) group (cofactor ~2^125, so it is essentially never in the
    r-order subgroup)."""
    from kzg_tpu.constants import P_MOD as P

    if in_subgroup:
        return G1.mul_scalar(G1_GENERATOR, rng.randrange(1, R))
    while True:
        x = rng.randrange(P)
        rhs = (pow(x, 3, P) + 4) % P
        y = pow(rhs, (P + 1) // 4, P)
        if y * y % P == rhs:
            return (x, y)


def test_g1_subgroup_fast_matches_generic():
    """The endomorphism membership test (Scott eprint 2021/1130) must agree
    with the generic multiply-by-r check on subgroup points, non-subgroup
    curve points, and the x^2/lambda edge scalars."""
    if not native.available():
        pytest.skip("native library not built")
    pts = [_rand_curve_point(True) for _ in range(6)]
    pts += [_rand_curve_point(False) for _ in range(6)]
    pts += [G1_GENERATOR, G1.mul_scalar(G1_GENERATOR, R - 1)]
    from kzg_tpu.constants import BLS_X

    for s in (1, 2, BLS_X % R, (BLS_X * BLS_X) % R, (R - BLS_X * BLS_X) % R):
        pts.append(G1.mul_scalar(G1_GENERATOR, s))
    for pt in pts:
        assert native.g1_in_subgroup(pt, fast=True) == native.g1_in_subgroup(
            pt, fast=False
        ), pt


def test_verify_kzg_proof_fused_matches_composed():
    """The fused native verify must agree with the composed host path on
    valid, tampered, infinity, and non-canonical inputs."""
    if not native.available():
        pytest.skip("native library not built")
    from kzg_tpu.oracle.kzg import settings_from_secret

    s = settings_from_secret(16, 1927409816240961209460912649124, 5)
    g2s = s.g2_monomial[1]
    secret = 1927409816240961209460912649124
    # p(X) = c0 + c1 X: commitment [p(s)]G, proof for opening at z:
    # pi = [(p(s) - p(z)) / (s - z)] G
    c0, c1 = rng.randrange(R), rng.randrange(R)
    z = rng.randrange(R)
    y = (c0 + c1 * z) % R
    commitment = G1.mul_scalar(G1_GENERATOR, (c0 + c1 * secret) % R)
    q = (c0 + c1 * secret - y) % R * pow((secret - z) % R, R - 2, R) % R
    proof = G1.mul_scalar(G1_GENERATOR, q)
    cb = ser.g1_to_bytes(commitment)
    pb = ser.g1_to_bytes(proof)
    zb, yb = z.to_bytes(32, "big"), y.to_bytes(32, "big")
    assert native.verify_kzg_proof_fused(cb, zb, yb, pb, g2s) is True
    bad_y = ((y + 1) % R).to_bytes(32, "big")
    assert native.verify_kzg_proof_fused(cb, zb, bad_y, pb, g2s) is False
    # infinity proof verifies the constant polynomial at its value
    const_c = G1.mul_scalar(G1_GENERATOR, c0)
    inf_b = ser.g1_to_bytes(None)
    assert native.verify_kzg_proof_fused(
        ser.g1_to_bytes(const_c), zb, (c0 % R).to_bytes(32, "big"), inf_b, g2s
    ) is True
    with pytest.raises(ValueError):
        native.verify_kzg_proof_fused(cb, b"\xff" * 32, yb, pb, g2s)
    with pytest.raises(ValueError):
        native.verify_kzg_proof_fused(b"\x01" * 48, zb, yb, pb, g2s)
