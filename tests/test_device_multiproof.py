"""Device multi-point opening vs the oracle (parity suite for
/root/reference/blst/src/types/kzg_settings.rs:198-277 semantics)."""

import random

import pytest

from kzg_tpu.constants import R_MOD as R


@pytest.fixture(scope="module")
def settings():
    from kzg_tpu.settings import load_settings

    return load_settings()


def _coset_evals(coeffs, x, n):
    from kzg_tpu.oracle.fft import fft_fr

    # evaluate p on x * <w_n> via: scale coeffs by x^i then size-n FFT of
    # the folded coefficients (p(x w^j) = sum_k (sum_{i=k mod n} c_i x^i) w^{jk})
    folded = [0] * n
    xs = 1
    for i, c in enumerate(coeffs):
        folded[i % n] = (folded[i % n] + c * xs) % R
        xs = xs * x % R
    return fft_fr(folded, inverse=False)


def test_proof_multi_roundtrip(settings):
    from kzg_tpu import multiproof
    from kzg_tpu import native

    rng = random.Random(1234)
    n = 32
    coeffs = [rng.randrange(R) for _ in range(512)]
    x = rng.randrange(1, R)

    commitment = native.g1_compress_batch(
        [settings.oracle.commit_to_poly_monomial(coeffs)]
    )[0]
    proof = multiproof.compute_kzg_proof_multi(coeffs, x, n, settings)

    # device proof == oracle proof bit-exactly
    want = native.g1_compress_batch(
        [settings.oracle.compute_proof_multi(coeffs, x, n)]
    )[0]
    assert proof == want

    ys = _coset_evals(coeffs, x, n)
    assert multiproof.verify_kzg_proof_multi(commitment, proof, x, ys, settings)

    # oracle verifier agrees with the device verifier
    com_pt, prf_pt = native.g1_decompress_batch(commitment + proof)
    assert settings.oracle.check_proof_multi(com_pt, prf_pt, x, ys, n)

    # wrong evaluations must fail
    bad = list(ys)
    bad[3] = (bad[3] + 1) % R
    assert not multiproof.verify_kzg_proof_multi(commitment, proof, x, bad, settings)

    # wrong proof (use the commitment) must fail
    assert not multiproof.verify_kzg_proof_multi(commitment, commitment, x, ys, settings)


def test_proof_multi_validation(settings):
    from kzg_tpu import multiproof

    with pytest.raises(ValueError):
        multiproof.compute_kzg_proof_multi([1, 2, 3], 5, 3, settings)  # n not pow2
    with pytest.raises(ValueError):
        multiproof.compute_kzg_proof_multi([1, 2], 5, 4, settings)  # too short
    with pytest.raises(ValueError):
        multiproof.verify_kzg_proof_multi(b"\x00" * 48, b"\x00" * 48, 5, [1] * 3, settings)
