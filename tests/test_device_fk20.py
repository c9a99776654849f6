"""Device FK20 legacy chunked-proof API vs the oracle and proof checks
(mirrors /root/reference/kzg-bench/src/tests/fk20_proofs.rs fk_single /
fk_single_strided / fk_multi chunk cases)."""

import random

import pytest

from kzg_tpu.constants import R_MOD as R
from kzg_tpu.fk20 import FK20MultiSettings, FK20SingleSettings
from kzg_tpu.oracle.das import reverse_bits_limited
from kzg_tpu.oracle.fft import fft_fr, reverse_bit_order
from kzg_tpu.oracle.fk20 import FK20MultiSettingsOracle, FK20SingleSettingsOracle
from kzg_tpu.oracle.kzg import settings_from_secret
from kzg_tpu.oracle import poly as P
from kzg_tpu.settings import DeviceKZGSettings

SECRET = 1927409816240961209460912649124
rng = random.Random(77)


def _device_settings(n: int, scale: int) -> DeviceKZGSettings:
    return DeviceKZGSettings(settings_from_secret(n, SECRET, scale))


def test_fk20_single_device_matches_oracle_and_verifies():
    coeffs = [1, 2, 3, 4, 7, 7, 7, 7, 13, 13, 13, 13, 13, 13, 13, 13]
    poly_len = len(coeffs)
    s = _device_settings(1 << 5, 5)
    fk_d = FK20SingleSettings(s, 2 * poly_len)
    fk_o = FK20SingleSettingsOracle(s.oracle, 2 * poly_len)

    got = fk_d.data_availability(coeffs)
    want = fk_o.data_availability(coeffs)
    assert got == want

    commitment = s.oracle.commit_to_poly_monomial(coeffs)
    for i in range(0, 2 * poly_len, 5):  # proof spot-checks (pairing ~0.1 s)
        x = s.oracle.fft.roots_of_unity[i]
        y = P.poly_eval(coeffs, x)
        proof = got[reverse_bits_limited(2 * poly_len, i)]
        assert s.oracle.check_proof_single(commitment, proof, x, y), i


@pytest.mark.parametrize("chunk_len", [2, 4, 8])
def test_fk20_multi_device_matches_oracle_and_verifies(chunk_len):
    n = 16
    chunk_count = n // chunk_len
    scale = (2 * n).bit_length() - 1
    s = _device_settings(2 * n, scale)
    coeffs = [rng.randrange(R) for _ in range(n)]
    fk_d = FK20MultiSettings(s, 2 * n, chunk_len)
    fk_o = FK20MultiSettingsOracle(s.oracle, 2 * n, chunk_len)

    got = fk_d.data_availability(coeffs)
    assert got == fk_o.data_availability(coeffs)

    commitment = s.oracle.commit_to_poly_monomial(coeffs)
    extended_fft = reverse_bit_order(fft_fr(coeffs + [0] * n))
    domain_stride = s.oracle.fft.max_width // (2 * n)
    for pos in range(2 * chunk_count):
        domain_pos = reverse_bits_limited(2 * chunk_count, pos)
        x = s.oracle.fft.roots_of_unity[domain_pos * domain_stride]
        ys = reverse_bit_order(extended_fft[chunk_len * pos : chunk_len * (pos + 1)])
        assert s.oracle.check_proof_multi(commitment, got[pos], x, ys, chunk_len), pos


def test_fk20_invalid_args():
    s = _device_settings(1 << 5, 5)
    with pytest.raises(ValueError):
        FK20SingleSettings(s, 3)  # not a power of two
    with pytest.raises(ValueError):
        FK20SingleSettings(s, 1 << 20)  # beyond max width
    with pytest.raises(ValueError):
        FK20MultiSettings(s, 16, 16)  # chunk_len > n2/2
    fk = FK20SingleSettings(s, 16)
    with pytest.raises(ValueError):
        fk.data_availability([1, 2, 3])  # wrong poly length
