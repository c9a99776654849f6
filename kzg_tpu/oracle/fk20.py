"""Oracle FK20 single/multi data-availability proof generators (the legacy
pre-EIP-7594 path).

Semantics parity with /root/reference/blst/src/types/fk20_single_settings.rs,
fk20_multi_settings.rs, and fk20_proofs.rs (toeplitz_part_1/2/3).
"""

from typing import List

from ..constants import R_MOD as R
from .curve import G1, Affine
from .fft import fft_fr, fft_g1, reverse_bit_order
from .kzg import KZGSettingsOracle
from .poly import toeplitz_coeffs_stride_legacy


def toeplitz_part_1(x: List[Affine]) -> List[Affine]:
    """fft_g1 of [x | identity padding] (parity: fk20_proofs.rs:17-26)."""
    return fft_g1(list(x) + [None] * len(x))


def toeplitz_part_2(coeffs: List[int], x_ext_fft: List[Affine]) -> List[Affine]:
    """Pointwise G1 scalar mul by fft(coeffs) (parity: fk20_proofs.rs:29-51)."""
    coeffs_fft = fft_fr(coeffs)
    return [G1.mul_scalar(x, c) for x, c in zip(x_ext_fft, coeffs_fft)]


def toeplitz_part_3(h_ext_fft: List[Affine]) -> List[Affine]:
    """ifft_g1 then zero the top half (parity: fk20_proofs.rs:53-62)."""
    n = len(h_ext_fft) // 2
    ret = fft_g1(h_ext_fft, inverse=True)
    return ret[:n] + [None] * n


class FK20SingleSettingsOracle:
    """(parity: FsFK20SingleSettings, fk20_single_settings.rs:20-112)"""

    def __init__(self, ks: KZGSettingsOracle, n2: int):
        if n2 > ks.fft.max_width:
            raise ValueError("n2 must be less than or equal to kzg settings max width")
        if n2 & (n2 - 1) or n2 < 2:
            raise ValueError("n2 must be a power of two >= 2")
        n = n2 // 2
        x = [ks.g1_monomial[n - 2 - i] for i in range(n - 1)] + [None]
        self.ks = ks
        self.x_ext_fft = toeplitz_part_1(x)

    def data_availability_optimized(self, poly_coeffs: List[int]) -> List[Affine]:
        n = len(poly_coeffs)
        n2 = 2 * n
        if n2 > self.ks.fft.max_width or n2 & (n2 - 1):
            raise ValueError("invalid polynomial length")
        toeplitz = toeplitz_coeffs_stride_legacy(poly_coeffs, 0, 1)
        h_ext_fft = toeplitz_part_2(toeplitz, self.x_ext_fft)
        h = toeplitz_part_3(h_ext_fft)
        return fft_g1(h)

    def data_availability(self, poly_coeffs: List[int]) -> List[Affine]:
        return reverse_bit_order(self.data_availability_optimized(poly_coeffs))


class FK20MultiSettingsOracle:
    """(parity: FsFK20MultiSettings, fk20_multi_settings.rs:46-180)"""

    def __init__(self, ks: KZGSettingsOracle, n2: int, chunk_len: int):
        if n2 > ks.fft.max_width:
            raise ValueError("n2 must be less than or equal to kzg settings max width")
        if n2 & (n2 - 1) or n2 < 2:
            raise ValueError("n2 must be a power of two >= 2")
        if chunk_len > n2 // 2 or chunk_len & (chunk_len - 1):
            raise ValueError("chunk_len must be a power of two <= n2/2")
        n = n2 // 2
        k = n // chunk_len
        self.ks = ks
        self.chunk_len = chunk_len
        self.x_ext_fft_files = []
        for offset in range(chunk_len):
            start = n - chunk_len - 1 - offset if n >= chunk_len + 1 + offset else 0
            x, j = [], start
            for _ in range(k - 1):
                x.append(ks.g1_monomial[j])
                j = j - chunk_len if j >= chunk_len else 0
            x.append(None)
            self.x_ext_fft_files.append(toeplitz_part_1(x))

    def data_availability_optimized(self, poly_coeffs: List[int]) -> List[Affine]:
        n = len(poly_coeffs)
        n2 = 2 * n
        if n2 > self.ks.fft.max_width or n2 & (n2 - 1):
            raise ValueError("invalid polynomial length")
        k = n // self.chunk_len
        k2 = 2 * k
        h_ext_fft = [None] * k2
        for i in range(self.chunk_len):
            toeplitz = toeplitz_coeffs_stride_legacy(poly_coeffs, i, self.chunk_len)
            part = toeplitz_part_2(toeplitz, self.x_ext_fft_files[i])
            h_ext_fft = [G1.affine_add(a, b) for a, b in zip(h_ext_fft, part)]
        h = toeplitz_part_3(h_ext_fft)
        return fft_g1(h)

    def data_availability(self, poly_coeffs: List[int]) -> List[Affine]:
        return reverse_bit_order(self.data_availability_optimized(poly_coeffs))
