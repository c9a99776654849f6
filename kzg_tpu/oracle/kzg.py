"""Oracle KZG settings + single/multi proof primitives.

Parity targets:
  - load_trusted_setup_rust      /root/reference/kzg/src/eip_4844.rs:1022-1086
  - check_proof_single           /root/reference/blst/src/types/kzg_settings.rs:178-196
  - compute_proof_single         /root/reference/blst/src/types/kzg_settings.rs:155-176
  - compute/check_proof_multi    /root/reference/blst/src/types/kzg_settings.rs:198-277
"""

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional

from ..constants import (
    FIELD_ELEMENTS_PER_BLOB,
    FIELD_ELEMENTS_PER_CELL,
    FIELD_ELEMENTS_PER_EXT_BLOB,
    R_MOD as R,
    TRUSTED_SETUP_NUM_G2_POINTS,
    root_of_unity,
)
from . import serialization as ser
from .curve import G1, G2, G1_GENERATOR, G2_GENERATOR, Affine
from .fft import fft_fr, reverse_bit_order
from .msm import msm
from .pairing import pairings_verify

_CACHE_DIR = os.environ.get(
    "KZG_TPU_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "kzg_tpu")
)


@dataclass
class FFTSettingsOracle:
    """Roots-of-unity tables (parity: blst/src/types/fft_settings.rs:13-58)."""

    max_width: int
    roots_of_unity: List[int]  # size max_width + 1, natural order
    brp_roots_of_unity: List[int]  # size max_width, bit-reversed
    reverse_roots_of_unity: List[int]  # size max_width + 1, reversed

    @classmethod
    def new(cls, scale: int) -> "FFTSettingsOracle":
        width = 1 << scale
        w = root_of_unity(scale)
        roots = [1]
        for _ in range(width):
            roots.append(roots[-1] * w % R)
        assert roots[-1] == 1
        brp = reverse_bit_order(roots[:-1])
        return cls(width, roots, brp, list(reversed(roots)))


@dataclass
class KZGSettingsOracle:
    fft: FFTSettingsOracle
    g1_monomial: List[Affine]
    g1_lagrange_brp: List[Affine]
    g2_monomial: List[Affine]
    cell_size: int = FIELD_ELEMENTS_PER_CELL
    # FK20: x_ext_fft_columns[offset][i], built lazily (expensive in Python)
    _x_ext_fft_columns: Optional[List[List[Affine]]] = field(default=None, repr=False)

    # ---- commit/prove/verify (single & multi openings) -------------------

    def commit_to_poly_monomial(self, coeffs) -> Affine:
        return msm(self.g1_monomial[: len(coeffs)], coeffs)

    def commit_to_poly_lagrange_brp(self, evals) -> Affine:
        return msm(self.g1_lagrange_brp[: len(evals)], evals)

    def compute_proof_single(self, poly_coeffs, x0: int) -> Affine:
        """Open a monomial-form polynomial at x0: commit to q = (p - p(x0))/(X - x0)
        via Horner synthetic division."""
        n = len(poly_coeffs)
        q = [0] * (n - 1)
        q[n - 2] = poly_coeffs[n - 1] % R
        for i in range(n - 2, 0, -1):
            q[i - 1] = (poly_coeffs[i] + x0 * q[i]) % R
        return self.commit_to_poly_monomial(q)

    def check_proof_single(self, commitment: Affine, proof: Affine, x: int, y: int) -> bool:
        """e(proof, [s - x]_2) == e(C - [y]_1, H) (parity kzg_settings.rs:178-196)."""
        x_g2 = G2.mul_scalar(G2_GENERATOR, x)
        s_minus_x = G2.affine_add(self.g2_monomial[1], G2.affine_neg(x_g2))
        y_g1 = G1.mul_scalar(G1_GENERATOR, y)
        commitment_minus_y = G1.affine_add(commitment, G1.affine_neg(y_g1))
        return pairings_verify(commitment_minus_y, G2_GENERATOR, proof, s_minus_x)

    def compute_proof_multi(self, poly_coeffs, x0: int, n: int) -> Affine:
        """Open at the n-th roots scaled by x0: q = p / (X^n - x0^n)
        (parity kzg_settings.rs:198-234)."""
        x_pow_n = pow(x0, n, R)
        # divide p by (X^n - x_pow_n): long division where divisor is sparse
        p = [c % R for c in poly_coeffs]
        if len(p) < n + 1:
            raise ValueError("compute_proof_multi: polynomial too short")
        q = [0] * (len(p) - n)
        rem = list(p)
        for i in range(len(q) - 1, -1, -1):
            q[i] = rem[i + n]
            rem[i] = (rem[i] + q[i] * x_pow_n) % R
            rem[i + n] = 0
        return self.commit_to_poly_monomial(q)

    def check_proof_multi(self, commitment: Affine, proof: Affine, x: int, ys, n: int) -> bool:
        """Verify an n-point opening on the coset x * <w_n>
        (parity kzg_settings.rs:236-277)."""
        # interpolate ys over the coset: coeffs = unscale(ifft(ys)) by 1/x
        interp = fft_fr(ys, inverse=True)
        xinv = pow(x, R - 2, R)
        xs = 1
        for i in range(len(interp)):
            interp[i] = interp[i] * xs % R
            xs = xs * xinv % R
        x_pow = pow(x, n, R)
        # e(proof, [s^n - x^n]_2) == e(C - [interp]_1, H)
        xn2 = G2.mul_scalar(G2_GENERATOR, x_pow)
        if n >= len(self.g2_monomial):
            raise ValueError("check_proof_multi: not enough G2 points")
        xn_minus_yn = G2.affine_add(self.g2_monomial[n], G2.affine_neg(xn2))
        interp_g1 = self.commit_to_poly_monomial(interp)
        commit_minus_interp = G1.affine_add(commitment, G1.affine_neg(interp_g1))
        return pairings_verify(commit_minus_interp, G2_GENERATOR, proof, xn_minus_yn)

    # ---- FK20 x_ext_fft columns (parity kzg_settings.rs:38-101) ----------

    @property
    def x_ext_fft_columns(self) -> List[List[Affine]]:
        if self._x_ext_fft_columns is None:
            self._x_ext_fft_columns = _x_ext_fft_columns_cached(
                self.g1_monomial, self.cell_size
            )
        return self._x_ext_fft_columns


def _toeplitz_part_1(x: List[Affine]) -> List[Affine]:
    """FFT of [x, inf-padding] of double length
    (parity: blst/src/types/kzg_settings.rs:38-61)."""
    from .fft import fft_g1

    n = len(x)
    padded = list(x) + [None] * n
    return fft_g1(padded)


def _x_ext_fft_columns_cached(g1_monomial, cell_size) -> List[List[Affine]]:
    """Disk-cached FK20 column table (diskcache analog,
    /root/reference/kzg/src/msm/diskcache.rs)."""
    h = hashlib.sha256(
        repr((cell_size, g1_monomial[:4], g1_monomial[-1], len(g1_monomial))).encode()
    ).hexdigest()[:32]
    path = os.path.join(_CACHE_DIR, f"x-ext-fft-{h}.json")
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        return [
            [tuple(p) if p is not None else None for p in col] for col in data
        ]
    cols = _build_x_ext_fft_columns(g1_monomial, cell_size)
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(cols, f)
    except OSError:
        pass
    return cols


def _build_x_ext_fft_columns(g1_monomial, cell_size) -> List[List[Affine]]:
    """(parity: blst/src/types/kzg_settings.rs:66-136, loop over offsets)"""
    n = len(g1_monomial)
    k = n // cell_size
    columns = [[None] * cell_size for _ in range(2 * k)]
    for offset in range(cell_size):
        # x = [g1[n - cell_size - 1 - offset - i*cell_size] for i in 0..k-1], last = inf
        x = []
        start = n - cell_size - 1 - offset
        for i in range(k - 1):
            x.append(g1_monomial[start - i * cell_size])
        x.append(None)
        xext = _toeplitz_part_1(x)
        for i, pt in enumerate(xext):
            columns[i][offset] = pt
    return columns


# ---------------------------------------------------------------------------
# Trusted setup loading
# ---------------------------------------------------------------------------


def parse_trusted_setup_string(contents: str):
    """Returns (g1_monomial_bytes, g1_lagrange_bytes, g2_monomial_bytes)
    (parity: load_trusted_setup_string, eip_4844.rs:151-228)."""
    tokens = contents.split()
    if len(tokens) < 2:
        raise ValueError("Incorrect trusted setup format")
    n_g1, n_g2 = int(tokens[0]), int(tokens[1])
    if n_g1 != FIELD_ELEMENTS_PER_BLOB or n_g2 != TRUSTED_SETUP_NUM_G2_POINTS:
        raise ValueError("Incorrect trusted setup format")
    hexes = tokens[2:]
    if len(hexes) != 2 * n_g1 + n_g2:
        raise ValueError("Incorrect trusted setup format")
    g1_lagrange = b"".join(bytes.fromhex(h) for h in hexes[:n_g1])
    g2_monomial = b"".join(bytes.fromhex(h) for h in hexes[n_g1 : n_g1 + n_g2])
    g1_monomial = b"".join(bytes.fromhex(h) for h in hexes[n_g1 + n_g2 :])
    return g1_monomial, g1_lagrange, g2_monomial


def _decompress_all(g1_monomial_bytes, g1_lagrange_bytes, g2_monomial_bytes):
    """Decompress + subgroup-check every setup point, with a disk cache keyed
    by content hash (the reference caches MSM tables the same way:
    /root/reference/kzg/src/msm/diskcache.rs)."""
    h = hashlib.sha256(
        g1_monomial_bytes + g1_lagrange_bytes + g2_monomial_bytes
    ).hexdigest()
    cache_path = os.path.join(_CACHE_DIR, f"setup-points-{h}.json")
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            data = json.load(f)
        to_pt = lambda t: tuple(t) if t is not None else None
        return (
            [to_pt(p) for p in data["g1m"]],
            [to_pt(p) for p in data["g1l"]],
            [tuple(map(tuple, p)) if p is not None else None for p in data["g2m"]],
        )
    g1m = [
        ser.g1_from_bytes(g1_monomial_bytes[i : i + 48])
        for i in range(0, len(g1_monomial_bytes), 48)
    ]
    g1l = [
        ser.g1_from_bytes(g1_lagrange_bytes[i : i + 48])
        for i in range(0, len(g1_lagrange_bytes), 48)
    ]
    g2m = [
        ser.g2_from_bytes(g2_monomial_bytes[i : i + 96])
        for i in range(0, len(g2_monomial_bytes), 96)
    ]
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        with open(cache_path, "w") as f:
            json.dump({"g1m": g1m, "g1l": g1l, "g2m": g2m}, f)
    except OSError:
        pass
    return g1m, g1l, g2m


def is_trusted_setup_in_lagrange_form(g1_lagrange, g2_monomial) -> bool:
    if len(g1_lagrange) < 2 or len(g2_monomial) < 2:
        return False
    is_monomial = pairings_verify(
        g1_lagrange[1], g2_monomial[0], g1_lagrange[0], g2_monomial[1]
    )
    return not is_monomial


def load_trusted_setup(
    g1_monomial_bytes: bytes, g1_lagrange_bytes: bytes, g2_monomial_bytes: bytes
) -> KZGSettingsOracle:
    if len(g1_monomial_bytes) // 48 != FIELD_ELEMENTS_PER_BLOB:
        raise ValueError("Invalid number of G1 points")
    if len(g1_lagrange_bytes) // 48 != FIELD_ELEMENTS_PER_BLOB:
        raise ValueError("Invalid number of G1 points")
    if len(g2_monomial_bytes) // 96 != TRUSTED_SETUP_NUM_G2_POINTS:
        raise ValueError("Invalid number of G2 points")
    g1m, g1l, g2m = _decompress_all(
        g1_monomial_bytes, g1_lagrange_bytes, g2_monomial_bytes
    )
    if not is_trusted_setup_in_lagrange_form(g1l, g2m):
        raise ValueError("Trusted setup is not in Lagrange form")
    g1l_brp = reverse_bit_order(g1l)
    scale = (FIELD_ELEMENTS_PER_EXT_BLOB).bit_length() - 1
    fft = FFTSettingsOracle.new(scale)
    return KZGSettingsOracle(fft, g1m, g1l_brp, g2m)


def load_trusted_setup_file(path: str) -> KZGSettingsOracle:
    with open(path) as f:
        g1m, g1l, g2m = parse_trusted_setup_string(f.read())
    return load_trusted_setup(g1m, g1l, g2m)


def generate_trusted_setup(n: int, secret: int):
    """Insecure test-only setup from a known secret
    (parity: /root/reference/blst/src/utils.rs:16-37)."""
    s_pow = 1
    g1m = []
    for _ in range(n):
        g1m.append(G1.mul_scalar(G1_GENERATOR, s_pow))
        s_pow = s_pow * secret % R
    g2m = []
    s_pow = 1
    for _ in range(TRUSTED_SETUP_NUM_G2_POINTS):
        g2m.append(G2.mul_scalar(G2_GENERATOR, s_pow))
        s_pow = s_pow * secret % R
    return g1m, g2m


def settings_from_secret(n: int, secret: int, scale: int) -> KZGSettingsOracle:
    """Build oracle settings for tests from a generated setup."""
    g1m, g2m = generate_trusted_setup(n, secret)
    # lagrange form: inverse FFT of the monomial points over the n-domain
    from .fft import fft_g1

    g1l = fft_g1(g1m, inverse=True)
    g1l_brp = reverse_bit_order(g1l)
    fft = FFTSettingsOracle.new(scale)
    return KZGSettingsOracle(fft, g1m, g1l_brp, g2m, cell_size=max(1, n // 64))
