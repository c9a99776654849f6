"""Oracle implementation of EIP-7594 (PeerDAS) cell operations.

Byte/semantics parity with /root/reference/kzg/src/das.rs (the generic DAS
trait) and /root/reference/kzg/src/eth/eip_7594.rs (raw byte wrappers).
Missing cells are represented as Python None (the reference's Fr::null()
sentinel).
"""

import hashlib
from typing import List, Optional, Sequence, Tuple

from ..constants import (
    BYTES_PER_CELL,
    CELLS_PER_EXT_BLOB,
    FIELD_ELEMENTS_PER_BLOB,
    FIELD_ELEMENTS_PER_CELL,
    FIELD_ELEMENTS_PER_EXT_BLOB,
    R_MOD as R,
    RANDOM_CHALLENGE_KZG_CELL_BATCH_DOMAIN,
    RECOVERY_SHIFT_FACTOR,
)
from . import serialization as ser
from .curve import G1, G2_GENERATOR, Affine
from .eip4844 import bytes_to_blob, compute_powers, hash_to_bls_field
from .fft import fft_fr, fft_g1, reverse_bit_order
from .kzg import KZGSettingsOracle
from .msm import msm
from .pairing import pairings_verify


def reverse_bits_limited(length: int, value: int) -> int:
    """(parity: /root/reference/kzg/src/common_utils.rs:94-97)"""
    bits = length.bit_length() - 1
    if bits == 0:
        return 0
    return int(format(value, f"0{bits}b")[::-1], 2)


CELL_INDICES_RBL = [
    reverse_bits_limited(CELLS_PER_EXT_BLOB, i) for i in range(CELLS_PER_EXT_BLOB)
]


# ---------------------------------------------------------------------------
# Polynomial helpers (parity: das.rs:455-658)
# ---------------------------------------------------------------------------


def shift_poly(poly: List[int], shift_factor: int) -> List[int]:
    out = list(poly)
    power = 1
    for i in range(1, len(out)):
        power = power * shift_factor % R
        out[i] = out[i] * power % R
    return out


def coset_fft(coeffs: List[int]) -> List[int]:
    return fft_fr(shift_poly(coeffs, RECOVERY_SHIFT_FACTOR))


def coset_ifft(evals: List[int]) -> List[int]:
    out = fft_fr(evals, inverse=True)
    return shift_poly(out, pow(RECOVERY_SHIFT_FACTOR, R - 2, R))


def compute_vanishing_polynomial_from_roots(roots: List[int]) -> List[int]:
    """Product of (X - root) accumulated coefficient-wise
    (parity: das.rs:493-517)."""
    poly = [(-roots[0]) % R]
    for i in range(1, len(roots)):
        neg = (-roots[i]) % R
        poly.append((neg + poly[i - 1]) % R)
        for j in range(i - 1, 0, -1):
            poly[j] = (poly[j] * neg + poly[j - 1]) % R
        poly[0] = poly[0] * neg % R
    poly.append(1)
    return poly


def vanishing_polynomial_for_missing_cells(
    missing_cell_indices: List[int], s: KZGSettingsOracle
) -> List[int]:
    """(parity: das.rs:519-547)"""
    n_ext = FIELD_ELEMENTS_PER_EXT_BLOB
    cell_size = s.cell_size
    cells_per_ext = n_ext // cell_size
    if not missing_cell_indices or len(missing_cell_indices) >= cells_per_ext:
        raise ValueError("Invalid missing cell indices count")
    stride = n_ext // cells_per_ext
    roots = [s.fft.roots_of_unity[i * stride] for i in missing_cell_indices]
    short = compute_vanishing_polynomial_from_roots(roots)
    vanishing = [0] * n_ext
    for i, coeff in enumerate(short):
        vanishing[i * cell_size] = coeff
    return vanishing


def recover_cells(
    cells: List[Optional[int]], provided_indices, s: KZGSettingsOracle
) -> List[int]:
    """Erasure recovery of the full 8192-element extension
    (parity: recover_cells, das.rs:549-616). `cells` is the full
    bit-reversed-order evaluation vector with None holes."""
    n_ext = FIELD_ELEMENTS_PER_EXT_BLOB
    cell_size = s.cell_size
    cells_per_ext = n_ext // cell_size

    cells_brp = reverse_bit_order(cells)
    missing = [
        reverse_bits_limited(cells_per_ext, i)
        for i in range(cells_per_ext)
        if i not in provided_indices
    ]
    if len(missing) > cells_per_ext // 2:
        raise ValueError("Not enough cells")

    vanishing_coeff = vanishing_polynomial_for_missing_cells(missing, s)
    vanishing_eval = fft_fr(vanishing_coeff)

    ext_times_zero = [
        0 if cells_brp[i] is None else cells_brp[i] * vanishing_eval[i] % R
        for i in range(n_ext)
    ]
    ext_times_zero_coeffs = fft_fr(ext_times_zero, inverse=True)
    ext_over_coset = coset_fft(ext_times_zero_coeffs)
    vanishing_over_coset = coset_fft(vanishing_coeff)
    quotient = [
        e * pow(v, R - 2, R) % R
        for e, v in zip(ext_over_coset, vanishing_over_coset)
    ]
    reconstructed_coeff = coset_ifft(quotient)
    out = fft_fr(reconstructed_coeff)
    return reverse_bit_order(out)


def poly_lagrange_to_monomial(lagrange: List[int]) -> List[int]:
    """(parity: das.rs:618-629)"""
    return fft_fr(reverse_bit_order(list(lagrange)), inverse=True)


def toeplitz_coeffs_stride(
    poly: List[int], n: int, offset: int, stride: int
) -> List[int]:
    """(parity: das.rs:631-658)"""
    r = n // stride
    d = n - 1
    d_minus_i = d - offset
    out = [0] * (2 * r)
    out[0] = poly[d_minus_i]
    for j in range(1, r - 1):
        out[2 * r - j] = poly[d_minus_i - j * stride]
    return out


def compute_fk20_proofs(poly: List[int], n: int, s: KZGSettingsOracle) -> List[Affine]:
    """FK20 multi-proofs via Toeplitz matrix-vector products
    (parity: compute_fk20_proofs, das.rs:660-696)."""
    cell_size = s.cell_size
    k = n // cell_size
    k2 = 2 * k

    coeffs = [[0] * cell_size for _ in range(k2)]
    for i in range(cell_size):
        toeplitz = toeplitz_coeffs_stride(poly, n, i, cell_size)
        toeplitz_fft = fft_fr(toeplitz)
        for j in range(k2):
            coeffs[j][i] = toeplitz_fft[j]

    columns = s.x_ext_fft_columns
    h_ext_fft = [msm(columns[j], coeffs[j]) for j in range(k2)]

    h = fft_g1(h_ext_fft, inverse=True)
    for i in range(k, k2):
        h[i] = None
    return fft_g1(h)


# ---------------------------------------------------------------------------
# Cell <-> bytes
# ---------------------------------------------------------------------------


def cell_from_bytes(cell_bytes: bytes) -> List[int]:
    if len(cell_bytes) != BYTES_PER_CELL:
        raise ValueError("Invalid cell length")
    return [
        ser.fr_from_bytes(cell_bytes[i : i + 32]) for i in range(0, BYTES_PER_CELL, 32)
    ]


def cells_to_bytes(values: Sequence[int]) -> List[bytes]:
    assert len(values) == FIELD_ELEMENTS_PER_EXT_BLOB
    out = []
    for c in range(CELLS_PER_EXT_BLOB):
        chunk = values[c * FIELD_ELEMENTS_PER_CELL : (c + 1) * FIELD_ELEMENTS_PER_CELL]
        out.append(b"".join(ser.fr_to_bytes(v) for v in chunk))
    return out


# ---------------------------------------------------------------------------
# Public API (raw bytes; parity: kzg/src/eth/eip_7594.rs)
# ---------------------------------------------------------------------------


def compute_cells_and_kzg_proofs(
    blob_bytes: bytes, s: KZGSettingsOracle, with_proofs: bool = True
) -> Tuple[List[bytes], List[bytes]]:
    """(parity: DAS::compute_cells_and_kzg_proofs, das.rs:244-292)"""
    blob = bytes_to_blob(blob_bytes)
    n = FIELD_ELEMENTS_PER_BLOB
    poly_monomial = poly_lagrange_to_monomial(blob) + [0] * n

    cells_fr = reverse_bit_order(fft_fr(poly_monomial))
    cells = cells_to_bytes(cells_fr)

    proofs = []
    if with_proofs:
        proof_pts = reverse_bit_order(compute_fk20_proofs(poly_monomial, n, s))
        proofs = [ser.g1_to_bytes(p) for p in proof_pts]
    return cells, proofs


def recover_cells_and_kzg_proofs(
    cell_indices: Sequence[int],
    cells_bytes: Sequence[bytes],
    s: KZGSettingsOracle,
) -> Tuple[List[bytes], List[bytes]]:
    """(parity: DAS::recover_cells_and_kzg_proofs, das.rs:101-207)"""
    cell_size = s.cell_size
    n_ext = FIELD_ELEMENTS_PER_EXT_BLOB
    cells_per_ext = n_ext // cell_size

    cells_fr: List[List[int]] = [cell_from_bytes(cb) for cb in cells_bytes]
    if len(cells_fr) != len(cell_indices):
        raise ValueError("Cell indices mismatch - cells length must be equal")
    if len(cells_fr) > cells_per_ext:
        raise ValueError("Cell length cannot be larger than CELLS_PER_EXT_BLOB")
    if len(cells_fr) < cells_per_ext // 2:
        raise ValueError("Impossible to recover - not enough cells")

    recovered: List[Optional[int]] = [None] * n_ext
    provided = set()
    for i, idx in enumerate(cell_indices):
        if idx >= cells_per_ext:
            raise ValueError(f"Invalid cell index {idx}")
        if i + 1 < len(cell_indices) and cell_indices[i + 1] <= idx:
            raise ValueError("Invalid cell indices: must be strictly ascending")
        if idx in provided:
            raise ValueError(f"Invalid cell indices: cell index {idx} appears twice")
        provided.add(idx)
        recovered[idx * cell_size : (idx + 1) * cell_size] = cells_fr[i]

    if len(cells_fr) != cells_per_ext:
        recovered = recover_cells(recovered, provided, s)

    poly_monomial = poly_lagrange_to_monomial(recovered)
    proofs = reverse_bit_order(
        compute_fk20_proofs(poly_monomial, n_ext // 2, s)
    )
    return (
        cells_to_bytes(recovered),
        [ser.g1_to_bytes(p) for p in proofs],
    )


def _deduplicate_with_indices(items):
    unique, index_map, indices = [], {}, []
    for it in items:
        if it in index_map:
            indices.append(index_map[it])
        else:
            index_map[it] = len(unique)
            indices.append(len(unique))
            unique.append(it)
    return unique, indices


def compute_verify_cell_kzg_proof_batch_challenge(
    commitments_bytes, commitment_indices, cell_indices, cells_fr, proofs_bytes, s
) -> int:
    """(parity: das.rs:390-452)"""
    cell_size = s.cell_size
    cell_count = len(cell_indices)
    data = bytearray()
    data += RANDOM_CHALLENGE_KZG_CELL_BATCH_DOMAIN
    data += FIELD_ELEMENTS_PER_BLOB.to_bytes(8, "big")
    data += cell_size.to_bytes(8, "big")
    data += len(commitments_bytes).to_bytes(8, "big")
    data += cell_count.to_bytes(8, "big")
    for cb in commitments_bytes:
        data += cb
    for i in range(cell_count):
        data += commitment_indices[i].to_bytes(8, "big")
        data += cell_indices[i].to_bytes(8, "big")
        for fr in cells_fr[i]:
            data += ser.fr_to_bytes(fr)
        data += proofs_bytes[i]
    return hash_to_bls_field(hashlib.sha256(bytes(data)).digest())


def _get_coset_shift_pow_for_cell(cell_index: int, s: KZGSettingsOracle) -> int:
    """h_k^n for the cell's coset (parity: das.rs:841-872)."""
    idx = CELL_INDICES_RBL[cell_index] * s.cell_size
    return s.fft.roots_of_unity[idx]


def _get_inv_coset_shift_for_cell(cell_index: int, s: KZGSettingsOracle) -> int:
    """h_k^{-1} via the reflected root (parity: das.rs:740-776)."""
    idx = FIELD_ELEMENTS_PER_EXT_BLOB - CELL_INDICES_RBL[cell_index]
    return s.fft.roots_of_unity[idx]


def compute_commitment_to_aggregated_interpolation_poly(
    r_powers, cell_indices, cells_fr, s: KZGSettingsOracle
) -> Affine:
    """(parity: das.rs:778-839)"""
    cell_size = s.cell_size
    cells_per_ext = FIELD_ELEMENTS_PER_EXT_BLOB // cell_size
    aggregated = [0] * (cells_per_ext * cell_size)
    for i, column in enumerate(cell_indices):
        for k in range(cell_size):
            idx = column * cell_size + k
            aggregated[idx] = (aggregated[idx] + cells_fr[i][k] * r_powers[i]) % R
    used = set(cell_indices)
    agg_poly = [0] * cell_size
    for col in sorted(used):
        chunk = reverse_bit_order(
            aggregated[col * cell_size : (col + 1) * cell_size]
        )
        interp = fft_fr(chunk, inverse=True)
        interp = shift_poly(interp, _get_inv_coset_shift_for_cell(col, s))
        for k in range(cell_size):
            agg_poly[k] = (agg_poly[k] + interp[k]) % R
    return msm(s.g1_monomial[:cell_size], agg_poly)


def verify_cell_kzg_proof_batch(
    commitments_bytes: Sequence[bytes],
    cell_indices: Sequence[int],
    cells_bytes: Sequence[bytes],
    proofs_bytes: Sequence[bytes],
    s: KZGSettingsOracle,
) -> bool:
    """(parity: DAS::verify_cell_kzg_proof_batch, das.rs:294-388)"""
    cell_size = s.cell_size
    cells_per_ext = FIELD_ELEMENTS_PER_EXT_BLOB // cell_size
    cell_count = len(cells_bytes)
    if len(cell_indices) != cell_count:
        raise ValueError("Cell count mismatch")
    if len(commitments_bytes) != cell_count:
        raise ValueError("Commitment count mismatch")
    if len(proofs_bytes) != cell_count:
        raise ValueError("Proof count mismatch")
    if cell_count == 0:
        return True
    if any(idx >= cells_per_ext for idx in cell_indices):
        raise ValueError("Invalid cell index")

    proofs = [ser.g1_from_bytes(pb) for pb in proofs_bytes]
    unique_commitments_bytes, commitment_indices = _deduplicate_with_indices(
        list(commitments_bytes)
    )
    unique_commitments = [ser.g1_from_bytes(cb) for cb in unique_commitments_bytes]
    cells_fr = [cell_from_bytes(cb) for cb in cells_bytes]

    r = compute_verify_cell_kzg_proof_batch_challenge(
        unique_commitments_bytes,
        commitment_indices,
        cell_indices,
        cells_fr,
        proofs_bytes,
        s,
    )
    r_powers = compute_powers(r, cell_count)

    proof_lincomb = msm(proofs, r_powers)

    # weighted sum of commitments (das.rs:698-738)
    weights = [0] * len(unique_commitments)
    for i, ci in enumerate(commitment_indices):
        weights[ci] = (weights[ci] + r_powers[i]) % R
    final_g1_sum = msm(unique_commitments, weights)

    interp_commit = compute_commitment_to_aggregated_interpolation_poly(
        r_powers, cell_indices, cells_fr, s
    )
    final_g1_sum = G1.affine_add(final_g1_sum, G1.affine_neg(interp_commit))

    # weighted sum of proofs (das.rs:874-906)
    weighted_r = [
        r_powers[i] * _get_coset_shift_pow_for_cell(cell_indices[i], s) % R
        for i in range(cell_count)
    ]
    weighted_proofs = msm(proofs, weighted_r)
    final_g1_sum = G1.affine_add(final_g1_sum, weighted_proofs)

    power_of_s = s.g2_monomial[cell_size]
    return pairings_verify(final_g1_sum, G2_GENERATOR, proof_lincomb, power_of_s)
