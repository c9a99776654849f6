"""Oracle implementation of the EIP-4844 (Proto-Danksharding) API.

Byte-level parity with /root/reference/kzg/src/eip_4844.rs. All functions
take and return raw bytes like the `_raw` entry points there; invalid inputs
raise ValueError (the C-ABI layer maps to C_KZG_BADARGS).
"""

import hashlib
from typing import List, Tuple

from ..constants import (
    BYTES_PER_BLOB,
    BYTES_PER_FIELD_ELEMENT,
    BYTES_PER_G1,
    FIAT_SHAMIR_PROTOCOL_DOMAIN,
    FIELD_ELEMENTS_PER_BLOB,
    R_MOD as R,
    RANDOM_CHALLENGE_KZG_BATCH_DOMAIN,
)
from . import serialization as ser
from .curve import G1, G1_GENERATOR, G2_GENERATOR, Affine
from .kzg import KZGSettingsOracle
from .msm import msm
from .pairing import pairings_verify

CHALLENGE_INPUT_SIZE = 32 + BYTES_PER_BLOB + 48


def hash_to_bls_field(b32: bytes) -> int:
    return int.from_bytes(b32, "big") % R


def bytes_to_blob(blob_bytes: bytes) -> List[int]:
    if len(blob_bytes) != BYTES_PER_BLOB:
        raise ValueError(
            f"Invalid blob: Invalid byte length. Expected {BYTES_PER_BLOB} "
            f"got {len(blob_bytes)}"
        )
    return [
        ser.fr_from_bytes(blob_bytes[i : i + 32]) for i in range(0, BYTES_PER_BLOB, 32)
    ]


def compute_powers(base: int, n: int) -> List[int]:
    powers = []
    acc = 1
    for _ in range(n):
        powers.append(acc)
        acc = acc * base % R
    return powers


def compute_challenge(blob: List[int], commitment: Affine) -> int:
    """(parity: compute_challenge_rust, eip_4844.rs:920-945)"""
    data = bytearray(CHALLENGE_INPUT_SIZE)
    data[:16] = FIAT_SHAMIR_PROTOCOL_DOMAIN
    data[16:24] = (0).to_bytes(8, "big")
    data[24:32] = FIELD_ELEMENTS_PER_BLOB.to_bytes(8, "big")
    for i, v in enumerate(blob):
        data[32 + i * 32 : 32 + (i + 1) * 32] = ser.fr_to_bytes(v)
    data[32 + BYTES_PER_BLOB :] = ser.g1_to_bytes(commitment)
    return hash_to_bls_field(hashlib.sha256(bytes(data)).digest())


def compute_r_powers(commitments, zs, ys, proofs) -> List[int]:
    """(parity: compute_r_powers, eip_4844.rs:328-378)"""
    n = len(commitments)
    data = bytearray()
    data += RANDOM_CHALLENGE_KZG_BATCH_DOMAIN
    data += FIELD_ELEMENTS_PER_BLOB.to_bytes(8, "big")
    data += n.to_bytes(8, "big")
    for i in range(n):
        data += ser.g1_to_bytes(commitments[i])
        data += ser.fr_to_bytes(zs[i])
        data += ser.fr_to_bytes(ys[i])
        data += ser.g1_to_bytes(proofs[i])
    r = hash_to_bls_field(hashlib.sha256(bytes(data)).digest())
    return compute_powers(r, n)


def evaluate_polynomial_in_evaluation_form(
    poly: List[int], x: int, s: KZGSettingsOracle
) -> int:
    """Barycentric evaluation at x of the polynomial given by its evaluations
    at the bit-reversed 4096 roots (parity: eip_4844.rs:954-1003)."""
    if len(poly) != FIELD_ELEMENTS_PER_BLOB:
        raise ValueError("Incorrect field elements count.")
    roots = s.fft.brp_roots_of_unity[:FIELD_ELEMENTS_PER_BLOB]
    for i in range(FIELD_ELEMENTS_PER_BLOB):
        if x == roots[i]:
            return poly[i]
    out = 0
    for i in range(FIELD_ELEMENTS_PER_BLOB):
        out += poly[i] * roots[i] % R * pow(x - roots[i], R - 2, R)
    out %= R
    out = out * pow(FIELD_ELEMENTS_PER_BLOB, R - 2, R) % R
    out = out * (pow(x, FIELD_ELEMENTS_PER_BLOB, R) - 1) % R
    return out


# ---------------------------------------------------------------------------
# Public API (raw bytes)
# ---------------------------------------------------------------------------


def blob_to_kzg_commitment(blob_bytes: bytes, s: KZGSettingsOracle) -> bytes:
    blob = bytes_to_blob(blob_bytes)
    return ser.g1_to_bytes(s.commit_to_poly_lagrange_brp(blob))


def _compute_kzg_proof_fr(blob: List[int], z: int, s: KZGSettingsOracle):
    """(parity: compute_kzg_proof_rust, eip_4844.rs:437-519)"""
    y = evaluate_polynomial_in_evaluation_form(blob, z, s)
    roots = s.fft.brp_roots_of_unity[:FIELD_ELEMENTS_PER_BLOB]
    n = FIELD_ELEMENTS_PER_BLOB
    q = [0] * n
    m = 0
    for i in range(n):
        if z == roots[i]:
            m = i + 1
            continue
        q[i] = (blob[i] - y) * pow(roots[i] - z, R - 2, R) % R
    if m != 0:
        m -= 1
        q[m] = 0
        for i in range(n):
            if i == m:
                continue
            # (p_i - y) * w_i / (z * (z - w_i))
            q[m] = (
                q[m] + (blob[i] - y) * roots[i] % R * pow(z * (z - roots[i]) % R, R - 2, R)
            ) % R
    proof = msm(s.g1_lagrange_brp, q)
    return proof, y


def compute_kzg_proof(
    blob_bytes: bytes, z_bytes: bytes, s: KZGSettingsOracle
) -> Tuple[bytes, bytes]:
    blob = bytes_to_blob(blob_bytes)
    z = ser.fr_from_bytes(z_bytes)
    proof, y = _compute_kzg_proof_fr(blob, z, s)
    return ser.g1_to_bytes(proof), ser.fr_to_bytes(y)


def compute_blob_kzg_proof(
    blob_bytes: bytes, commitment_bytes: bytes, s: KZGSettingsOracle
) -> bytes:
    blob = bytes_to_blob(blob_bytes)
    commitment = ser.g1_from_bytes(commitment_bytes)
    challenge = compute_challenge(blob, commitment)
    proof, _ = _compute_kzg_proof_fr(blob, challenge, s)
    return ser.g1_to_bytes(proof)


def verify_kzg_proof(
    commitment_bytes: bytes,
    z_bytes: bytes,
    y_bytes: bytes,
    proof_bytes: bytes,
    s: KZGSettingsOracle,
) -> bool:
    commitment = ser.g1_from_bytes(commitment_bytes)
    z = ser.fr_from_bytes(z_bytes)
    y = ser.fr_from_bytes(y_bytes)
    proof = ser.g1_from_bytes(proof_bytes)
    return s.check_proof_single(commitment, proof, z, y)


def verify_blob_kzg_proof(
    blob_bytes: bytes, commitment_bytes: bytes, proof_bytes: bytes, s: KZGSettingsOracle
) -> bool:
    blob = bytes_to_blob(blob_bytes)
    commitment = ser.g1_from_bytes(commitment_bytes)
    proof = ser.g1_from_bytes(proof_bytes)
    challenge = compute_challenge(blob, commitment)
    y = evaluate_polynomial_in_evaluation_form(blob, challenge, s)
    return s.check_proof_single(commitment, proof, challenge, y)


def _verify_kzg_proof_batch(commitments, zs, ys, proofs, s: KZGSettingsOracle) -> bool:
    """(parity: verify_kzg_proof_batch, eip_4844.rs:380-435)"""
    n = len(commitments)
    r_powers = compute_r_powers(commitments, zs, ys, proofs)
    proof_lincomb = msm(proofs, r_powers)
    c_minus_y = [
        G1.affine_add(commitments[i], G1.affine_neg(G1.mul_scalar(G1_GENERATOR, ys[i])))
        for i in range(n)
    ]
    r_times_z = [r_powers[i] * zs[i] % R for i in range(n)]
    proof_z_lincomb = msm(proofs, r_times_z)
    c_minus_y_lincomb = msm(c_minus_y, r_powers)
    rhs_g1 = G1.affine_add(c_minus_y_lincomb, proof_z_lincomb)
    return pairings_verify(proof_lincomb, s.g2_monomial[1], rhs_g1, G2_GENERATOR)


def verify_blob_kzg_proof_batch(
    blobs_bytes: List[bytes],
    commitments_bytes: List[bytes],
    proofs_bytes: List[bytes],
    s: KZGSettingsOracle,
) -> bool:
    """(parity: verify_blob_kzg_proof_batch_rust, eip_4844.rs:736-832)"""
    if not (len(blobs_bytes) == len(commitments_bytes) == len(proofs_bytes)):
        raise ValueError("Invalid amount of arguments")
    if len(blobs_bytes) == 0:
        return True
    if len(blobs_bytes) == 1:
        return verify_blob_kzg_proof(
            blobs_bytes[0], commitments_bytes[0], proofs_bytes[0], s
        )
    blobs = [bytes_to_blob(b) for b in blobs_bytes]
    commitments = [ser.g1_from_bytes(c) for c in commitments_bytes]
    proofs = [ser.g1_from_bytes(p) for p in proofs_bytes]
    zs, ys = [], []
    for blob, commitment in zip(blobs, commitments):
        challenge = compute_challenge(blob, commitment)
        zs.append(challenge)
        ys.append(evaluate_polynomial_in_evaluation_form(blob, challenge, s))
    return _verify_kzg_proof_batch(commitments, zs, ys, proofs, s)
