"""The complete c-kzg-4844 / rust-kzg API surface in one namespace.

A user of the reference's bindings (ethereum/c-kzg-4844's Python binding,
or rust-kzg's `_raw` functions -- /root/reference/kzg/src/eip_4844.rs and
/root/reference/kzg/src/eth/eip_7594.rs) finds the same functions here with
the same byte-level semantics; compute-heavy paths run on the TPU, host
paths on the native C++ core. Invalid inputs raise ValueError (the
reference returns Err / C_KZG_BADARGS).

    from kzg_tpu import api as kzg
    s = kzg.load_trusted_setup_file("trusted_setup.txt")
    commitment = kzg.blob_to_kzg_commitment(blob, s)
"""

from typing import List, Optional, Sequence, Tuple

from . import eip4844 as _e4
from . import eip7594 as _e7
from .settings import DeviceKZGSettings, load_settings
from .oracle.kzg import (
    load_trusted_setup as _load_oracle,
    parse_trusted_setup_string,
)

Settings = DeviceKZGSettings


# ---- trusted setup ---------------------------------------------------------


def load_trusted_setup(
    g1_monomial_bytes: bytes, g1_lagrange_bytes: bytes, g2_monomial_bytes: bytes
) -> Settings:
    """(parity: load_trusted_setup, blst/src/eip_4844.rs:180)"""
    return DeviceKZGSettings(
        _load_oracle(g1_monomial_bytes, g1_lagrange_bytes, g2_monomial_bytes)
    )


def load_trusted_setup_file(path: Optional[str] = None) -> Settings:
    """(parity: load_trusted_setup_file, blst/src/eip_4844.rs:227)"""
    return load_settings(path)


# ---- EIP-4844 ---------------------------------------------------------------


def blob_to_kzg_commitment(blob: bytes, s: Settings) -> bytes:
    return _e4.blob_to_kzg_commitment(blob, s)


def compute_kzg_proof(blob: bytes, z: bytes, s: Settings) -> Tuple[bytes, bytes]:
    return _e4.compute_kzg_proof(blob, z, s)


def compute_blob_kzg_proof(blob: bytes, commitment: bytes, s: Settings) -> bytes:
    return _e4.compute_blob_kzg_proof(blob, commitment, s)


def verify_kzg_proof(
    commitment: bytes, z: bytes, y: bytes, proof: bytes, s: Settings
) -> bool:
    return _e4.verify_kzg_proof(commitment, z, y, proof, s)


def verify_blob_kzg_proof(blob: bytes, commitment: bytes, proof: bytes, s: Settings) -> bool:
    return _e4.verify_blob_kzg_proof(blob, commitment, proof, s)


def verify_blob_kzg_proof_batch(
    blobs: Sequence[bytes],
    commitments: Sequence[bytes],
    proofs: Sequence[bytes],
    s: Settings,
    mesh=None,
) -> bool:
    """mesh: optional jax.sharding.Mesh with a "blobs" axis to shard the
    batch across chips (ICI collectives combine the MSM partials)."""
    return _e4.verify_blob_kzg_proof_batch(blobs, commitments, proofs, s, mesh=mesh)


# batched throughput variants (beyond the reference's surface)
blob_to_kzg_commitment_batch = _e4.blob_to_kzg_commitment_batch
compute_blob_kzg_proof_batch = _e4.compute_blob_kzg_proof_batch


# ---- EIP-7594 ---------------------------------------------------------------


def compute_cells(blob: bytes, s: Settings) -> List[bytes]:
    """(parity: compute_cells_raw, kzg/src/eth/eip_7594.rs:88-103)"""
    cells, _ = _e7.compute_cells_and_kzg_proofs(blob, s, with_proofs=False)
    return cells


def compute_cells_and_kzg_proofs(
    blob: bytes, s: Settings
) -> Tuple[List[bytes], List[bytes]]:
    """(parity: compute_cells_and_kzg_proofs_raw, eth/eip_7594.rs:60-86)"""
    return _e7.compute_cells_and_kzg_proofs(blob, s)


def recover_cells_and_kzg_proofs(
    cell_indices: Sequence[int], cells: Sequence[bytes], s: Settings
) -> Tuple[List[bytes], List[bytes]]:
    """(parity: recover_cells_and_kzg_proofs_raw, eth/eip_7594.rs:19-58)"""
    return _e7.recover_cells_and_kzg_proofs(cell_indices, cells, s)


def recover_cells_and_kzg_proofs_batch(
    cell_indices_list, cells_list, s: Settings
):
    """(parity: recover_cells_and_kzg_proofs_batch, das.rs:210-242)"""
    return _e7.recover_cells_and_kzg_proofs_batch(cell_indices_list, cells_list, s)


def verify_cell_kzg_proof_batch(
    commitments: Sequence[bytes],
    cell_indices: Sequence[int],
    cells: Sequence[bytes],
    proofs: Sequence[bytes],
    s: Settings,
) -> bool:
    """(parity: verify_cell_kzg_proof_batch_raw, eth/eip_7594.rs:105-139)"""
    return _e7.verify_cell_kzg_proof_batch(commitments, cell_indices, cells, proofs, s)


def compute_verify_cell_kzg_proof_batch_challenge(
    commitments: Sequence[bytes],
    commitment_indices: Sequence[int],
    cell_indices: Sequence[int],
    cells: Sequence[bytes],
    proofs: Sequence[bytes],
) -> int:
    """Fiat-Shamir challenge r for cell batch verification (parity:
    DAS::compute_verify_cell_kzg_proof_batch_challenge, kzg/src/das.rs:390-452;
    exported per backend, blst/src/eip_7594.rs:30-97). `commitments` are the
    DEDUPLICATED commitments; `commitment_indices` maps each cell to its slot."""
    return _e7.compute_verify_cell_kzg_proof_batch_challenge(
        commitments, commitment_indices, cell_indices, cells, proofs
    )


def compute_kzg_proof_multi(
    poly_coeffs: Sequence[int], x: int, n: int, s: Settings
) -> bytes:
    """(parity: KZGSettings::compute_proof_multi,
    blst/src/types/kzg_settings.rs:198-234; device quotient via
    ops/poly.poly_fast_div)"""
    from . import multiproof as _mp

    return _mp.compute_kzg_proof_multi(poly_coeffs, x, n, s)


def verify_kzg_proof_multi(
    commitment: bytes, proof: bytes, x: int, ys: Sequence[int], s: Settings
) -> bool:
    """(parity: KZGSettings::check_proof_multi,
    blst/src/types/kzg_settings.rs:236-277; device coset interpolation)"""
    from . import multiproof as _mp

    return _mp.verify_kzg_proof_multi(commitment, proof, x, ys, s)
