"""c-kzg-4844-compatible C ABI surface: the byte-layout types and
return-code conventions of /root/reference/kzg/src/eth/c_bindings.rs, as
ctypes structures plus Python entry points that speak them.

This is the wire contract a C caller of the reference sees
(c_bindings.rs:16-113): fixed-size byte structs, CKzgRet status codes, and
out-parameters. The Python functions here take/return these structures so a
cffi/embedding shim can expose them under the exact C symbol names; the
framework-native entry points live in kzg_tpu.api.
"""

import ctypes
from enum import IntEnum
from typing import List, Optional, Tuple

from .constants import (
    BYTES_PER_BLOB,
    BYTES_PER_CELL,
    BYTES_PER_COMMITMENT,
    BYTES_PER_FIELD_ELEMENT,
    BYTES_PER_PROOF,
    CELLS_PER_EXT_BLOB,
)


class CKzgRet(IntEnum):
    """(parity: CKzgRet, c_bindings.rs:16-23)"""

    OK = 0
    BADARGS = 1
    ERROR = 2
    MALLOC = 3


class Bytes32(ctypes.Structure):
    _fields_ = [("bytes", ctypes.c_uint8 * 32)]


class Bytes48(ctypes.Structure):
    _fields_ = [("bytes", ctypes.c_uint8 * 48)]


class Blob(ctypes.Structure):
    _fields_ = [("bytes", ctypes.c_uint8 * BYTES_PER_BLOB)]


class Cell(ctypes.Structure):
    _fields_ = [("bytes", ctypes.c_uint8 * BYTES_PER_CELL)]


class KZGCommitment(Bytes48):
    pass


class KZGProof(Bytes48):
    pass


def _b(struct) -> bytes:
    return bytes(struct.bytes)


def _fill(struct_cls, data: bytes):
    s = struct_cls()
    ctypes.memmove(s.bytes, data, len(data))
    return s


def _wrap(fn):
    """Map the framework's ValueError convention to CKzgRet codes."""

    def call(*args):
        try:
            return CKzgRet.OK, fn(*args)
        except ValueError:
            return CKzgRet.BADARGS, None
        except Exception:
            return CKzgRet.ERROR, None

    return call


# ---------------------------------------------------------------------------
# Entry points (same names as the #[no_mangle] functions,
# blst/src/eip_4844.rs:163-501 and c_bindings.rs:133-354)
# ---------------------------------------------------------------------------


def blob_to_kzg_commitment(blob: Blob, settings) -> Tuple[CKzgRet, Optional[KZGCommitment]]:
    from . import api

    ret, out = _wrap(api.blob_to_kzg_commitment)(_b(blob), settings)
    return ret, _fill(KZGCommitment, out) if out is not None else None


def compute_kzg_proof(
    blob: Blob, z: Bytes32, settings
) -> Tuple[CKzgRet, Optional[KZGProof], Optional[Bytes32]]:
    from . import api

    ret, out = _wrap(api.compute_kzg_proof)(_b(blob), _b(z), settings)
    if out is None:
        return ret, None, None
    return ret, _fill(KZGProof, out[0]), _fill(Bytes32, out[1])


def compute_blob_kzg_proof(
    blob: Blob, commitment: Bytes48, settings
) -> Tuple[CKzgRet, Optional[KZGProof]]:
    from . import api

    ret, out = _wrap(api.compute_blob_kzg_proof)(_b(blob), _b(commitment), settings)
    return ret, _fill(KZGProof, out) if out is not None else None


def verify_kzg_proof(
    commitment: Bytes48, z: Bytes32, y: Bytes32, proof: Bytes48, settings
) -> Tuple[CKzgRet, Optional[bool]]:
    from . import api

    return _wrap(api.verify_kzg_proof)(_b(commitment), _b(z), _b(y), _b(proof), settings)


def verify_blob_kzg_proof(
    blob: Blob, commitment: Bytes48, proof: Bytes48, settings
) -> Tuple[CKzgRet, Optional[bool]]:
    from . import api

    return _wrap(api.verify_blob_kzg_proof)(_b(blob), _b(commitment), _b(proof), settings)


def verify_blob_kzg_proof_batch(
    blobs: List[Blob], commitments: List[Bytes48], proofs: List[Bytes48], settings
) -> Tuple[CKzgRet, Optional[bool]]:
    from . import api

    return _wrap(api.verify_blob_kzg_proof_batch)(
        [_b(b) for b in blobs], [_b(c) for c in commitments], [_b(p) for p in proofs], settings
    )


def compute_cells_and_kzg_proofs(
    blob: Blob, settings
) -> Tuple[CKzgRet, Optional[List[Cell]], Optional[List[KZGProof]]]:
    from . import api

    ret, out = _wrap(api.compute_cells_and_kzg_proofs)(_b(blob), settings)
    if out is None:
        return ret, None, None
    cells, proofs = out
    return ret, [_fill(Cell, c) for c in cells], [_fill(KZGProof, p) for p in proofs]


def recover_cells_and_kzg_proofs(
    cell_indices: List[int], cells: List[Cell], settings
) -> Tuple[CKzgRet, Optional[List[Cell]], Optional[List[KZGProof]]]:
    from . import api

    ret, out = _wrap(api.recover_cells_and_kzg_proofs)(
        list(cell_indices), [_b(c) for c in cells], settings
    )
    if out is None:
        return ret, None, None
    rc, rp = out
    return ret, [_fill(Cell, c) for c in rc], [_fill(KZGProof, p) for p in rp]


def verify_cell_kzg_proof_batch(
    commitments: List[Bytes48],
    cell_indices: List[int],
    cells: List[Cell],
    proofs: List[Bytes48],
    settings,
) -> Tuple[CKzgRet, Optional[bool]]:
    from . import api

    return _wrap(api.verify_cell_kzg_proof_batch)(
        [_b(c) for c in commitments],
        list(cell_indices),
        [_b(c) for c in cells],
        [_b(p) for p in proofs],
        settings,
    )
