"""Structural tests for the C-ABI layer: byte layouts and return codes
(parity: /root/reference/kzg/src/eth/c_bindings.rs:16-113)."""

import ctypes

from kzg_tpu import c_abi as C
from kzg_tpu.constants import BYTES_PER_BLOB, BYTES_PER_CELL


def test_struct_sizes():
    assert ctypes.sizeof(C.Bytes32) == 32
    assert ctypes.sizeof(C.Bytes48) == 48
    assert ctypes.sizeof(C.Blob) == BYTES_PER_BLOB
    assert ctypes.sizeof(C.Cell) == BYTES_PER_CELL
    assert ctypes.sizeof(C.KZGCommitment) == 48
    assert ctypes.sizeof(C.KZGProof) == 48


def test_ret_codes():
    assert C.CKzgRet.OK == 0
    assert C.CKzgRet.BADARGS == 1
    assert C.CKzgRet.ERROR == 2
    assert C.CKzgRet.MALLOC == 3


def test_badargs_mapping(device_settings):
    blob = C.Blob()  # all zeros is a VALID blob (all elements canonical)
    bad = C.Bytes48()  # zero bytes: invalid compressed point
    ret, _ = C.compute_blob_kzg_proof(blob, bad, device_settings)
    assert ret == C.CKzgRet.BADARGS


def test_commit_roundtrip(device_settings):
    from kzg_tpu import api

    blob = C.Blob()
    ret, commitment = C.blob_to_kzg_commitment(blob, device_settings)
    assert ret == C.CKzgRet.OK
    want = api.blob_to_kzg_commitment(bytes(BYTES_PER_BLOB), device_settings)
    assert bytes(commitment.bytes) == want
