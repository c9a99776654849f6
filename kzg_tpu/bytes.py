"""Vectorized byte <-> limb conversions between the wire format (32-byte
big-endian field elements, c-kzg-4844 layout) and the device limb layout
(little-endian 16-bit limbs on axis 0).

The reference does this element-at-a-time through blst
(/root/reference/kzg/src/eip_4844.rs:867-880 bytes_to_blob); here a whole
blob converts with a handful of numpy reshapes so host marshalling never
bottlenecks the device.
"""

from typing import Tuple

import numpy as np

from .constants import (
    BYTES_PER_BLOB,
    BYTES_PER_FIELD_ELEMENT,
    FR_LIMBS,
    R_MOD,
)

_R_LIMBS = np.array(
    [(R_MOD >> (16 * k)) & 0xFFFF for k in range(FR_LIMBS)], dtype=np.uint32
)


def frs_from_bytes(data: bytes) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenated 32-byte big-endian scalars -> ((16, n) canonical limbs,
    (n,) bool validity mask: value < r)."""
    if len(data) % BYTES_PER_FIELD_ELEMENT != 0:
        raise ValueError("Invalid byte length")
    raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, BYTES_PER_FIELD_ELEMENT)
    n = raw.shape[0]
    limbs = np.empty((FR_LIMBS, n), dtype=np.uint32)
    for k in range(FR_LIMBS):
        hi = raw[:, 30 - 2 * k].astype(np.uint32)
        lo = raw[:, 31 - 2 * k].astype(np.uint32)
        limbs[k] = (hi << 8) | lo
    # strict less-than against the modulus, most-significant limb first
    lt = np.zeros(n, dtype=bool)
    eq = np.ones(n, dtype=bool)
    for k in range(FR_LIMBS - 1, -1, -1):
        lt |= eq & (limbs[k] < _R_LIMBS[k])
        eq &= limbs[k] == _R_LIMBS[k]
    return limbs, lt


def frs_to_bytes(limbs: np.ndarray) -> bytes:
    """(16, n) canonical limbs -> concatenated 32-byte big-endian scalars."""
    limbs = np.asarray(limbs, dtype=np.uint32)
    n = limbs.shape[-1]
    out = np.zeros((n, BYTES_PER_FIELD_ELEMENT), dtype=np.uint8)
    for k in range(FR_LIMBS):
        out[:, 30 - 2 * k] = (limbs[k] >> 8).astype(np.uint8)
        out[:, 31 - 2 * k] = (limbs[k] & 0xFF).astype(np.uint8)
    return out.tobytes()


def blob_to_scalars(blob_bytes: bytes) -> np.ndarray:
    """Validated blob -> (16, 4096) canonical limbs. Raises on bad length or
    non-canonical elements (parity: bytes_to_blob, eip_4844.rs:867-880)."""
    if len(blob_bytes) != BYTES_PER_BLOB:
        raise ValueError(
            f"Invalid blob: Invalid byte length. Expected {BYTES_PER_BLOB} "
            f"got {len(blob_bytes)}"
        )
    limbs, ok = frs_from_bytes(blob_bytes)
    if not ok.all():
        raise ValueError("Invalid blob: scalar is not canonical")
    return limbs


def blobs_to_scalars(blobs) -> np.ndarray:
    """Many validated blobs -> (16, B, 4096) canonical limbs in ONE numpy
    pass (per-blob loops cost ~1.5 ms each at batch-verify sizes)."""
    for b in blobs:
        if len(b) != BYTES_PER_BLOB:
            raise ValueError(
                f"Invalid blob: Invalid byte length. Expected {BYTES_PER_BLOB} "
                f"got {len(b)}"
            )
    limbs, ok = frs_from_bytes(b"".join(blobs))
    if not ok.all():
        raise ValueError("Invalid blob: scalar is not canonical")
    n = BYTES_PER_BLOB // BYTES_PER_FIELD_ELEMENT
    return limbs.reshape(FR_LIMBS, len(blobs), n)


def fr_from_bytes(b32: bytes) -> np.ndarray:
    """One 32-byte scalar -> (16, 1) canonical limbs; raises if >= r."""
    if len(b32) != BYTES_PER_FIELD_ELEMENT:
        raise ValueError("Invalid field element length")
    limbs, ok = frs_from_bytes(b32)
    if not ok[0]:
        raise ValueError("Invalid scalar: not canonical")
    return limbs
