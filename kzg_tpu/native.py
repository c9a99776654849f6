"""ctypes binding to the native C++ host core (native/libkzg_native.so).

Provides: batch point codecs with subgroup checks, the pairing check,
SHA-256, and small host group ops -- the role blst's C/asm plays for the
reference (/root/reference/blst/src/kzg_proofs.rs:74-100). All entry points
fall back to the pure-Python oracle when the shared library is missing
(build with native/build.sh).
"""

import ctypes
import os
from typing import List, Optional, Tuple

from .constants import P_MOD as P, R_MOD

Affine = Optional[Tuple[int, int]]

_LIB_PATHS = [
    os.environ.get("KZG_TPU_NATIVE_LIB", ""),
    os.path.join(os.path.dirname(__file__), "..", "native", "libkzg_native.so"),
]


def _load():
    for p in _LIB_PATHS:
        if p and os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                lib.kzgn_version.restype = ctypes.c_int
                if lib.kzgn_version() != 5:
                    continue
                lib.kzgn_sha256.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_size_t,
                    ctypes.c_char_p,
                ]
                lib.kzgn_g1_decompress_batch.restype = ctypes.c_long
                lib.kzgn_g2_decompress_batch.restype = ctypes.c_long
                lib.kzgn_g1_compress_batch.restype = ctypes.c_long
                lib.kzgn_pairings_verify.restype = ctypes.c_int
                lib.kzgn_g1_mul.restype = ctypes.c_int
                lib.kzgn_g1_add.restype = ctypes.c_int
                lib.kzgn_g1_msm.restype = ctypes.c_int
                lib.kzgn_verify_kzg_proof.restype = ctypes.c_int
                lib.kzgn_g1_in_subgroup.restype = ctypes.c_int
                lib.kzgn_verify_blob_batch_tail.restype = ctypes.c_int
                lib.kzgn_eval_blobs_batch.restype = ctypes.c_long
                lib.kzgn_verify_cell_batch.restype = ctypes.c_int
                lib.kzgn_fk20_init.restype = ctypes.c_int
                lib.kzgn_compute_cells.restype = ctypes.c_long
                lib.kzgn_recover_cells.restype = ctypes.c_long
                lib.kzgn_commit_init.restype = ctypes.c_int
                lib.kzgn_blob_commit.restype = ctypes.c_long
                lib.kzgn_compute_kzg_proof.restype = ctypes.c_long
                return lib
            except OSError:
                continue
    return None


_lib = _load()


def available() -> bool:
    return _lib is not None


def sha256(data: bytes) -> bytes:
    if _lib is None:
        import hashlib

        return hashlib.sha256(data).digest()
    out = ctypes.create_string_buffer(32)
    _lib.kzgn_sha256(data, len(data), out)
    return out.raw


def _xy_to_point(xy: bytes, inf: int) -> Affine:
    if inf:
        return None
    return (int.from_bytes(xy[:48], "big"), int.from_bytes(xy[48:96], "big"))


def _point_to_xy(pt: Affine) -> Tuple[bytes, int]:
    if pt is None:
        return bytes(96), 1
    return pt[0].to_bytes(48, "big") + pt[1].to_bytes(48, "big"), 0


def g1_decompress_batch(
    compressed: bytes, subgroup_check: bool = True
) -> List[Affine]:
    """48n bytes -> list of affine points (None = infinity).
    Raises ValueError naming the first invalid point."""
    n = len(compressed) // 48
    if len(compressed) != 48 * n:
        raise ValueError("g1: expected 48-byte compressed points")
    if _lib is None:
        from .oracle import serialization as ser

        return [
            ser.g1_from_bytes(compressed[48 * i : 48 * (i + 1)], subgroup_check)
            for i in range(n)
        ]
    out = ctypes.create_string_buffer(96 * n)
    infs = ctypes.create_string_buffer(n)
    rc = _lib.kzgn_g1_decompress_batch(
        compressed, ctypes.c_size_t(n), int(subgroup_check), out, infs
    )
    if rc:
        raise ValueError(f"g1: invalid point at index {rc - 1}")
    return [
        _xy_to_point(out.raw[96 * i : 96 * (i + 1)], infs.raw[i]) for i in range(n)
    ]


def g2_decompress_batch(
    compressed: bytes, subgroup_check: bool = True
) -> List[Optional[tuple]]:
    n = len(compressed) // 96
    if len(compressed) != 96 * n:
        raise ValueError("g2: expected 96-byte compressed points")
    if _lib is None:
        from .oracle import serialization as ser

        return [
            ser.g2_from_bytes(compressed[96 * i : 96 * (i + 1)], subgroup_check)
            for i in range(n)
        ]
    out = ctypes.create_string_buffer(192 * n)
    infs = ctypes.create_string_buffer(n)
    rc = _lib.kzgn_g2_decompress_batch(
        compressed, ctypes.c_size_t(n), int(subgroup_check), out, infs
    )
    if rc:
        raise ValueError(f"g2: invalid point at index {rc - 1}")
    pts = []
    for i in range(n):
        if infs.raw[i]:
            pts.append(None)
            continue
        b = out.raw[192 * i : 192 * (i + 1)]
        x = (int.from_bytes(b[:48], "big"), int.from_bytes(b[48:96], "big"))
        y = (int.from_bytes(b[96:144], "big"), int.from_bytes(b[144:192], "big"))
        pts.append((x, y))
    return pts


def g1_compress_batch(points: List[Affine]) -> List[bytes]:
    n = len(points)
    if _lib is None:
        from .oracle import serialization as ser

        return [ser.g1_to_bytes(p) for p in points]
    xy = bytearray(96 * n)
    infs = bytearray(n)
    for i, p in enumerate(points):
        b, inf = _point_to_xy(p)
        xy[96 * i : 96 * (i + 1)] = b
        infs[i] = inf
    out = ctypes.create_string_buffer(48 * n)
    rc = _lib.kzgn_g1_compress_batch(bytes(xy), bytes(infs), ctypes.c_size_t(n), out)
    if rc:
        raise ValueError(f"g1: invalid affine coordinates at index {rc - 1}")
    return [out.raw[48 * i : 48 * (i + 1)] for i in range(n)]


def _g2_to_bytes_raw(pt) -> Tuple[bytes, int]:
    if pt is None:
        return bytes(192), 1
    x, y = pt
    return (
        x[0].to_bytes(48, "big")
        + x[1].to_bytes(48, "big")
        + y[0].to_bytes(48, "big")
        + y[1].to_bytes(48, "big")
    ), 0


def pairings_verify(a1: Affine, a2, b1: Affine, b2) -> bool:
    """e(a1, a2) == e(b1, b2) (parity: blst/src/kzg_proofs.rs:74-100)."""
    if _lib is None:
        from .oracle.pairing import pairings_verify as opv

        return opv(a1, a2, b1, b2)
    a1b, a1i = _point_to_xy(a1)
    b1b, b1i = _point_to_xy(b1)
    a2b, a2i = _g2_to_bytes_raw(a2)
    b2b, b2i = _g2_to_bytes_raw(b2)
    rc = _lib.kzgn_pairings_verify(a1b, a1i, a2b, a2i, b1b, b1i, b2b, b2i)
    if rc < 0:
        raise ValueError("pairings_verify: malformed input")
    return rc == 1


def verify_kzg_proof_fused(
    commitment_bytes: bytes, z_bytes: bytes, y_bytes: bytes, proof_bytes: bytes, g2s
) -> Optional[bool]:
    """Full single-point verify in ONE native call (decompress with fast
    endomorphism subgroup checks + Shamir double ladder + one pairing) --
    no FFI round trips on the latency path. Returns None when the native
    library is unavailable (callers fall back to the composed path); raises
    ValueError on malformed points / non-canonical scalars (BADARGS)."""
    if _lib is None:
        return None
    rc = _lib.kzgn_verify_kzg_proof(
        commitment_bytes, z_bytes, y_bytes, proof_bytes, *_g2_to_bytes_raw(g2s)
    )
    if rc == -2:
        raise ValueError("bytes_to_bls_field: scalar not canonical")
    if rc < 0:
        raise ValueError("invalid commitment/proof point")
    return rc == 1


def verify_blob_batch_tail(
    commitments_comp: bytes,
    proofs_comp: bytes,
    n: int,
    zs: List[int],
    ys: List[int],
    r: int,
    g2s,
) -> Optional[bool]:
    """Fused batch-verification host tail in ONE native call: decompress
    both point arrays (fast subgroup checks), the two folded r-power linear
    combinations, and the prepared-line dual pairing. Returns None when the
    native library is unavailable; raises ValueError on invalid points
    (message names which array and index, matching the composed path)."""
    if _lib is None:
        return None
    zs_be = b"".join(z.to_bytes(32, "big") for z in zs)
    ys_be = b"".join(y.to_bytes(32, "big") for y in ys)
    g2b, g2i = _g2_to_bytes_raw(g2s)
    rc = _lib.kzgn_verify_blob_batch_tail(
        commitments_comp,
        proofs_comp,
        ctypes.c_size_t(n),
        zs_be,
        ys_be,
        r.to_bytes(32, "big"),
        g2b,
        g2i,
    )
    if rc >= 0:
        return rc == 1
    if rc <= -200:
        raise ValueError(f"g1: invalid point at index {-200 - rc}")
    if rc <= -100:
        raise ValueError(f"g1: invalid point at index {-100 - rc}")
    raise ValueError("verify_blob_batch_tail: malformed input")


def verify_cell_batch(
    unique_commitments_comp: bytes,
    nu: int,
    commitment_indices: List[int],
    cell_indices: List[int],
    cells_wire: bytes,
    proofs_comp: bytes,
    n: int,
    r: int,
    roots_ext_mont: bytes,
    g1mono_xy: bytes,
    g1mono_inf: bytes,
    g2s64,
) -> Optional[bool]:
    """EIP-7594 cell-batch verification tail entirely in the native host
    core (parity: DAS::verify_cell_kzg_proof_batch, das.rs:294-452).
    Returns None when the native library is unavailable; raises ValueError
    on invalid points/scalars."""
    if _lib is None:
        return None
    ci = (ctypes.c_uint32 * n)(*commitment_indices)
    xi = (ctypes.c_uint32 * n)(*cell_indices)
    g2b, g2i = _g2_to_bytes_raw(g2s64)
    rc = _lib.kzgn_verify_cell_batch(
        unique_commitments_comp,
        ctypes.c_size_t(nu),
        ci,
        xi,
        cells_wire,
        proofs_comp,
        ctypes.c_size_t(n),
        r.to_bytes(32, "big"),
        roots_ext_mont,
        g1mono_xy,
        g1mono_inf,
        g2b,
        g2i,
    )
    if rc >= 0:
        return rc == 1
    if rc == -2:
        raise ValueError("Invalid cell: scalar not canonical")
    if rc == -3:
        raise ValueError("Invalid cell index")
    raise ValueError("g1: invalid point")


_fk20_ready = False


def fk20_init(xext_xy: bytes, xext_inf: bytes, roots_ext_mont: bytes) -> bool:
    """One-time registration of the FK20 context (x_ext_fft columns + root
    tables) with the native host engine. Returns False if unavailable."""
    global _fk20_ready
    if _lib is None:
        return False
    if _fk20_ready:
        return True
    rc = _lib.kzgn_fk20_init(xext_xy, xext_inf, roots_ext_mont)
    if rc != 0:
        raise ValueError("fk20_init: invalid setup points")
    _fk20_ready = True
    return True


def compute_cells(blob_bytes: bytes, with_proofs: int):
    """Host FK20: blob -> (8192 extended scalars BE in brp cell order,
    128 compressed proofs). with_proofs: 0 cells only, 1 both, 2 proofs
    only. Returns None when unavailable (callers fall back to the device
    kernel); raises ValueError on non-canonical blob scalars."""
    if _lib is None or not _fk20_ready:
        return None
    cells_out = ctypes.create_string_buffer(8192 * 32)
    proofs_out = ctypes.create_string_buffer(128 * 48)
    rc = _lib.kzgn_compute_cells(blob_bytes, with_proofs, cells_out, proofs_out)
    if rc > 0:
        raise ValueError("Invalid blob: scalar is not canonical")
    if rc != 0:
        return None
    return cells_out.raw, proofs_out.raw


def recover_cells(cell_indices: List[int], cells_wire: bytes, with_proofs: bool):
    """Host erasure recovery (+ optional FK20 proof recomputation).
    Returns (recovered 8192 scalars BE, proofs bytes or None), or None when
    the native engine is unavailable."""
    if _lib is None or not _fk20_ready:
        return None
    n = len(cell_indices)
    ci = (ctypes.c_uint32 * n)(*cell_indices)
    rec = ctypes.create_string_buffer(8192 * 32)
    proofs = ctypes.create_string_buffer(128 * 48) if with_proofs else None
    rc = _lib.kzgn_recover_cells(ci, ctypes.c_size_t(n), cells_wire, rec, proofs)
    if rc > 0:
        raise ValueError("Invalid cell: scalar not canonical")
    if rc != 0:
        return None
    return rec.raw, (proofs.raw if with_proofs else None)


_commit_ready = False


def commit_init(points_xy: bytes, points_inf: bytes, n: int) -> bool:
    """Register the Lagrange-brp setup with the native host MSM (single-op
    commit/prove path). Idempotent; False when unavailable."""
    global _commit_ready
    if _lib is None:
        return False
    if _commit_ready:
        return True
    rc = _lib.kzgn_commit_init(points_xy, points_inf, ctypes.c_size_t(n))
    if rc != 0:
        raise ValueError("commit_init: invalid setup points")
    _commit_ready = True
    return True


def blob_commit(blob_bytes: bytes) -> Optional[bytes]:
    """Single-blob commitment on the host (GLV Pippenger over the
    registered setup, ~85 ms). None when unavailable; ValueError on a
    non-canonical scalar."""
    if _lib is None or not _commit_ready:
        return None
    out = ctypes.create_string_buffer(48)
    rc = _lib.kzgn_blob_commit(blob_bytes, out)
    if rc > 0:
        raise ValueError("Invalid blob: scalar is not canonical")
    if rc != 0:
        return None
    return out.raw


def compute_kzg_proof_host(
    blob_bytes: bytes, z: int, roots_brp_mont: bytes
) -> Optional[Tuple[bytes, bytes]]:
    """(proof, y) for one blob at z, fully on the host (barycentric + the
    in-domain quotient branch + 4096-point MSM). None when unavailable."""
    if _lib is None or not _commit_ready:
        return None
    proof = ctypes.create_string_buffer(48)
    y = ctypes.create_string_buffer(32)
    rc = _lib.kzgn_compute_kzg_proof(
        blob_bytes, z.to_bytes(32, "big"), roots_brp_mont, proof, y
    )
    if rc > 0:
        raise ValueError("Invalid blob: scalar is not canonical")
    if rc == -1:
        raise ValueError("bytes_to_bls_field: scalar not canonical")
    if rc != 0:
        return None
    return proof.raw, y.raw


def g1_in_subgroup(pt: Affine, fast: bool = True) -> bool:
    """Membership probe (differential-test hook for the endomorphism check)."""
    if _lib is None:
        raise RuntimeError("native library unavailable")
    if pt is None:
        return True
    b, _ = _point_to_xy(pt)
    rc = _lib.kzgn_g1_in_subgroup(b, 1 if fast else 0)
    if rc < 0:
        raise ValueError("malformed point")
    return rc == 1


def g1_mul(pt: Affine, scalar: int) -> Affine:
    if _lib is None:
        from .oracle.curve import G1

        return G1.mul_scalar(pt, scalar)
    b, inf = _point_to_xy(pt)
    out = ctypes.create_string_buffer(96)
    rc = _lib.kzgn_g1_mul(b, inf, (scalar % (1 << 256)).to_bytes(32, "big"), out)
    if rc < 0:
        raise ValueError("g1_mul: malformed input")
    return None if rc == 1 else _xy_to_point(out.raw, 0)


def g2_mul(pt, scalar: int):
    if _lib is None:
        from .oracle.curve import G2

        return G2.mul_scalar(pt, scalar)
    b, inf = _g2_to_bytes_raw(pt)
    out = ctypes.create_string_buffer(192)
    rc = _lib.kzgn_g2_mul(b, inf, (scalar % (1 << 256)).to_bytes(32, "big"), out)
    if rc < 0:
        raise ValueError("g2_mul: malformed input")
    if rc == 1:
        return None
    raw = out.raw
    return (
        (int.from_bytes(raw[:48], "big"), int.from_bytes(raw[48:96], "big")),
        (int.from_bytes(raw[96:144], "big"), int.from_bytes(raw[144:192], "big")),
    )


def g2_add(p, q):
    if _lib is None:
        from .oracle.curve import G2

        return G2.affine_add(p, q)
    pb, pi = _g2_to_bytes_raw(p)
    qb, qi = _g2_to_bytes_raw(q)
    out = ctypes.create_string_buffer(192)
    rc = _lib.kzgn_g2_add(pb, pi, qb, qi, out)
    if rc < 0:
        raise ValueError("g2_add: malformed input")
    if rc == 1:
        return None
    raw = out.raw
    return (
        (int.from_bytes(raw[:48], "big"), int.from_bytes(raw[48:96], "big")),
        (int.from_bytes(raw[96:144], "big"), int.from_bytes(raw[144:192], "big")),
    )


def g1_msm(points: List[Affine], scalars: List[int]) -> Affine:
    """Host MSM (windowed Pippenger in the C++ core): sum scalars[i] * P_i.
    For the small batch-verification lincombs (n <= a few hundred), where a
    device round trip would dominate (role parity: verify_kzg_proof_batch's
    3-MSM fold, /root/reference/kzg/src/eip_4844.rs:380-435)."""
    n = len(points)
    if len(scalars) != n:
        raise ValueError("g1_msm: length mismatch")
    if _lib is None or n == 0:
        from .oracle.msm import msm as oracle_msm

        return oracle_msm(points, [s % R_MOD for s in scalars])
    xy = bytearray(96 * n)
    infs = bytearray(n)
    sc = bytearray(32 * n)
    for i, (pt, s) in enumerate(zip(points, scalars)):
        b, inf = _point_to_xy(pt)
        xy[96 * i : 96 * (i + 1)] = b
        infs[i] = inf
        sc[32 * i : 32 * (i + 1)] = (s % (1 << 256)).to_bytes(32, "big")
    out = ctypes.create_string_buffer(96)
    rc = _lib.kzgn_g1_msm(
        bytes(xy), bytes(infs), ctypes.c_size_t(n), bytes(sc), out
    )
    if rc < 0:
        raise ValueError("g1_msm: malformed input")
    return None if rc == 1 else _xy_to_point(out.raw, 0)


def g1_add(p: Affine, q: Affine) -> Affine:
    if _lib is None:
        from .oracle.curve import G1

        return G1.affine_add(p, q)
    pb, pi = _point_to_xy(p)
    qb, qi = _point_to_xy(q)
    out = ctypes.create_string_buffer(96)
    rc = _lib.kzgn_g1_add(pb, pi, qb, qi, out)
    if rc < 0:
        raise ValueError("g1_add: malformed input")
    return None if rc == 1 else _xy_to_point(out.raw, 0)


def eval_barycentric_4096(
    blob_bytes: bytes, z_bytes: bytes, roots_brp_bytes: bytes
):
    """Host barycentric evaluation of one blob at z over the bit-reversed
    4096-root domain (parity: evaluate_polynomial_in_evaluation_form,
    eip_4844.rs:954-1003). Returns the 32-byte big-endian y, or None if the
    native library is unavailable. Raises ValueError on a non-canonical
    scalar."""
    if _lib is None:
        return None
    out = ctypes.create_string_buffer(32)
    rc = _lib.kzgn_eval_barycentric_4096(
        blob_bytes, z_bytes, roots_brp_bytes, out
    )
    if rc == -1:
        raise ValueError("Invalid scalar: not canonical")
    if rc != 0:
        return None
    return out.raw


def eval_blobs_batch(
    blobs_wire: bytes, n: int, zs: List[int], roots_brp_bytes: bytes
) -> Optional[List[int]]:
    """Host barycentric evaluation of n blobs at n points with ONE batch
    inversion across all n*4096 denominators -- keeps batch verification off
    the wire entirely (the 8.4 MB/64-blob upload is the remote-attached
    chip's bottleneck). Returns the list of y ints, or None when the native
    library is unavailable. Raises ValueError on non-canonical scalars
    (message matches the device path)."""
    if _lib is None:
        return None
    zs_be = b"".join(z.to_bytes(32, "big") for z in zs)
    out = ctypes.create_string_buffer(32 * n)
    rc = _lib.kzgn_eval_blobs_batch(
        blobs_wire, ctypes.c_size_t(n), zs_be, roots_brp_bytes, out
    )
    if rc > 0:
        raise ValueError("Invalid blob: scalar is not canonical")
    if rc < 0:
        raise ValueError("Invalid scalar: not canonical")
    return [
        int.from_bytes(out.raw[32 * i : 32 * (i + 1)], "big") for i in range(n)
    ]
