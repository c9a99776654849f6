"""EIP-4844 (Proto-Danksharding) API, device compute path.

The split mirrors the reference's L0/L2 split (generic protocol logic over a
compute backend, /root/reference/kzg/src/eip_4844.rs) but drawn along the
TPU's natural boundary instead: everything O(blob) -- barycentric
evaluation, quotient construction, batch inversion, MSMs -- runs jitted on
device over limb arrays, batched over blobs; the serial, latency-bound bits
-- SHA-256 Fiat-Shamir transcripts, 48-byte point codecs, the single final
pairing -- run on host.

Byte-level semantics parity with the reference's `_rust` functions
(eip_4844.rs:278-832); bit-exactness is enforced by the consensus-spec
vector suite in tests/.
"""

import hashlib
import os
import time
from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bytes as bs
from .constants import (
    BYTES_PER_BLOB,
    FIAT_SHAMIR_PROTOCOL_DOMAIN,
    FIELD_ELEMENTS_PER_BLOB,
    R_MOD as R,
    RANDOM_CHALLENGE_KZG_BATCH_DOMAIN,
)
from . import native
from .oracle import serialization as oser
from .oracle.curve import G1, G1_GENERATOR, G2_GENERATOR
from .ops import field as fl
from .ops import g1 as dg1
from .ops import msm as dmsm
from .ops.field import FR
from .settings import DeviceKZGSettings

# ---------------------------------------------------------------------------
# Device kernels (jitted; batch dim B = number of blobs)
# ---------------------------------------------------------------------------


def _one_mont(ndim: int) -> jnp.ndarray:
    return jnp.asarray(FR.one_mont).reshape((FR.n_limbs,) + (1,) * (ndim - 1))


@lru_cache(maxsize=None)
def _ninv_mont_const(n: int):
    return FR.const(pow(n, R - 2, R))


def _eval_barycentric_body(poly_m: jnp.ndarray, z_m: jnp.ndarray, roots_m: jnp.ndarray):
    """Barycentric evaluation of blobs at points, all in Montgomery form.

    poly_m: (16, B, n) evaluations at bit-reversed roots; z_m: (16, B, 1);
    roots_m: (16, n). Returns (y_m (16, B, 1), inv_diff (16, B, n),
    was_zero (B, n)) -- the latter two are reused by the quotient kernel.
    (parity: evaluate_polynomial_in_evaluation_form, eip_4844.rs:954-1003)
    """
    n = poly_m.shape[-1]
    rb = roots_m[:, None, :]
    diff = fl.sub(FR, jnp.broadcast_to(z_m, poly_m.shape), jnp.broadcast_to(rb, poly_m.shape))
    inv_diff, was_zero = fl.batch_inv_tree(FR, diff)
    # zero differences (z in domain) must contribute nothing downstream
    inv_diff = jnp.where(was_zero[None], jnp.zeros_like(inv_diff), inv_diff)
    in_domain = was_zero.any(axis=-1)  # (B,)

    y_in = fl.sum_tree(FR, jnp.where(was_zero[None], poly_m, jnp.zeros_like(poly_m)))

    terms = fl.mont_mul(FR, fl.mont_mul(FR, poly_m, jnp.broadcast_to(rb, poly_m.shape)), inv_diff)
    ssum = fl.sum_tree(FR, terms)  # (16, B, 1)
    z_pow = z_m
    for _ in range(n.bit_length() - 1):
        z_pow = fl.mont_mul(FR, z_pow, z_pow)
    one = jnp.broadcast_to(_one_mont(z_m.ndim), z_m.shape)
    factor = fl.sub(FR, z_pow, one)
    y_out = fl.mul_const(FR, fl.mont_mul(FR, ssum, factor), _ninv_mont_const(n))

    y = jnp.where(in_domain[None, :, None], y_in, y_out)
    return y, inv_diff, was_zero


def _quotient_body(poly_m, y_m, z_m, inv_diff, was_zero, roots_m):
    """Quotient polynomial q with q_i = (p_i - y)/(w_i - z), with the
    in-domain branch handled branchlessly
    (parity: compute_kzg_proof_rust, eip_4844.rs:437-519)."""
    rb = jnp.broadcast_to(roots_m[:, None, :], poly_m.shape)
    p_minus_y = fl.sub(FR, poly_m, jnp.broadcast_to(y_m, poly_m.shape))
    # (p_i - y) * inv(w_i - z) = (y - p_i) * inv(z - w_i)
    q_std = fl.mont_mul(FR, fl.neg(FR, p_minus_y), inv_diff)
    # in-domain slot m: q_m = sum_i!=m (p_i - y) * w_i * inv(z * (z - w_i))
    zinv = fl.inv(FR, z_m)
    t = fl.mont_mul(FR, fl.mont_mul(FR, p_minus_y, rb), inv_diff)
    q_m = fl.mont_mul(FR, fl.sum_tree(FR, t), zinv)  # (16, B, 1)
    q = jnp.where(was_zero[None], jnp.broadcast_to(q_m, q_std.shape), q_std)
    return fl.to_canonical(FR, q)


# ---------------------------------------------------------------------------
# Fused per-op programs: ONE device program per protocol call (uploads one
# limb array, returns affine/canonical limbs) -- transfers and program
# switches dominate per-op latency on a remote-attached TPU. FIELD-dominated
# sections trace in the platform-best form (fl.maybe_unrolled: unrolled
# dataflow on TPU -- measured 4x on the batch-64 eval -- loop graphs on
# XLA:CPU). MSM-containing sections stay loop-form: their hot loop is the
# Pallas kernel, and unrolling the XLA-side glue only blows up compile time.
# ---------------------------------------------------------------------------


@jax.jit
def _eval_barycentric(poly_m: jnp.ndarray, z_m: jnp.ndarray, roots_m: jnp.ndarray):
    with fl.maybe_unrolled(fl.unroll_default()):
        return _eval_barycentric_body(poly_m, z_m, roots_m)


@partial(jax.jit, static_argnames=("c",))
def _commit_program(scalars, tab_x, tab_y, tab_inf, c: int):
    table = dmsm.FixedBaseTable(tab_x, tab_y, tab_inf, c)
    out = dmsm.msm_fixed_core(table, scalars)
    return dg1.to_affine(out)


@partial(jax.jit, static_argnames=("c",))
def _commit_program_bytes(words, tab_x, tab_y, tab_inf, c: int):
    """Raw-bytes commitment program: words (B, 4096, 8) u32 wire image ->
    packed [ok | x | y | inf] ((2 + 2*LP), B). Byte->limb unpack and
    canonicality validation on device; ONE upload, ONE read-back."""
    scalars, ok = _words_to_limbs(words)
    okb = ok.all(axis=-1).astype(jnp.uint32)
    table = dmsm.FixedBaseTable(tab_x, tab_y, tab_inf, c)
    aff = dg1.to_affine(dmsm.msm_fixed_core(table, scalars))
    return jnp.concatenate(
        [okb[None], aff.x, aff.y, aff.inf.astype(jnp.uint32)[None]], axis=0
    )


def _prove_body(poly_limbs, z_limbs, roots_m, tab_x, tab_y, tab_inf, c: int):
    """blob limbs (canonical) + z limbs -> (proof affine, y canonical).

    Unrolled field dataflow at every batch size: compiled TPU executables
    persist across processes (kzg_tpu/__init__.py), so the bigger compile
    is a one-time cost and the ~4x faster form always wins at runtime."""
    with fl.maybe_unrolled(fl.unroll_default()):
        poly_m = fl.from_canonical(FR, poly_limbs)
        z_m = fl.from_canonical(FR, z_limbs)
        y_m, inv_diff, was_zero = _eval_barycentric_body(poly_m, z_m, roots_m)
        q = _quotient_body(poly_m, y_m, z_m, inv_diff, was_zero, roots_m)
        y_can = fl.to_canonical(FR, y_m)
    table = dmsm.FixedBaseTable(tab_x, tab_y, tab_inf, c)
    proofs = dmsm.msm_fixed_core(table, q)
    return dg1.to_affine(proofs), y_can


@partial(jax.jit, static_argnames=("c",))
def _prove_program_packed(polyz_packed, roots_m, tab_x, tab_y, tab_inf, c: int):
    """One-upload / one-download prove step for the remote-attached chip:
    polyz_packed = packed limb pairs of [poly | z] concatenated on the last
    axis ((8, B, 4097) u32, half the wire size); returns (2L+1+16, B) packed
    [proof.x | proof.y | inf | y]."""
    polyz = _unpack_limbs16(polyz_packed)
    poly_limbs = polyz[..., :-1]
    z_limbs = polyz[..., -1:]
    aff, y = _prove_body(
        poly_limbs, z_limbs, roots_m, tab_x, tab_y, tab_inf, c
    )
    return jnp.concatenate(
        [aff.x, aff.y, aff.inf.astype(jnp.uint32)[None], y[..., 0]], axis=0
    )


@jax.jit
def _eval_program(poly_limbs, z_limbs, roots_m):
    """blob limbs + z limbs -> y canonical (16, B, 1)."""
    with fl.maybe_unrolled(fl.unroll_default()):
        poly_m = fl.from_canonical(FR, poly_limbs)
        z_m = fl.from_canonical(FR, z_limbs)
        y_m, _, _ = _eval_barycentric_body(poly_m, z_m, roots_m)
        return fl.to_canonical(FR, y_m)


def _pack_limbs16(limbs: np.ndarray) -> np.ndarray:
    """(16, ...) u32 16-bit limbs -> (8, ...) u32 packed pairs: halves the
    host->device wire size (the 16-bit limbs waste the top halfword; the
    tunnel moves ~150 MB/s, so a 64-blob batch saves ~55 ms)."""
    return limbs[0::2] | (limbs[1::2] << 16)


def _unpack_limbs16(packed: jnp.ndarray) -> jnp.ndarray:
    lo = packed & jnp.uint32(0xFFFF)
    hi = packed >> 16
    L = 2 * packed.shape[0]
    return jnp.stack([lo, hi], axis=1).reshape((L,) + packed.shape[1:])


@jax.jit
def _eval_program_packed(packed, z_limbs, roots_m):
    """Packed-upload barycentric eval: packed (8, B, 4096) u32 limb pairs
    (canonical) -> y canonical (16, B, 1)."""
    with fl.maybe_unrolled(fl.unroll_default()):
        poly_m = fl.from_canonical(FR, _unpack_limbs16(packed))
        z_m = fl.from_canonical(FR, z_limbs)
        y_m, _, _ = _eval_barycentric_body(poly_m, z_m, roots_m)
        return fl.to_canonical(FR, y_m)


def _words_to_limbs(words: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw wire image -> limbs + canonicality, ON DEVICE.

    words: (B, n, 8) u32 = the blob bytes read as host-little-endian u32
    words (np.frombuffer, zero host conversion). Each scalar is 32 bytes
    big-endian: byte m of word j is (w[j] >> 8(m%4)) & 0xff, and 16-bit
    limb k (little-endian limb order) = byte[30-2k] << 8 | byte[31-2k].
    Returns ((16, B, n) canonical limbs, (B, n) bool canonical-range mask).
    (parity: the per-element from_bytes validation of bytes_to_blob,
    /root/reference/kzg/src/eip_4844.rs:867-880)"""
    limbs = []
    for k in range(FR.n_limbs):
        mhi, mlo = 30 - 2 * k, 31 - 2 * k
        bhi = (words[..., mhi // 4] >> (8 * (mhi % 4))) & jnp.uint32(0xFF)
        blo = (words[..., mlo // 4] >> (8 * (mlo % 4))) & jnp.uint32(0xFF)
        limbs.append((bhi << 8) | blo)
    x = jnp.stack(limbs, axis=0)  # (16, B, n)
    lt = jnp.zeros(x.shape[1:], bool)
    eq = jnp.ones(x.shape[1:], bool)
    for k in range(FR.n_limbs - 1, -1, -1):
        m = jnp.uint32(int(FR.mod_limbs[k]))
        lt = lt | (eq & (x[k] < m))
        eq = eq & (x[k] == m)
    return x, lt


@jax.jit
def _eval_program_bytes(words, z_limbs, roots_m):
    """Raw-bytes-upload barycentric eval: words (B, 4096, 8) u32 wire image
    -> packed [ok | y] ((1 + 16), B): the byte->limb unpack and canonicality
    check run on device, so the host does ZERO per-element work before the
    upload (the 8.4 MB/64-blob transfer is the batch path's wire floor)."""
    with fl.maybe_unrolled(fl.unroll_default()):
        poly, ok = _words_to_limbs(words)
        poly_m = fl.from_canonical(FR, poly)
        z_m = fl.from_canonical(FR, z_limbs)
        y_m, _, _ = _eval_barycentric_body(poly_m, z_m, roots_m)
        y = fl.to_canonical(FR, y_m)  # (16, B, 1)
        okb = ok.all(axis=-1).astype(jnp.uint32)  # (B,)
        return jnp.concatenate([okb[None], y[..., 0]], axis=0)


@partial(jax.jit, static_argnames=("c",))
def _lincomb_program(px, py, pinf, scalars, c: int):
    out = dmsm.msm_core(dg1.G1Aff(px, py, pinf), scalars, c)
    return dg1.to_affine(out)


# ---------------------------------------------------------------------------
# Multi-chip (mesh-sharded) variants of the batch programs: the blob batch
# is the natural shard axis -- exactly the reference's per-physical-core
# chunking (eip_4844.rs:770-816), expressed as shard_map over a
# jax.sharding.Mesh with a "blobs" axis. Partial MSM sums combine over ICI.
# ---------------------------------------------------------------------------


def _mesh_specs(mesh, blob_axis: str = "blobs"):
    from jax.sharding import PartitionSpec as P

    if blob_axis not in mesh.axis_names:
        raise ValueError(f"mesh must have a '{blob_axis}' axis")
    return P


def _commit_program_sharded(mesh, table: dmsm.FixedBaseTable, scalars):
    """Fixed-base commitment MSMs with the blob batch sharded over the
    mesh's "blobs" axis (table replicated). scalars: (16, B, n)."""
    from jax.experimental.shard_map import shard_map

    P = _mesh_specs(mesh)
    from .ops import pallas_msm

    use_pallas = pallas_msm.enabled_for(mesh)
    c = table.c

    def fn(tx, ty, tinf, sc):
        return dmsm.msm_fixed_core(
            dmsm.FixedBaseTable(tx, ty, tinf, c), sc, use_pallas=use_pallas
        )

    spec_out = dg1.G1XYZZ(*([P(None, "blobs")] * 4))
    f = shard_map(
        fn,
        mesh=mesh,
        check_rep=False,
        in_specs=(P(), P(), P(), P(None, "blobs", None)),
        out_specs=spec_out,
    )
    out = jax.jit(f)(table.x, table.y, table.inf, scalars)
    return jax.jit(dg1.to_affine)(out)


def _eval_program_sharded(mesh, poly_limbs, z_limbs, roots_m):
    """Barycentric eval with blobs sharded over the mesh. Field-op form
    follows the MESH platform (loop graphs on a CPU mesh -- the multi-chip
    dryrun's XLA:CPU compile budget is the binding constraint)."""
    from jax.experimental.shard_map import shard_map

    P = _mesh_specs(mesh)
    from .ops import pallas_msm

    unroll = pallas_msm.enabled_for(mesh)

    def fn(p_, z_, r_):
        with fl.maybe_unrolled(unroll):
            poly_m = fl.from_canonical(FR, p_)
            z_m = fl.from_canonical(FR, z_)
            y_m, _, _ = _eval_barycentric_body(poly_m, z_m, r_)
            return fl.to_canonical(FR, y_m)

    f = shard_map(
        fn,
        mesh=mesh,
        check_rep=False,
        in_specs=(P(None, "blobs", None), P(None, "blobs", None), P(None, None)),
        out_specs=P(None, "blobs", None),
    )
    return jax.jit(f)(poly_limbs, z_limbs, roots_m)


def _lincomb_program_sharded(mesh, px, py, pinf, scalars, c: int):
    """Variable-base MSM family with the POINT axis (= blobs in batch
    verification) sharded; per-shard partial sums are all-gathered over ICI
    and reduced on every chip."""
    from jax.experimental.shard_map import shard_map

    P = _mesh_specs(mesh)
    from .ops import pallas_msm

    use_pallas = pallas_msm.enabled_for(mesh)

    def fn(x_, y_, i_, sc_):
        part = dmsm.msm_core(dg1.G1Aff(x_, y_, i_), sc_, c, use_pallas=use_pallas)
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, "blobs", axis=a.ndim, tiled=False),
            part,
        )
        full = dg1.tree_reduce(dg1.G1XYZZ(*gathered), unroll=use_pallas)
        return dg1.G1XYZZ(*(a[..., 0] for a in full))

    f = shard_map(
        fn,
        mesh=mesh,
        check_rep=False,
        in_specs=(
            P(None, None, "blobs"),
            P(None, None, "blobs"),
            P(None, "blobs"),
            P(None, None, "blobs"),
        ),
        out_specs=dg1.G1XYZZ(*([P(None, None)] * 4)),
    )
    out = jax.jit(f)(px, py, pinf, scalars)
    return jax.jit(dg1.to_affine)(out)


# ---------------------------------------------------------------------------
# Host <-> device glue
# ---------------------------------------------------------------------------


def _blobs_to_poly_mont(blobs: Sequence[bytes]) -> jnp.ndarray:
    """Validated blobs -> (16, B, 4096) Montgomery device array."""
    return fl.from_canonical_jit(FR, jnp.asarray(bs.blobs_to_scalars(blobs)))


def _commit_scalars(blobs: Sequence[bytes]) -> jnp.ndarray:
    return jnp.asarray(bs.blobs_to_scalars(blobs))


def _points_to_bytes(p: dg1.G1XYZZ) -> List[bytes]:
    return native.g1_compress_batch(dg1.xyzz_to_ints(p))


def _y_to_ints(y_canonical) -> List[int]:
    """CANONICAL (non-Montgomery) limbs -> python ints."""
    return fl.limbs_to_ints(np.asarray(y_canonical).reshape(FR.n_limbs, -1))


def hash_to_bls_field(b32: bytes) -> int:
    return int.from_bytes(b32, "big") % R


def compute_challenge(blob_bytes: bytes, commitment_bytes: bytes) -> int:
    """Fiat-Shamir challenge over raw wire bytes
    (parity: compute_challenge_rust, eip_4844.rs:920-945)."""
    h = hashlib.sha256()
    h.update(
        FIAT_SHAMIR_PROTOCOL_DOMAIN
        + (0).to_bytes(8, "big")
        + FIELD_ELEMENTS_PER_BLOB.to_bytes(8, "big")
    )
    h.update(blob_bytes)  # no 131 KB concat copy: feed the wire bytes directly
    h.update(commitment_bytes)
    return hash_to_bls_field(h.digest())


def _batch_challenge_r(commitments_b, zs, ys, proofs_b) -> int:
    """The Fiat-Shamir batch challenge r
    (parity: compute_r_powers hashing, eip_4844.rs:328-378)."""
    n = len(commitments_b)
    data = bytearray()
    data += RANDOM_CHALLENGE_KZG_BATCH_DOMAIN
    data += FIELD_ELEMENTS_PER_BLOB.to_bytes(8, "big")
    data += n.to_bytes(8, "big")
    for i in range(n):
        data += commitments_b[i]
        data += zs[i].to_bytes(32, "big")
        data += ys[i].to_bytes(32, "big")
        data += proofs_b[i]
    return hash_to_bls_field(hashlib.sha256(bytes(data)).digest())


def compute_r_powers(commitments_b, zs, ys, proofs_b) -> List[int]:
    """(parity: compute_r_powers, eip_4844.rs:328-378)"""
    r = _batch_challenge_r(commitments_b, zs, ys, proofs_b)
    out, acc = [], 1
    for _ in range(len(commitments_b)):
        out.append(acc)
        acc = acc * r % R
    return out


# ---------------------------------------------------------------------------
# Public API (raw bytes, c-kzg-4844 semantics)
# ---------------------------------------------------------------------------


BATCH_CHUNK = 64  # blobs per device program (bounds scan working-set memory)


def _chunks(seq, k=BATCH_CHUNK):
    for i in range(0, len(seq), k):
        yield seq[i : i + k]


def _pad_pow2(chunk, filler):
    """Pad a chunk to the next power of two with a duplicate filler element
    so arbitrary batch sizes reuse a handful of compiled programs (remote-
    compiled TPU executables are not persistable across processes; each
    distinct shape costs a fresh compile)."""
    m = 1 << max(0, (len(chunk) - 1)).bit_length()
    return list(chunk) + [filler] * (m - len(chunk))


def blob_to_kzg_commitment(blob_bytes: bytes, s: DeviceKZGSettings) -> bytes:
    # single-op latency path: the host GLV Pippenger (~85 ms) beats a
    # fenced device round trip (~170 ms) on a remote-attached chip.
    # KZG_TPU_HOST_SINGLE=0 forces the device program (locally-attached).
    if len(blob_bytes) != BYTES_PER_BLOB:
        raise ValueError(
            f"Invalid blob: Invalid byte length. Expected {BYTES_PER_BLOB} "
            f"got {len(blob_bytes)}"
        )
    if (
        native.available()
        and os.environ.get("KZG_TPU_HOST_SINGLE", "1") == "1"
        and s.ensure_native_commit()
    ):
        out = native.blob_commit(blob_bytes)
        if out is not None:
            return out
    return blob_to_kzg_commitment_batch([blob_bytes], s)[0]


def blob_to_kzg_commitment_batch(
    blobs: Sequence[bytes], s: DeviceKZGSettings, mesh=None
) -> List[bytes]:
    """Commit to many blobs with ONE fused fixed-base MSM family per chunk
    (parity: blob_to_kzg_commitment_rust, eip_4844.rs:278-295).

    mesh: optional jax.sharding.Mesh with a "blobs" axis -- the blob batch
    shards across chips and each chip runs its own commitment MSMs (the
    multi-chip analog of the reference's per-core chunking)."""
    t = s.lagrange_table
    if mesh is not None:
        n_dev = mesh.shape["blobs"]
        blobs = list(blobs)
        pad = (-len(blobs)) % n_dev
        scalars = _commit_scalars(blobs + [blobs[0]] * pad)
        aff = _commit_program_sharded(mesh, t, scalars)
        return native.g1_compress_batch(dg1.affine_to_ints(aff)[: len(blobs)])
    blobs = list(blobs)
    for b in blobs:
        if len(b) != BYTES_PER_BLOB:
            raise ValueError(
                f"Invalid blob: Invalid byte length. Expected {BYTES_PER_BLOB} "
                f"got {len(b)}"
            )
    # dispatch every chunk's raw-bytes upload + program before fencing any
    # (the in-order queue pipelines transfers under compute); ONE device
    # concat + ONE read-back for the whole batch
    outs, keep = [], []
    off = 0
    for chunk in _chunks(blobs):
        padded = _pad_pow2(chunk, chunk[0])
        words = np.frombuffer(b"".join(padded), dtype=np.uint32).reshape(
            len(padded), FIELD_ELEMENTS_PER_BLOB, 8
        )
        outs.append(_commit_program_bytes(jax.device_put(words), t.x, t.y, t.inf, t.c))
        keep.extend(range(off, off + len(chunk)))
        off += len(padded)
    packed = np.asarray(outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1))
    if not packed[0, keep].all():
        raise ValueError("Invalid blob: scalar is not canonical")
    from .ops.field import FP

    L = FP.n_limbs
    xs = FP.decode(packed[1 : L + 1, keep])
    ys_ = FP.decode(packed[L + 1 : 2 * L + 1, keep])
    infs = packed[2 * L + 1, keep] != 0
    pts = [None if infs[b] else (xs[b], ys_[b]) for b in range(len(blobs))]
    return native.g1_compress_batch(pts)


def compute_kzg_proof(
    blob_bytes: bytes, z_bytes: bytes, s: DeviceKZGSettings
) -> Tuple[bytes, bytes]:
    if len(blob_bytes) != BYTES_PER_BLOB:
        raise ValueError(
            f"Invalid blob: Invalid byte length. Expected {BYTES_PER_BLOB} "
            f"got {len(blob_bytes)}"
        )
    if len(z_bytes) != 32:
        raise ValueError("Invalid field element length")
    if (
        native.available()
        and os.environ.get("KZG_TPU_HOST_SINGLE", "1") == "1"
        and s.ensure_native_commit()
    ):
        out = native.compute_kzg_proof_host(
            blob_bytes, int.from_bytes(z_bytes, "big"), s.roots_brp_mont_bytes
        )
        if out is not None:
            return out
    z = bs.fr_from_bytes(z_bytes)  # (16, 1)
    t = s.lagrange_table
    # one packed upload ([poly | z] concatenated, limb pairs packed to u32)
    # and one download (packed proof+y): each separate transfer through a
    # remote-attached chip costs a full round trip
    polyz = np.concatenate(
        [bs.blob_to_scalars(blob_bytes)[:, None, :], z[:, None, :]], axis=-1
    )
    packed = np.asarray(
        _prove_program_packed(
            jnp.asarray(_pack_limbs16(polyz)), s.roots_brp_mont, t.x, t.y, t.inf, t.c
        )
    )
    from .ops.field import FP

    L = FP.n_limbs
    xs = FP.decode(packed[:L])
    ys = FP.decode(packed[L : 2 * L])
    inf = packed[2 * L, 0] != 0
    pt = None if inf else (xs[0], ys[0])
    proof = native.g1_compress_batch([pt])[0]
    return proof, bs.frs_to_bytes(packed[2 * L + 1 :, :1])


def compute_blob_kzg_proof(
    blob_bytes: bytes, commitment_bytes: bytes, s: DeviceKZGSettings
) -> bytes:
    if len(commitment_bytes) != 48:
        raise ValueError("Invalid commitment length")
    if len(blob_bytes) != BYTES_PER_BLOB:
        raise ValueError(
            f"Invalid blob: Invalid byte length. Expected {BYTES_PER_BLOB} "
            f"got {len(blob_bytes)}"
        )
    if (
        native.available()
        and os.environ.get("KZG_TPU_HOST_SINGLE", "1") == "1"
        and s.ensure_native_commit()
    ):
        # the commitment must still be a valid point (BADARGS otherwise)
        native.g1_decompress_batch(commitment_bytes)
        z = compute_challenge(blob_bytes, commitment_bytes)
        out = native.compute_kzg_proof_host(
            blob_bytes, z, s.roots_brp_mont_bytes
        )
        if out is not None:
            return out[0]
    return compute_blob_kzg_proof_batch([blob_bytes], [commitment_bytes], s)[0]


def compute_blob_kzg_proof_batch(
    blobs: Sequence[bytes], commitments: Sequence[bytes], s: DeviceKZGSettings
) -> List[bytes]:
    """Batched blob proofs: challenges on host, one device program per chunk
    (parity: compute_blob_kzg_proof_rust, eip_4844.rs:541-563)."""
    if any(len(c) != 48 for c in commitments):
        raise ValueError("Invalid commitment length")
    native.g1_decompress_batch(b"".join(commitments))  # validate (raises)
    zs = [compute_challenge(b, c) for b, c in zip(blobs, commitments)]
    t = s.lagrange_table
    # dispatch every chunk's packed upload + program before fencing any:
    # the in-order device queue pipelines chunk k+1's transfer under chunk
    # k's compute, and the single read-back per chunk comes at the end
    outs, keep = [], []
    off = 0
    for lo in range(0, len(blobs), BATCH_CHUNK):
        chunk = list(blobs)[lo : lo + BATCH_CHUNK]
        zchunk = zs[lo : lo + BATCH_CHUNK]
        padded = _pad_pow2(chunk, chunk[0])
        zpad = zchunk + [zchunk[0]] * (len(padded) - len(chunk))
        polyz = np.concatenate(
            [
                bs.blobs_to_scalars(padded),
                fl.ints_to_limbs(zpad, FR.n_limbs)[:, :, None],
            ],
            axis=-1,
        )
        outs.append(
            _prove_program_packed(
                jnp.asarray(_pack_limbs16(polyz)),
                s.roots_brp_mont, t.x, t.y, t.inf, t.c,
            )
        )
        keep.extend(range(off, off + len(chunk)))
        off += len(padded)
    from .ops.field import FP

    L = FP.n_limbs
    arr = np.asarray(outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1))[
        :, keep
    ]
    xs = FP.decode(arr[:L])
    ys_ = FP.decode(arr[L : 2 * L])
    infs = arr[2 * L] != 0
    pts = [None if infs[b] else (xs[b], ys_[b]) for b in range(arr.shape[1])]
    return native.g1_compress_batch(pts)


def _check_proof_single(s: DeviceKZGSettings, commitment, proof, z: int, y: int) -> bool:
    """Same check as the reference's e(C - [y]_1, H) == e(proof, [s - z]_2)
    (check_proof_single, blst/src/types/kzg_settings.rs:178-196), rearranged
    as e(C - [y]_1 + z*proof, H) == e(proof, [s]_2) so the variable scalar
    lands on the G1 side: a G1 mul is ~3x cheaper than the G2 mul and both
    G2 pairing arguments become fixed points."""
    y_g1 = native.g1_mul(G1_GENERATOR, y)
    z_pi = native.g1_mul(proof, z)
    lhs = native.g1_add(native.g1_add(commitment, G1.affine_neg(y_g1)), z_pi)
    return native.pairings_verify(lhs, G2_GENERATOR, proof, s.oracle.g2_monomial[1])


def verify_kzg_proof(
    commitment_bytes: bytes,
    z_bytes: bytes,
    y_bytes: bytes,
    proof_bytes: bytes,
    s: DeviceKZGSettings,
) -> bool:
    """Single-point verify: one pairing, host-bound (parity:
    verify_kzg_proof_rust, eip_4844.rs:586-611)."""
    if len(commitment_bytes) != 48 or len(proof_bytes) != 48:
        raise ValueError("Invalid commitment/proof length")
    if len(z_bytes) != 32 or len(y_bytes) != 32:
        raise ValueError("Invalid field element length")
    fused = native.verify_kzg_proof_fused(
        commitment_bytes, z_bytes, y_bytes, proof_bytes, s.oracle.g2_monomial[1]
    )
    if fused is not None:
        return fused
    commitment, proof = native.g1_decompress_batch(commitment_bytes + proof_bytes)
    bs.fr_from_bytes(z_bytes)  # canonicality checks (raise like the reference)
    bs.fr_from_bytes(y_bytes)
    z = int.from_bytes(z_bytes, "big")
    y = int.from_bytes(y_bytes, "big")
    return _check_proof_single(s, commitment, proof, z, y)


def verify_blob_kzg_proof(
    blob_bytes: bytes,
    commitment_bytes: bytes,
    proof_bytes: bytes,
    s: DeviceKZGSettings,
) -> bool:
    """(parity: verify_blob_kzg_proof_rust, eip_4844.rs:638-665)"""
    if len(commitment_bytes) != 48 or len(proof_bytes) != 48:
        raise ValueError("Invalid commitment/proof length")
    if len(blob_bytes) != BYTES_PER_BLOB:
        raise ValueError(
            f"Invalid blob: Invalid byte length. Expected {BYTES_PER_BLOB} "
            f"got {len(blob_bytes)}"
        )
    z = compute_challenge(blob_bytes, commitment_bytes)
    # single-blob verify is latency-bound: the barycentric eval runs in the
    # native host core (8-lane IFMA split of the one blob, ~0.24 ms) instead
    # of a device round trip (~80 ms RTT on a remote-attached chip), and the
    # check itself is ONE fused native call (decompress + Shamir ladder +
    # pairing).
    try:
        ys1 = native.eval_blobs_batch(
            blob_bytes, 1, [z], s.roots_brp_mont_bytes
        )
    except ValueError:
        raise ValueError("Invalid blob: scalar is not canonical")
    y_be = ys1[0].to_bytes(32, "big") if ys1 is not None else None
    if y_be is not None:
        fused = native.verify_kzg_proof_fused(
            commitment_bytes, z.to_bytes(32, "big"), y_be, proof_bytes,
            s.oracle.g2_monomial[1],
        )
        if fused is not None:
            return fused
    commitment, proof = native.g1_decompress_batch(commitment_bytes + proof_bytes)
    if y_be is not None:
        y = int.from_bytes(y_be, "big")
    else:
        poly = jnp.asarray(bs.blobs_to_scalars([blob_bytes]))
        zl = jnp.asarray(fl.ints_to_limbs([z], FR.n_limbs))[:, :, None]
        y = _y_to_ints(_eval_program(poly, zl, s.roots_brp_mont))[0]
    return _check_proof_single(s, commitment, proof, z, y)


def verify_blob_kzg_proof_batch(
    blobs: Sequence[bytes],
    commitments_bytes: Sequence[bytes],
    proofs_bytes: Sequence[bytes],
    s: DeviceKZGSettings,
    mesh=None,
) -> bool:
    """Batch verification: device does the 64 barycentric evals and the three
    size-n MSMs (fused into one sort+scan); host does hashes and the single
    pairing (parity: verify_blob_kzg_proof_batch_rust, eip_4844.rs:736-832).

    The three MSMs are algebraically folded:
      lhs  = e(sum_i r_i P_i, [s]_2)
      rhs  = e(sum_i r_i C_i + sum_i (r_i z_i) P_i - (sum_i r_i y_i) G, H)
    which is the same pairing equation as the reference's
    (proof_lincomb, C_minus_y_lincomb + proof_z_lincomb) formulation.
    """
    if not (len(blobs) == len(commitments_bytes) == len(proofs_bytes)):
        raise ValueError("Invalid amount of arguments")
    n = len(blobs)
    if n == 0:
        return True
    if any(len(c) != 48 for c in commitments_bytes) or any(
        len(p) != 48 for p in proofs_bytes
    ):
        raise ValueError("Invalid commitment/proof length")
    fused_tail = native.available()
    t_decompress0 = time.perf_counter()
    if not fused_tail:
        commitments = native.g1_decompress_batch(b"".join(commitments_bytes))
        proofs = native.g1_decompress_batch(b"".join(proofs_bytes))
    t_decompress1 = time.perf_counter()
    if n == 1:
        return verify_blob_kzg_proof(blobs[0], commitments_bytes[0], proofs_bytes[0], s)

    # evals are field-only (no MSM working set): one program for all blobs.
    # The batch axis is padded to a power of two so arbitrary batch sizes
    # reuse a handful of compiled programs (consensus vectors alone carry
    # ~10 distinct counts). The RAW blob bytes upload ASYNC before the
    # Fiat-Shamir hashing (the 8.4 MB/64-blob wire time is the batch path's
    # floor) and the byte->limb unpack + canonicality check run on device.
    for b in blobs:
        if len(b) != BYTES_PER_BLOB:
            raise ValueError(
                f"Invalid blob: Invalid byte length. Expected {BYTES_PER_BLOB} "
                f"got {len(b)}"
            )
    trace = os.environ.get("KZG_TPU_TRACE") == "1"
    marks = [("start", t_decompress0), ("decompress", t_decompress1)]

    def _mark(label):
        if trace:
            marks.append((label, time.perf_counter()))

    npad = 1 << max(0, (n - 1)).bit_length()
    use_mesh = mesh is not None and npad % mesh.shape["blobs"] == 0
    # Eval placement: a mesh evaluates on its devices (sharded program); a
    # single remote-attached chip evaluates on the HOST via the native
    # batch barycentric (one batch inversion over all n*4096 denominators,
    # ~1.5 ms/blob) -- the 8.4 MB/64-blob upload is wire-bound on the
    # tunnel (hundreds of ms), which made the device eval the whole batch
    # latency. KZG_TPU_HOST_EVAL=0 forces the device program (the right
    # choice for a locally-attached chip where PCIe upload is ~1 ms).
    host_eval = (
        not use_mesh
        and native.available()
        and os.environ.get("KZG_TPU_HOST_EVAL", "1") == "1"
    )
    if use_mesh:
        limbs = bs.blobs_to_scalars(list(blobs) + [blobs[0]] * (npad - n))
    elif not host_eval:
        wire = b"".join(blobs) + blobs[0] * (npad - n)
        words = np.frombuffer(wire, dtype=np.uint32).reshape(
            npad, FIELD_ELEMENTS_PER_BLOB, 8
        )
        _mark("wire_concat")
        dev = jax.device_put(words)  # async; streams under the hashing below
        _mark("device_put_dispatch")
    zs = [compute_challenge(b, c) for b, c in zip(blobs, commitments_bytes)]
    _mark("challenges_sha")
    if host_eval:
        ys = native.eval_blobs_batch(
            b"".join(blobs), n, zs, s.roots_brp_mont_bytes
        )
        _mark("eval_host")
    elif use_mesh:
        zl = jnp.asarray(
            fl.ints_to_limbs(zs + [zs[0]] * (npad - n), FR.n_limbs)
        )[:, :, None]
        ys = _y_to_ints(
            _eval_program_sharded(mesh, jnp.asarray(limbs), zl, s.roots_brp_mont)
        )[:n]
    else:
        zl = jnp.asarray(
            fl.ints_to_limbs(zs + [zs[0]] * (npad - n), FR.n_limbs)
        )[:, :, None]
        out = np.asarray(_eval_program_bytes(dev, zl, s.roots_brp_mont))
        _mark("eval_fenced")
        if not out[0, :n].all():
            raise ValueError("Invalid blob: scalar is not canonical")
        ys = fl.limbs_to_ints(out[1:, :n])
        _mark("ys_decode")

    # the r-weighted lincombs and pairing run in the NATIVE host core: at
    # n <= a few hundred points, a host GLV Pippenger (~5 ms) beats a second
    # device program whose fence alone costs a ~40 ms tunnel round trip. The
    # right-hand side folds into ONE MSM over [commitments | proofs | G]
    # (parity: the proof/C-y/proof-z lincombs of verify_kzg_proof_batch,
    # eip_4844.rs:380-435).
    if fused_tail:
        r = _batch_challenge_r(commitments_bytes, zs, ys, proofs_bytes)
        _mark("r_powers")
        ok = native.verify_blob_batch_tail(
            b"".join(commitments_bytes),
            b"".join(proofs_bytes),
            n,
            zs,
            ys,
            r,
            s.oracle.g2_monomial[1],
        )
        _mark("native_tail")
    else:
        r_powers = compute_r_powers(commitments_bytes, zs, ys, proofs_bytes)
        _mark("r_powers")
        r_times_z = [r * z % R for r, z in zip(r_powers, zs)]
        ry_sum = sum(r * y % R for r, y in zip(r_powers, ys)) % R
        proof_lincomb = native.g1_msm(proofs, list(r_powers))
        rhs = native.g1_msm(
            commitments + proofs + [G1_GENERATOR],
            list(r_powers) + r_times_z + [(R - ry_sum) % R],
        )
        _mark("host_msms")
        ok = native.pairings_verify(
            proof_lincomb, s.oracle.g2_monomial[1], rhs, G2_GENERATOR
        )
    if trace:
        _mark("pairing")
        import sys

        stages = "  ".join(
            f"{lbl}:{(t1 - t0) * 1e3:.1f}ms"
            for (_, t0), (lbl, t1) in zip(marks, marks[1:])
        )
        print(f"[batch_verify n={n}] {stages}", file=sys.stderr, flush=True)
    return ok
