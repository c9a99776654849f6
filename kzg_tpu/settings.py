"""Device-side KZG settings: trusted setup resident in HBM as limb arrays
plus precomputed fixed-base MSM tables, with an on-disk cache keyed by the
setup content hash (checkpoint/resume analog of the reference's MSM table
disk cache, /root/reference/kzg/src/msm/diskcache.rs).

The oracle settings object rides along for the host-side pieces (G2 points,
pairing checks, byte serialization of commitments).
"""

import hashlib
import os
from dataclasses import dataclass
from functools import cached_property
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .constants import FIELD_ELEMENTS_PER_BLOB, R_MOD as R
from .oracle.kzg import KZGSettingsOracle, load_trusted_setup_file
from .ops import g1 as dg1
from .ops import msm as dmsm
from .ops.field import FR, ints_to_limbs

_CACHE_DIR = os.environ.get(
    "KZG_TPU_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "kzg_tpu")
)
_TABLE_FORMAT_VERSION = 1


def _table_cache_path(tag: str, content_hash: str, c: int) -> str:
    return os.path.join(
        _CACHE_DIR, f"kzg-tpu.table.v{_TABLE_FORMAT_VERSION}.{tag}.{c}.{content_hash}.npz"
    )


def _points_hash(points) -> str:
    h = hashlib.sha256()
    for p in points:
        if p is None:
            h.update(b"\x00" * 96)
        else:
            h.update(p[0].to_bytes(48, "big"))
            h.update(p[1].to_bytes(48, "big"))
    return h.hexdigest()[:32]


def build_table_cached(
    points, tag: str, c: Optional[int] = None
) -> dmsm.FixedBaseTable:
    """Fixed-base table for a list of oracle affine points, cached on disk."""
    n = len(points)
    if c is None:
        c = dmsm.default_window(n, fixed_base=True)
    chash = _points_hash(points)
    path = _table_cache_path(tag, chash, c)
    if os.path.exists(path):
        data = np.load(path)
        return dmsm.FixedBaseTable(
            jnp.asarray(data["x"]), jnp.asarray(data["y"]), jnp.asarray(data["inf"]), c
        )
    aff = dg1.affine_from_ints(points)
    table = dmsm.build_fixed_base_table(aff, c=c)
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        np.savez(
            path,
            x=np.asarray(table.x),
            y=np.asarray(table.y),
            inf=np.asarray(table.inf),
        )
    except OSError:
        pass
    return table


@dataclass
class DeviceKZGSettings:
    """Trusted setup resident on device + host-side oracle companion."""

    oracle: KZGSettingsOracle

    @cached_property
    def lagrange_table(self) -> dmsm.FixedBaseTable:
        """Fixed-base table over the bit-reversed Lagrange setup (the base
        of every blob commitment/proof MSM)."""
        return build_table_cached(self.oracle.g1_lagrange_brp, "lagrange_brp")

    @cached_property
    def monomial_table(self) -> dmsm.FixedBaseTable:
        """Fixed-base table over the monomial setup (FK20 / monomial commits)."""
        return build_table_cached(self.oracle.g1_monomial, "monomial")

    @cached_property
    def roots_brp_mont(self) -> jnp.ndarray:
        """Bit-reversed 4096 roots of unity, Montgomery form, (16, 4096)."""
        roots = self.oracle.fft.brp_roots_of_unity[:FIELD_ELEMENTS_PER_BLOB]
        r = 1 << (16 * FR.n_limbs)
        return jnp.asarray(ints_to_limbs([v * r % R for v in roots], FR.n_limbs))

    @cached_property
    def roots_brp_mont_bytes(self) -> bytes:
        """Bit-reversed 4096 roots as raw little-endian Montgomery limbs,
        the format the native host barycentric evaluator takes."""
        rmont = 1 << 256
        return b"".join(
            (v * rmont % R).to_bytes(32, "little")
            for v in self.oracle.fft.brp_roots_of_unity[:FIELD_ELEMENTS_PER_BLOB]
        )

    @cached_property
    def roots_ext_mont_bytes(self) -> bytes:
        """All 8193 roots of unity (8192-wide FFTSettings incl. the wrap
        element) as raw little-endian Montgomery limbs -- the table the
        native EIP-7594 host tail indexes (coset shifts, h_k powers, the
        64-point column IFFT twiddles)."""
        rmont = 1 << 256
        return b"".join(
            (v * rmont % R).to_bytes(32, "little")
            for v in self.oracle.fft.roots_of_unity
        )

    @cached_property
    def g1_monomial64_host(self) -> tuple:
        """First 64 monomial setup points as (affine-BE bytes, inf flags)
        for the native interpolation-poly commitment MSM."""
        xy = bytearray()
        inf = bytearray()
        for p in self.oracle.g1_monomial[:64]:
            if p is None:
                xy += bytes(96)
                inf.append(1)
            else:
                xy += p[0].to_bytes(48, "big") + p[1].to_bytes(48, "big")
                inf.append(0)
        return bytes(xy), bytes(inf)

    @cached_property
    def x_ext_host(self) -> tuple:
        """x_ext_fft columns flattened [col*64 + i] as (affine-BE bytes,
        inf flags) for the native FK20 engine."""
        xy = bytearray()
        inf = bytearray()
        for col in self.oracle.x_ext_fft_columns:
            for p in col:
                if p is None:
                    xy += bytes(96)
                    inf.append(1)
                else:
                    xy += p[0].to_bytes(48, "big") + p[1].to_bytes(48, "big")
                    inf.append(0)
        return bytes(xy), bytes(inf)

    @cached_property
    def lagrange_host(self) -> tuple:
        """Lagrange-brp setup points as (affine-BE bytes, inf flags) for the
        native single-op commit/prove MSM."""
        xy = bytearray()
        inf = bytearray()
        for p in self.oracle.g1_lagrange_brp:
            if p is None:
                xy += bytes(96)
                inf.append(1)
            else:
                xy += p[0].to_bytes(48, "big") + p[1].to_bytes(48, "big")
                inf.append(0)
        return bytes(xy), bytes(inf)

    def ensure_native_commit(self) -> bool:
        """Register the Lagrange setup with the native host MSM (idempotent)."""
        from . import native as _native

        if not _native.available():
            return False
        xy, inf = self.lagrange_host
        return _native.commit_init(xy, inf, len(self.oracle.g1_lagrange_brp))

    def ensure_native_fk20(self) -> bool:
        """Register the FK20 context with the native engine (idempotent)."""
        from . import native as _native

        if not _native.available():
            return False
        xy, inf = self.x_ext_host
        return _native.fk20_init(xy, inf, self.roots_ext_mont_bytes)

    @property
    def n(self) -> int:
        return FIELD_ELEMENTS_PER_BLOB


def load_settings(path: Optional[str] = None) -> DeviceKZGSettings:
    if path is None:
        from .utils.vectors import trusted_setup_path

        path = trusted_setup_path()
    return DeviceKZGSettings(load_trusted_setup_file(path))
