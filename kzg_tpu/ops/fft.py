"""Device (TPU) radix-2 FFT over Fr, in limb representation.

TPU-first design (NOT the reference's recursive fork-join,
/root/reference/blst/src/fft_fr.rs): an *iterative* decimation-in-time
butterfly network. Each stage is one batched Montgomery multiply over n/2
lanes plus one add and one sub -- a shape XLA fuses into a handful of VPU
loops. The stage loop is unrolled at trace time (log2(n) <= 20 stages), all
shapes are static, and the bit-reversal permutation is a host-precomputed
gather index.

Values are (L=16, *batch, n) uint32 limb arrays in Montgomery form, so a
whole batch of blobs is transformed by the same traced program (the batch
dims shard across chips; the transform axis stays local).
"""

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_MOD as R, root_of_unity
from . import field as fl
from .field import FR


def brp_indices(n: int) -> np.ndarray:
    """Bit-reversal permutation indices (parity:
    /root/reference/kzg/src/common_utils.rs:6-34)."""
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


@lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool):
    """Per-stage Montgomery-form twiddle tables.

    Stage s (s = 0..log_n-1) has butterfly half-width h = 2^s and uses the
    2^(s+1)-th root of unity; returns a tuple of (L, h) numpy arrays.
    """
    out = []
    for s in range(log_n):
        h = 1 << s
        w = root_of_unity(s + 1)
        if inverse:
            w = pow(w, R - 2, R)
        tw = 1
        vals = []
        for _ in range(h):
            vals.append(tw)
            tw = tw * w % R
        r = 1 << (fl.LIMB_BITS * FR.n_limbs)
        mont = [v * r % R for v in vals]
        out.append(fl.ints_to_limbs(mont, FR.n_limbs))
    return tuple(out)


@lru_cache(maxsize=None)
def _n_inv_mont(n: int) -> tuple:
    r = 1 << (fl.LIMB_BITS * FR.n_limbs)
    v = pow(n, R - 2, R) * r % R
    return tuple(int(x) for x in fl.int_to_limbs(v, FR.n_limbs))


_COMPACT = [False]


class compact_stages:
    """Context: trace FFTs as ONE lax.scan stage body instead of log2(n)
    unrolled stages. Bit-exact (same butterflies); the HLO size becomes
    independent of n, which keeps big fused kernels (EIP-7594 recover /
    cells) inside the remote TPU compiler's memory budget -- an unrolled
    13-stage FFT x unrolled limb ops blew a 14 MB MLIR module and got the
    compile helper OOM-killed. Costs one extra gather and doubles the
    twiddle-multiply lanes (both halves instead of one), which is noise
    next to the kernels around it."""

    def __enter__(self):
        self._saved = _COMPACT[0]
        _COMPACT[0] = True

    def __exit__(self, *exc):
        _COMPACT[0] = self._saved
        return False


@lru_cache(maxsize=None)
def _scan_tables(log_n: int, inverse: bool):
    """Per-stage elementwise butterfly tables for the scan-form FFT:
    tw (S, L, n) Montgomery twiddle per position, idxA/idxB (S, n) pair
    source indices, sign (S, n) bool (True = hi half: out = a - t)."""
    n = 1 << log_n
    L = FR.n_limbs
    r = 1 << (fl.LIMB_BITS * L)
    tw = np.empty((log_n, L, n), np.uint32)
    idx_a = np.empty((log_n, n), np.int32)
    idx_b = np.empty((log_n, n), np.int32)
    sign = np.empty((log_n, n), bool)
    pos = np.arange(n)
    for s in range(log_n):
        h = 1 << s
        w = root_of_unity(s + 1)
        if inverse:
            w = pow(w, R - 2, R)
        ladder = [1]
        for _ in range(h - 1):
            ladder.append(ladder[-1] * w % R)
        k = pos % h
        vals = [ladder[int(kk)] * r % R for kk in k]
        tw[s] = fl.ints_to_limbs(vals, L)
        idx_a[s] = pos & ~h
        idx_b[s] = pos | h
        sign[s] = (pos & h) != 0
    return tw, idx_a, idx_b, sign


def _fft_scan_body(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    L = FR.n_limbs
    nb = x.ndim - 2
    x = jnp.take(x, jnp.asarray(brp_indices(n)), axis=-1)
    tw, ia, ib, sg = (jnp.asarray(t) for t in _scan_tables(log_n, inverse))

    def stage(carry, inp):
        tw_s, ia_s, ib_s, sg_s = inp
        a = jnp.take(carry, ia_s, axis=-1)
        b = jnp.take(carry, ib_s, axis=-1)
        twb = tw_s.reshape((L,) + (1,) * nb + (n,))
        t = fl.mont_mul(FR, b, jnp.broadcast_to(twb, b.shape))
        out = jnp.where(
            sg_s.reshape((1,) * (nb + 1) + (n,)),
            fl.sub(FR, a, t),
            fl.add(FR, a, t),
        )
        return out, None

    x, _ = jax.lax.scan(stage, x, (tw, ia, ib, sg))
    if inverse:
        ninv = jnp.asarray(np.array(_n_inv_mont(n), dtype=np.uint32)).reshape(
            (L,) + (1,) * nb + (1,)
        )
        x = fl.mont_mul(FR, x, jnp.broadcast_to(ninv, x.shape))
    return x


@lru_cache(maxsize=None)
def _roll_tables(log_n: int, inverse: bool):
    """Full-width per-position twiddles + low-half masks for the roll-form
    butterfly: tw[s][i] = w_s^(i mod 2^s) broadcast over ALL n positions,
    low[s][i] = (i & 2^s) == 0."""
    n = 1 << log_n
    L = FR.n_limbs
    r = 1 << (fl.LIMB_BITS * L)
    tw = np.empty((log_n, L, n), np.uint32)
    low = np.empty((log_n, n), bool)
    pos = np.arange(n)
    for s in range(log_n):
        h = 1 << s
        w = root_of_unity(s + 1)
        if inverse:
            w = pow(w, R - 2, R)
        ladder = [1]
        for _ in range(h - 1):
            ladder.append(ladder[-1] * w % R)
        tw[s] = fl.ints_to_limbs([ladder[int(i % h)] * r % R for i in pos], L)
        low[s] = (pos & h) == 0
    return tw, low


def _fft_roll_body(x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
    """Gather-free butterfly network: each stage is ONE fused elementwise
    pass (mont_mul + add/sub + two lane rolls + select), so XLA emits
    log2(n) fused kernels with zero gathers/stacks/relayouts.

    Stage s pairs i with i^h (h = 2^s). With b[i] = x[i+h] (roll -h):
      u[i] = x[i] + w[i] b[i]   (the correct out[i] on low positions)
      v[i] = x[i] - w[i] b[i]   (the correct out[i+h], computed at i)
      out  = where(i & h == 0, u, roll(v, +h))
    Same butterflies as fft_body -- bit-exact, 2x the minimal multiply
    count but fully vectorized with no data movement beyond two rolls.
    (semantics parity: fft_fr, /root/reference/blst/src/fft_fr.rs:112-154)
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    L = FR.n_limbs
    nb = x.ndim - 2
    x = jnp.take(x, jnp.asarray(brp_indices(n)), axis=-1)
    tw, low = _roll_tables(log_n, inverse)
    for s in range(log_n):
        h = 1 << s
        b = jnp.roll(x, -h, axis=-1)
        if s == 0:
            t = b
        else:
            tws = jnp.asarray(tw[s]).reshape((L,) + (1,) * nb + (n,))
            t = fl.mont_mul(FR, b, jnp.broadcast_to(tws, b.shape))
        u = fl.add(FR, x, t)
        v = fl.sub(FR, x, t)
        x = jnp.where(
            jnp.asarray(low[s]).reshape((1,) * (nb + 1) + (n,)),
            u,
            jnp.roll(v, h, axis=-1),
        )
    if inverse:
        ninv = jnp.asarray(np.array(_n_inv_mont(n), dtype=np.uint32)).reshape(
            (L,) + (1,) * nb + (1,)
        )
        x = fl.mont_mul(FR, x, jnp.broadcast_to(ninv, x.shape))
    return x


def fft_body(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Radix-2 FFT along the last axis (unjitted body; composable inside
    other traced programs -- it picks up whatever field-op forms are active,
    see fl.maybe_unrolled, and the scan stage form under compact_stages).

    x: (L, *batch, n) Montgomery-form Fr limbs; n a power of two.
    Semantics parity: fft_fr /root/reference/blst/src/fft_fr.rs:112-154
    (forward = natural-order roots; inverse = reversed roots + 1/n scale).
    """
    n = x.shape[-1]
    assert n & (n - 1) == 0, "fft: length must be a power of two"
    if n > 1:
        from . import pallas_fft

        if pallas_fft.active(n):
            # VMEM-resident stage groups on TPU. Measured A/B vs the XLA
            # roll network (round 5, pipelined x10): 5.00 vs 5.34 ms at
            # 2^12 but 16.3 vs 12.6 ms at 2^15 -- the multi-tile stage
            # kernels lose above 2^13, so pallas_fft caps MAX_LOG_N there
            # and the roll form serves the larger sizes.
            return pallas_fft.fft_pallas(x, inverse)
    if _COMPACT[0] and n > 1:
        return _fft_scan_body(x, inverse)
    if n > 1 and os.environ.get("KZG_TPU_FFT_ROLL", "1") == "1":
        return _fft_roll_body(x, inverse)
    log_n = n.bit_length() - 1
    L = FR.n_limbs
    batch = x.shape[1:-1]
    nb = len(batch)

    # bit-reversal permutation (gather with a host-constant index vector)
    x = jnp.take(x, jnp.asarray(brp_indices(n)), axis=-1)

    tws = _stage_twiddles(log_n, inverse)
    for s in range(log_n):
        h = 1 << s
        blocks = n >> (s + 1)
        x = x.reshape((L,) + batch + (blocks, 2, h))
        a = x[..., 0, :]
        b = x[..., 1, :]
        if s == 0:
            # stage-0 twiddle is 1 (forward and inverse): identity multiply
            t = b
        else:
            tw = jnp.asarray(tws[s]).reshape((L,) + (1,) * (nb + 1) + (h,))
            t = fl.mont_mul(FR, b, jnp.broadcast_to(tw, b.shape))
        x = jnp.stack([fl.add(FR, a, t), fl.sub(FR, a, t)], axis=-2)
        x = x.reshape((L,) + batch + (n,))
    if inverse:
        ninv = jnp.asarray(
            np.array(_n_inv_mont(n), dtype=np.uint32)
        ).reshape((L,) + (1,) * nb + (1,))
        x = fl.mont_mul(FR, x, jnp.broadcast_to(ninv, x.shape))
    return x


@partial(jax.jit, static_argnames=("inverse", "unroll", "compact", "pallas"))
def _fft_jit(
    x: jnp.ndarray, inverse: bool, unroll: bool, compact: bool, pallas: bool
) -> jnp.ndarray:
    # compact/pallas are threaded as STATIC args (not read inside the body):
    # a nested jit caches its jaxpr, so a context flag read at body-trace
    # time would leak the first caller's choice into later callers.
    from . import pallas_fft

    if pallas:
        return pallas_fft.fft_pallas(x, inverse)
    with pallas_fft.force_off(), fl.maybe_unrolled(unroll):
        if compact:
            return _fft_scan_body(x, inverse)
        return fft_body(x, inverse)


def fft(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Jitted FFT on the process-default backend; the stage form follows the
    platform (Pallas kernel on TPU, roll/scan XLA network elsewhere) and the
    field-op form follows it too (unrolled dataflow on TPU, compact loops on
    XLA:CPU)."""
    from . import pallas_fft

    return _fft_jit(
        x, inverse, fl.unroll_default(), _COMPACT[0],
        pallas_fft.active(x.shape[-1]),
    )


def ifft(x: jnp.ndarray) -> jnp.ndarray:
    return fft(x, inverse=True)


@partial(jax.jit, static_argnames=("unroll", "pallas"))
def _das_extension_jit(evens: jnp.ndarray, unroll: bool, pallas: bool) -> jnp.ndarray:
    from . import pallas_fft

    import contextlib

    off = contextlib.nullcontext() if pallas else pallas_fft.force_off()
    with off, fl.maybe_unrolled(unroll):
        coeffs = fft_body(evens, inverse=True)
        padded = jnp.concatenate([coeffs, jnp.zeros_like(coeffs)], axis=-1)
        full = fft_body(padded)
    return full[..., 1::2]


def das_extension(evens: jnp.ndarray) -> jnp.ndarray:
    """Erasure-coding extension: given evaluations of a degree<n polynomial
    on the n-domain (= even indices of the 2n-domain), return the odd-index
    evaluations (parity: /root/reference/blst/src/data_availability_sampling.rs).
    """
    from . import pallas_fft

    return _das_extension_jit(
        evens, fl.unroll_default(), pallas_fft.active(evens.shape[-1])
    )


# ---------------------------------------------------------------------------
# Host conversions
# ---------------------------------------------------------------------------


def fr_from_ints(vals) -> jnp.ndarray:
    """Python ints -> (L, n) Montgomery device limbs."""
    return FR.encode(list(vals))


def fr_to_ints(x) -> list:
    return FR.decode(x)
