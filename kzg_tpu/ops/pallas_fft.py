"""Pallas TPU kernel for the radix-2 Fr FFT.

The XLA roll-form FFT (ops/fft.py:_fft_roll_body) pays log2(n) full
HBM-to-HBM passes, each a Montgomery multiply whose ~50-value live set
spills between XLA fusion regions -- measured ~11 ms device time at scale
15, barely ahead of blst's single CORE (9.69 ms, BASELINE.md:36). This
kernel keeps the element set VMEM-resident across whole stage groups and
runs the limb arithmetic on small register tiles, the shape the MSM scan
kernel already drives at the VPU ceiling (ops/pallas_msm.py).

Decomposition (TPU-first; nothing like this exists in the reference, whose
FFT is a recursive fork-join over CPU cores,
/root/reference/blst/src/fft_fr.rs:49-108):

  index i = (T, r, c) bits: c = low cb<=7 bits (VPU lane), r = next rb<=4
  bits (sublane row), T = the rest (tile). After the bit-reversal
  permutation, a DIT stage with half-width h pairs i with i^h, so

    stages with h < 2^cb       pair along the lane axis  (in-register roll)
    stages with h < 2^(cb+rb)  pair along the row axis   (sublane roll)
    remaining stages           pair along the tile axis  (sublane roll in a
                                                          different view)

  Kernel AB runs the lane+row stages; every tile is independent, so the
  grid walks (batch, T) and all programs share one (stages, L, R, C)
  twiddle table (position mod 2^s never sees the T bits). Kernel C runs the
  tile stages; every row is independent, so the grid walks (batch, r) and
  streams per-stage full-width twiddles. The array layout
  (L, batch, BPT, T, R, C) is IDENTICAL for both calls -- only the
  BlockSpecs differ -- so there is no relayout between them.

  Small transforms (n <= 2^11, the FK20 Toeplitz FFTs) have no tile stages
  and spare sublane rows; BPT batch elements pack into those rows so one
  program still fills full VPU tiles.

Butterflies use the roll form (ops/fft.py:_fft_roll_body docstring): twice
the minimal multiply count but zero gathers. Bit-exact vs the XLA path
(tests/test_pallas_fft.py) and through it the slow-DFT oracle
(tests/test_device_fft.py).
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R_MOD as R, root_of_unity
from . import field as fl
from .field import FR

L = FR.n_limbs
CB = 7  # lane bits (128 lanes)
RB = 4  # row bits (16 sublane rows)

# n above this falls back to the XLA path: kernel C's per-program block is
# (L, T, 128) and its mont_mul live set grows linearly with T = n / 2^11.
# Kernel C's per-stage tile kernels lose to the XLA roll network above
# 2^13 (round-5 A/B: 16.3 vs 12.6 ms pipelined at 2^15); the kernel serves
# the sizes where its VMEM residency wins. KZG_TPU_PALLAS_FFT_MAX overrides
# the routing cap for tuning; HARD_MAX_LOG_N is the capability limit.
HARD_MAX_LOG_N = 17
MAX_LOG_N = int(os.environ.get("KZG_TPU_PALLAS_FFT_MAX", "13"))
MIN_LOG_N = 7

_FORCE_OFF = [False]


class force_off:
    """Context: disable the Pallas FFT inside this trace (shard_map bodies
    that may land on CPU meshes must keep the XLA forms)."""

    def __enter__(self):
        self._saved = _FORCE_OFF[0]
        _FORCE_OFF[0] = True

    def __exit__(self, *exc):
        _FORCE_OFF[0] = self._saved
        return False


def enabled() -> bool:
    """Default-on when the process-default backend is a TPU;
    KZG_TPU_PALLAS_FFT=0 disables."""
    if _FORCE_OFF[0]:
        return False
    if os.environ.get("KZG_TPU_PALLAS_FFT", "1") != "1":
        return False
    try:
        # TPU only: the kernel uses pltpu VMEM BlockSpecs / Mosaic lowering,
        # which would fail to compile on a GPU backend ("axon" is the
        # remote-attached TPU platform name).
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def supported(n: int) -> bool:
    """Capability limit of the kernel (what it can compile and run)."""
    log_n = n.bit_length() - 1
    return (1 << log_n) == n and MIN_LOG_N <= log_n <= HARD_MAX_LOG_N


def active(n: int) -> bool:
    """Routing decision: capability AND the measured win window
    (MAX_LOG_N; above it the XLA roll network is faster)."""
    log_n = n.bit_length() - 1
    return supported(n) and log_n <= MAX_LOG_N and enabled()


def _interpret() -> bool:
    return os.environ.get("KZG_TPU_PALLAS_INTERPRET", "0") == "1"


def _plan(log_n: int):
    cb = min(CB, log_n)
    rb = min(RB, log_n - cb)
    tb = log_n - cb - rb
    bpt = (1 << RB) >> rb if tb == 0 else 1  # batch packed into spare rows
    return cb, rb, tb, bpt


@lru_cache(maxsize=None)
def _tables(log_n: int, inverse: bool):
    """Host twiddle tables in Montgomery form.

    ab: (cb+rb, L, Rr, C) -- stage s twiddle at (r, c); identical for every
        tile because position mod 2^s has no T bits for s < cb+rb.
    cc: (tb, L, T, Rr, C) -- full-width tables for the tile stages
        (empty first axis when tb == 0).
    """
    n = 1 << log_n
    cb, rb, tb, _ = _plan(log_n)
    C, Rr, T = 1 << cb, 1 << rb, 1 << tb
    rmont = 1 << (fl.LIMB_BITS * L)

    def stage_vals(s, width):
        h = 1 << s
        w = root_of_unity(s + 1)
        if inverse:
            w = pow(w, R - 2, R)
        ladder = [1]
        for _ in range(h - 1):
            ladder.append(ladder[-1] * w % R)
        return [ladder[i % h] * rmont % R for i in range(width)]

    ab = np.empty((cb + rb, L, Rr, C), np.uint32)
    for s in range(cb + rb):
        ab[s] = fl.ints_to_limbs(stage_vals(s, Rr * C), L).reshape(L, Rr, C)
    cc = np.empty((tb, L, T, Rr, C), np.uint32)
    for j in range(tb):
        cc[j] = fl.ints_to_limbs(stage_vals(cb + rb + j, n), L).reshape(
            L, T, Rr, C
        )
    return ab, cc


@lru_cache(maxsize=None)
def _scale_limbs(log_n: int) -> np.ndarray:
    """(1/n) in Montgomery form, shaped (L, 1, 1, 1) for in-kernel use."""
    rmont = 1 << (fl.LIMB_BITS * L)
    v = pow(1 << log_n, R - 2, R) * rmont % R
    return fl.int_to_limbs(v, L).reshape(L, 1, 1, 1)


def _butterfly(x, tw, h: int, axis: int, identity_tw: bool):
    """One roll-form DIT stage along `axis` of an (L, *batch) value."""
    b = jnp.roll(x, -h, axis=axis)
    t = b if identity_tw else fl.mont_mul(FR, b, tw)
    u = fl.add(FR, x, t)
    v = fl.sub(FR, x, t)
    ids = jax.lax.broadcasted_iota(jnp.uint32, x.shape[1:], axis - 1)
    low = (ids & h) == 0
    return jnp.where(low[None], u, jnp.roll(v, h, axis=axis))


@lru_cache(maxsize=None)
def _kernel_ab(log_n: int, scale: bool):
    """Lane + row stages; grid = (batch_groups, T);
    x layout (L, G, BPT, T, Rr, C), block (L, 1, BPT, 1, Rr, C)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cb, rb, tb, bpt = _plan(log_n)
    C, Rr, T = 1 << cb, 1 << rb, 1 << tb

    def kernel(tw_ref, scale_ref, x_ref, o_ref):
        with fl.unrolled_ops():
            if bpt == 1:
                # rank-3 (L, Rr, C) values: the shape the MSM scan kernel
                # drives at the VPU ceiling; singleton batch dims cost
                # Mosaic layout changes on every op
                x = x_ref[:, 0, 0, 0]
                lane_ax, row_ax = 2, 1

                def tw(s_i):
                    return tw_ref[s_i]

            else:
                x = x_ref[:, 0, :, 0]  # (L, BPT, Rr, C)
                lane_ax, row_ax = 3, 2

                def tw(s_i):
                    # explicit singleton BPT axis: limb-leading arrays
                    # cannot rely on trailing-dim broadcasting
                    return tw_ref[s_i][:, None]

            if scale:
                s = scale_ref[...].reshape((L,) + (1,) * (x.ndim - 1))
                x = fl.mont_mul(FR, x, jnp.broadcast_to(s, x.shape))
            for s_i in range(cb):
                x = _butterfly(x, tw(s_i), 1 << s_i, lane_ax, s_i == 0)
            for s_i in range(cb, cb + rb):
                x = _butterfly(
                    x, tw(s_i), 1 << (s_i - cb), row_ax, identity_tw=False
                )
            if bpt == 1:
                o_ref[:, 0, 0, 0] = x
            else:
                o_ref[:, 0, :, 0] = x

    spec_x = pl.BlockSpec(
        (L, 1, bpt, 1, Rr, C),
        lambda g, t: (0, g, 0, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    spec_tw = pl.BlockSpec(
        (cb + rb, L, Rr, C), lambda g, t: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    spec_s = pl.BlockSpec(
        (L, 1, 1, 1), lambda g, t: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )

    def call(x, tw, scale_arr):
        G = x.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            grid=(G, T),
            in_specs=[spec_tw, spec_s, spec_x],
            out_specs=spec_x,
            interpret=_interpret(),
        )(tw, scale_arr, x)

    return call


RG = 8  # sublane rows per kernel-C program (Mosaic: second-to-last block
# dim must be a multiple of 8 or the full array dim; Rr = 16 whenever tile
# stages exist, so groups of 8 rows always tile it exactly)


@lru_cache(maxsize=None)
def _kernel_c_stage(log_n: int, j: int):
    """ONE tile stage (pairs tiles 2^j apart); grid = (batch, Rr/RG);
    block (L, 1, 1, T, RG, C). Per-stage calls keep VMEM at ~3 blocks
    (x + out + this stage's twiddles) instead of tb + 2."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cb, rb, tb, _ = _plan(log_n)
    C, Rr, T = 1 << cb, 1 << rb, 1 << tb

    def kernel(tw_ref, x_ref, o_ref):
        with fl.unrolled_ops():
            x = x_ref[:, 0, 0]  # (L, T, RG, C)
            o_ref[:, 0, 0] = _butterfly(x, tw_ref[...], 1 << j, 1, False)

    spec_x = pl.BlockSpec(
        (L, 1, 1, T, RG, C),
        lambda g, r: (0, g, 0, 0, r, 0),
        memory_space=pltpu.VMEM,
    )
    spec_tw = pl.BlockSpec(
        (L, T, RG, C), lambda g, r: (0, 0, r, 0), memory_space=pltpu.VMEM
    )

    def call(x, tw_j):
        G = x.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            grid=(G, Rr // RG),
            in_specs=[spec_tw, spec_x],
            out_specs=spec_x,
            interpret=_interpret(),
        )(tw_j, x)

    return call


def fft_pallas(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.fft's stage network on supported sizes.

    x: (L, *batch, n) Montgomery limbs in NATURAL order (the bit-reversal
    gather runs in XLA before the kernel: one 4-byte-indexed take against
    log2(n) full arithmetic passes). Includes the 1/n scale when inverse.
    """
    from .fft import brp_indices

    n = x.shape[-1]
    assert supported(n)
    log_n = n.bit_length() - 1
    cb, rb, tb, bpt = _plan(log_n)
    C, Rr, T = 1 << cb, 1 << rb, 1 << tb
    batch = x.shape[1:-1]
    B = int(np.prod(batch)) if batch else 1
    Bp = -(-B // bpt) * bpt

    x = jnp.take(x, jnp.asarray(brp_indices(n)), axis=-1)
    x = x.reshape(L, B, n)
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B), (0, 0)))
    x = x.reshape(L, Bp // bpt, bpt, T, Rr, C)

    ab, cc = _tables(log_n, inverse)
    scale_arr = jnp.asarray(
        _scale_limbs(log_n) if inverse else np.zeros((L, 1, 1, 1), np.uint32)
    )
    x = _kernel_ab(log_n, inverse)(x, jnp.asarray(ab), scale_arr)
    for j in range(tb):
        x = _kernel_c_stage(log_n, j)(x, jnp.asarray(cc[j]))
    x = x.reshape(L, Bp, n)[:, :B]
    return x.reshape((L,) + batch + (n,))
