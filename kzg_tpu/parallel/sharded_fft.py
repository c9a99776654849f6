"""Multi-chip Fr FFT: the four-step (Bailey) factorization with one
all-to-all between the two local FFT phases.

The reference scales its FFT with recursive fork-join threads
(/root/reference/blst/src/fft_fr.rs:73-96); the TPU-native equivalent for
large transforms (the 2^12..2^20 scaling sweep in BASELINE.json) is:

    n = n1 * n2, input x[i1 + n1*i2] laid out as a (n1, n2) matrix with the
    i1 axis sharded over the mesh:
      1. length-n2 FFTs along the local axis (each chip: n1/d of them);
      2. twiddle multiply by w_n^(i1*k2) (local, precomputed);
      3. all_to_all over ICI: re-shard from rows (i1) to columns (k2);
      4. length-n1 FFTs along the (now local) i1 axis.
    X[k2 + n2*k1] = result[k2, k1].

Bit-exact against the single-chip fft (tests/test_sharded.py).
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..constants import R_MOD as R, root_of_unity
from ..ops import field as fl
from ..ops import pallas_msm
from ..ops.fft import fft_body
from ..ops.field import FR


@lru_cache(maxsize=None)
def _outer_twiddles(n1: int, n2: int, inverse: bool) -> np.ndarray:
    """(16, n1, n2) Montgomery-form w_n^(i1*k2) table."""
    n = n1 * n2
    w = root_of_unity(n.bit_length() - 1)
    if inverse:
        w = pow(w, R - 2, R)
    r = 1 << (16 * FR.n_limbs)
    out = np.empty((FR.n_limbs, n1, n2), dtype=np.uint32)
    for i1 in range(n1):
        base = pow(w, i1, R)
        acc = 1
        row = np.empty(n2, dtype=object)
        for k2 in range(n2):
            row[k2] = acc * r % R
            acc = acc * base % R
        out[:, i1, :] = fl.ints_to_limbs(list(row), FR.n_limbs)
    return out


@lru_cache(maxsize=None)
def _n_inv_mont(n: int) -> np.ndarray:
    r = 1 << (16 * FR.n_limbs)
    return fl.int_to_limbs(pow(n, R - 2, R) * r % R, FR.n_limbs)


def fft_sharded(
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "points",
    inverse: bool = False,
) -> jnp.ndarray:
    """Distributed FFT along the last axis of (16, n) Montgomery limbs.
    Output matches ops.fft.fft bit-exactly."""
    n = x.shape[-1]
    d = mesh.shape[axis]
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    if n1 < d:
        n1 = d
    n2 = n // n1
    assert n1 % d == 0 and n1 * n2 == n

    # x[i1 + n1*i2] -> y[i1, i2]: reshape to (n2, n1) then transpose
    y = x.reshape(FR.n_limbs, n2, n1).transpose(0, 2, 1)  # (16, n1, n2)
    tw = jnp.asarray(_outer_twiddles(n1, n2, inverse))

    # field-op form follows the MESH platform (unrolled dataflow on a TPU
    # mesh; compact loop graphs on a CPU mesh, where XLA:CPU compile time
    # is the binding constraint -- see fl.maybe_unrolled)
    unroll = pallas_msm.enabled_for(mesh)

    from ..ops import pallas_fft

    def shard_fn(yb, twb):
        # the Pallas FFT kernel is gated off inside shard_map bodies: the
        # mesh may be CPU (multi-chip dryrun) and per-shard lengths here are
        # short; the XLA forms are correct on every platform
        with pallas_fft.force_off(), fl.maybe_unrolled(unroll):
            # yb: (16, n1/d, n2)
            a = fft_body(yb, inverse=inverse)       # step 1 (scale note below)
            # inverse: fft_body(inverse) scales by 1/n2; total needed 1/n --
            # the remaining 1/n1 comes from step 4's own inverse scale.
            b = fl.mont_mul(FR, a, twb)             # step 2
            c = jax.lax.all_to_all(b, axis, split_axis=2, concat_axis=1, tiled=True)
            # c: (16, n1, n2/d) -> transpose so i1 is last
            ct = c.transpose(0, 2, 1)               # (16, n2/d, n1)
            return fft_body(ct, inverse=inverse)    # step 4

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        check_rep=False,
        in_specs=(P(None, axis, None), P(None, axis, None)),
        out_specs=P(None, axis, None),
    )
    out = jax.jit(fn)(y, tw)  # (16, n2, n1) with n2 sharded
    # X[k2 + n2*k1] = out[k2, k1] -> flatten with k1 major
    return out.transpose(0, 2, 1).reshape(FR.n_limbs, n)


def ifft_sharded(x: jnp.ndarray, mesh: Mesh, axis: str = "points") -> jnp.ndarray:
    return fft_sharded(x, mesh, axis=axis, inverse=True)
