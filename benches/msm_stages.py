"""Stage-by-stage timing of the fixed-base MSM pipeline.

Prefix-difference method with honest fencing: for each prefix of the
pipeline (digits+sort | +gather | +scan/buckets | +integrate) dispatch
`iters` distinct-input programs into the device FIFO queue and fence ONCE
on a host read-back of the last result; stage cost = difference between
successive prefixes. Each prefix ends in a tiny u32 reduction so the
read-back is a few bytes.

Usage: python benches/msm_stages.py [batch] [iters]
"""

import os
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from kzg_tpu.constants import R_MOD as R
    from kzg_tpu.ops import field as fl
    from kzg_tpu.ops import g1
    from kzg_tpu.ops import msm as dmsm
    from kzg_tpu.ops.field import FP, FR, ints_to_limbs
    from kzg_tpu.ops.g1 import G1Aff, G1XYZZ
    from kzg_tpu.settings import load_settings

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n = 4096

    s = load_settings()
    table = s.lagrange_table
    c = table.c
    w = dmsm.num_windows(c)
    half = 1 << (c - 1)
    L = FP.n_limbs
    print(f"c={c} w={w} batch={batch} E={batch*w*n}", file=sys.stderr)

    @partial(jax.jit, static_argnames=("stage",))
    def prefix(scalars, stage):
        nb = batch
        digits = dmsm.signed_digits(scalars, c).reshape(w, nb, n)
        sign = digits < 0
        bucket = jnp.abs(digits)
        bidx = jnp.arange(nb, dtype=jnp.int32)[None, :, None]
        keys = bidx * (half + 1) + bucket
        E = nb * w * n
        flat_keys = keys.reshape(E)
        order = jnp.argsort(flat_keys)
        sorted_keys = flat_keys[order]
        if stage == 0:
            return jnp.sum(sorted_keys) + jnp.sum(order)

        def pack_rows(a):  # (L, w, n) -> (w*n, L/2)
            p = a[0::2] | (a[1::2] << 16)
            return p.reshape(L // 2, w * n).T

        def unpack(gg):
            lo = gg & jnp.uint32(0xFFFF)
            hi = gg >> 16
            return jnp.stack([lo, hi], axis=1).reshape(L, gg.shape[-1])

        tab_rows = jnp.concatenate(
            [pack_rows(table.x), pack_rows(table.y)], axis=1
        )
        j = order // (nb * n)
        rem = order % (nb * n)
        src = j * n + rem % n
        gg = tab_rows[src].T
        px = unpack(gg[: L // 2])
        py = unpack(gg[L // 2 :])
        sign_s = sign.reshape(E)[order]
        py = jnp.where(sign_s[None], fl.neg(FP, py), py)
        tinf = jnp.broadcast_to(
            table.inf.reshape((w, 1, n)), (w, nb, n)
        ).reshape(E)
        pinf = tinf[order]
        if stage == 1:
            return jnp.sum(px) + jnp.sum(py) + jnp.sum(pinf)

        with g1.tiled_pallas_adds():
            sums = dmsm.segment_sum_points(
                G1Aff(px, py, pinf), sorted_keys, nb * (half + 1),
                use_pallas=True,
            )
            buckets = G1XYZZ(*(cc.reshape((L, nb, half + 1)) for cc in sums))
            if stage == 2:
                return sum(jnp.sum(cc) for cc in buckets)
            acc = dmsm.integrate_buckets(buckets)
        return sum(jnp.sum(cc) for cc in acc)

    rng = np.random.default_rng(42)

    def make_scalars(i):
        sc = [
            [int.from_bytes(rng.bytes(32), "big") % R for _ in range(n)]
            for _ in range(batch)
        ]
        return jnp.asarray(np.stack([ints_to_limbs(si, 16) for si in sc], axis=1))

    inputs = [make_scalars(i) for i in range(iters)]

    results = {}
    for stage in (0, 1, 2, 3):
        # warm-up compile + one execution
        r = prefix(inputs[0], stage)
        _ = np.asarray(r)
        t0 = time.time()
        outs = [prefix(x, stage) for x in inputs]
        _ = np.asarray(outs[-1])  # FIFO queue: one fence covers all
        dt = (time.time() - t0) / iters * 1e3
        results[stage] = dt
        print(f"prefix {stage}: {dt:.2f} ms", file=sys.stderr)

    names = ["digits+sort", "gather+unpack", "scan+buckets", "integrate"]
    prev = 0.0
    for stage in (0, 1, 2, 3):
        print(f"{names[stage]:>14}: {results[stage]-prev:7.2f} ms")
        prev = results[stage]
    total = results[3]
    pts = batch * n / (total / 1e3)
    print(f"total {total:.2f} ms -> {pts/1e3:.0f}K pts/s")


if __name__ == "__main__":
    main()
