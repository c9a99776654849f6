"""Stage-by-stage timing of the fixed-base MSM pipeline (mem-layout design).

Prefix-difference method with honest fencing: for each prefix of the
pipeline (digits+sort | +gather | +scan/buckets | +integrate) dispatch
`iters` distinct-input programs into the device FIFO queue and fence ONCE
on a host read-back of the last result; stage cost = difference between
successive prefixes. Each prefix ends in a tiny u32 reduction so the
read-back is a few bytes.

Usage: python benches/msm_stages.py [batch] [iters]
"""

import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from kzg_tpu.constants import R_MOD as R
    from kzg_tpu.ops import g1
    from kzg_tpu.ops import msm as dmsm
    from kzg_tpu.ops import pallas_msm
    from kzg_tpu.ops.field import FP, ints_to_limbs
    from kzg_tpu.ops.g1 import G1XYZZ
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
        n_keys = nb * (half + 1)

        rows_packed, R0 = dmsm._pack_point_rows(table.x, table.y, table.inf)
        src_nat = jnp.broadcast_to(
            (
                jnp.arange(w, dtype=jnp.int32).reshape(w, 1, 1) * n
                + jnp.arange(n, dtype=jnp.int32).reshape(1, 1, n)
            ),
            (w, nb, n),
        )
        aug = jnp.where(sign, src_nat + R0, src_nat).reshape(E)
        flat_keys = keys.reshape(E)

        sorted_keys, src_sorted = jax.lax.sort((flat_keys, aug), num_keys=1)
        if stage == 0:
            return jnp.sum(sorted_keys) + jnp.sum(src_sorted)

        diff = sorted_keys[1:] != sorted_keys[:-1]
        first = jnp.concatenate([jnp.ones((1,), bool), diff])
        last = jnp.concatenate([diff, jnp.ones((1,), bool)])
        K = dmsm._pick_chunk(E)
        lanes = pallas_msm.S * 128
        m_p = -(-(-(-E // K)) // lanes) * lanes
        E2 = m_p * K
        pad = E2 - E
        if pad:
            src_sorted = jnp.pad(src_sorted, (0, pad))
            first = jnp.pad(first, (0, pad), constant_values=True)
            last = jnp.pad(last, (0, pad), constant_values=True)
        fl2 = first.reshape(m_p, K)
        la2 = last.reshape(m_p, K)
        MS = m_p // 128
        idx_mem = src_sorted.reshape(m_p, K).T.reshape(K, MS, 128)
        first_mem = fl2.astype(jnp.uint32).T.reshape(K, MS, 128)
        g = jnp.take(rows_packed.T, idx_mem, axis=1)
        if stage == 1:
            return jnp.sum(g, dtype=jnp.uint32)

        with g1.tiled_pallas_adds():
            sums = dmsm._bucket_sums_mem(rows_packed, flat_keys, aug, n_keys)
            buckets = G1XYZZ(*(cc.reshape((L, nb, half + 1)) for cc in sums))
            if stage == 2:
                return sum(jnp.sum(cc, dtype=jnp.uint32) for cc in buckets)
            acc = dmsm.integrate_buckets(buckets)
        return sum(jnp.sum(cc, dtype=jnp.uint32) for cc in acc)

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

    names = ["digits+sort", "gather", "scan+buckets", "integrate"]
    prev = 0.0
    for stage in (0, 1, 2, 3):
        print(f"{names[stage]:>14}: {results[stage]-prev:7.2f} ms")
        prev = results[stage]
    total = results[3]
    pts = batch * n / (total / 1e3)
    print(f"total {total:.2f} ms -> {pts/1e3:.0f}K pts/s")


if __name__ == "__main__":
    main()
