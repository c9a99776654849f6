"""Microbenchmark: Pallas Montgomery kernel vs the XLA limb path.

Run on a TPU: python benches/pallas_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from kzg_tpu.constants import P_MOD, R_MOD
from kzg_tpu.ops import field as fl
from kzg_tpu.ops import pallas_field as pf
from kzg_tpu.ops.field import FP, FR


def bench(tag, fn, a, b, iters=20):
    out = fn(a, b)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(a, b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    n = a.shape[-1] if a.ndim == 2 else np.prod(a.shape[1:])
    print(f"{tag:28s} {dt*1e6:9.1f} us  ({n/dt/1e6:8.1f} M muls/s)", file=sys.stderr)
    return out


def main():
    rng = np.random.default_rng(0)
    for spec, mod in ((FR, R_MOD), (FP, P_MOD)):
        for n in (1 << 13, 1 << 17):
            vals_a = [int.from_bytes(rng.bytes(48), "big") % mod for _ in range(256)]
            vals_b = [int.from_bytes(rng.bytes(48), "big") % mod for _ in range(256)]
            a = jnp.tile(jnp.asarray(spec.encode(vals_a)), (1, n // 256))
            b = jnp.tile(jnp.asarray(spec.encode(vals_b)), (1, n // 256))
            jitted = jax.jit(lambda x, y, s=spec: fl.mont_mul(s, x, y))
            o1 = bench(f"{spec.name} xla    n=2^{n.bit_length()-1}", jitted, a, b)
            if pf.enabled():
                o2 = bench(
                    f"{spec.name} pallas n=2^{n.bit_length()-1}",
                    lambda x, y, s=spec: pf.mont_mul_pallas(s, x, y),
                    a,
                    b,
                )
                same = bool(jnp.all(o1 == o2))
                print(f"  match: {same}", file=sys.stderr)
                if not same:
                    sys.exit(1)


if __name__ == "__main__":
    main()
