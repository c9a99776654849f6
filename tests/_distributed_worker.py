"""Worker process for the REAL 2-process `jax.distributed` test.

Each worker is one "host": CPU backend with 4 virtual devices and gloo
cross-process collectives. Both workers initialize jax.distributed against
the same coordinator, build the ONE global (2 x 4) blobs-x-points mesh
(`parallel.distributed.global_mesh` -- blobs axis spans the two processes,
the DCN analog), run the sharded fixed-base MSM over it, and check their
local blob shard bit-exactly against the pure-Python oracle.

Role parity: the reference scales with an in-process thread pool
(/root/reference/kzg/src/msm/thread_pool.rs); the TPU-native scaling unit
is a multi-host mesh, so the test must actually span OS processes.
"""

import os
import sys


def main() -> int:
    port = sys.argv[1]
    pid = int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "kzg_tpu", "jax_cache_local"
        ),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kzg_tpu.oracle.curve import G1, G1_GENERATOR
    from kzg_tpu.ops import field as fl
    from kzg_tpu.ops import g1 as dg1
    from kzg_tpu.ops import msm as dmsm
    from kzg_tpu.parallel import distributed as D
    from kzg_tpu.parallel.sharded_msm import msm_fixed_sharded

    D.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = D.global_mesh(blob_axis_size=2)
    assert dict(mesh.shape) == {"blobs": 2, "points": 4}

    # deterministic inputs, identical on both processes
    rng = np.random.RandomState(7)
    n, B, c = 64, 2, 7
    pts = [
        G1.mul_scalar(G1_GENERATOR, int(k) + 1) for k in rng.randint(1, 2**30, n)
    ]
    scalars = [[int(s) for s in rng.randint(0, 2**62, n)] for _ in range(B)]

    table = dmsm.build_fixed_base_table(dg1.affine_from_ints(pts), c=c)
    sc = np.stack(
        [np.asarray(fl.ints_to_limbs(row, fl.FR.n_limbs)) for row in scalars],
        axis=1,
    )  # (16, B, n)

    def gput(x, spec):
        s = NamedSharding(mesh, spec)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    tg = dmsm.FixedBaseTable(
        gput(table.x, P(None, None, "points")),
        gput(table.y, P(None, None, "points")),
        gput(table.inf, P(None, "points")),
        c,
    )
    out = msm_fixed_sharded(tg, gput(sc, P(None, "blobs", "points")), mesh)

    # this process's blob shard (replicated over its 4 points-axis devices)
    b = out.x.addressable_shards[0].index[1].start  # global blob index
    local = dg1.G1XYZZ(
        *(np.asarray(leaf.addressable_shards[0].data) for leaf in out)
    )  # leaves (L, 1)
    got = dg1.affine_to_ints(jax.jit(dg1.to_affine)(local))[0]

    want = None
    for p, k in zip(pts, scalars[b]):
        want = G1.affine_add(want, G1.mul_scalar(p, k))
    assert got == want, f"blob {b}: {got} != {want}"

    print(f"OK {pid}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
