"""2-process (multi-host proxy) weak-scaling measurement of the sharded
fixed-base MSM over a DCN-spanning global mesh (gloo CPU collectives).

Methodology: each process hosts 4 virtual CPU devices; the global mesh is
(blobs=nproc, points=4). The per-process workload is fixed (B_LOCAL blobs of
an n-point fixed-base MSM), so perfect weak scaling means the 2-process
step time equals the 1-process step time; efficiency = t_1proc / t_2proc.
The sharded program is the production one (parallel.sharded_msm.
msm_fixed_sharded), so the measured delta is the real cross-process
collective + runtime overhead.

CAVEAT (recorded with the result): this host exposes ONE physical core, so
two processes timeshare it -- the measured efficiency is a LOWER bound that
bundles core contention with communication overhead. On real multi-host
TPU the compute runs on chips and only the collective overhead remains.
(Role parity: the reference scales via an in-process thread pool,
/root/reference/kzg/src/msm/thread_pool.rs; BASELINE.md asks >=80% at 2
hosts.)

Usage: python benches/scaling_2proc.py            # runs both, prints JSON
       python benches/scaling_2proc.py worker P I N   # internal
"""

import json
import os
import socket
import subprocess
import sys
import time

# Shapes chosen for XLA:CPU COMPILE cost, not run cost: the collective
# overhead being measured is shape-independent, and the round-4 run died in
# the workers' cold compiles (1800 s timeout on one timeshared core).
# c=4 keeps integrate_buckets on its compact path -- same program family the
# multi-chip dryrun compiles, so the persistent cache is shared.
N_PTS = 64
B_LOCAL = 2
WINDOW = 4
STEPS = 8


def worker(port: int, pid: int, nproc: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import kzg_tpu  # host-fingerprinted local cache partition

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", kzg_tpu.compile_cache_dir())
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import numpy as np

    from kzg_tpu.constants import R_MOD as R
    from kzg_tpu.oracle.curve import G1, G1_GENERATOR
    from kzg_tpu.ops import field as fl
    from kzg_tpu.ops import g1 as dg1
    from kzg_tpu.ops import msm as dmsm
    from kzg_tpu.parallel import distributed as D
    from kzg_tpu.parallel.sharded_msm import msm_fixed_sharded

    if nproc > 1:
        D.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    mesh = D.global_mesh(blob_axis_size=nproc)

    rng = np.random.RandomState(7)
    pts = [
        G1.mul_scalar(G1_GENERATOR, int(k) + 1)
        for k in rng.randint(1, 2**30, N_PTS)
    ]
    table = dmsm.build_fixed_base_table(dg1.affine_from_ints(pts), c=WINDOW)
    B = B_LOCAL * nproc
    scalars = [
        [int.from_bytes(rng.bytes(32), "big") % R for _ in range(N_PTS)]
        for _ in range(B)
    ]
    import jax.numpy as jnp

    sc = jnp.asarray(np.stack([fl.ints_to_limbs(s, 16) for s in scalars], axis=1))

    out = msm_fixed_sharded(table, sc, mesh)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = msm_fixed_sharded(table, sc, mesh)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS
    if pid == 0:
        print(json.dumps({"nproc": nproc, "step_ms": dt * 1e3}), flush=True)


def run_config(nproc: int) -> float:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "worker", str(port), str(i), str(nproc)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    step_ms = None
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}: {out[-2000:]}")
        for line in out.splitlines():
            if line.startswith("{"):
                step_ms = json.loads(line)["step_ms"]
    assert step_ms is not None
    return step_ms


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    t1 = run_config(1)
    t2 = run_config(2)
    print(
        json.dumps(
            {
                "msm_fixed_sharded_step_ms_1proc": t1,
                "msm_fixed_sharded_step_ms_2proc": t2,
                "weak_scaling_efficiency": t1 / t2,
                "note": (
                    "single-core host: 2 processes timeshare one core, so "
                    "this efficiency is a lower bound bundling contention "
                    "with gloo collective overhead"
                ),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
