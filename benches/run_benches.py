"""Criterion-style benchmark CLI reproducing the reference's headline table
(SURVEY.md section 6 / BASELINE.md): per-op medians + blobs/s, JSON output.

Usage: python benches/run_benches.py [--iters N] [--ops op1,op2] [--json PATH]
Env: BENCH_NPOW (MSM size exponent, default 12, parity with
/root/reference/kzg-bench/src/benches/lincomb.rs:25-27).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, iters):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


BASELINES_MS = {
    # blst sequential 1-core / parallel 16-core (BASELINE.md)
    "blob_to_kzg_commitment": (52.39, 8.98),
    "compute_kzg_proof": (55.34, 10.26),
    "compute_blob_kzg_proof": (56.41, 11.29),
    "verify_kzg_proof": (1.24, 1.23),
    "verify_blob_kzg_proof": (2.82, 2.83),
    "verify_blob_kzg_proof_batch_64": (114.2, 16.17),
    "fft_fr_scale15": (9.69, 2.37),
    "g1_lincomb_4096": (54.6, 9.02),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ops", type=str, default="")
    ap.add_argument("--json", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from kzg_tpu import api as kzg
    from kzg_tpu.constants import R_MOD as R
    from kzg_tpu.ops import fft as dfft, msm as dmsm
    from kzg_tpu.ops.field import FR, ints_to_limbs

    print(f"devices: {jax.devices()}", file=sys.stderr)
    s = kzg.load_trusted_setup_file()

    rng = np.random.default_rng(7)

    def rand_blob():
        vals = [int.from_bytes(rng.bytes(32), "big") % R for _ in range(4096)]
        return b"".join(v.to_bytes(32, "big") for v in vals)

    blob = rand_blob()
    results = {}
    want = [o for o in args.ops.split(",") if o] or None

    def run(name, prepare, op):
        if want and name not in want:
            return
        ctx = prepare()
        op(*ctx)  # warmup/compile
        dt = timeit(lambda: op(*ctx), args.iters)
        base1, base16 = BASELINES_MS.get(name, (None, None))
        results[name] = {
            "ms": dt * 1e3,
            "vs_blst_1core": (base1 / (dt * 1e3)) if base1 else None,
            "vs_blst_16core": (base16 / (dt * 1e3)) if base16 else None,
        }
        extra = ""
        if base1:
            extra = f"  ({base1/(dt*1e3):.1f}x blst-1c, {base16/(dt*1e3):.1f}x blst-16c)"
        print(f"{name:36s} {dt*1e3:10.3f} ms{extra}", file=sys.stderr)

    def fence(out):
        # jax.block_until_ready does NOT fence execution through the remote
        # axon tunnel (PERF.md "Measurement integrity"); only a host
        # read-back is an honest fence. ONE concatenated transfer -- each
        # separate read-back costs a full ~40 ms round trip.
        leaves = [jnp.ravel(l).astype(jnp.uint32) for l in jax.tree.leaves(out)]
        return np.asarray(leaves[0] if len(leaves) == 1 else jnp.concatenate(leaves))

    # micro: MSM at the reference's default size
    npow = int(os.environ.get("BENCH_NPOW", "12"))
    n = 1 << npow
    sc = jnp.asarray(
        ints_to_limbs([int.from_bytes(rng.bytes(32), "big") % R for _ in range(n)], 16)
    )
    table = s.lagrange_table

    run(
        f"g1_lincomb_{n}",
        lambda: (),
        lambda: fence(dmsm.msm_fixed(table, sc)),
    )

    # micro: fft_fr scale 15
    vals = FR.encode([int.from_bytes(rng.bytes(32), "big") % R for _ in range(1 << 15)])
    run(
        "fft_fr_scale15",
        lambda: (),
        lambda: fence(dfft.fft(vals)),
    )

    # protocol ops
    commitment = kzg.blob_to_kzg_commitment(blob, s)
    proof, y = kzg.compute_kzg_proof(blob, (2026).to_bytes(32, "big"), s)
    blob_proof = kzg.compute_blob_kzg_proof(blob, commitment, s)

    run("blob_to_kzg_commitment", lambda: (), lambda: kzg.blob_to_kzg_commitment(blob, s))
    run(
        "compute_kzg_proof",
        lambda: (),
        lambda: kzg.compute_kzg_proof(blob, (2026).to_bytes(32, "big"), s),
    )
    run(
        "compute_blob_kzg_proof",
        lambda: (),
        lambda: kzg.compute_blob_kzg_proof(blob, commitment, s),
    )
    run(
        "verify_kzg_proof",
        lambda: (),
        lambda: kzg.verify_kzg_proof(commitment, (2026).to_bytes(32, "big"), y, proof, s),
    )
    run(
        "verify_blob_kzg_proof",
        lambda: (),
        lambda: kzg.verify_blob_kzg_proof(blob, commitment, blob_proof, s),
    )

    # 64-blob batch (the reference's MAX_COUNT=64 headline,
    # kzg-bench/src/benches/eip_4844.rs:42)
    blobs = [rand_blob() for _ in range(64)]
    commitments = kzg.blob_to_kzg_commitment_batch(blobs, s)
    proofs = kzg.compute_blob_kzg_proof_batch(blobs, commitments, s)
    run(
        "verify_blob_kzg_proof_batch_64",
        lambda: (),
        lambda: kzg.verify_blob_kzg_proof_batch(blobs, commitments, proofs, s),
    )
    if results.get("verify_blob_kzg_proof_batch_64"):
        ms = results["verify_blob_kzg_proof_batch_64"]["ms"]
        results["verify_blob_kzg_proof_batch_64"]["blobs_per_sec"] = 64 / (ms / 1e3)

    # EIP-7594 (no published reference numbers; recorded for tracking)
    run(
        "compute_cells_and_kzg_proofs",
        lambda: (),
        lambda: kzg.compute_cells_and_kzg_proofs(blob, s),
    )
    cells, cell_proofs = kzg.compute_cells_and_kzg_proofs(blob, s)
    half = list(range(0, 128, 2))
    run(
        "recover_cells_and_kzg_proofs_50pct",
        lambda: (),
        lambda: kzg.recover_cells_and_kzg_proofs(half, [cells[i] for i in half], s),
    )
    run(
        "verify_cell_kzg_proof_batch_128",
        lambda: (),
        lambda: kzg.verify_cell_kzg_proof_batch(
            [commitment] * 128, list(range(128)), cells, cell_proofs, s
        ),
    )

    # MSM size-scaling sweep (BASELINE.md north-star curve; parity:
    # BENCH_NPOW sweep, kzg-bench/src/benches/lincomb.rs:25-27). Variable
    # base: build-table cost would dominate a fresh setup at each size.
    if not want or "msm_sweep" in want:
        sweep = {}
        from kzg_tpu.ops import g1 as dg1
        from kzg_tpu.oracle.kzg import generate_trusted_setup

        g1m, _ = generate_trusted_setup(4096, 31337)
        for p in [int(x) for x in os.environ.get(
            "BENCH_SWEEP_POWS", "12,14,16,18,20"
        ).split(",")]:
            m = 1 << p
            # synthetic points (tiled generated setup: arithmetic cost is
            # identical to a real setup of this size)
            base = dg1.affine_from_ints((g1m * ((m + 4095) // 4096))[:m])
            scs = jnp.asarray(
                ints_to_limbs(
                    [int.from_bytes(rng.bytes(32), "big") % R for _ in range(m)], 16
                )
            )
            out = dmsm.msm(base, scs)  # compile + warm
            fence(out)
            dt = timeit(lambda: fence(dmsm.msm(base, scs)), max(2, args.iters // 2))
            sweep[f"2^{p}"] = {"ms": dt * 1e3, "pts_per_sec": m / dt}
            print(
                f"msm_variable 2^{p:<2d} {dt*1e3:10.2f} ms  "
                f"({m/dt/1e3:.0f}k pts/s)",
                file=sys.stderr,
            )
        results["msm_sweep_variable_base"] = sweep

    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
