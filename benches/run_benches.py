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


def timeit_stats(fn, iters):
    """(median, p10, p90, n) seconds -- criterion-style spread so a single
    contended-host outlier is visible instead of silently polluting the row."""
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    a = np.asarray(ts)
    return float(np.median(a)), float(np.percentile(a, 10)), float(np.percentile(a, 90)), len(a)


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

    t_start = time.time()

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

    def flush_partial():
        # rows stream out as they are produced: a timed-out run still
        # leaves a valid partial table on disk and in the log
        if args.json:
            with open(args.json, "w") as f:
                json.dump(results, f, indent=2)

    def run(name, prepare, op):
        if want and name not in want:
            return
        ctx = prepare()
        t0 = time.perf_counter()
        op(*ctx)  # warmup/compile
        t_compile = time.perf_counter() - t0
        dt, p10, p90, n_samp = timeit_stats(lambda: op(*ctx), args.iters)
        base1, base16 = BASELINES_MS.get(name, (None, None))
        results[name] = {
            "ms": dt * 1e3,
            "ms_p10": p10 * 1e3,
            "ms_p90": p90 * 1e3,
            "samples": n_samp,
            "vs_blst_1core": (base1 / (dt * 1e3)) if base1 else None,
            "vs_blst_16core": (base16 / (dt * 1e3)) if base16 else None,
        }
        extra = ""
        if base1:
            extra = f"  ({base1/(dt*1e3):.1f}x blst-1c, {base16/(dt*1e3):.1f}x blst-16c)"
        print(
            f"[{time.time()-t_start:7.1f}s] {name:36s} {dt*1e3:10.3f} ms{extra}"
            f"  [warm+compile {t_compile:.1f}s]",
            file=sys.stderr,
            flush=True,
        )
        flush_partial()

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

    def run_pipelined(name, op, iters=None):
        """Device throughput per op: dispatch `iters` programs into the
        in-order queue, fence ONCE on the last (PERF.md "Measurement
        integrity") -- the honest per-op number once the ~40 ms tunnel
        round trip amortizes (a locally-attached chip pays no such RTT).
        Recorded as <name>.ms_pipelined next to the fenced latency."""
        if want and name not in want:
            return
        iters = iters or max(4, args.iters)
        op()  # warm
        t0 = time.perf_counter()
        outs = [op() for _ in range(iters)]
        fence(outs[-1])
        dt = (time.perf_counter() - t0) / iters
        if name in results:
            results[name]["ms_pipelined"] = dt * 1e3
        else:
            results[name] = {"ms_pipelined": dt * 1e3}
        print(
            f"[{time.time()-t_start:7.1f}s] {name:36s} {dt*1e3:10.3f} ms (pipelined)",
            file=sys.stderr,
            flush=True,
        )
        flush_partial()

    run(
        f"g1_lincomb_{n}",
        lambda: (),
        lambda: fence(dmsm.msm_fixed(table, sc)),
    )
    run_pipelined(f"g1_lincomb_{n}", lambda: dmsm.msm_fixed(table, sc))

    # micro: fft_fr scale 15
    vals = FR.encode([int.from_bytes(rng.bytes(32), "big") % R for _ in range(1 << 15)])
    run(
        "fft_fr_scale15",
        lambda: (),
        lambda: fence(dfft.fft(vals)),
    )
    run_pipelined("fft_fr_scale15", lambda: dfft.fft(vals))

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

    # throughput-shaped per-blob numbers: the single-op rows above pay a
    # full tunnel round trip per call; the batch entry points amortize it
    # (the honest comparison against the reference's 16-core batch numbers)
    def per_blob(name, fn, base_name):
        if want and name not in want:
            return
        fn()  # warm
        dt = timeit(fn, max(3, args.iters // 2))
        base1, base16 = BASELINES_MS.get(base_name, (None, None))
        row = {"ms_per_blob": dt / 64 * 1e3}
        if base1:
            row["vs_blst_1core"] = base1 / (dt / 64 * 1e3)
            row["vs_blst_16core"] = base16 / (dt / 64 * 1e3)
        results[name] = row
        print(
            f"[{time.time()-t_start:7.1f}s] {name:36s} {dt/64*1e3:10.3f} ms/blob",
            file=sys.stderr,
            flush=True,
        )
        flush_partial()

    per_blob(
        "blob_to_kzg_commitment_batch_64",
        lambda: kzg.blob_to_kzg_commitment_batch(blobs, s),
        "blob_to_kzg_commitment",
    )
    per_blob(
        "compute_blob_kzg_proof_batch_64",
        lambda: kzg.compute_blob_kzg_proof_batch(blobs, commitments, s),
        "compute_blob_kzg_proof",
    )
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

    # G1 FFT capability demonstration at the reference's bench scales
    # (blst fft_g1: 18.8 s single-core / ~5 s 16-core at 2^15, BASELINE.md;
    # bench shapes from /root/reference/kzg-bench/src/benches/fft.rs)
    if not want or "fft_g1" in want:
        from kzg_tpu.ops import g1 as dg1
        from kzg_tpu.ops.g1fft import fft_g1_standalone
        from kzg_tpu.oracle.kzg import generate_trusted_setup

        g1pts, _ = generate_trusted_setup(4096, 31337)
        g1fft_res = {}
        # default caps at 2^14: the 2^15 unrolled G1-FFT program exceeded the
        # remote TPU compiler's practical budget (>70 min, round-4 log);
        # override with BENCH_G1FFT_POWS=12,15 where a longer budget exists.
        for p in [int(x) for x in os.environ.get(
            "BENCH_G1FFT_POWS", "12,14"
        ).split(",")]:
            m = 1 << p
            base = dg1.from_affine(
                dg1.affine_from_ints((g1pts * ((m + 4095) // 4096))[:m])
            )
            fence(fft_g1_standalone(base))  # compile + warm
            t0 = time.perf_counter()
            fence(fft_g1_standalone(base))
            dt = time.perf_counter() - t0
            base1 = 18.8e3 * (m * p) / ((1 << 15) * 15)  # O(n log n) scaling
            g1fft_res[f"2^{p}"] = {
                "ms": dt * 1e3,
                "vs_blst_1core_scaled": base1 / (dt * 1e3),
            }
            print(
                f"[{time.time()-t_start:7.1f}s] fft_g1 2^{p:<2d} {dt*1e3:10.1f} ms "
                f"({base1/(dt*1e3):.1f}x blst-1c scaled)",
                file=sys.stderr,
                flush=True,
            )
            results["fft_g1"] = g1fft_res
            flush_partial()

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
                f"[{time.time()-t_start:7.1f}s] msm_variable 2^{p:<2d} "
                f"{dt*1e3:10.2f} ms  ({m/dt/1e3:.0f}k pts/s)",
                file=sys.stderr,
                flush=True,
            )
            results["msm_sweep_variable_base"] = sweep
            flush_partial()

    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
