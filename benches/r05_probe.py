"""Round-5 TPU probe: stage-level timings for every op that misses its perf
bar, in ONE process (the axon tunnel serializes clients -- never run two
TPU-bound processes at once).

Usage: python benches/r05_probe.py [section ...]
Sections: upload, batchverify, eip7594, fft, all (default).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

os.environ.setdefault("KZG_TPU_TRACE", "1")

import jax
import jax.numpy as jnp

from kzg_tpu import api as kzg
from kzg_tpu.constants import R_MOD as R
from kzg_tpu.ops import fft as dfft
from kzg_tpu.ops import field as fl
from kzg_tpu.ops.field import FR

SECTIONS = set(sys.argv[1:]) or {"all"}


def want(name):
    return "all" in SECTIONS or name in SECTIONS


def log(msg):
    print(msg, flush=True)


rng = np.random.default_rng(7)


def rand_blob():
    vals = [int.from_bytes(rng.bytes(32), "big") % R for _ in range(4096)]
    return b"".join(v.to_bytes(32, "big") for v in vals)


log(f"devices: {jax.devices()}")
s = kzg.load_trusted_setup_file()

if want("upload"):
    log("== upload bandwidth (fresh buffers) ==")
    for mb, shape in ((8.4, (64, 4096, 8)),):
        for i in range(5):
            w = rng.integers(0, 2**30, size=shape, dtype=np.uint32)
            t0 = time.perf_counter()
            d = jax.device_put(w)
            jax.block_until_ready(d)
            dt = time.perf_counter() - t0
            log(f"device_put {mb}MB fresh: {dt*1e3:7.1f} ms ({mb/dt:5.0f} MB/s)")

if want("batchverify"):
    log("== verify_blob_kzg_proof_batch(64) stage trace ==")
    blobs = [rand_blob() for _ in range(64)]
    cs = kzg.blob_to_kzg_commitment_batch(blobs, s)
    ps = kzg.compute_blob_kzg_proof_batch(blobs, cs, s)
    for i in range(8):
        t0 = time.perf_counter()
        ok = kzg.verify_blob_kzg_proof_batch(blobs, cs, ps, s)
        dt = time.perf_counter() - t0
        log(f"batch verify 64: {dt*1e3:7.1f} ms ok={ok}")

if want("eip7594"):
    log("== EIP-7594 timings ==")
    blob = rand_blob()
    t0 = time.perf_counter()
    cells, proofs = kzg.compute_cells_and_kzg_proofs(blob, s)
    log(f"compute_cells compile+first: {time.perf_counter()-t0:7.1f} s")
    for i in range(5):
        t0 = time.perf_counter()
        kzg.compute_cells_and_kzg_proofs(blob, s)
        log(f"compute_cells_and_kzg_proofs: {(time.perf_counter()-t0)*1e3:7.1f} ms")
    half = list(range(0, 128, 2))
    t0 = time.perf_counter()
    kzg.recover_cells_and_kzg_proofs(half, [cells[i] for i in half], s)
    log(f"recover compile+first: {time.perf_counter()-t0:7.1f} s")
    for i in range(5):
        t0 = time.perf_counter()
        kzg.recover_cells_and_kzg_proofs(half, [cells[i] for i in half], s)
        log(f"recover_cells(50%): {(time.perf_counter()-t0)*1e3:7.1f} ms")
    comm = kzg.blob_to_kzg_commitment(blob, s)
    t0 = time.perf_counter()
    kzg.verify_cell_kzg_proof_batch([comm] * 128, list(range(128)), cells, proofs, s)
    log(f"verify_cells compile+first: {time.perf_counter()-t0:7.1f} s")
    for i in range(5):
        t0 = time.perf_counter()
        ok = kzg.verify_cell_kzg_proof_batch(
            [comm] * 128, list(range(128)), cells, proofs, s
        )
        log(f"verify_cell_batch(128): {(time.perf_counter()-t0)*1e3:7.1f} ms ok={ok}")

if want("fft"):
    log("== Fr FFT A/B: roll form vs pallas kernel ==")
    from kzg_tpu.ops import pallas_fft

    for p in (12, 15):
        x = FR.encode([int.from_bytes(rng.bytes(32), "big") % R for _ in range(1 << p)])

        def fence(a):
            return np.asarray(jax.tree.leaves(a)[0])

        # XLA (roll) form
        with pallas_fft.force_off():
            y = dfft.fft(x)
            fence(y)
            t0 = time.perf_counter()
            for _ in range(10):
                y = dfft.fft(x)
            fence(y)
            dt_roll = (time.perf_counter() - t0) / 10
        # Pallas kernel (jitted, as the production path calls it)
        ok_pallas = pallas_fft.enabled() and pallas_fft.supported(1 << p)
        dt_pal = float("nan")
        if ok_pallas:
            pal = jax.jit(pallas_fft.fft_pallas)
            y = pal(x)
            fence(y)
            t0 = time.perf_counter()
            for _ in range(10):
                y = pal(x)
            fence(y)
            dt_pal = (time.perf_counter() - t0) / 10
        log(
            f"fft_fr 2^{p}: xla_roll {dt_roll*1e3:7.2f} ms | pallas "
            f"{dt_pal*1e3:7.2f} ms (pipelined x10)"
        )

log("probe done")
