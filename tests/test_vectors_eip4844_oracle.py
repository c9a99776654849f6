"""EIP-4844 consensus-spec vector tests against the oracle backend.

By default a deterministic subset of each category runs (the oracle is pure
Python); pass --all-vectors / KZG_ALL_VECTORS=1 for the full 344-vector sweep.
(parity: /root/reference/kzg-bench/src/tests/eip_4844.rs:538-576)
"""

import itertools

import pytest

from kzg_tpu.oracle import eip4844 as E
from kzg_tpu.utils.vectors import load_vectors, unhex

SUBSET = 8


def _iter(category, all_vectors):
    vecs = load_vectors(category)
    if not all_vectors:
        vecs = itertools.islice(vecs, SUBSET)
    return list(vecs)


def _run(category, fn, all_vectors):
    failures = []
    for name, inp, out in _iter(category, all_vectors):
        try:
            got = fn(inp)
            ok = out is not None and got == _expect(out)
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            failures.append(name)
    assert not failures, f"{category} failures: {failures}"


def _expect(out):
    if isinstance(out, str):
        return unhex(out)
    if isinstance(out, bool):
        return out
    if isinstance(out, list):
        return tuple(unhex(o) if isinstance(o, str) else o for o in out)
    return out


def test_blob_to_kzg_commitment(oracle_settings, all_vectors):
    _run(
        "blob_to_kzg_commitment",
        lambda inp: E.blob_to_kzg_commitment(unhex(inp["blob"]), oracle_settings),
        all_vectors,
    )


def test_compute_kzg_proof(oracle_settings, all_vectors):
    _run(
        "compute_kzg_proof",
        lambda inp: E.compute_kzg_proof(
            unhex(inp["blob"]), unhex(inp["z"]), oracle_settings
        ),
        all_vectors,
    )


def test_compute_blob_kzg_proof(oracle_settings, all_vectors):
    _run(
        "compute_blob_kzg_proof",
        lambda inp: E.compute_blob_kzg_proof(
            unhex(inp["blob"]), unhex(inp["commitment"]), oracle_settings
        ),
        all_vectors,
    )


def test_verify_kzg_proof(oracle_settings, all_vectors):
    _run(
        "verify_kzg_proof",
        lambda inp: E.verify_kzg_proof(
            unhex(inp["commitment"]),
            unhex(inp["z"]),
            unhex(inp["y"]),
            unhex(inp["proof"]),
            oracle_settings,
        ),
        all_vectors,
    )


def test_verify_blob_kzg_proof(oracle_settings, all_vectors):
    _run(
        "verify_blob_kzg_proof",
        lambda inp: E.verify_blob_kzg_proof(
            unhex(inp["blob"]),
            unhex(inp["commitment"]),
            unhex(inp["proof"]),
            oracle_settings,
        ),
        all_vectors,
    )


def test_verify_blob_kzg_proof_batch(oracle_settings, all_vectors):
    def fn(inp):
        return E.verify_blob_kzg_proof_batch(
            [unhex(b) for b in inp["blobs"]],
            [unhex(c) for c in inp["commitments"]],
            [unhex(p) for p in inp["proofs"]],
            oracle_settings,
        )

    _run("verify_blob_kzg_proof_batch", fn, all_vectors)


def test_compute_challenge_vectors(all_vectors):
    for name, inp, out in _iter("compute_challenge", all_vectors):
        blob = E.bytes_to_blob(unhex(inp["blob"]))
        from kzg_tpu.oracle import serialization as ser

        commitment = ser.g1_from_bytes(unhex(inp["commitment"]), subgroup_check=False)
        got = E.compute_challenge(blob, commitment)
        assert ser.fr_to_bytes(got) == unhex(out), name
