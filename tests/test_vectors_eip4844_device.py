"""EIP-4844 consensus-spec vector tests against the DEVICE pipeline
(kzg_tpu.eip4844): the bit-exactness gate for the TPU compute path.

Same harness shape as the oracle vector suite; a deterministic subset per
category by default, --all-vectors for the full sweep.
(parity: /root/reference/kzg-bench/src/tests/eip_4844.rs:538-576)
"""

import itertools

from kzg_tpu import eip4844 as E
from kzg_tpu.utils.vectors import load_vectors, unhex

SUBSET = 8


def _iter(category, all_vectors):
    vecs = load_vectors(category)
    if not all_vectors:
        vecs = itertools.islice(vecs, SUBSET)
    return list(vecs)


def _expect(out):
    if isinstance(out, str):
        return unhex(out)
    if isinstance(out, bool):
        return out
    if isinstance(out, list):
        return tuple(unhex(o) if isinstance(o, str) else o for o in out)
    return out


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


def test_blob_to_kzg_commitment(device_settings, all_vectors):
    _run(
        "blob_to_kzg_commitment",
        lambda inp: E.blob_to_kzg_commitment(unhex(inp["blob"]), device_settings),
        all_vectors,
    )


def test_compute_kzg_proof(device_settings, all_vectors):
    _run(
        "compute_kzg_proof",
        lambda inp: E.compute_kzg_proof(
            unhex(inp["blob"]), unhex(inp["z"]), device_settings
        ),
        all_vectors,
    )


def test_compute_blob_kzg_proof(device_settings, all_vectors):
    _run(
        "compute_blob_kzg_proof",
        lambda inp: E.compute_blob_kzg_proof(
            unhex(inp["blob"]), unhex(inp["commitment"]), device_settings
        ),
        all_vectors,
    )


def test_verify_blob_kzg_proof(device_settings, all_vectors):
    _run(
        "verify_blob_kzg_proof",
        lambda inp: E.verify_blob_kzg_proof(
            unhex(inp["blob"]),
            unhex(inp["commitment"]),
            unhex(inp["proof"]),
            device_settings,
        ),
        all_vectors,
    )


def test_verify_blob_kzg_proof_batch(device_settings, all_vectors):
    def fn(inp):
        return E.verify_blob_kzg_proof_batch(
            [unhex(b) for b in inp["blobs"]],
            [unhex(c) for c in inp["commitments"]],
            [unhex(p) for p in inp["proofs"]],
            device_settings,
        )

    _run("verify_blob_kzg_proof_batch", fn, all_vectors)


def test_verify_kzg_proof(device_settings, all_vectors):
    _run(
        "verify_kzg_proof",
        lambda inp: E.verify_kzg_proof(
            unhex(inp["commitment"]),
            unhex(inp["z"]),
            unhex(inp["y"]),
            unhex(inp["proof"]),
            device_settings,
        ),
        all_vectors,
    )


def test_compute_challenge(device_settings, all_vectors):
    failures = []
    for name, inp, out in _iter("compute_challenge", all_vectors):
        try:
            from kzg_tpu import bytes as bs

            blob, commitment = unhex(inp["blob"]), unhex(inp["commitment"])
            bs.blob_to_scalars(blob)  # validate (raises like the reference)
            if len(commitment) != 48:
                raise ValueError("Invalid commitment length")
            z = E.compute_challenge(blob, commitment)
            ok = out is not None and z.to_bytes(32, "big") == unhex(out)
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            failures.append(name)
    assert not failures, failures


def test_commit_batch_consistency(device_settings):
    """Batched commitment path agrees with the single-blob path."""
    vecs = [
        unhex(inp["blob"])
        for _, inp, out in _iter("blob_to_kzg_commitment", False)
        if out is not None and len(unhex(inp["blob"])) == 131072
    ][:3]
    singles = [E.blob_to_kzg_commitment(b, device_settings) for b in vecs]
    batched = E.blob_to_kzg_commitment_batch(vecs, device_settings)
    assert singles == batched
