"""EIP-7594 consensus-spec vector tests against the oracle backend.

Small deterministic subsets by default (FK20 in pure Python is seconds per
call); --all-vectors for the full sweep.
(parity: /root/reference/kzg-bench/src/tests/eip_7594.rs)
"""

import itertools

import pytest

from kzg_tpu.oracle import das as D
from kzg_tpu.utils.vectors import load_vectors, unhex


def _iter(category, all_vectors, subset):
    vecs = load_vectors(category)
    if not all_vectors:
        vecs = itertools.islice(vecs, subset)
    return list(vecs)


def _mixed(category, k):
    """k valid + k invalid vectors, deterministic."""
    valid, invalid = [], []
    for v in load_vectors(category):
        (valid if v[2] is not None else invalid).append(v)
    return valid[:k] + invalid[: 2 * k]


def test_compute_cells_and_kzg_proofs(oracle_settings, all_vectors):
    vecs = (
        _iter("compute_cells_and_kzg_proofs", True, 0)
        if all_vectors
        else _mixed("compute_cells_and_kzg_proofs", 2)
    )
    failures = []
    for name, inp, out in vecs:
        try:
            cells, proofs = D.compute_cells_and_kzg_proofs(
                unhex(inp["blob"]), oracle_settings
            )
            ok = out is not None and (
                cells == [unhex(c) for c in out[0]]
                and proofs == [unhex(p) for p in out[1]]
            )
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            failures.append(name)
    assert not failures, failures


def test_compute_cells_only_vectors(oracle_settings, all_vectors):
    vecs = _mixed("compute_cells", 1)
    failures = []
    for name, inp, out in vecs:
        try:
            cells, _ = D.compute_cells_and_kzg_proofs(
                unhex(inp["blob"]), oracle_settings, with_proofs=False
            )
            ok = out is not None and cells == [unhex(c) for c in out]
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            failures.append(name)
    assert not failures, failures


def test_recover_cells_and_kzg_proofs(oracle_settings, all_vectors):
    vecs = (
        _iter("recover_cells_and_kzg_proofs", True, 0)
        if all_vectors
        else _mixed("recover_cells_and_kzg_proofs", 2)
    )
    failures = []
    for name, inp, out in vecs:
        try:
            cells, proofs = D.recover_cells_and_kzg_proofs(
                inp["cell_indices"],
                [unhex(c) for c in inp["cells"]],
                oracle_settings,
            )
            ok = out is not None and (
                cells == [unhex(c) for c in out[0]]
                and proofs == [unhex(p) for p in out[1]]
            )
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            failures.append(name)
    assert not failures, failures


def test_verify_cell_kzg_proof_batch(oracle_settings, all_vectors):
    vecs = (
        _iter("verify_cell_kzg_proof_batch", True, 0)
        if all_vectors
        else _mixed("verify_cell_kzg_proof_batch", 3)
    )
    failures = []
    for name, inp, out in vecs:
        try:
            got = D.verify_cell_kzg_proof_batch(
                [unhex(c) for c in inp["commitments"]],
                inp["cell_indices"],
                [unhex(c) for c in inp["cells"]],
                [unhex(p) for p in inp["proofs"]],
                oracle_settings,
            )
            ok = got == out
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            failures.append(name)
    assert not failures, failures


def test_challenge_vector(oracle_settings, all_vectors):
    for name, inp, out in _iter(
        "compute_verify_cell_kzg_proof_batch_challenge", all_vectors, 4
    ):
        try:
            from kzg_tpu.oracle import serialization as _s

            cells_fr = [
                [_s.fr_from_bytes(unhex(e)) for e in cell]
                for cell in inp["cosets_evals"]
            ]
            got = D.compute_verify_cell_kzg_proof_batch_challenge(
                [unhex(c) for c in inp["commitments"]],
                inp["commitment_indices"],
                inp["cell_indices"],
                cells_fr,
                [unhex(p) for p in inp["proofs"]],
                oracle_settings,
            )
            from kzg_tpu.oracle import serialization as ser

            ok = out is not None and ser.fr_to_bytes(got) == unhex(out)
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            pytest.fail(f"{name}")
