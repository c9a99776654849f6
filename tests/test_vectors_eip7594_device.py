"""EIP-7594 consensus-spec vector tests against the DEVICE pipeline.

Deterministic mixed (valid + invalid) subsets by default; --all-vectors for
the full sweep. (parity: /root/reference/kzg-bench/src/tests/eip_7594.rs)
"""

from kzg_tpu import eip7594 as E
from kzg_tpu.utils.vectors import load_vectors, unhex


def _mixed(category, k, all_vectors):
    valid, invalid = [], []
    for v in load_vectors(category):
        (valid if v[2] is not None else invalid).append(v)
    if all_vectors:
        return valid + invalid
    return valid[:k] + invalid[: 3 * k]


def test_compute_cells_and_kzg_proofs(device_settings, all_vectors):
    failures = []
    for name, inp, out in _mixed("compute_cells_and_kzg_proofs", 3, all_vectors):
        try:
            cells, proofs = E.compute_cells_and_kzg_proofs(
                unhex(inp["blob"]), device_settings
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


def test_compute_cells(device_settings, all_vectors):
    failures = []
    for name, inp, out in _mixed("compute_cells", 1, all_vectors):
        try:
            cells, _ = E.compute_cells_and_kzg_proofs(
                unhex(inp["blob"]), device_settings, with_proofs=False
            )
            ok = out is not None and cells == [unhex(c) for c in out]
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            failures.append(name)
    assert not failures, failures


def test_recover_cells_and_kzg_proofs(device_settings, all_vectors):
    failures = []
    for name, inp, out in _mixed("recover_cells_and_kzg_proofs", 3, all_vectors):
        try:
            cells, proofs = E.recover_cells_and_kzg_proofs(
                inp["cell_indices"], [unhex(c) for c in inp["cells"]], device_settings
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


def test_batch_challenge(all_vectors):
    """Public challenge API vs the consensus vectors (parity:
    compute_verify_cell_kzg_proof_batch_challenge, kzg/src/das.rs:390-452)."""
    failures = []
    for name, inp, out in _mixed(
        "compute_verify_cell_kzg_proof_batch_challenge", 4, all_vectors
    ):
        try:
            cells = [b"".join(unhex(e) for e in cell) for cell in inp["cosets_evals"]]
            got = E.compute_verify_cell_kzg_proof_batch_challenge(
                [unhex(c) for c in inp["commitments"]],
                inp["commitment_indices"],
                inp["cell_indices"],
                cells,
                [unhex(p) for p in inp["proofs"]],
            )
            ok = out is not None and got.to_bytes(32, "big") == unhex(out)
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            failures.append(name)
    assert not failures, failures


def test_verify_cell_kzg_proof_batch(device_settings, all_vectors):
    failures = []
    for name, inp, out in _mixed("verify_cell_kzg_proof_batch", 4, all_vectors):
        try:
            got = E.verify_cell_kzg_proof_batch(
                [unhex(c) for c in inp["commitments"]],
                inp["cell_indices"],
                [unhex(c) for c in inp["cells"]],
                [unhex(p) for p in inp["proofs"]],
                device_settings,
            )
            ok = got == out
        except (ValueError, KeyError):
            ok = out is None
        if not ok:
            failures.append(name)
    assert not failures, failures
