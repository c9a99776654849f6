"""Consensus-vector sweeps through the HOST-native fast paths.

The protocol entry points route latency-shaped ops through
native/kzg_native.cpp on this rig (see PERF.md "placement by shape");
these tests pin that routing against every consensus vector of the
affected categories, independent of any device/TPU availability. The
device-path variants live in tests/test_vectors_*_device.py.
"""

import os

import pytest

from kzg_tpu import native
from kzg_tpu.utils.vectors import load_vectors, unhex

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (native/build.sh)"
)


@pytest.fixture(scope="module")
def s():
    from kzg_tpu.settings import load_settings

    return load_settings()


def _run_category(category, runner, want_shape):
    nrun = 0
    for name, inp, want in load_vectors(category):
        try:
            got = runner(inp)
        except Exception:
            got = None
        assert want_shape(got, want), (category, name, got, want)
        nrun += 1
    assert nrun > 0
    return nrun


def test_verify_cell_kzg_proof_batch_host(s):
    from kzg_tpu import eip7594 as e7

    assert os.environ.get("KZG_TPU_HOST_7594", "1") == "1"
    _run_category(
        "verify_cell_kzg_proof_batch",
        lambda inp: e7.verify_cell_kzg_proof_batch(
            [unhex(c) for c in inp["commitments"]],
            list(inp["cell_indices"]),
            [unhex(c) for c in inp["cells"]],
            [unhex(p) for p in inp["proofs"]],
            s,
        ),
        lambda got, want: got == want if want is not None else got is None,
    )


def test_compute_cells_and_kzg_proofs_host(s):
    from kzg_tpu import eip7594 as e7

    def run(inp):
        cells, proofs = e7.compute_cells_and_kzg_proofs(unhex(inp["blob"]), s)
        return list(cells), list(proofs)

    def check(got, want):
        if want is None:
            return got is None
        return got == ([unhex(c) for c in want[0]], [unhex(p) for p in want[1]])

    _run_category("compute_cells_and_kzg_proofs", run, check)


def test_recover_cells_and_kzg_proofs_host(s):
    from kzg_tpu import eip7594 as e7

    def run(inp):
        cells, proofs = e7.recover_cells_and_kzg_proofs(
            list(inp["cell_indices"]), [unhex(c) for c in inp["cells"]], s
        )
        return list(cells), list(proofs)

    def check(got, want):
        if want is None:
            return got is None
        return got == ([unhex(c) for c in want[0]], [unhex(p) for p in want[1]])

    _run_category("recover_cells_and_kzg_proofs", run, check)


def test_blob_to_kzg_commitment_host(s):
    from kzg_tpu import eip4844 as e4

    assert os.environ.get("KZG_TPU_HOST_SINGLE", "1") == "1"
    _run_category(
        "blob_to_kzg_commitment",
        lambda inp: e4.blob_to_kzg_commitment(unhex(inp["blob"]), s),
        lambda got, want: got == unhex(want) if want is not None else got is None,
    )


def test_compute_kzg_proof_host(s):
    from kzg_tpu import eip4844 as e4

    _run_category(
        "compute_kzg_proof",
        lambda inp: e4.compute_kzg_proof(unhex(inp["blob"]), unhex(inp["z"]), s),
        lambda got, want: (
            got == (unhex(want[0]), unhex(want[1]))
            if want is not None
            else got is None
        ),
    )


def test_compute_blob_kzg_proof_host(s):
    from kzg_tpu import eip4844 as e4

    _run_category(
        "compute_blob_kzg_proof",
        lambda inp: e4.compute_blob_kzg_proof(
            unhex(inp["blob"]), unhex(inp["commitment"]), s
        ),
        lambda got, want: got == unhex(want) if want is not None else got is None,
    )


def test_verify_kzg_proof_host(s):
    from kzg_tpu import eip4844 as e4

    _run_category(
        "verify_kzg_proof",
        lambda inp: e4.verify_kzg_proof(
            unhex(inp["commitment"]),
            unhex(inp["z"]),
            unhex(inp["y"]),
            unhex(inp["proof"]),
            s,
        ),
        lambda got, want: got == want if want is not None else got is None,
    )


def test_verify_blob_kzg_proof_host(s):
    from kzg_tpu import eip4844 as e4

    _run_category(
        "verify_blob_kzg_proof",
        lambda inp: e4.verify_blob_kzg_proof(
            unhex(inp["blob"]), unhex(inp["commitment"]), unhex(inp["proof"]), s
        ),
        lambda got, want: got == want if want is not None else got is None,
    )


def test_host_pipeline_fuzz(s):
    """One random full-pipeline round: host commit/proof vs the oracle,
    verify round trips with tampering, FK20 cells+proofs self-verification,
    and random-subset erasure recovery equality. KZG_FUZZ_SEED varies the
    case."""
    import random

    from kzg_tpu import eip4844 as e4, eip7594 as e7
    from kzg_tpu.constants import R_MOD as R
    from kzg_tpu.oracle import eip4844 as okzg

    s.ensure_native_commit()
    s.ensure_native_fk20()
    rng = random.Random(int(os.environ.get("KZG_FUZZ_SEED", "7")))
    blob = b"".join(rng.randrange(R).to_bytes(32, "big") for _ in range(4096))
    c = e4.blob_to_kzg_commitment(blob, s)
    assert c == okzg.blob_to_kzg_commitment(blob, s.oracle)
    zb = rng.randrange(R).to_bytes(32, "big")
    p, y = e4.compute_kzg_proof(blob, zb, s)
    assert (p, y) == okzg.compute_kzg_proof(blob, zb, s.oracle)
    assert e4.verify_kzg_proof(c, zb, y, p, s) is True
    y_bad = ((int.from_bytes(y, "big") + 1) % R).to_bytes(32, "big")
    assert e4.verify_kzg_proof(c, zb, y_bad, p, s) is False
    cells, proofs = e7.compute_cells_and_kzg_proofs(blob, s)
    assert (
        e7.verify_cell_kzg_proof_batch([c] * 128, list(range(128)), cells, proofs, s)
        is True
    )
    have = sorted(rng.sample(range(128), rng.randrange(64, 100)))
    rc_cells, rc_proofs = e7.recover_cells_and_kzg_proofs(
        have, [cells[i] for i in have], s
    )
    assert list(rc_cells) == list(cells) and list(rc_proofs) == list(proofs)


def test_verify_blob_kzg_proof_batch_host(s):
    from kzg_tpu import eip4844 as e4

    assert os.environ.get("KZG_TPU_HOST_EVAL", "1") == "1"
    _run_category(
        "verify_blob_kzg_proof_batch",
        lambda inp: e4.verify_blob_kzg_proof_batch(
            [unhex(b) for b in inp["blobs"]],
            [unhex(c) for c in inp["commitments"]],
            [unhex(p) for p in inp["proofs"]],
            s,
        ),
        lambda got, want: got == want if want is not None else got is None,
    )
