"""Loader for the Ethereum consensus-spec KZG test vectors.

The vectors are canonical public test data (ethereum/consensus-spec-tests);
we read them from the reference checkout when present, or from a local
directory given by KZG_TPU_TEST_VECTORS.
(parity: /root/reference/kzg-bench/src/tests/eip_4844.rs:538-576 glob logic)
"""

import glob
import os
from typing import Iterator, Tuple

import yaml

_DEFAULT_DIRS = [
    os.environ.get("KZG_TPU_TEST_VECTORS", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "tests", "vectors"),
    "/root/reference/kzg-bench/src/test_vectors",
]

TRUSTED_SETUP_PATHS = [
    os.environ.get("KZG_TPU_TRUSTED_SETUP", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "tests", "trusted_setup.txt"),
    "/root/reference/kzg-bench/src/trusted_setup.txt",
]


def vectors_root() -> str:
    for d in _DEFAULT_DIRS:
        if d and os.path.isdir(d):
            return d
    raise FileNotFoundError("consensus-spec test vectors not found")


def trusted_setup_path() -> str:
    for p in TRUSTED_SETUP_PATHS:
        if p and os.path.isfile(p):
            return p
    raise FileNotFoundError("trusted_setup.txt not found")


def load_vectors(category: str) -> Iterator[Tuple[str, dict, object]]:
    """Yields (name, input_dict, output) for every vector in a category."""
    root = vectors_root()
    paths = sorted(glob.glob(os.path.join(root, category, "*", "*", "data.yaml")))
    if not paths:
        paths = sorted(glob.glob(os.path.join(root, category, "**", "data.yaml"), recursive=True))
    for path in paths:
        with open(path) as f:
            data = yaml.safe_load(f)
        name = os.path.basename(os.path.dirname(path))
        yield name, data["input"], data.get("output")


def unhex(s: str) -> bytes:
    return bytes.fromhex(s[2:] if s.startswith("0x") else s)
