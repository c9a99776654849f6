"""Structural tests for the multi-host mesh helpers (single-process here;
the mesh/axis layout is identical on a real multi-host slice)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kzg_tpu.parallel import distributed as D  # noqa: E402


def test_global_mesh_layout():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("need >=2 devices")
    mesh = D.global_mesh(blob_axis_size=2)
    assert mesh.axis_names == ("blobs", "points")
    assert mesh.shape["blobs"] == 2
    assert mesh.shape["blobs"] * mesh.shape["points"] == len(devs)


def test_blobs_mesh_runs_sharded_batch():
    """blobs_mesh feeds the mesh= path of the batch entry points."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("need >=2 devices")
    mesh = D.blobs_mesh()
    assert mesh.axis_names == ("blobs",)
    assert mesh.shape["blobs"] == len(devs)


def test_global_mesh_indivisible_raises():
    devs = jax.devices()
    if len(devs) % 2 != 0 or len(devs) < 2:
        pytest.skip("need even device count")
    with pytest.raises(ValueError):
        D.global_mesh(blob_axis_size=len(devs) + 1)
