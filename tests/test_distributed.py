"""Multi-host distributed execution tests: structural mesh-layout checks
plus a REAL 2-process `jax.distributed` run (gloo CPU collectives) of the
sharded MSM over a DCN-spanning global mesh."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from kzg_tpu.parallel import distributed as D  # noqa: E402


def test_two_process_sharded_msm():
    """Two OS processes x 4 virtual CPU devices = one global (2, 4)
    blobs-x-points mesh; each process verifies its blob shard vs the
    oracle. This is the actual multi-host code path (initialize + global
    mesh + cross-process collectives), not a simulation."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    # drop any inherited device-count flag (conftest sets 8 for this
    # process); each worker sets its own 4 so the global mesh is 2 x 4 = 8
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process distributed run timed out\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"OK {i}" in out, f"worker {i} no OK:\n{out}"


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
