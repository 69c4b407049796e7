"""True multi-process jax.distributed run (VERDICT round-1 item 5).

Launches tools/multihost_run.py twice (2 processes x 1 CPU device,
jax.distributed over localhost gRPC) and once standalone (1 process x 2
virtual devices): the SAME 2-device shard_map program, so the
trajectories must match to float tolerance.  This exercises the real
cross-process collective transport a multi-host TPU slice would use.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "multihost_run.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_two_process_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out2 = tmp_path / "mh2.npz"
    out1 = tmp_path / "mh1.npz"
    env = _clean_env()

    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, "--process-id", str(pid),
             "--num-processes", "2", "--coordinator", coord,
             "--out", str(out2), "--n-scans", "5"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    single = subprocess.run(
        [sys.executable, SCRIPT, "--process-id", "0",
         "--num-processes", "1", "--local-devices", "2",
         "--out", str(out1), "--n-scans", "5"],
        env=env, cwd=REPO, capture_output=True, timeout=600)
    assert single.returncode == 0, single.stdout[-2000:]

    t2 = np.load(out2)["traj"]
    t1 = np.load(out1)["traj"]
    assert t2.shape == t1.shape
    # same program, same collectives — equal up to reduction ordering
    np.testing.assert_allclose(t2, t1, atol=1e-5)
    # and the filter actually tracked motion (not a frozen state)
    assert np.linalg.norm(t2[-1] - t2[0]) > 0.05


def test_two_process_spmd_matches_single_process(tmp_path):
    """The PRODUCTION-parity SPMD window step (replicated map, query-
    sharded points, psum'd Gram, spmd dense-moment insert) across two
    real jax.distributed processes equals the same 2-device program in
    one process — the as-implemented multi-chip path of MULTICHIP.md."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out2 = tmp_path / "spmd2.npz"
    out1 = tmp_path / "spmd1.npz"
    env = _clean_env()

    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT, "--process-id", str(pid),
             "--num-processes", "2", "--coordinator", coord,
             "--out", str(out2), "--n-scans", "6", "--spmd"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]

    single = subprocess.run(
        [sys.executable, SCRIPT, "--process-id", "0",
         "--num-processes", "1", "--local-devices", "2",
         "--out", str(out1), "--n-scans", "6", "--spmd"],
        env=env, cwd=REPO, capture_output=True, timeout=600)
    assert single.returncode == 0, single.stdout[-2000:]

    t2 = np.load(out2)["traj"]
    t1 = np.load(out1)["traj"]
    assert t2.shape == t1.shape
    np.testing.assert_allclose(t2, t1, atol=1e-5)
    assert np.linalg.norm(t2[-1] - t2[0]) > 0.05
