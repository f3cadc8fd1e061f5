"""2-process CPU cluster test of the multi-host scaffolding.

Spawns two worker processes that form a jax.distributed cluster
(coordinator on localhost), build the hybrid (dcn-data x gauss) mesh and
run one tile-sharded training step on globally sharded arrays — the same
code path a real multi-host TPU deployment uses (SURVEY §7 layer 9).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # long tail: excluded from the default (<5 min) selection


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # workers set device counts themselves
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, "-m", "tests.multihost_worker", str(port), str(i)],
        cwd=root, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
    # Both processes must agree on the replicated loss.
    l0 = [ln for ln in outs[0].splitlines() if "MULTIHOST_OK" in ln][0]
    l1 = [ln for ln in outs[1].splitlines() if "MULTIHOST_OK" in ln][0]
    assert l0.split("loss=")[1] == l1.split("loss=")[1]
