"""Two-process jax.distributed smoke (VERDICT round-1 missing #5).

Spawns two fresh CPU processes that join through a localhost coordinator
(core.mesh.init_distributed's multi-controller branch) and run one decode
step with the KV cache sharded across the processes. Runs the actual DCN
code path the in-process 8-device mesh tests cannot reach.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # two-process DCN init (heavy tier, VERDICT r4 task 7)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_decode():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the child sets its own device count
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "cpmcu_tpu.tools.dist_smoke",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            cwd=root, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "DIST_SMOKE_OK" in out, f"process {i} no OK marker:\n{out[-3000:]}"
