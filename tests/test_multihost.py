"""Two-process multi-host bring-up smoke (VERDICT r1 item 9): drives
``runtime/mesh.init_distributed`` with a REAL ``jax.distributed.initialize``
pair of CPU processes on a localhost coordinator and runs one sharded train
step over a mesh spanning both processes — so the multi-host path executes
at least once before it ever meets a TPU pod."""
import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_step():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, n_dev, loss = line.split()
                results[int(pid)] = (int(n_dev), loss)
    assert set(results) == {0, 1}, outs
    # both processes saw the 4-device global mesh and agree on the loss
    assert results[0][0] == results[1][0] == 4
    assert results[0][1] == results[1][1]
