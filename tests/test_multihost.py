"""Multi-process distributed evidence for SURVEY §5.8 (VERDICT r2 #5):
the landmark-sharded two-phase LM runs on a mesh that CROSSES a process
boundary (2 processes x 4 virtual CPU devices, one jax.distributed
cluster) and matches the single-process result. The inter-process psum is
this environment's stand-in for DCN on a multi-host TPU pod.

Runs in subprocesses: jax.distributed cannot join a cluster from the
already-initialized test process.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_lm_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_lm.py"),
             "--coord", f"127.0.0.1:{port}", "--nproc", "2", "--pid", str(pid),
             "--local-devices", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process LM run timed out")
        outs.append((p.returncode, out, err))

    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err[-3000:]}"
    # process 0 prints the comparison record
    rec = None
    for rc, out, err in outs:
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                rec = json.loads(line)
    assert rec is not None, outs
    assert rec["ok"], rec
    assert rec["n_processes"] == 2 and rec["n_global_devices"] == 8
    assert rec["max_node_p_err"] < 1e-8, rec
