"""Multi-process distributed training: jax.distributed.initialize + a global
mesh spanning 2 processes x 2 virtual CPU devices, running one production
train step (SURVEY.md §2.4 / §5 — the reference has no distributed backend at
all; BASELINE.json's north star requires the multi-host path to exist and
compose)."""

import os
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(__file__), "distributed_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # child sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                _, pid, val = line.split()
                losses[int(pid)] = float(val)
    assert set(losses) == {0, 1}, f"missing LOSS lines: {outs}"
    # SPMD: the psum'd loss must be bit-identical across processes
    assert losses[0] == losses[1]
