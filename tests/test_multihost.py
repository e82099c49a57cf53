"""True multi-process jax.distributed tests (2 processes x 4 virtual CPU
devices = one 8-device global mesh), validating the multi-host EP path and
the PrefetchHints KV-store consensus beyond the single-process virtual-mesh
tests in test_parallel.py. The reference's cross-node story is dormant
torch-RPC (reference README.md:18); ours is the same SPMD program over a
global mesh, so the test IS the production code path.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # e2e-heavy; fast path: -m 'not slow'


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_ep_and_prefetch_hints():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:  # exact-PID cleanup only (never by pattern)
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"MH_OK {i}" in out, f"proc {i} output:\n{out}"
