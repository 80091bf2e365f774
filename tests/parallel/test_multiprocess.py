"""Two-process jax.distributed test — the multi-host (DCN) init path.

SURVEY.md §4 names multi-process simulation as the TPU-world analog of
a fake-backend test: two OS processes, each with 2 CPU devices, build
ONE global 4-device mesh through ``maybe_initialize_distributed``
(parallel/mesh.py) and run a cross-process psum plus a lon-sharded
Pangu step whose halo ring crosses the process boundary (gloo-over-TCP
standing in for DCN).  Reference: no counterpart (single-GPU).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(rank: int, nproc: int, port: int) -> subprocess.Popen:
    env = dict(os.environ)
    # the axon sitecustomize registers a PJRT backend at interpreter
    # start, which would instantiate the CPU client before
    # jax.distributed.initialize — see mp_worker module docstring
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        SKYRIM_FORCE_PALLAS="1",  # manual path: ring ppermutes over gloo
        SKYRIM_COORDINATOR=f"127.0.0.1:{port}",
        SKYRIM_NUM_PROCESSES=str(nproc),
        SKYRIM_PROCESS_ID=str(rank),
    )
    repo = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
    return subprocess.Popen(
        [sys.executable, "-m", "skyrim_tpu.parallel.mp_worker",
         "--local-devices", "2", "--steps", "2"],
        env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_global_mesh():
    port = _free_port()
    procs = [_spawn(r, 2, port) for r in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("mp_worker timed out")
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"
        assert f"mp_worker rank={r} procs=2 global_devices=4 ok" in out
        assert "psum(" in out and ") ok" in out
        assert "sharded_advance mode=manual" in out and "mesh=lon4" in out
        assert "parity(local)=" in out
