"""Multi-process distributed execution test (VERDICT round-1 item 6):
2 "hosts" x 4 virtual CPU devices under jax.distributed run the sharded
LIO ESIKF step and the sliding-window BA refine over an 8-device global
mesh, and the result matches a single-device computation. This is the
multi-host story the in-process tests/test_sharding.py cannot cover:
cross-process SPMD with globally-sharded jax.Arrays."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_spmd_lio_and_ba():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, str(ROOT / "tests" / "dist_worker.py"),
             coord, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=ROOT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
    assert "DIST_OK" in outs[0][1], outs[0]
