"""2-process jax.distributed loopback test — VERDICT round-2 gap #5.

`parallel/distributed.py` had never executed with process_count > 1 (the
virtual 8-device mesh shards devices, not processes). Here the parent
spawns two REAL processes, each with 4 virtual CPU devices, wired into one
8-device global mesh via `init_distributed(coordinator, 2, pid)`; both run
a globally-sharded reduction and a diffusion-style sharded-batch /
replicated-params gradient step. Matching replicated outputs across the
two processes prove the cross-process collectives actually ran.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_init_and_collectives():
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", worker, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "MPOK" in out, f"worker {pid} incomplete:\n{out[-3000:]}"

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MPRESULT")][0]
        results.append(dict(kv.split("=") for kv in line.split()[1:]))

    for r in results:
        assert r["count"] == "2"
        assert r["devices"] == "8"
        # 32 rows per process: procs 0/1 contribute 1.0s and 2.0s
        assert abs(float(r["sum"]) - (32 * 1.0 + 32 * 2.0)) < 1e-4, r["sum"]
    # the replicated loss/grad must be IDENTICAL across processes even
    # though each held different local data — only possible via the
    # cross-process all-reduce
    assert results[0]["loss"] == results[1]["loss"], results
    assert results[0]["gnorm"] == results[1]["gnorm"], results
