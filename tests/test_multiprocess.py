"""Multi-process (multi-host) execution — PROVEN, not just structured.

Spawns 2 real `jax.distributed` processes (local coordinator, 4 virtual
CPU devices each -> an 8-device global mesh spanning the processes) and
runs, inside the children:

  1. the view-sharded PatchMatch solve (parallel.sharding) with the batch
     placed from process-local data (parallel.multihost.host_to_global),
  2. the geometric stage-barrier collective `gather_src_depths` on a
     depth bank built the multi-process way, checked against the expected
     gather on both hosts,
  3. group-sharded fusion (engine.fusion mesh path, host greedy replay),
     checked bitwise against the same scene's SEQUENTIAL fusion computed
     locally in the same process,
  4. the full production `run_pipeline(mesh=...)` on a tiny shared dense
     folder — process-0-gated checkpoint writes + stage barriers — and
     asserts the fused PLY exists and recovers the synthetic plane.

This is the multi-host leg of SURVEY.md §2.3 (the reference has no
distributed machinery at all; BASELINE configs 4-5 commit us to it).
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = os.path.join(os.path.dirname(__file__), "_multiprocess_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_pipeline(tmp_path):
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("XLA_FLAGS", None)
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base["PYTHONPATH"] = repo + os.pathsep + env_base.get("PYTHONPATH",
                                                              "")
    env_base["ACMMP_MP_PORT"] = str(port)
    env_base["ACMMP_MP_TMP"] = str(tmp_path)

    procs = []
    for pid in range(2):
        env = dict(env_base, ACMMP_MP_RANK=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, _CHILD], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {pid} failed (rc={p.returncode}):\n{out[-8000:]}")
        assert "ALL STAGES OK" in out, out[-8000:]
    # the PLY was written exactly once (by process 0) and is valid
    ply = os.path.join(str(tmp_path), "scene", "ACMMP", "ACMMP_model.ply")
    assert os.path.exists(ply), ply
