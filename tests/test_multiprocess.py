"""Real multi-process execution of the multihost runtime.

Launches 2 independent Python processes that rendezvous through
``jax.distributed.initialize`` on CPU (2 virtual devices per process →
one 4-device global mesh spanning a genuine process boundary), then
asserts — inside each worker, against numpy expectations it derives
itself (``tests/_mp_worker.py``):

* ``host_local_array`` assembles the global batch from per-host slabs,
* one DP train step agrees with the single-process answer,
* ``broadcast_from_primary`` / ``allgather_hosts`` / ``sync`` cross the
  boundary,
* ``save_checkpoint_sharded`` writes disjoint per-host shard files that
  ``load_checkpoint_sharded`` reassembles on every process.

This is the multi-process coverage the in-suite single-process tests
cannot provide (see ``tests/test_multihost.py``).  The reference has no
distributed runtime at all (SURVEY.md §5.8); this validates the
beyond-reference pod path.
"""
import os
import socket
import subprocess
import sys

import pytest

NPROC = 2
DEV_PER_PROC = 2
TIMEOUT_S = 300


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_runtime(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # don't let the parent suite's settings leak into the workers —
    # notably the TPU plugin writes TPU_*/PJRT_* discovery vars into
    # the parent's os.environ when ITS backend initializes, and those
    # make the workers' CPU client come up single-node
    for k in list(env):
        if k.startswith(("TPU_", "PJRT_", "PALLAS_AXON",
                         "MEGASCALE_")) or k in (
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
                "JAX_COORDINATOR_ADDRESS"):
            env.pop(k)

    procs = []
    logs = []
    for pid in range(NPROC):
        log = open(tmp_path / f"worker{pid}.log", "wb")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coord, str(NPROC), str(pid),
             str(tmp_path)],
            env=env, stdout=log, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(worker))))
    rcs = []
    try:
        for p in procs:
            rcs.append(p.wait(timeout=TIMEOUT_S))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out after "
                    f"{TIMEOUT_S}s — see {tmp_path}/worker*.log")
    finally:
        for log in logs:
            log.close()

    transcripts = {
        pid: (tmp_path / f"worker{pid}.log").read_text(errors="replace")
        for pid in range(NPROC)}
    if any(rc != 0 for rc in rcs):
        detail = "\n".join(f"--- worker {pid} (rc={rcs[pid]}) ---\n"
                           f"{transcripts[pid][-4000:]}"
                           for pid in range(NPROC))
        # a sandboxed host may forbid the coordinator's listening
        # socket; that is an environment limitation, not a bug — skip
        # LOUDLY so the gap stays visible in the test report
        if any(m in detail for m in
               ("UNAVAILABLE", "Permission denied", "DEADLINE_EXCEEDED",
                "failed to connect")) and not (tmp_path / "ok.0").exists():
            pytest.skip("jax.distributed rendezvous unavailable in this "
                        "sandbox — multi-process runtime NOT verified "
                        "here:\n" + detail)
        pytest.fail(detail)
    for pid in range(NPROC):
        assert (tmp_path / f"ok.{pid}").exists(), transcripts[pid][-4000:]
        assert f"worker {pid}: OK" in transcripts[pid]
