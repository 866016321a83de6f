"""Real multi-process coverage for tfmq_dm_tpu.parallel.distributed —
the rebuild of the linklink bootstrap + rank-0 helpers
(/root/reference/linklink/__init__.py:21-59, dist_helper.py:132-167).

Two actual OS processes initialize through a local coordinator
(CPU backend), then exercise: process_count/process_index, the
process-0 gating decorator, and a broadcast_object round-trip of a
non-trivial pytree. Slow tier (subprocess + distributed runtime spinup).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)   # 1 local device per process
import jax
jax.config.update("jax_platforms", "cpu")

from tfmq_dm_tpu.parallel import distributed as D

coord, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
D.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

# process-0 gating (rank-0 checkpoint-write semantics)
@D.main_process_only
def write_marker():
    with open(os.path.join(out_dir, "rank0_marker"), "w") as f:
        f.write("main")
    return "wrote"

gate_result = write_marker()

# broadcast a non-trivial host object from process 0
obj = {"wq": 4, "cali_t": list(range(7)), "name": "tfmq"} \
    if pid == 0 else None
got = D.broadcast_object(obj)

with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as f:
    json.dump({"process_index": jax.process_index(),
               "process_count": jax.process_count(),
               "is_main": D.is_main_process(),
               "gate_result": gate_result,
               "broadcast": got}, f)
"""


# A worker that touches the local backend FIRST (jax.devices()), then
# requests explicit multi-host init — jax.distributed.initialize must
# fail (backend already up), and our wrapper must RE-RAISE rather than
# silently staying single-host (round-3 weak #5).
FAIL_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.devices()                      # initialize the local backend
from tfmq_dm_tpu.parallel import distributed as D
try:
    D.initialize(coordinator_address="127.0.0.1:1",
                 num_processes=2, process_id=0)
except RuntimeError as e:
    print("RAISED-AS-EXPECTED:", e)
    sys.exit(0)
sys.exit(1)                        # silent fallback = the bug
"""


def _env():
    return dict(os.environ, JAX_PLATFORMS="cpu",
                PYTHONPATH=os.pathsep.join(
                    [os.path.dirname(os.path.dirname(__file__))]
                    + os.environ.get("PYTHONPATH", "").split(os.pathsep)))


def test_explicit_init_failure_raises():
    proc = subprocess.run([sys.executable, "-c", FAIL_WORKER],
                          env=_env(), capture_output=True, timeout=120)
    assert proc.returncode == 0, (proc.stdout.decode()[-2000:],
                                  proc.stderr.decode()[-2000:])
    assert b"RAISED-AS-EXPECTED" in proc.stdout


@pytest.mark.slow
def test_two_process_initialize_broadcast(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(os.path.dirname(__file__))]
                   + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    procs = [subprocess.Popen(
        [sys.executable, "-c", WORKER, coord, str(pid), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    results = {}
    for pid in (0, 1):
        with open(tmp_path / f"result_{pid}.json") as f:
            results[pid] = json.load(f)

    expected = {"wq": 4, "cali_t": list(range(7)), "name": "tfmq"}
    assert results[0]["is_main"] and not results[1]["is_main"]
    assert results[0]["gate_result"] == "wrote"
    assert results[1]["gate_result"] is None
    # the rank-0 marker exists exactly because process 0 wrote it
    assert (tmp_path / "rank0_marker").read_text() == "main"
    for pid in (0, 1):
        assert results[pid]["process_count"] == 2
        assert results[pid]["broadcast"] == expected, pid
