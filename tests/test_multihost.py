"""Multi-host path actually exercised: two OS processes join a
jax.distributed cluster on the CPU backend and run `all_gather_objects`
(the eval-dict gather replacing dist.all_gather_object,
engine/forgery_engine.py:374-375) plus the sharded EpochSampler.

Round-1 gap: the pickle-pad-allgather path had never run at
process_count() > 1 (every in-suite caller early-returns single-process)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
jax.distributed.initialize(
    coordinator_address=os.environ["UD_COORD"],
    num_processes=2,
    process_id=int(os.environ["UD_PID"]),
)
sys.path.insert(0, os.environ["UD_REPO"])
import numpy as np
from unidefense_tpu.parallel.mesh import all_gather_objects

pid = jax.process_index()
assert jax.process_count() == 2

# dict + scalar gather (ragged pickles: each process sends different sizes)
payload = {"videos_%d" % pid: list(range(pid * 3 + 1))}
got = all_gather_objects(payload, pid * 10)
assert len(got) == 2, got
assert got[0][0] == {"videos_0": [0]}, got
assert got[1][0] == {"videos_1": [0, 1, 2, 3]}, got
assert got[0][1] == 0 and got[1][1] == 10, got

# sharded sampler: the two processes partition the padded index space
from unidefense_tpu.data.pipeline import EpochSampler

s = EpochSampler(10, 2, shuffle=True, shard_id=pid, num_shards=2)
s.set_epoch(3)
mine = sorted(sum((b.tolist() for b in s), []))
gathered = all_gather_objects(mine)
if pid == 0:
    allidx = sorted(gathered[0][0] + gathered[1][0])
    assert len(allidx) == 10 and set(allidx) == set(range(10)), allidx
print("MULTIHOST_OK", pid, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_allgather():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            UD_COORD=f"127.0.0.1:{port}",
            UD_PID=str(pid),
            UD_REPO=REPO,
        )
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen([sys.executable, "-c", CHILD], env=env,
                             stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                             text=True)
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0]
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {pid}" in out
