"""Multi-process input-pipeline test (VERDICT r2 item 8).

Launches TWO real JAX processes (jax.distributed local cluster, CPU
platform, 2 virtual devices each) that both construct the DataLoader over
the same deterministic dataset and assert the loader forms a GLOBAL
jax.Array: global batch axis = batch_size * process_count, and each
process's addressable shards hold exactly its own interleaved items.
This is what plain ``device_put`` of host-local numpy cannot do — the
regression this test pins.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2 --xla_backend_optimization_level=0"
import jax
jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid,
    cluster_detection_method="deactivate",
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and len(jax.local_devices()) == 2

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.getcwd())
from kmunet_tpu.data.pipeline import DataLoader

# deterministic dataset: item i = i * ones(3, 4)
class DS:
    def __len__(self): return 16
    def __getitem__(self, i): return np.full((3, 4), float(i), np.float32)

mesh = Mesh(np.asarray(jax.devices()).reshape(4,), ("data",))
sharding = NamedSharding(mesh, P("data"))
loader = DataLoader(DS(), batch_size=4, shuffle=False, num_workers=2,
                    sharding=sharding, prefetch=1)

batches = list(iter(loader))
assert len(batches) == 2, len(batches)  # 16 items / (4 per proc * 2 procs)
b = batches[0]
assert isinstance(b, jax.Array)
assert b.shape == (8, 3, 4), b.shape          # GLOBAL batch = 4 * 2 procs
assert not b.is_fully_addressable              # truly distributed

# process p holds indices p, p+2, p+4, p+6 (stride-pc sharding); its local
# batch is stacked in that order, occupying global rows [4p, 4p+4).
expect_local = np.stack([np.full((3, 4), float(pid + 2 * k), np.float32)
                         for k in range(4)])
local = np.concatenate(
    [np.asarray(s.data) for s in sorted(b.addressable_shards, key=lambda s: s.index[0].start)]
)
np.testing.assert_array_equal(local, expect_local)
print(f"proc {pid}: global assembly OK")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_array_assembly(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: global assembly OK" in out
