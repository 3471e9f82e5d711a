"""Multi-process jax.distributed bootstrap (SURVEY.md §4b).

Two local processes, CPU platform, one psum across them — exercises the
config-5 multi-host code path (`jax.distributed.initialize`) without real
hosts. Skips when the runtime doesn't support cross-process CPU collectives
(sandbox-dependent).
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="127.0.0.1:%s" % sys.argv[2],
    num_processes=2,
    process_id=pid,
    local_device_ids=[0, 1],
)
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
import numpy as np
assert jax.process_count() == 2, jax.process_count()
mesh = jax.sharding.Mesh(np.array(jax.devices()).reshape(4), ("x",))
def f(v):
    return jax.lax.psum(v, "x")
g = jax.shard_map(f, mesh=mesh, in_specs=P("x"), out_specs=P("x"))
local = jnp.arange(4, dtype=jnp.float32)  # globally 4 shards of 1
out = g(local)
# psum over 4 global shards each holding [i] -> every shard sees the sum
total = float(jax.jit(lambda x: x.sum())(out))
print("OK", total, flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("TPU_ICP_SLAM_SKIP_MULTIPROC") == "1",
    reason="explicitly disabled",
)
def test_two_process_psum(tmp_path):
    port = "29417"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("multi-process runtime hung in this sandbox")
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(outs)
        if "UNAVAILABLE" in joined or "not implemented" in joined.lower() or (
            "unimplemented" in joined.lower()
        ):
            pytest.skip(f"cross-process CPU collectives unsupported: {joined[-300:]}")
        raise AssertionError(joined)
    for out in outs:
        assert "OK" in out, out
