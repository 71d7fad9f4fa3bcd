"""Two-process jax.distributed smoke test over loopback (VERDICT r2
item 8): the only previously-untested line in parallel/mesh.py was the
real multi-process initialize_multihost path.

Spawns two local CPU processes (2 virtual devices each -> a 4-device
global mesh), each running initialize_multihost + sharded_rollout, and
asserts both report the same replicated statistics as a single-process
run of the identical problem — per-host shards stay local, the psum'd
stats cross the (loopback) DCN.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np
import pytest

_HELPER = r"""
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
sys.path.insert(0, os.getcwd())
from mpc_limx_control_tpu.parallel import mesh as pmesh
from mpc_limx_control_tpu.control import rollout as ro
from mpc_limx_control_tpu.core.config import ControllerConfig

n = pmesh.initialize_multihost(
    coordinator_address="127.0.0.1:" + port, num_processes=2,
    process_id=pid)
assert n == 4, n
cfg = ControllerConfig.walking()
B, steps = 8, 3
s0 = ro.initial_plant_state(cfg, batch=(B,))
s0 = s0.replace(xi=s0.xi.at[:, 9].add(
    0.01 * jnp.arange(B, dtype=jnp.float32)))
mesh = pmesh.make_mesh(jax.devices())
run = pmesh.sharded_rollout(cfg, mesh, steps)
final, stats = run(pmesh.shard_leading(s0, mesh),
                   jnp.asarray(0.0, jnp.float32))
import numpy as np
res = {"process": pid, "ndev": n,
       "mean_height": [float(x) for x in np.asarray(stats["mean_height"])],
       "max_qp_residual": float(np.asarray(stats["max_qp_residual"])[-1])}
with open(out, "w") as fh:
    json.dump(res, fh)
"""


def test_two_process_distributed_rollout(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    helper = tmp_path / "dist_helper.py"
    helper.write_text(_HELPER)
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(helper), str(i), port, outs[i]],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    deadline = time.time() + 420
    for p in procs:
        try:
            rc = p.wait(timeout=max(1.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        if rc != 0:
            out = p.stdout.read().decode(errors="replace")[-3000:]
            pytest.fail(f"worker exited rc={rc}:\n{out}")

    results = [json.load(open(o)) for o in outs]
    assert results[0]["ndev"] == results[1]["ndev"] == 4
    # both processes see identical replicated statistics
    np.testing.assert_allclose(results[0]["mean_height"],
                               results[1]["mean_height"], rtol=0, atol=0)

    # and they match the single-process run of the identical problem
    import jax
    import jax.numpy as jnp
    from mpc_limx_control_tpu.core.config import ControllerConfig
    from mpc_limx_control_tpu.control import rollout as ro
    from mpc_limx_control_tpu.parallel import mesh as pmesh

    cfg = ControllerConfig.walking()
    s0 = ro.initial_plant_state(cfg, batch=(8,))
    s0 = s0.replace(xi=s0.xi.at[:, 9].add(
        0.01 * jnp.arange(8, dtype=jnp.float32)))
    mesh = pmesh.make_mesh(jax.devices()[:4])
    run = pmesh.sharded_rollout(cfg, mesh, 3)
    _, stats = run(pmesh.shard_leading(s0, mesh),
                   jnp.asarray(0.0, jnp.float32))
    np.testing.assert_allclose(results[0]["mean_height"],
                               np.asarray(stats["mean_height"]),
                               atol=1e-6)
