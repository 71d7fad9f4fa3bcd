"""Scaling sweep: batched MPC throughput vs device count (BASELINE
config 5 shape).

On a multi-chip host this sweeps real meshes of 1..N chips; on a
single-chip or CPU host, set XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu to exercise the sharded code path on virtual devices
(the collective structure is identical; absolute numbers are CPU-bound).

Usage: python examples/scaling_sweep.py [--batch-per-device 512] [--iters 5]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro
from mpc_limx_control_tpu.parallel import mesh as pmesh


def bench_mesh(cfg, devices, batch_per_device, iters):
    mesh = pmesh.make_mesh(devices)
    B = batch_per_device * len(devices)
    s0 = ro.initial_plant_state(cfg, batch=(B,))
    key = jax.random.PRNGKey(0)
    s0 = s0.replace(xi=s0.xi.at[:, 9].add(
        0.05 * jax.random.normal(key, (B,), jnp.float32)))
    s0 = pmesh.shard_leading(s0, mesh)
    step = pmesh.sharded_batch_step(cfg, mesh)

    st, stats = step(s0, jnp.asarray(0.0, jnp.float32))
    np.asarray(st.xi[0])        # sync

    t0 = time.perf_counter()
    for k in range(iters):
        st, stats = step(st, jnp.asarray(float(k), jnp.float32))
    np.asarray(st.xi[0])
    dt = time.perf_counter() - t0
    return {
        "devices": len(devices),
        "batch": B,
        "solves_per_s": B * iters / dt,
        "step_ms": dt / iters * 1e3,
        "mean_height": float(stats["mean_height"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    cfg = ControllerConfig.walking()
    devs = jax.devices()
    counts = sorted({1, 2, len(devs) // 2, len(devs)} - {0})
    results = []
    for n in counts:
        if n > len(devs):
            continue
        r = bench_mesh(cfg, devs[:n], args.batch_per_device, args.iters)
        results.append(r)
        print(json.dumps(r))
    if len(results) > 1:
        base = results[0]["solves_per_s"]
        for r in results[1:]:
            eff = r["solves_per_s"] / (base * r["devices"])
            print(f"devices={r['devices']}: scaling efficiency {eff:.2f}")


if __name__ == "__main__":
    main()
