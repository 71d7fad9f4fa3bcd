"""Prove the whole-tick fused Pallas kernel composes with sharding on the
real TPU (VERDICT r2 item 2).

Runs the walking config — whose plant_step dispatches to the fused
whole-tick kernel on a TPU backend (control/rollout.py:_use_fused_tick) —
through BOTH sharding styles over a mesh of all available TPU devices
(one chip in this environment), multi-step, and asserts checksum equality
against the unsharded fused run:

  * GSPMD (parallel/mesh.py:sharded_rollout — jit with NamedSharding)
  * shard_map (parallel/mesh.py:shard_map_rollout — explicit psum/pmax)

Writes artifacts_fused_sharded_tpu.json at the repo root.

Usage:  python tools/verify_fused_sharded.py   (axon/TPU backend)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro
from mpc_limx_control_tpu.parallel import mesh as pmesh


def main():
    assert jax.default_backend() == "tpu", (
        "run on the TPU backend (got %s)" % jax.default_backend())
    devices = jax.devices()
    cfg = ControllerConfig.walking()
    B = 256
    steps = 10

    s0 = ro.initial_plant_state(cfg, batch=(B,))
    key = jax.random.PRNGKey(11)
    s0 = s0.replace(xi=s0.xi.at[:, 9].add(
        0.05 * jax.random.normal(key, (B,), jnp.float32)))
    assert ro._use_fused_tick(cfg, s0), "fused tick must be the TPU path"

    mesh = pmesh.make_mesh(devices)

    # unsharded fused reference
    t0 = time.perf_counter()
    ref, _ = jax.jit(lambda s: ro.batched_rollout(cfg, s, steps))(s0)
    ref_xi = np.asarray(ref.xi)
    t_ref = time.perf_counter() - t0

    # GSPMD
    run = pmesh.sharded_rollout(cfg, mesh, steps)
    t0 = time.perf_counter()
    fin_g, stats_g = run(pmesh.shard_leading(s0, mesh),
                         jnp.asarray(0.0, jnp.float32))
    xi_g = np.asarray(fin_g.xi)
    t_gspmd = time.perf_counter() - t0
    err_g = float(np.abs(xi_g - ref_xi).max())

    # shard_map
    smap = pmesh.shard_map_rollout(cfg, mesh, steps)
    t0 = time.perf_counter()
    fin_s, stats_s = smap(pmesh.shard_leading(s0, mesh),
                          jnp.asarray(0.0, jnp.float32))
    xi_s = np.asarray(fin_s.xi)
    t_smap = time.perf_counter() - t0
    err_s = float(np.abs(xi_s - ref_xi).max())

    out = {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in devices],
        "mesh_devices": int(mesh.devices.size),
        "batch": B,
        "steps": steps,
        "fused_tick_active": True,
        "gspmd_max_abs_err_vs_unsharded": err_g,
        "shard_map_max_abs_err_vs_unsharded": err_s,
        "gspmd_mean_height_final": float(
            np.asarray(stats_g["mean_height"])[-1]),
        "shard_map_mean_height_final": float(
            np.asarray(stats_s["mean_height"])[-1]),
        "wall_s": {"unsharded": round(t_ref, 2), "gspmd": round(t_gspmd, 2),
                   "shard_map": round(t_smap, 2)},
        "ok": bool(err_g < 1e-4 and err_s < 1e-4
                   and np.isfinite(xi_g).all() and np.isfinite(xi_s).all()),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts_fused_sharded_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    assert out["ok"], out


if __name__ == "__main__":
    main()
