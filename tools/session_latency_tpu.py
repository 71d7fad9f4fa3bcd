"""Live-session latency artifact on the TPU host (VERDICT r3 item 7).

Runs the full loopback UDP session (ControlSession.run — the production
path: warm fused solve + dtMPC hold, one packed device->host transfer
per tick) against the WirePlant SRBD plant process, on whatever backend
the environment provides (the tunneled v5e chip under axon), and records
the session's own latency statistics: tick/solve/hold p50/p95, deadline
misses vs the 1 kHz control period, and solves vs the 5 ms dtMPC budget
(include/MPCParam.h:46-47) — plus closed-loop quality (height, forward
progress) so the numbers are from a run that actually walked.

On the tunneled dev chip each dispatch pays the ~25-50 ms network RTT
(NOTES.md), so the latency columns measure the tunnel; the artifact
records the backend so the numbers are interpreted honestly.  On a CPU
host the same tool shows the solve p50 inside the 5 ms budget.

Writes artifacts_session_tpu.json at the repo root.

Usage: python tools/session_latency_tpu.py [iters]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import session as ses
from test_session_walking import WirePlant


def _run(cfg, iters, use_kf, port_base, async_dispatch=False):
    sp, cp = port_base, port_base + 1
    plant = WirePlant(cfg, sp, cp, publish_truth_odom=not use_kf)
    try:
        with ses.ControlSession(cfg, host_ip="127.0.0.1", state_port=sp,
                                cmd_port=cp) as session:
            if use_kf:
                truth = np.asarray(plant.xi)
                session.kf = session.kf.replace(
                    x_hat=session.kf.x_hat
                    .at[0:3].set(jnp.asarray(truth[3:6]))
                    .at[6:9].set(plant.foot_l)
                    .at[9:12].set(plant.foot_r))
            t0 = time.perf_counter()
            stats = session.run(iterations=iters, hz=1000.0,
                                use_kf=use_kf,
                                async_dispatch=async_dispatch)
            wall = time.perf_counter() - t0
        xi = np.asarray(plant.xi)
        out = {k: (round(v, 6) if isinstance(v, float) else v)
               for k, v in stats.items()}
        out["wall_s"] = round(wall, 2)
        out["achieved_hz"] = round(stats["sent"] / wall, 1)
        out["final_height"] = round(float(xi[5]), 4)
        out["final_x"] = round(float(xi[3]), 4)
        out["walked_ok"] = bool(0.55 < xi[5] < 0.75 and xi[3] > 0.05
                                and abs(xi[0]) < 0.2 and abs(xi[1]) < 0.2)
        return out
    finally:
        plant.close()


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    base = 18300 + int(time.time() * 10) % 200
    cfg = ControllerConfig.walking()

    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "iterations": iters,
        "note": ("per-dispatch latency on the tunneled dev chip measures "
                 "the ~25-50 ms network RTT (NOTES.md), not on-device "
                 "compute; deployment hardware pays ~0.2-0.5 ms PCIe "
                 "dispatch"),
        "truth_odom": _run(cfg, iters, use_kf=False, port_base=base),
        "kf": _run(cfg, iters, use_kf=True, port_base=base + 10),
        # round 5 (VERDICT r4 next #7): the MPC dispatch overlaps the
        # hold ticks; commands are served from the newest COMPLETED
        # solve with a measured staleness histogram.  On this link the
        # loop rate is bounded by the hold tick's own dispatch RTT, no
        # longer by the (larger) solve RTT.
        "truth_odom_async": _run(cfg, iters, use_kf=False,
                                 port_base=base + 20,
                                 async_dispatch=True),
    }
    out["ok"] = bool(out["truth_odom"]["walked_ok"]
                     and out["kf"]["walked_ok"]
                     and out["truth_odom_async"]["walked_ok"])
    path = os.path.join(REPO, "artifacts_session_tpu.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    assert out["ok"], out


if __name__ == "__main__":
    main()
