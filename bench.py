"""Benchmark: batched TRON1 MPC solves/s per chip.

Runs the full walking-controller tick (gait + placement + swing IK +
contact-scheduled SRBD GRF MPC + plant step) over a scenario batch on one
chip and reports throughput against the BASELINE.json north-star target of
1,000 solves/s/chip, plus the p50 single-solve latency vs the 5 ms dtMPC
real-time budget (include/MPCParam.h:46-47).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_SOLVES_PER_S = 1000.0     # BASELINE.md north star (v5e chip)
DT_MPC_BUDGET_S = 0.005          # reference re-solve interval


def main():
    from mpc_limx_control_tpu.core.config import ControllerConfig
    from mpc_limx_control_tpu.control import rollout as ro

    cfg = ControllerConfig.walking()
    dev = jax.devices()[0]
    batch = int(os.environ.get(
        "BENCH_BATCH", 4096 if dev.platform != "cpu" else 256))

    state0 = ro.initial_plant_state(cfg, batch=(batch,))
    key = jax.random.PRNGKey(0)
    state0 = state0.replace(
        xi=state0.xi.at[:, 9].add(
            0.05 * jax.random.normal(key, (batch,), jnp.float32)))

    @jax.jit
    def step(state, it):
        return jax.vmap(lambda s: ro.plant_step(cfg, s, it))(state)

    # warmup / compile.  NB: fetch to host (np.asarray) rather than
    # block_until_ready — on the tunneled TPU backend block_until_ready
    # can return before execution finishes, which silently inflates
    # throughput numbers by orders of magnitude.
    st, _ = step(state0, jnp.asarray(0.0, jnp.float32))
    np.asarray(st.xi)

    iters = 10
    t0 = time.perf_counter()
    st = state0
    for k in range(iters):
        st, m = step(st, jnp.asarray(float(k), jnp.float32))
    np.asarray(st.xi)
    elapsed = time.perf_counter() - t0

    solves_per_s = batch * iters / elapsed
    step_latency = elapsed / iters

    # single-scenario latency (p50 over repeats) vs the 5 ms budget
    # Real-time latency: per-tick time of a device-resident closed loop
    # (lax.scan of K full ticks) — the deployment shape for a 1 kHz
    # controller; host-dispatch per tick would only measure the tunnel RTT.
    s1 = ro.initial_plant_state(cfg)
    K = 50
    roll = jax.jit(lambda s: ro.rollout(cfg, s, K))
    r, _ = roll(s1)
    np.asarray(r.xi)
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        r, _ = roll(s1)
        np.asarray(r.xi)
        lats.append((time.perf_counter() - t0) / K)
    p50 = float(np.median(lats))

    print(json.dumps({
        "metric": "batched TRON1 walking MPC throughput (full tick incl. "
                  "contact-scheduled GRF QP, swing IK, plant step)",
        "value": round(solves_per_s, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_s / TARGET_SOLVES_PER_S, 3),
        "batch": batch,
        "batched_step_latency_ms": round(step_latency * 1e3, 3),
        "p50_single_solve_latency_ms": round(p50 * 1e3, 3),
        "p50_within_5ms_budget": p50 <= DT_MPC_BUDGET_S,
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
