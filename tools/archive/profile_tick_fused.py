"""On-chip check of the whole-tick fused kernel (ops/tick_fused_pallas.py):
compiles on Mosaic, matches the unfused composition, and times both paths.

Timing per NOTES.md: host fetch of a scalar, batch-last fused kernel vs
the XLA composition at the bench batch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro


def timeit(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters, out


def main():
    cfg = ControllerConfig.walking()
    dev = jax.devices()[0]
    B = int(os.environ.get("BENCH_BATCH",
                           4096 if dev.platform != "cpu" else 256))
    print(f"B={B} device={dev}", flush=True)

    state0 = ro.initial_plant_state(cfg, batch=(B,))
    key = jax.random.PRNGKey(0)
    state0 = state0.replace(xi=state0.xi.at[:, 9].add(
        0.05 * jax.random.normal(key, (B,), jnp.float32)))
    it0 = jnp.asarray(260.0, jnp.float32)

    @jax.jit
    def step_fused(state, it):
        return jax.vmap(lambda s: ro.plant_step(cfg, s, it))(state)

    @jax.jit
    def step_ref(state, it):
        return jax.vmap(lambda s: ro._plant_step_ref(cfg, s, it))(state)

    print("compiling fused tick kernel ...", flush=True)
    t0 = time.perf_counter()
    sf, mf = step_fused(state0, it0)
    np.asarray(sf.xi)
    print(f"fused compile+run: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    sr, mr = step_ref(state0, it0)
    np.asarray(sr.xi)
    print(f"ref compile+run:   {time.perf_counter()-t0:.1f}s", flush=True)

    dx = float(np.max(np.abs(np.asarray(sf.xi) - np.asarray(sr.xi))))
    dq = float(np.max(np.abs(np.asarray(sf.q) - np.asarray(sr.q))))
    dg = float(np.max(np.abs(np.asarray(mf["grf"]) - np.asarray(mr["grf"]))))
    print(f"on-chip parity: max|dxi|={dx:.2e} max|dq|={dq:.2e} "
          f"max|dgrf|={dg:.2e}", flush=True)

    # bench.py methodology: thread the state tick-to-tick (a real closed
    # loop chains data dependencies — unthreaded repeats overlap across
    # dispatches and overstate throughput)
    def loop(step, iters=20):
        st = state0
        st, _ = step(st, it0)
        np.asarray(st.xi)
        st = state0
        t0 = time.perf_counter()
        for k in range(iters):
            st, _ = step(st, jnp.asarray(260.0 + k, jnp.float32))
        np.asarray(st.xi)
        return (time.perf_counter() - t0) / iters

    t_f = loop(step_fused)
    t_r = loop(step_ref)
    print(f"fused tick: {t_f*1e3:7.2f} ms  ({B/t_f:,.0f} solves/s)",
          flush=True)
    print(f"ref tick:   {t_r*1e3:7.2f} ms  ({B/t_r:,.0f} solves/s)",
          flush=True)


if __name__ == "__main__":
    main()
