"""Profile fused whole-tick kernel cost vs ADMM iteration count.

Device-resident lax.scan rollout (no per-step dispatch), batch 4096,
median of repeats — isolates on-chip kernel time from tunnel noise.
"""
import dataclasses, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro

batch = 4096
K = 20
base = ControllerConfig.walking()

for it_n in (0, 2, 4, 8, 12):
    cfg = dataclasses.replace(
        base, srbd=dataclasses.replace(
            base.srbd, solver=dataclasses.replace(
                base.srbd.solver, admm_warm_iters=it_n)))
    st0 = ro.initial_plant_state(cfg, batch=(batch,))
    key = jax.random.PRNGKey(0)
    st0 = st0.replace(
        xi=st0.xi.at[:, 9].add(
            0.05 * jax.random.normal(key, (batch,), jnp.float32)))

    def _roll(s, cfg=cfg):
        def stp(st, it):
            st2, _ = jax.vmap(lambda x: ro.plant_step(cfg, x, it))(st)
            return st2, 0.0
        return jax.lax.scan(stp, s, jnp.arange(K, dtype=jnp.float32))[0]

    roll = jax.jit(_roll)
    r = roll(st0)
    np.asarray(r.xi[0, 0])          # scalar-ish fetch; sync
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = roll(st0)
        np.asarray(r.xi[0, 0])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"admm_warm_iters={it_n:2d}  per-tick {med/K*1e3:7.3f} ms  "
          f"({batch*K/med:10.1f} solves/s)  spread "
          f"{min(ts)/K*1e3:.3f}-{max(ts)/K*1e3:.3f}")
