import time, json
import jax, jax.numpy as jnp, numpy as np
from mpc_limx_control_tpu.core.config import ControllerConfig
import dataclasses
from mpc_limx_control_tpu.control import rollout as ro

cfg = ControllerConfig.walking()
B = 4096
s0 = ro.initial_plant_state(cfg, batch=(B,))
key = jax.random.PRNGKey(0)
s0 = s0.replace(xi=s0.xi.at[:, 9].add(0.05*jax.random.normal(key,(B,),jnp.float32)))

for iters_mult in (1, 2):
    c2 = dataclasses.replace(cfg, srbd=dataclasses.replace(cfg.srbd,
          solver=dataclasses.replace(cfg.srbd.solver, iters=20*iters_mult)))
    step = jax.jit(lambda state, it: jax.vmap(lambda s: ro.plant_step(c2, s, it))(state))
    st, m = step(s0, jnp.asarray(0.0, jnp.float32)); jax.block_until_ready(st)
    ts = []
    st = s0
    for k in range(10):
        t0 = time.perf_counter()
        st, m = step(st, jnp.asarray(float(k), jnp.float32))
        jax.block_until_ready((st, m))
        ts.append(time.perf_counter()-t0)
    print(f"iters={20*iters_mult}: per-step median {np.median(ts)*1e3:.3f} ms  min {min(ts)*1e3:.3f}  max {max(ts)*1e3:.3f}")
    print("   sample grf:", np.asarray(st.xi[0, 9:12]))
