import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_log_compiles", True)
from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro

cfg = ControllerConfig.walking()
B = 1024
s0 = ro.initial_plant_state(cfg, batch=(B,))
key = jax.random.PRNGKey(0)
s0 = s0.replace(xi=s0.xi.at[:, 9].add(0.05*jax.random.normal(key,(B,),jnp.float32)))
step = jax.jit(lambda state, it: jax.vmap(lambda s: ro.plant_step(cfg, s, it))(state))
st, m = step(s0, jnp.asarray(0.0, jnp.float32))
xi = np.asarray(st.xi)
print("warm done; nan?", np.isnan(xi).any(), "xi0:", xi[0,:3])
st = s0
for k in range(6):
    t0=time.perf_counter()
    st, m = step(st, jnp.asarray(float(k), jnp.float32))
    xi = np.asarray(st.xi)          # force full device->host fetch
    print(f"step {k}: {(time.perf_counter()-t0)*1e3:.2f} ms nan={np.isnan(xi).any()}")
