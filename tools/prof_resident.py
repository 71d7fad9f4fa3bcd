"""A/B: plant_step-dispatch scan vs the batch-last RESIDENT rollout on
the real chip (slope methodology, B=4096)."""
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

batch = int(os.environ.get("B", 4096))
cfg = ControllerConfig.walking()
st0 = ro.initial_plant_state(cfg, batch=(batch,))
key = jax.random.PRNGKey(0)
st0 = st0.replace(xi=st0.xi.at[:, 9].add(
    0.05 * jax.random.normal(key, (batch,), jnp.float32)))


def slope(make_roll, K1=10, K2=60, reps=5):
    ts = {}
    for K in (K1, K2):
        roll = make_roll(K)
        r = roll()
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = roll()
            np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
            samples.append(time.perf_counter() - t0)
        ts[K] = float(np.median(samples))
    return (ts[K2] - ts[K1]) / (K2 - K1)


def mk_dispatch(K):
    def stp(s, it):
        s2, _ = jax.vmap(lambda x: ro.plant_step(cfg, x, it))(s)
        return s2, 0.0
    f = jax.jit(lambda s: jax.lax.scan(
        stp, s, jnp.arange(K, dtype=jnp.float32))[0])
    return lambda: f(st0)


def mk_resident(K):
    f = jax.jit(lambda s: ro.batched_rollout_resident(cfg, s, K)[0])
    return lambda: f(st0)


t_d = slope(mk_dispatch)
print(f"dispatch scan : {t_d*1e3:7.3f} ms/tick  {batch/t_d:12,.0f} solves/s")
t_r = slope(mk_resident)
print(f"resident scan : {t_r*1e3:7.3f} ms/tick  {batch/t_r:12,.0f} solves/s"
      f"  ({(t_d/t_r - 1)*100:+.1f}%)")
