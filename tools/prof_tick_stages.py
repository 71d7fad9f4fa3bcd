"""Marginal cost of each fused-tick kernel stage on the real chip.

Builds the whole-tick kernel with one stage skipped at a time
(prof_skip) and reports the time delta vs the full kernel — outputs are
garbage for skipped stages, timing is the point.  B=4096, K-step
device-resident scan.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro
from mpc_limx_control_tpu.ops import tick_fused_pallas as tf

batch = 4096
K = 20
cfg = ControllerConfig.walking()

st0 = ro.initial_plant_state(cfg, batch=(batch,))
key = jax.random.PRNGKey(0)
st0 = st0.replace(
    xi=st0.xi.at[:, 9].add(0.05 * jax.random.normal(key, (batch,),
                                                    jnp.float32)))
args0 = (st0.xi, st0.q, st0.foot_l, st0.foot_r, st0.qp_z, st0.qp_lam,
         st0.ref_anchor)
vdes = jnp.tile(jnp.asarray(cfg.desired_velocity, jnp.float32)[None],
                (batch, 1))
wdes = jnp.full((batch,), float(cfg.desired_yaw_rate), jnp.float32)


def time_variant(skip):
    fn = tf.make_tick_fused(cfg, prof_skip=skip)

    def stp(carry, it):
        xi, q, fl, fr, z, y, anc = carry
        it_b = jnp.full((batch,), it, jnp.float32)
        out = jax.vmap(fn)(xi, q, fl, fr, z, y, anc, it_b, vdes, wdes)
        return out[:7], 0.0

    roll = jax.jit(lambda c: jax.lax.scan(
        stp, c, jnp.arange(K, dtype=jnp.float32))[0])
    r = roll(args0)
    np.asarray(r[0][0, 0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = roll(args0)
        np.asarray(r[0][0, 0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K


full = time_variant(())
print(f"full tick: {full*1e3:7.3f} ms  ({batch/full:12.1f} solves/s)")
ALL = ("gram", "cols", "lint", "chol", "admm", "solve",
       "lin", "arms", "ik", "fk", "post")
for stage in ALL:
    t = time_variant((stage,))
    print(f"skip {stage:6s}: {t*1e3:7.3f} ms  marginal {1e3*(full-t):7.3f} ms"
          f"  ({100*(full-t)/full:5.1f}%)")
t = time_variant(ALL)
print(f"skip ALL   : {t*1e3:7.3f} ms  (infra floor; accounted "
      f"{1e3*(full-t):7.3f} ms)")
