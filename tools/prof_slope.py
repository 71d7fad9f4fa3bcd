"""RTT-corrected per-tick time of the fused whole-tick kernel.

The tunneled axon backend pays a ~27 ms host round trip on every
dispatch+fetch, so timing ONE K-step scan overstates per-tick time by
RTT/K (the 'infra floor' mismeasured on 2026-08-20).  Timing two scan
lengths and taking the slope cancels the RTT exactly:

    tick = (T(K2) - T(K1)) / (K2 - K1)
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

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K1, K2 = 10, 60
cfg = ControllerConfig.walking()

st0 = ro.initial_plant_state(cfg, batch=(batch,))
st0 = st0.replace(
    xi=st0.xi.at[:, 9].add(0.05 * jax.random.normal(
        jax.random.PRNGKey(0), (batch,), jnp.float32)))
args0 = (st0.xi, st0.q, st0.foot_l, st0.foot_r, st0.qp_z, st0.qp_lam,
         st0.ref_anchor)
vdes = jnp.tile(jnp.asarray(cfg.desired_velocity, jnp.float32)[None],
                (batch, 1))
wdes = jnp.full((batch,), float(cfg.desired_yaw_rate), jnp.float32)
fn = tf.make_tick_fused(cfg)


def timed(K):
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
    return float(np.median(ts))


t1, t2 = timed(K1), timed(K2)
tick = (t2 - t1) / (K2 - K1)
rtt = t1 - K1 * tick
print(f"B={batch}  T({K1})={t1*1e3:.2f} ms  T({K2})={t2*1e3:.2f} ms")
print(f"per-tick {tick*1e3:.3f} ms  ({batch/tick:,.1f} solves/s)  "
      f"implied RTT {rtt*1e3:.2f} ms")
