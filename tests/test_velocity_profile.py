"""Commanded-velocity profiles: ramp up, cruise, and stop — the commanded
interface the reference lacks (desired velocity hardcoded to (1,0,0),
include/MPCController.h:16)."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro


def test_velocity_ramp_and_stop():
    cfg = ControllerConfig.walking()
    steps = 1800
    t = np.arange(steps) / 1000.0
    vx = np.where(t < 0.6, t / 0.6 * 0.6,          # ramp 0 -> 0.6 m/s
                  np.where(t < 1.2, 0.6, 0.0))     # cruise, then stop
    sched = jnp.asarray(np.stack([vx, 0 * vx, 0 * vx], axis=1), jnp.float32)

    s0 = ro.initial_plant_state(cfg)
    final, m = jax.jit(
        lambda s: ro.rollout(cfg, s, steps, v_des_schedule=sched))(s0)
    h = np.asarray(m["height"])
    v = np.asarray(m["velocity"])
    assert h.min() > 0.5, h.min()
    # cruise phase tracks ~0.6
    assert abs(v[900:1150, 0].mean() - 0.6) < 0.2
    # after the stop command the robot decelerates toward zero
    assert v[-1, 0] < 0.2, v[-1, 0]
    assert v[-1, 0] < v[1250, 0] * 0.5
    assert not np.isnan(np.asarray(final.xi)).any()
