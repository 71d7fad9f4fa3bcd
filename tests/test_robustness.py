"""Robustness scenarios: push recovery and turning.

The reference never exercises disturbances; these tests drive the full
controller through lateral/frontal push impulses and yaw-rate commands —
the scenarios a production locomotion stack must survive.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro


def _walk_with_push(push_v, push_at=600, steps=1500):
    """Walk, then instantaneously add `push_v` to the base velocity
    (impulse ~ m * push_v) at tick `push_at`."""
    cfg = ControllerConfig.walking()
    s0 = ro.initial_plant_state(cfg)
    final1, m1 = jax.jit(
        lambda s: ro.rollout(cfg, s, push_at))(s0)
    pushed = final1.replace(
        xi=final1.xi.at[9:12].add(jnp.asarray(push_v, jnp.float32)))
    final2, m2 = jax.jit(
        lambda s: ro.rollout(cfg, s, steps - push_at,
                             start_iteration=push_at))(pushed)
    h = np.concatenate([np.asarray(m1["height"]), np.asarray(m2["height"])])
    v = np.concatenate([np.asarray(m1["velocity"]),
                        np.asarray(m2["velocity"])])
    return h, v


@pytest.mark.parametrize("push", [
    (0.0, 0.3, 0.0),     # lateral shove
    (0.25, 0.0, 0.0),    # frontal shove
    (-0.2, -0.2, 0.0),   # diagonal backward
])
def test_push_recovery(push):
    h, v = _walk_with_push(push)
    assert h.min() > 0.5, h.min()
    # recovers to forward tracking within 0.9 s of the push
    assert abs(v[-300:, 0].mean() - 0.5) < 0.2
    assert abs(v[-300:, 1].mean()) < 0.2


def test_turning_walk():
    cfg = dataclasses.replace(ControllerConfig.walking(),
                              desired_yaw_rate=0.3)
    s0 = ro.initial_plant_state(cfg)
    final, m = jax.jit(lambda s: ro.rollout(cfg, s, 1500))(s0)
    h = np.asarray(m["height"])
    assert h.min() > 0.5
    # yaw integrates toward the commanded rate
    yaw = float(final.xi[2])
    assert 0.15 < yaw < 0.6, yaw
    assert not np.isnan(np.asarray(final.xi)).any()
