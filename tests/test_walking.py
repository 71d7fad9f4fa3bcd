"""Closed-loop TRON1 tests: standing balance and walking limit cycle.

BASELINE configs 2-4: standing-balance MPC, walking-gait MPC at control
rate, and batched walking scenarios.  These are full controller-in-the-loop
simulations (control/rollout.py) — the capability the reference sketches
but never completes (its stance-force computation is an empty stub,
include/MPCController.h:177-180).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro


@pytest.fixture(scope="module")
def walk_run():
    cfg = ControllerConfig.walking()
    s0 = ro.initial_plant_state(cfg)
    final, metrics = jax.jit(
        lambda s: ro.rollout(cfg, s, 1800))(s0)
    return final, jax.tree.map(np.asarray, metrics)


def test_walking_stays_upright(walk_run):
    final, m = walk_run
    h = m["height"]
    assert h.min() > 0.55, h.min()
    assert abs(h[-600:].mean() - 0.65) < 0.02


def test_walking_tracks_velocity(walk_run):
    final, m = walk_run
    vx = m["velocity"][:, 0]
    # steady-state forward speed within 30% of the 0.5 m/s command
    assert abs(vx[-600:].mean() - 0.5) < 0.15, vx[-600:].mean()


def test_walking_grf_physical(walk_run):
    final, m = walk_run
    fz = m["grf"][:, 2] + m["grf"][:, 5]
    # average vertical force over the last second carries the weight
    assert abs(fz[-1000:].mean() - 9.585 * 9.81) < 15.0
    # unilateral contact: no pulling on the ground
    assert m["grf"][:, 2].min() > -1e-3
    assert m["grf"][:, 5].min() > -1e-3


def test_walking_friction_cone_respected(walk_run):
    final, m = walk_run
    mu = ControllerConfig.walking().srbd.friction_mu
    for off in (0, 3):
        fx, fy, fz = (m["grf"][:, off], m["grf"][:, off + 1],
                      m["grf"][:, off + 2])
        assert (np.abs(fx) <= mu * fz + 1e-2).all()
        assert (np.abs(fy) <= mu * fz + 1e-2).all()


def test_standing_regulates_height_and_attitude():
    cfg = ControllerConfig.standing()
    s0 = ro.initial_plant_state(cfg)
    # start 5 cm low with a small vertical push
    s0 = s0.replace(xi=s0.xi.at[5].set(0.60).at[11].set(0.1))
    final, m = jax.jit(lambda s: ro.rollout(cfg, s, 500))(s0)
    h = np.asarray(m["height"])
    # height recovers toward the 0.65 target
    assert h[-1] > h[0]
    assert abs(h[-1] - 0.65) < abs(h[0] - 0.65)
    # NB: a point-foot biped cannot stand statically (no COP authority);
    # lateral drift over longer windows is physical, not a controller bug.


def test_batched_walking_scenarios():
    """Perturbed initial states AND staggered gait phases (config 4)."""
    cfg = ControllerConfig.walking()
    B = 4
    s0 = ro.initial_plant_state(cfg, batch=(B,))
    key = jax.random.PRNGKey(1)
    s0 = s0.replace(xi=s0.xi.at[:, 9].add(
        0.1 * jax.random.normal(key, (B,), jnp.float32)))
    # stagger gait phase by up to 100 ms across scenarios
    it0 = jnp.asarray([0.0, 30.0, 60.0, 90.0], jnp.float32)
    final, m = jax.jit(
        lambda s, i0: ro.batched_rollout(cfg, s, 600,
                                         start_iteration=i0))(s0, it0)
    h = np.asarray(m["height"])            # [B, T]
    assert h.shape == (B, 600)
    assert (h.min(axis=1) > 0.5).all()
    assert not np.isnan(np.asarray(final.xi)).any()
    # staggered phases produce genuinely different trajectories
    assert np.abs(h[0] - h[1]).max() > 1e-4


def test_anchor_integral_kills_velocity_bias():
    """The reference-anchor integral placement action (round 3,
    cfg.ref_anchor_band/anchor_placement_gain) drives steady-state vx to
    the commanded 0.5 within +/-0.02 — the receding reference alone
    settles ~14% fast (0.569 measured), because it re-zeroes its
    position error every solve and cannot see accumulated drift."""
    import dataclasses
    cfg = ControllerConfig.walking()
    assert cfg.ref_anchor_band > 0.0 and cfg.anchor_placement_gain > 0.0
    s0 = ro.initial_plant_state(cfg)
    assert s0.ref_anchor is not None
    final, m = jax.jit(lambda s: ro.rollout(cfg, s, 3600))(s0)
    vx = np.asarray(m["velocity"])[:, 0]
    h = np.asarray(m["height"])
    assert abs(vx[-600:].mean() - 0.5) < 0.02, vx[-600:].mean()
    assert abs(h[-600:].mean() - 0.65) < 0.02
    # and the receding baseline really does overspeed (the bias the
    # anchor exists to kill)
    rcfg = dataclasses.replace(cfg, ref_anchor_band=0.0,
                               anchor_placement_gain=0.0)
    r0 = ro.initial_plant_state(rcfg)
    assert r0.ref_anchor is None
    _, rm = jax.jit(lambda s: ro.rollout(rcfg, s, 1800))(r0)
    rvx = np.asarray(rm["velocity"])[:, 0]
    assert rvx[-600:].mean() > 0.54
