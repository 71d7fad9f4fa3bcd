"""Kalman-filter state estimation tests (ops/kf.py + control/estimator.py).

The reference never tests its KF (the estimator test only prints the fake
Gazebo source, src/state_estimator_test.cpp:3).  Here: convergence to
ground truth on synthetic walking data, contact gating behavior, and
batching.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import EstimatorConfig
from mpc_limx_control_tpu.core.types import KFState
from mpc_limx_control_tpu.ops import kf as kfops


CFG = EstimatorConfig()
DT = 0.001


def _simulate(steps=400, accel=(0.5, 0.0, 0.0), batch=()):
    """Ground truth: base accelerates from rest; both feet pinned at ground.
    Returns measurement stream + truth arrays."""
    p0 = np.array([0.0, 0.0, 0.65])
    feet = np.array([[0.0, 0.105, 0.0], [0.0, -0.105, 0.0]])
    a = np.asarray(accel)
    t = np.arange(steps)[:, None] * DT
    pos = p0 + 0.5 * a * t ** 2
    vel = a * t
    foot_rel = feet[None] - pos[:, None, :]            # [T, 2, 3]
    foot_vel_rel = -vel[:, None, :] * np.ones((1, 2, 1))
    meas = kfops.KFMeasurement(
        foot_pos_rel=jnp.asarray(np.broadcast_to(
            foot_rel, (*batch, steps, 2, 3)).swapaxes(0, 0)),
        foot_vel_rel=jnp.asarray(np.broadcast_to(
            foot_vel_rel, (*batch, steps, 2, 3))),
        accel_world=jnp.asarray(np.broadcast_to(
            a, (*batch, steps, 3)).copy()),
        contact=jnp.ones((*batch, steps, 2), bool),
        foot_heights=jnp.zeros((*batch, steps, 2)),
    )
    return meas, pos, vel


def test_kf_converges_to_truth():
    meas, pos, vel = _simulate()
    state = KFState.initial((), CFG.initial_covariance, jnp.float64)

    def step(s, m):
        s2 = kfops.kf_update(CFG, s, m, DT)
        return s2, s2.x_hat

    _, xs = jax.lax.scan(step, state, meas)
    xs = np.asarray(xs)
    # after the transient, the filter tracks base position and velocity
    np.testing.assert_allclose(xs[-1, 0:3], pos[-1], atol=2e-2)
    np.testing.assert_allclose(xs[-1, 3:6], vel[-1], atol=2e-2)
    # foot positions converge to the pinned feet (z offset by footRadius)
    np.testing.assert_allclose(xs[-1, 6:8], [0.0, 0.105], atol=2e-2)


def test_kf_contact_gating_increases_uncertainty():
    meas, _, _ = _simulate(steps=50)
    state = KFState.initial((), CFG.initial_covariance, jnp.float64)

    def run(contact_on):
        s = state
        for i in range(50):
            m = jax.tree.map(lambda x: x[i], meas)
            m = m._replace(contact=jnp.asarray([contact_on, True]))
            s = kfops.kf_update(CFG, s, m, DT)
        return s

    s_contact = run(True)
    s_swing = run(False)
    # left-foot block covariance must be larger without contact
    cov_c = float(s_contact.p_cov[6, 6])
    cov_s = float(s_swing.p_cov[6, 6])
    assert cov_s > cov_c * 5.0


def test_kf_batched_matches_single():
    meas, _, _ = _simulate(steps=30)
    state1 = KFState.initial((), CFG.initial_covariance, jnp.float64)
    stateB = KFState.initial((4,), CFG.initial_covariance, jnp.float64)

    s1 = state1
    for i in range(30):
        s1 = kfops.kf_update(CFG, s1, jax.tree.map(lambda x: x[i], meas), DT)

    sB = stateB
    for i in range(30):
        mB = jax.tree.map(
            lambda x: jnp.broadcast_to(x[i], (4, *x[i].shape)), meas)
        sB = kfops.kf_update(CFG, sB, mB, DT)

    np.testing.assert_allclose(np.asarray(sB.x_hat[2]),
                               np.asarray(s1.x_hat), atol=1e-10)
