"""estimator_tick integration tests: KF + FK packing path
(control/estimator.py), mirroring the intended real-hardware loop of
src/mpc_control.cpp:158-192."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.core.types import ImuData, JointState, KFState
from mpc_limx_control_tpu.control import estimator as est
from mpc_limx_control_tpu.control import rollout as ro
from mpc_limx_control_tpu.models import kinematics as kin

CFG = ControllerConfig.standing()
DT = 0.001


def _standing_inputs():
    """Joint state of the standing pose; IMU of a stationary body."""
    s0 = ro.initial_plant_state(CFG)
    f32 = jnp.float32
    joints = JointState(q=s0.q, dq=jnp.zeros(6, f32), tau=jnp.zeros(6, f32))
    imu = ImuData(
        quat=jnp.asarray([0.0, 0.0, 0.0, 1.0], f32),
        acc=jnp.asarray([0.0, 0.0, 9.81], f32),  # specific force, at rest
        gyro=jnp.zeros(3, f32))
    return s0, joints, imu


def test_estimator_converges_standing():
    s0, joints, imu = _standing_inputs()
    kf = KFState.initial((), CFG.estimator.initial_covariance, jnp.float32)
    contact = jnp.asarray([True, True])

    def step(kf, _):
        out = est.estimator_tick(CFG, kf, joints, imu, contact, DT)
        return out.kf, out.odom.pos

    kf, traj = jax.lax.scan(step, kf, None, length=800)
    pos = np.asarray(traj)
    # converges to the true standing height (base->foot FK z + footRadius)
    true_z = float(-kin.forward_kinematics(
        kin.leg_geometry(CFG.robot.legs, "left", jnp.float32),
        joints.q[:3])[2])
    assert abs(pos[-1, 2] - (true_z + CFG.estimator.foot_radius)) < 0.03, \
        (pos[-1], true_z)
    # x/y stay near the feet midpoint (feet under COM when standing)
    assert abs(pos[-1, 0]) < 0.05
    assert abs(pos[-1, 1]) < 0.05


def test_estimator_batched():
    s0, joints, imu = _standing_inputs()
    B = 4
    kf = KFState.initial((B,), CFG.estimator.initial_covariance,
                         jnp.float32)
    jb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B, *x.shape)), joints)
    ib = jax.tree.map(lambda x: jnp.broadcast_to(x, (B, *x.shape)), imu)
    contact = jnp.ones((B, 2), bool)
    out = est.estimator_tick(CFG, kf, jb, ib, contact, DT)
    assert out.odom.pos.shape == (B, 3)
    # all batch entries identical
    np.testing.assert_allclose(np.asarray(out.kf.x_hat[0]),
                               np.asarray(out.kf.x_hat[3]), atol=1e-7)


def test_scripted_odometry_shapes():
    v = jnp.asarray([0.5, 0.0, 0.0])
    odom = est.scripted_odometry(CFG, jnp.asarray(250.0), v)
    assert odom.pos.shape == (3,)
    np.testing.assert_allclose(float(odom.pos[0]), 0.5 * 0.25, atol=1e-5)
    # batched
    its = jnp.arange(8.0)
    vb = jnp.broadcast_to(v, (8, 3))
    ob = est.scripted_odometry(CFG, its, vb)
    assert ob.pos.shape == (8, 3)
