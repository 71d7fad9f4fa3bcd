"""Core pytree state containers.

The reference passes mutable structs between layers:
`RobotOdomState{pos,ori,quat,v_pos,v_ori}` (include/state_estimator_fake.h:19-25,
duplicated at include/stateEstimator.h:49-55), limxsdk `RobotState{q,dq,tau}`,
`RobotCmd{mode,q,dq,tau,Kp,Kd}`, `ImuData{quat,acc,gyro}`
(include/pf_controller_base.h:88-91).

Here each is an immutable pytree whose leaves carry an arbitrary leading batch
shape, so the same structures flow through `vmap`/`pjit` unchanged.
"""

from __future__ import annotations

from typing import Optional

import chex
import jax.numpy as jnp


@chex.dataclass(frozen=True)
class OdomState:
    """Base-link odometry estimate (reference RobotOdomState).

    pos  [..., 3]  world position
    ori  [..., 3]  roll/pitch/yaw (rad)
    quat [..., 4]  orientation quaternion, (x, y, z, w) to match the
                   reference's layout (state_estimator_fake.h:69-72)
    v_pos [..., 3] world linear velocity
    v_ori [..., 3] angular velocity
    """

    pos: jnp.ndarray
    ori: jnp.ndarray
    quat: jnp.ndarray
    v_pos: jnp.ndarray
    v_ori: jnp.ndarray

    @classmethod
    def zeros(cls, batch=(), dtype=jnp.float32) -> "OdomState":
        quat = jnp.zeros((*batch, 4), dtype).at[..., 3].set(1.0)
        return cls(
            pos=jnp.zeros((*batch, 3), dtype),
            ori=jnp.zeros((*batch, 3), dtype),
            quat=quat,
            v_pos=jnp.zeros((*batch, 3), dtype),
            v_ori=jnp.zeros((*batch, 3), dtype),
        )


@chex.dataclass(frozen=True)
class JointState:
    """Measured joint state (limxsdk RobotState: q, dq, tau)."""

    q: jnp.ndarray    # [..., J]
    dq: jnp.ndarray   # [..., J]
    tau: jnp.ndarray  # [..., J]

    @classmethod
    def zeros(cls, batch=(), num_joints: int = 6, dtype=jnp.float32):
        z = jnp.zeros((*batch, num_joints), dtype)
        return cls(q=z, dq=z, tau=z)


@chex.dataclass(frozen=True)
class ImuData:
    """IMU sample (limxsdk ImuData: quat, acc, gyro); quat is (x, y, z, w)."""

    quat: jnp.ndarray  # [..., 4]
    acc: jnp.ndarray   # [..., 3]
    gyro: jnp.ndarray  # [..., 3]

    @classmethod
    def zeros(cls, batch=(), dtype=jnp.float32):
        quat = jnp.zeros((*batch, 4), dtype).at[..., 3].set(1.0)
        return cls(
            quat=quat,
            acc=jnp.zeros((*batch, 3), dtype),
            gyro=jnp.zeros((*batch, 3), dtype),
        )


@chex.dataclass(frozen=True)
class RobotCmd:
    """Joint command (limxsdk RobotCmd: mode, q, dq, tau, Kp, Kd)."""

    mode: jnp.ndarray  # [..., J] int32; 0 = torque mode (src/mpc_control.cpp:120)
    q: jnp.ndarray
    dq: jnp.ndarray
    tau: jnp.ndarray
    kp: jnp.ndarray
    kd: jnp.ndarray

    @classmethod
    def zeros(cls, batch=(), num_joints: int = 6, dtype=jnp.float32):
        z = jnp.zeros((*batch, num_joints), dtype)
        return cls(
            mode=jnp.zeros((*batch, num_joints), jnp.int32),
            q=z, dq=z, tau=z, kp=z, kd=z,
        )


@chex.dataclass(frozen=True)
class GaitState:
    """Pure-functional output of the gait clock (MPCController.h:61-75).

    left_swing        [...]  bool: True when the left leg is in swing
    phase             [...]  time within the gait cycle (s)
    remain_swing_time [...]  time until the current swing leg lands (s)
    swing_progress    [...]  (swing_time - remain_swing_time)/swing_time in [0,1]
    """

    left_swing: jnp.ndarray
    phase: jnp.ndarray
    remain_swing_time: jnp.ndarray
    swing_progress: jnp.ndarray


@chex.dataclass(frozen=True)
class QPSolution:
    """Result of a batched QP solve.

    u          [..., nz]  primal solution (stacked control sequence)
    iterations scalar     fixed iteration count actually run
    residual   [...]      final KKT/primal-dual residual norm (diagnostic;
                          surfaced as a batch mask for failure detection —
                          the reference merely prints the qpOASES code and
                          continues, src/QPSolver.cpp:98-105)
    """

    u: jnp.ndarray
    iterations: int
    residual: jnp.ndarray


@chex.dataclass(frozen=True)
class KFState:
    """Kalman filter state: 12-state (base pos, base vel, two foot positions)
    with covariance (include/stateEstimator.h:142-147)."""

    x_hat: jnp.ndarray  # [..., 12]
    p_cov: jnp.ndarray  # [..., 12, 12]

    @classmethod
    def initial(cls, batch=(), initial_covariance: float = 100.0,
                dtype=jnp.float32):
        eye = jnp.broadcast_to(
            jnp.eye(12, dtype=dtype) * initial_covariance, (*batch, 12, 12))
        return cls(x_hat=jnp.zeros((*batch, 12), dtype), p_cov=eye)
