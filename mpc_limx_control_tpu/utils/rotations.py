"""Rotation utilities (quaternion / Euler / rotation matrix), batched.

Quaternions are (x, y, z, w) to match the limxsdk/reference layout
(include/state_estimator_fake.h:69-72).  ZYX Euler convention matches the
reference's quatToZyx (include/stateEstimator.h:76-84): zyx = (yaw, pitch,
roll); separately rpy = (roll, pitch, yaw) as used by the fake estimator's
tf::Matrix3x3::getRPY (include/state_estimator_fake.h:60-67).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (x,y,z,w) -> [..., 3, 3] world-from-body rotation."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = 2.0 / jnp.maximum(n, 1e-12)
    xx, yy, zz = s * x * x, s * y * y, s * z * z
    xy, xz, yz = s * x * y, s * x * z, s * y * z
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    return jnp.stack([
        jnp.stack([1 - (yy + zz), xy - wz, xz + wy], -1),
        jnp.stack([xy + wz, 1 - (xx + zz), yz - wx], -1),
        jnp.stack([xz - wy, yz + wx, 1 - (xx + yy)], -1),
    ], -2)


def quat_to_zyx(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [..., 3] ZYX Euler (yaw, pitch, roll), exactly the
    reference's quatToZyx including the 0.99999 asin clamp
    (include/stateEstimator.h:76-84)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    as_ = jnp.minimum(-2.0 * (x * z - w * y), 0.99999)
    yaw = jnp.arctan2(2 * (x * y + w * z), w * w + x * x - y * y - z * z)
    pitch = jnp.arcsin(as_)
    roll = jnp.arctan2(2 * (y * z + w * x), w * w - x * x - y * y + z * z)
    return jnp.stack([yaw, pitch, roll], -1)


def quat_to_rpy(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [..., 3] (roll, pitch, yaw), the layout RobotOdomState.ori
    uses (include/state_estimator_fake.h:62-67)."""
    zyx = quat_to_zyx(q)
    return zyx[..., ::-1]


def rpy_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] (roll, pitch, yaw) -> [..., 4] (x,y,z,w)."""
    r, p, y = rpy[..., 0] / 2, rpy[..., 1] / 2, rpy[..., 2] / 2
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ], -1)


def rpy_to_rot(rpy: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] (roll, pitch, yaw) -> [..., 3, 3] = Rz(yaw)Ry(pitch)Rx(roll),
    the reference's getRotationMatrixFromZyxEulerAngles with zyx=(y,p,r)."""
    return quat_to_rot(rpy_to_quat(rpy))
