"""Leg inverse dynamics: recursive Newton-Euler (RNEA) for the 3-DoF
point-foot leg chain.

Capability parity with `PinocchioKinematics::inverseDynamics`
(include/pinocchio_kinematics.h:46-48), which calls pinocchio::rnea on the
URDF model.  The URDF is not shipped with the reference (hardcoded
external path, include/pinocchio_kinematics.h:24), so link inertial
parameters are configurable with documented engineering estimates as
defaults (chain offsets are the exact `kinematicValues` of
include/MPCParam.h:13-38 via models/kinematics.py).

Fixed-base chain, joint axes (roll, pitch, pitch), fully batched and
unrolled (3 links): tau = RNEA(q, dq, ddq, gravity).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from mpc_limx_control_tpu.core.config import LegOffsets
from mpc_limx_control_tpu.models.kinematics import _rx, _ry, leg_geometry


@dataclasses.dataclass(frozen=True)
class LegInertialParams:
    """Per-link mass (kg), COM offset in link frame (m), and diagonal
    rotational inertia about the COM (kg m^2).  Defaults are engineering
    estimates for a ~1.8 kg TRON1 leg (trunk carries the rest of the
    9.585 kg total, include/mpcQP.h:18)."""

    masses: Tuple[float, float, float] = (0.7, 0.8, 0.3)
    # COM at roughly half the next-link offset
    com_abad: Tuple[float, float, float] = (-0.04, 0.01, 0.0)
    com_hip: Tuple[float, float, float] = (-0.075, -0.01, -0.13)
    com_knee: Tuple[float, float, float] = (0.07, 0.0, -0.145)
    inertia_abad: Tuple[float, float, float] = (1e-3, 1e-3, 1e-3)
    inertia_hip: Tuple[float, float, float] = (8e-3, 8e-3, 1e-3)
    inertia_knee: Tuple[float, float, float] = (3e-3, 3e-3, 5e-4)


def _axis_x(dtype):
    return jnp.asarray([1.0, 0.0, 0.0], dtype)


def _axis_y(dtype):
    return jnp.asarray([0.0, 1.0, 0.0], dtype)


def rnea(q: jnp.ndarray, dq: jnp.ndarray, ddq: jnp.ndarray,
         offsets: LegOffsets = LegOffsets(),
         params: LegInertialParams = LegInertialParams(),
         side: str = "left",
         gravity: float = 9.81) -> jnp.ndarray:
    """Joint torques for the prescribed motion.  q/dq/ddq [..., 3].

    Standard RNEA: outward recursion propagates angular velocity/
    acceleration and linear acceleration link to link; inward recursion
    accumulates forces/moments and projects onto the joint axes.
    Gravity is handled by accelerating the base frame upward.
    """
    dtype = q.dtype
    geom = leg_geometry(offsets, side, dtype)
    mirror = 1.0 if side == "left" else -1.0

    # joint rotation matrices (parent <- link) and axes in link frame
    R1 = _rx(q[..., 0])
    R2 = _ry(q[..., 1])
    R3 = _ry(q[..., 2])
    rots = [R1, R2, R3]
    axes = [_axis_x(dtype), _axis_y(dtype), _axis_y(dtype)]
    # joint position offsets in the PARENT frame
    joints_pos = [geom.abad, geom.hip, geom.knee]
    masses = [jnp.asarray(m, dtype) for m in params.masses]
    coms = [jnp.asarray(c, dtype)
            * jnp.asarray([1.0, mirror, 1.0], dtype)
            for c in (params.com_abad, params.com_hip, params.com_knee)]
    inertias = [jnp.diag(jnp.asarray(i, dtype))
                for i in (params.inertia_abad, params.inertia_hip,
                          params.inertia_knee)]

    batch = q.shape[:-1]
    zero3 = jnp.zeros((*batch, 3), dtype)
    g_base = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, gravity], dtype), (*batch, 3))

    # ---- outward recursion (quantities in each link's own frame)
    w = zero3            # angular velocity of base
    dw = zero3
    a = g_base           # base linear acceleration trick: +g upward
    w_l, dw_l, ac_l = [], [], []
    for i in range(3):
        Rt = jnp.swapaxes(rots[i], -1, -2)     # link <- parent
        ax = axes[i]
        qd = dq[..., i:i + 1]
        qdd = ddq[..., i:i + 1]
        w_new = jnp.einsum("...ij,...j->...i", Rt, w) + ax * qd
        dw_new = (jnp.einsum("...ij,...j->...i", Rt, dw)
                  + jnp.cross(jnp.einsum("...ij,...j->...i", Rt, w),
                              ax * qd)
                  + ax * qdd)
        # acceleration of the link origin
        a_parent_at_joint = (
            a + jnp.cross(dw, jnp.broadcast_to(joints_pos[i], (*batch, 3)))
            + jnp.cross(w, jnp.cross(
                w, jnp.broadcast_to(joints_pos[i], (*batch, 3)))))
        a_new = jnp.einsum("...ij,...j->...i", Rt, a_parent_at_joint)
        # COM acceleration
        ac = (a_new + jnp.cross(dw_new,
                                jnp.broadcast_to(coms[i], (*batch, 3)))
              + jnp.cross(w_new, jnp.cross(
                  w_new, jnp.broadcast_to(coms[i], (*batch, 3)))))
        w, dw, a = w_new, dw_new, a_new
        w_l.append(w_new)
        dw_l.append(dw_new)
        ac_l.append(ac)

    # ---- inward recursion
    f_child = zero3
    n_child = zero3
    taus = [None, None, None]
    for i in (2, 1, 0):
        F = masses[i] * ac_l[i]
        Iw = jnp.einsum("ij,...j->...i", inertias[i], w_l[i])
        N = (jnp.einsum("ij,...j->...i", inertias[i], dw_l[i])
             + jnp.cross(w_l[i], Iw))
        if i < 2:
            # rotate child wrench into this frame and shift its moment
            Rc = rots[i + 1]
            f_c = jnp.einsum("...ij,...j->...i", Rc, f_child)
            n_c = (jnp.einsum("...ij,...j->...i", Rc, n_child)
                   + jnp.cross(jnp.broadcast_to(
                       joints_pos[i + 1], (*batch, 3)), f_c))
        else:
            f_c = zero3
            n_c = zero3
        f = F + f_c
        n = N + jnp.cross(jnp.broadcast_to(coms[i], (*batch, 3)), F) + n_c
        taus[i] = jnp.sum(n * axes[i], axis=-1)
        f_child, n_child = f, n

    return jnp.stack(taus, axis=-1)


def gravity_torques(q: jnp.ndarray, **kw) -> jnp.ndarray:
    """tau = RNEA(q, 0, 0): static gravity compensation torques."""
    z = jnp.zeros_like(q)
    return rnea(q, z, z, **kw)
