"""Leg kinematics tests: FK consistency, IK round trips, Jacobians."""

import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import LegOffsets, RobotParams
from mpc_limx_control_tpu.models import kinematics as kin


def test_home_pose_matches_static_offsets():
    """FK at q=0 must equal the chained static offsets
    (include/MPCParam.h:64-72 computes the same sums)."""
    off = LegOffsets()
    gl = kin.leg_geometry(off, "left", jnp.float64)
    p = np.asarray(kin.forward_kinematics(gl, jnp.zeros(3, jnp.float64)))
    expected = (np.asarray(off.abad_offset) + np.asarray(off.hip_offset)
                + np.asarray(off.knee_offset) + np.asarray(off.foot_offset)
                + np.asarray(off.contact_offset))
    np.testing.assert_allclose(p, expected, atol=1e-12)


def test_right_leg_mirrors_left():
    off = LegOffsets()
    gl = kin.leg_geometry(off, "left", jnp.float64)
    gr = kin.leg_geometry(off, "right", jnp.float64)
    q = jnp.asarray([0.3, -0.4, 0.7], jnp.float64)
    q_mirror = jnp.asarray([-0.3, -0.4, 0.7], jnp.float64)
    pl = np.asarray(kin.forward_kinematics(gl, q))
    pr = np.asarray(kin.forward_kinematics(gr, q_mirror))
    np.testing.assert_allclose(pl * np.array([1, -1, 1]), pr, atol=1e-12)


def test_analytic_ik_round_trip():
    rng = np.random.default_rng(7)
    gl = kin.leg_geometry(LegOffsets(), "left", jnp.float64)
    qs = jnp.asarray(rng.uniform(-0.8, 0.8, (64, 3)))
    targets = kin.forward_kinematics(gl, qs)
    guess = qs + jnp.asarray(rng.uniform(-0.3, 0.3, (64, 3)))
    q_ik = kin.inverse_kinematics_analytic(gl, targets, guess)
    p_rt = kin.forward_kinematics(gl, q_ik)
    assert float(jnp.max(jnp.abs(p_rt - targets))) < 1e-10


def test_damped_ls_ik_converges():
    """The iterative fallback hits the reference budget: <= 10 iterations,
    tol 1e-3 (include/pinocchio_kinematics.h:61)."""
    rng = np.random.default_rng(8)
    gl = kin.leg_geometry(LegOffsets(), "left", jnp.float64)
    qs = jnp.asarray(rng.uniform(-0.6, 0.6, (32, 3)))
    targets = kin.forward_kinematics(gl, qs)
    q0 = qs + jnp.asarray(rng.uniform(-0.2, 0.2, (32, 3)))
    q_ik = kin.inverse_kinematics_damped_ls(gl, targets, q0, iters=10)
    err = jnp.linalg.norm(kin.forward_kinematics(gl, q_ik) - targets,
                          axis=-1)
    assert float(jnp.max(err)) < 1e-3


def test_jacobian_matches_finite_differences():
    gl = kin.leg_geometry(LegOffsets(), "left", jnp.float64)
    q = jnp.asarray([0.2, -0.5, 0.9], jnp.float64)
    J = np.asarray(kin.contact_jacobian(gl, q))
    eps = 1e-7
    for j in range(3):
        dq = jnp.zeros(3, jnp.float64).at[j].set(eps)
        fd = (np.asarray(kin.forward_kinematics(gl, q + dq))
              - np.asarray(kin.forward_kinematics(gl, q - dq))) / (2 * eps)
        np.testing.assert_allclose(J[:, j], fd, atol=1e-6)


def test_unreachable_target_saturates():
    """Targets beyond the leg workspace clamp to maximum extension instead
    of producing NaN."""
    gl = kin.leg_geometry(LegOffsets(), "left", jnp.float64)
    target = jnp.asarray([0.0, 0.105, -2.0], jnp.float64)  # far below
    q = kin.inverse_kinematics_analytic(gl, target, jnp.zeros(3))
    assert not bool(jnp.isnan(q).any())
    p = kin.forward_kinematics(gl, q)
    # foot points toward the target at maximum reach
    assert float(p[2]) < -0.7


def test_full_fk_both_legs():
    q6 = jnp.zeros(6, jnp.float64)
    pl, pr = kin.full_fk(LegOffsets(), q6)
    assert pl.shape == (3,) and pr.shape == (3,)
    np.testing.assert_allclose(np.asarray(pl)[0], np.asarray(pr)[0],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(pl)[1], -np.asarray(pr)[1],
                               atol=1e-12)
