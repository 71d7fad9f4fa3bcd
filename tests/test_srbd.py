"""SRBD linearization tests: reference-literal parity + corrected physics."""

import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import RobotParams, SRBDConfig
from mpc_limx_control_tpu.models import srbd

ROBOT = RobotParams()


def test_reference_literal_matrices():
    """Bit-for-bit check against a hand transcription of
    include/mpcQP.h:139-181 (symmetric dPos block, -m input rows, -1
    gravity coupling)."""
    foot = np.array([0.1, -0.105, 0.0])
    base = np.array([0.02, 0.01, 0.6])
    d = foot - base
    dx, dy, dz = d

    Ac_ref = np.zeros((13, 13))
    Ac_ref[0, 7], Ac_ref[0, 8] = dz, dy
    Ac_ref[1, 6], Ac_ref[1, 8] = dz, dx
    Ac_ref[2, 6], Ac_ref[2, 7] = dy, dx
    Ac_ref[3, 9] = Ac_ref[4, 10] = Ac_ref[5, 11] = 1.0
    Ac_ref[11, 12] = -1.0
    Bc_ref = np.zeros((13, 3))
    Bc_ref[9, 0] = Bc_ref[10, 1] = Bc_ref[11, 2] = -ROBOT.mass

    Ac, Bc = srbd.linearize_reference_literal(
        ROBOT, jnp.asarray(foot), jnp.asarray(base), jnp.float64)
    np.testing.assert_allclose(np.asarray(Ac), Ac_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Bc), Bc_ref, atol=1e-12)


def test_corrected_physics_structure():
    foot = jnp.asarray([0.0, -0.105, 0.0], jnp.float64)
    base = jnp.asarray([0.0, 0.0, 0.65], jnp.float64)
    Ac, Bc = srbd.linearize(ROBOT, foot, base, jnp.asarray(0.0), jnp.float64)
    Ac, Bc = np.asarray(Ac), np.asarray(Bc)

    # Theta_dot = Rz(0)^T omega = omega
    np.testing.assert_allclose(Ac[0:3, 6:9], np.eye(3), atol=1e-12)
    # p_dot = v
    np.testing.assert_allclose(Ac[3:6, 9:12], np.eye(3), atol=1e-12)
    # gravity: v_z_dot picks +1 * g_state (g_state = -9.81 pulls down)
    assert Ac[11, 12] == 1.0
    # v_dot = f/m
    np.testing.assert_allclose(Bc[9:12, :], np.eye(3) / ROBOT.mass,
                               atol=1e-12)
    # omega_dot = I^-1 [r]x f: pushing up (fz>0) at y=-0.105 rolls negative
    tau_per_fz = Bc[6:9, 2]            # omega_dot per unit fz
    I = np.asarray(ROBOT.inertia).reshape(3, 3)
    r = np.asarray(foot - base)
    expected = np.linalg.solve(I, np.cross(r, [0.0, 0.0, 1.0]))
    np.testing.assert_allclose(tau_per_fz, expected, atol=1e-12)


def test_corrected_yaw_rotation():
    """At yaw = 90deg, Theta_dot block must be Rz(pi/2)^T."""
    foot = jnp.zeros(3, jnp.float64)
    base = jnp.asarray([0.0, 0.0, 0.65], jnp.float64)
    yaw = jnp.asarray(np.pi / 2)
    Ac, _ = srbd.linearize(ROBOT, foot, base, yaw, jnp.float64)
    rzT = np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(Ac)[0:3, 6:9], rzT, atol=1e-9)


def test_equilibrium_forces():
    """At rest with feet under the COM, fz = m g / 2 per foot solves the
    continuous dynamics exactly (v_dot = omega_dot = 0)."""
    base = jnp.asarray([0.0, 0.0, 0.65], jnp.float64)
    foot_l = jnp.asarray([0.0, 0.105, 0.0], jnp.float64)
    foot_r = jnp.asarray([0.0, -0.105, 0.0], jnp.float64)
    _, Bc_l = srbd.linearize(ROBOT, foot_l, base, jnp.asarray(0.0),
                             jnp.float64)
    Ac, Bc_r = srbd.linearize(ROBOT, foot_r, base, jnp.asarray(0.0),
                              jnp.float64)
    xi = srbd.initial_state(jnp.zeros(3, jnp.float64), base,
                            jnp.zeros(3, jnp.float64),
                            jnp.zeros(3, jnp.float64))
    fz = ROBOT.mass * 9.81 / 2
    u = jnp.asarray([0.0, 0.0, fz], jnp.float64)
    xdot = Ac @ xi + Bc_l @ u + Bc_r @ u
    np.testing.assert_allclose(np.asarray(xdot), np.zeros(13), atol=1e-9)


def test_friction_cone_rows():
    cfg = SRBDConfig()
    G, h = srbd.friction_cone_rows(cfg, 2, jnp.float64)
    assert G.shape == (12, 6) and h.shape == (12,)
    # a force inside the cone satisfies all rows
    f_ok = np.array([0.1, -0.1, 50.0, 0.0, 0.0, 10.0])
    assert (np.asarray(G) @ f_ok <= np.asarray(h) + 1e-12).all()
    # violating |fx| <= mu fz fails
    f_bad = np.array([40.0, 0.0, 50.0, 0.0, 0.0, 10.0])
    assert not (np.asarray(G) @ f_bad <= np.asarray(h)).all()


def test_walking_reference_parity():
    """Reference-trajectory structure of include/mpcQP.h:74-97: yaw ramps
    at omega_yaw, x at velocity_x, step 0 keeps measured velocity."""
    cfg = SRBDConfig()          # ts = 1 ms, N = 20, literal knobs
    xi0 = srbd.initial_state(
        jnp.asarray([0.01, -0.02, 0.3]), jnp.asarray([1.0, 2.0, 0.6]),
        jnp.asarray([0.0, 0.0, 0.05]), jnp.asarray([0.2, 0.0, 0.0]),
        g_state=-9.8)
    ref = srbd.walking_reference(
        xi0, cfg, cfg.horizon,
        v_des=jnp.asarray([cfg.ref_velocity_x, 0.0, 0.0]),
        yaw_rate=jnp.asarray(cfg.ref_yaw_rate))
    ref = np.asarray(ref)
    for i in [0, 5, 20]:
        t = i * cfg.ts
        np.testing.assert_allclose(ref[i, 2], 0.3 + t * 0.1, atol=1e-6)
        np.testing.assert_allclose(ref[i, 3], 1.0 + t * 0.5, atol=1e-6)
        np.testing.assert_allclose(ref[i, 12], -9.8, atol=1e-6)
    np.testing.assert_allclose(ref[0, 9], 0.2, atol=1e-6)   # measured v
    np.testing.assert_allclose(ref[1:, 9], 0.5, atol=1e-6)  # desired v
