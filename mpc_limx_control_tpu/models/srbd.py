"""Single-rigid-body dynamics (SRBD) linearization for stance-force MPC.

The reference's intended formulation lives in include/mpcQP.h (13-state
x = [theta_rpy(3), p(3), omega(3), v(3), g], u = support-foot GRF(3)), but
is dead code with physics bugs its own TODOs flag:

  * Bc uses -m where 1/m belongs (include/mpcQP.h:178-181)
  * the "skew" dPos matrix is symmetric, not skew (include/mpcQP.h:142-145)
  * the yaw rotation block of Ac is never filled (include/mpcQP.h:149)
  * inertia^-1 coupling (inB) is computed but unused (include/mpcQP.h:146-148)
  * gravity row signs make v_z feel +9.8 upward (include/mpcQP.h:165 with
    x13 = -9.8 at :71)

Two vmappable linearizations are provided:

* :func:`linearize_reference_literal` — bit-for-bit the matrices of
  include/mpcQP.h:152-181, for parity testing against the reference.
* :func:`linearize` — the corrected convex MPC of Di Carlo et al. (2018),
  "Dynamic Locomotion in the MIT Cheetah 3 Through Convex Model-Predictive
  Control": Theta_dot = Rz(psi)^T omega, p_dot = v,
  omega_dot = I_w^{-1} [r]x f, v_dot = f/m + gravity, with gravity carried
  by the 13th state.  Supports per-step foot positions (contact-scheduled
  LTV horizon) and both feet (nu = 3 per stance foot).
"""

from __future__ import annotations

import jax.numpy as jnp

from mpc_limx_control_tpu.core.config import RobotParams, SRBDConfig


def _skew(r):
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([o, -z, y], -1),
        jnp.stack([z, o, -x], -1),
        jnp.stack([-y, x, o], -1),
    ], -2)


def inertia_matrix(robot: RobotParams, dtype=jnp.float32):
    return jnp.asarray(robot.inertia, dtype).reshape(3, 3)


def linearize(robot: RobotParams, foot_pos: jnp.ndarray,
              base_pos: jnp.ndarray, yaw: jnp.ndarray,
              dtype=jnp.float32):
    """Corrected SRBD continuous-time (Ac [...,13,13], Bc [...,13,3]).

    foot_pos/base_pos [..., 3] world frame; yaw [...] the operating yaw.
    State: [theta(3), p(3), omega_world(3), v(3), g_state] with
    g_state ~ gravity magnitude carried as a constant state (reference
    layout, include/mpcQP.h:66-71); v_z row couples +1 * g_state with
    g_state = -9.81 so gravity pulls down.
    Inertia is rotated to world at the operating yaw: I_w = Rz I Rz^T.
    """
    batch = jnp.broadcast_shapes(foot_pos.shape[:-1], base_pos.shape[:-1],
                                 jnp.shape(yaw))
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    o = jnp.zeros_like(c)
    i = jnp.ones_like(c)
    rz = jnp.stack([
        jnp.stack([c, -s, o], -1),
        jnp.stack([s, c, o], -1),
        jnp.stack([o, o, i], -1),
    ], -2)                                            # [..., 3, 3]
    rzT = jnp.swapaxes(rz, -1, -2)

    I_body = inertia_matrix(robot, dtype)
    I_w = rz @ I_body @ rzT
    I_w_inv = jnp.linalg.inv(I_w)

    r = foot_pos - base_pos                            # moment arm
    r_skew = _skew(r)

    Ac = jnp.zeros((*batch, 13, 13), dtype)
    Ac = Ac.at[..., 0:3, 6:9].set(rzT)                 # Theta_dot = Rz^T w
    eye3 = jnp.eye(3, dtype=dtype)
    Ac = Ac.at[..., 3:6, 9:12].set(eye3)               # p_dot = v
    Ac = Ac.at[..., 11, 12].set(1.0)                   # v_z_dot += g_state

    Bc = jnp.zeros((*batch, 13, 3), dtype)
    Bc = Bc.at[..., 6:9, :].set(I_w_inv @ r_skew)      # w_dot = I^-1 [r]x f
    Bc = Bc.at[..., 9:12, :].set(eye3 / robot.mass)    # v_dot = f/m
    return Ac, Bc


def linearize_shared(robot: RobotParams, arms: jnp.ndarray,
                     base_pos: jnp.ndarray, yaw: jnp.ndarray,
                     dtype=jnp.float32):
    """Corrected SRBD linearization with the yaw-dependent pieces computed
    ONCE and shared across K moment arms.

    arms [..., K, 3]; base_pos [..., 3]; yaw [...].
    Returns (Ac [..., 13, 13], Bc [..., K, 13, 3]).

    Equivalent to vmapping :func:`linearize` over K, but ~N times cheaper
    inside the contact-scheduled MPC: Ac, Rz, and I_w^{-1} do not depend
    on the arm, and the matrices are assembled by block concatenation
    (no scatter updates).
    """
    batch = jnp.broadcast_shapes(arms.shape[:-2], base_pos.shape[:-1],
                                 jnp.shape(yaw))
    K = arms.shape[-2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    o = jnp.zeros_like(c)
    i = jnp.ones_like(c)
    rz = jnp.stack([
        jnp.stack([c, -s, o], -1),
        jnp.stack([s, c, o], -1),
        jnp.stack([o, o, i], -1),
    ], -2)
    rzT = jnp.swapaxes(rz, -1, -2)
    I_body = inertia_matrix(robot, dtype)
    I_w_inv = jnp.linalg.inv(rz @ I_body @ rzT)

    z = jnp.zeros((*batch, 3, 1), dtype)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch, 3, 3))
    zeros33 = jnp.zeros((*batch, 3, 3), dtype)
    g_col = jnp.broadcast_to(
        jnp.asarray([[0.0], [0.0], [1.0]], dtype), (*batch, 3, 1))
    row_theta = jnp.concatenate(
        [zeros33, zeros33, jnp.broadcast_to(rzT, (*batch, 3, 3)), zeros33,
         z], -1)
    row_p = jnp.concatenate([zeros33, zeros33, zeros33, eye3, z], -1)
    row_w = jnp.concatenate([zeros33] * 4 + [z], -1)
    row_v = jnp.concatenate([zeros33, zeros33, zeros33, zeros33, g_col], -1)
    row_g = jnp.zeros((*batch, 1, 13), dtype)
    Ac = jnp.concatenate([row_theta, row_p, row_w, row_v, row_g], -2)

    r = arms - base_pos[..., None, :]                    # [..., K, 3]
    torque = jnp.einsum("...ij,...kjl->...kil", I_w_inv, _skew(r))
    zK = jnp.zeros((*batch, K, 6, 3), dtype)
    eyeK = jnp.broadcast_to(jnp.eye(3, dtype=dtype) / robot.mass,
                            (*batch, K, 3, 3))
    lastK = jnp.zeros((*batch, K, 1, 3), dtype)
    Bc = jnp.concatenate([zK, torque, eyeK, lastK], -2)
    return Ac, Bc


def discretize_srbd(Ac: jnp.ndarray, Bc: jnp.ndarray, ts: float):
    """EXACT ZOH for the corrected SRBD: Ac is nilpotent of index 3
    (Theta<-omega and p<-v<-g are the only couplings), so

        Ad = I + Ac ts + Ac^2 ts^2/2
        Bd = (I ts + Ac ts^2/2 + Ac^2 ts^3/6) Bc

    with no series truncation.  Bc may carry extra leading axes (e.g. a
    per-arm axis [..., K, 13, 3]); Ac is [..., 13, 13].
    """
    nx = Ac.shape[-1]
    eye = jnp.eye(nx, dtype=Ac.dtype)
    Ac2 = Ac @ Ac
    Ad = eye + Ac * ts + Ac2 * (ts * ts / 2.0)
    S = eye * ts + Ac * (ts * ts / 2.0) + Ac2 * (ts ** 3 / 6.0)
    if Bc.ndim == Ac.ndim + 1:
        Bd = jnp.einsum("...ij,...kjl->...kil", S, Bc)
    else:
        Bd = S @ Bc
    return Ad, Bd


def srbd_step_vector(robot: RobotParams, xi: jnp.ndarray,
                     feet: jnp.ndarray, forces: jnp.ndarray, ts: float):
    """Exact-ZOH SRBD plant step in explicit VECTOR form — identical math
    to ``discretize_srbd(linearize_shared(...)) @ xi + Bd @ u`` but with no
    13x13/13x6 matrices ever formed.

    The plant tick of the rollout harness (the x <- Ad x + Bd u of
    src/QPSolver.cpp:108-111) only needs the next state vector; building
    the batched Ad/Bd matrices costs ~30 HBM-round-tripping XLA ops per
    tick at [B,13,13].  With Ac nilpotent of index 3 the exact update is
    closed-form in 3-vector arithmetic (derivation in discretize_srbd's
    docstring):

        wd        = I_w^{-1} sum_k (r_k x f_k)      (world inertia)
        ad        = sum_k f_k / m + g_state e_z
        theta_new = theta + ts Rz^T w + ts^2/2 Rz^T wd
        p_new     = p + ts v + ts^2/2 ad
        w_new     = w + ts wd
        v_new     = v + ts ad

    xi [..., 13]; feet [..., K, 3] world foot positions; forces [..., K, 3]
    world GRFs (zero for swing feet).  Returns xi_new [..., 13].
    """
    dtype = xi.dtype
    theta = xi[..., 0:3]
    p = xi[..., 3:6]
    w = xi[..., 6:9]
    v = xi[..., 9:12]
    g_state = xi[..., 12]

    yaw = theta[..., 2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)

    def rz_t(u):          # Rz(yaw)^T @ u
        return jnp.stack([c * u[..., 0] + s * u[..., 1],
                          -s * u[..., 0] + c * u[..., 1],
                          u[..., 2]], -1)

    def rz(u):            # Rz(yaw) @ u
        return jnp.stack([c * u[..., 0] - s * u[..., 1],
                          s * u[..., 0] + c * u[..., 1],
                          u[..., 2]], -1)

    r = feet - p[..., None, :]
    tau_w = jnp.cross(r, forces).sum(-2)
    f_tot = forces.sum(-2)

    # I_w^{-1} tau = Rz I_body^{-1} Rz^T tau (I_body^{-1} is a trace-time
    # constant)
    import numpy as _np
    I_inv = jnp.asarray(
        _np.linalg.inv(_np.asarray(robot.inertia,
                                   _np.float64).reshape(3, 3)), dtype)
    wd = rz(jnp.einsum("ij,...j->...i", I_inv, rz_t(tau_w)))
    ad = f_tot / robot.mass + g_state[..., None] * jnp.asarray(
        [0.0, 0.0, 1.0], dtype)

    half = ts * ts / 2.0
    theta_new = theta + ts * rz_t(w) + half * rz_t(wd)
    p_new = p + ts * v + half * ad
    w_new = w + ts * wd
    v_new = v + ts * ad
    return jnp.concatenate(
        [theta_new, p_new, w_new, v_new, g_state[..., None]], -1)


def linearize_reference_literal(robot: RobotParams, foot_pos: jnp.ndarray,
                                base_pos: jnp.ndarray, dtype=jnp.float32):
    """The exact (buggy) matrices of include/mpcQP.h:139-181, kept for
    parity validation of the condensation/solve path on identical inputs."""
    d = foot_pos - base_pos
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    batch = d.shape[:-1]
    o = jnp.zeros_like(dx)

    Ac = jnp.zeros((*batch, 13, 13), dtype)
    # rows 1-3, cols 7-9: the symmetric "dPos" block (include/mpcQP.h:154-156)
    Ac = Ac.at[..., 0, 7].set(dz)
    Ac = Ac.at[..., 0, 8].set(dy)
    Ac = Ac.at[..., 1, 6].set(dz)
    Ac = Ac.at[..., 1, 8].set(dx)
    Ac = Ac.at[..., 2, 6].set(dy)
    Ac = Ac.at[..., 2, 7].set(dx)
    # rows 4-6: velocity integration (include/mpcQP.h:157-159)
    Ac = Ac.at[..., 3, 9].set(1.0)
    Ac = Ac.at[..., 4, 10].set(1.0)
    Ac = Ac.at[..., 5, 11].set(1.0)
    # row 12: gravity coupling -1 on col 13 (include/mpcQP.h:165)
    Ac = Ac.at[..., 11, 12].set(-1.0)

    Bc = jnp.zeros((*batch, 13, 3), dtype)
    # rows 10-12 = -m * I (include/mpcQP.h:178-180, the flagged bug)
    Bc = Bc.at[..., 9, 0].set(-robot.mass)
    Bc = Bc.at[..., 10, 1].set(-robot.mass)
    Bc = Bc.at[..., 11, 2].set(-robot.mass)
    del o
    return Ac, Bc


def friction_cone_rows(cfg: SRBDConfig, N: int, dtype=jnp.float32):
    """Per-horizon input constraint rows G_u u_k <= h_u, stacked over k.

    Pyramidal friction cone for each stance GRF (corrected physics —
    replaces the reference's placeholder +/-8 N box, include/mpcQP.h:59):
        |fx| <= mu fz,  |fy| <= mu fz,  fz_min <= fz <= fz_max.
    Returns (G [6N, 3N], h [6N]).
    """
    mu = cfg.friction_mu
    Gu = jnp.asarray([
        [1.0, 0.0, -mu],
        [-1.0, 0.0, -mu],
        [0.0, 1.0, -mu],
        [0.0, -1.0, -mu],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
    ], dtype)
    hu = jnp.asarray([0.0, 0.0, 0.0, 0.0, cfg.fz_max, -cfg.fz_min], dtype)
    eye = jnp.eye(N, dtype=dtype)
    G = jnp.kron(eye, Gu)
    h = jnp.tile(hu, N)
    return G, h


def initial_state(orientation, position, angular_velocity, velocity,
                  g_state: float = -9.81):
    """Pack xi = [theta, p, omega, v, g] (include/mpcQP.h:66-71; the
    reference literal uses -9.8)."""
    g = jnp.full((*orientation.shape[:-1], 1), g_state, orientation.dtype)
    return jnp.concatenate(
        [orientation, position, angular_velocity, velocity, g], axis=-1)


def walking_reference(xi0: jnp.ndarray, cfg: SRBDConfig, N: int,
                      v_des: jnp.ndarray, yaw_rate: jnp.ndarray,
                      height_des: float | None = None,
                      pos_anchor: jnp.ndarray | None = None,
                      yaw_anchor: jnp.ndarray | None = None):
    """Reference trajectory [..., N+1, 13] from the current state.

    Generalizes include/mpcQP.h:74-97 (which hardcodes yaw rate 0.1 and
    vx 0.5): orientation held except yaw integrating yaw_rate; position
    integrating v_des; angular velocity = (0,0,yaw_rate); velocity = v_des
    (step 0 keeps the measured velocity, :89-93); g row constant.

    yaw_anchor [...] : absolute yaw the ramp originates from (the
    band-clipped persistent heading anchor, cfg.yaw_anchor_band); None =
    the receding form (origin at the measured yaw, include/mpcQP.h:74-76).

    Roll/pitch rows follow cfg.attitude_ref: "level" (default) sets them
    to zero so the MPC actively restores posture; "receding" keeps the
    measured attitude as the reference (the include/mpcQP.h:74-97 form,
    parity only) — under which attitude is merely rate-damped and a
    stance-torque bias integrates unchecked (~0.023 rad/s pitch drift,
    gait collapse at ~41 s in the round-5 60k-tick soak).
    """
    dtype = xi0.dtype
    ts = cfg.ts
    t = jnp.arange(N + 1, dtype=dtype) * ts            # [N+1]
    ref = jnp.broadcast_to(xi0[..., None, :],
                           (*xi0.shape[:-1], N + 1, 13))
    if cfg.attitude_ref == "level":
        ref = ref.at[..., 0:2].set(0.0)
    yaw0 = xi0[..., 2:3] if yaw_anchor is None else yaw_anchor[..., None]
    yaw = yaw0 + t * yaw_rate[..., None]
    # receding reference (position pinned at the measured state, as the
    # reference does, include/mpcQP.h:83-85) unless an absolute anchor is
    # given (standing balance: drive the COM over the support point —
    # necessary because a point-foot robot's x-dynamics are an inverted
    # pendulum that a receding reference cannot stabilize).
    origin = xi0[..., None, 3:6] if pos_anchor is None \
        else pos_anchor[..., None, :]
    pos = origin + t[..., :, None] * v_des[..., None, :]
    omega = jnp.zeros((*xi0.shape[:-1], N + 1, 3), dtype)
    omega = omega.at[..., 2].set(yaw_rate[..., None])
    vel = jnp.broadcast_to(v_des[..., None, :],
                           (*xi0.shape[:-1], N + 1, 3))
    # step 0 keeps measured velocity (include/mpcQP.h:89-93)
    vel = jnp.concatenate([xi0[..., None, 9:12], vel[..., 1:, :]], axis=-2)
    if height_des is not None:
        pos = pos.at[..., 2].set(height_des)

    ref = ref.at[..., 2].set(yaw)
    ref = ref.at[..., 3:6].set(pos)
    ref = ref.at[..., 6:9].set(omega)
    ref = ref.at[..., 9:12].set(vel)
    return ref
