"""Whole-tick fused Pallas kernel: the ENTIRE walking plant tick in VMEM.

After the fused MPC kernel (ops/mpc_fused_pallas.py) collapsed the
condensation+solve to ~6.5 ms at B=4096, the OTHER half of the tick —
gait clock, foot placement, swing trajectory, FK, analytic IK, SRBD plant
step, foot pinning (reference call stack MPC::run,
include/MPCController.h:183-196, plus the plant x<-Ad x+Bd u of
src/QPSolver.cpp:108-111) — became the bottleneck: ~100 small
fusion-bounded XLA ops, each a [B, <16]-shaped HBM round trip
(tools/archive/profile_rest.py: ~4.8 ms at B=4096).

This kernel runs ONE complete simulation tick per 128-lane block with no
HBM intermediates:

  1. gait clock + capture-point foot placement + sinusoidal swing
     trajectory (control/gait.py math, batch-last);
  2. both-leg closed-form FK and the one swing-leg analytic IK
     (models/kinematics.py math; acos realized as atan2(sqrt(1-c^2), c));
  3. contact schedule + moment-arm synthesis over the horizon;
  4. the full prep-fused MPC solve (_prep_mpc: SRBD linearization, exact
     nilpotent ZOH, walking reference, band condensation, Cholesky, warm
     ADMM) re-entered in-kernel;
  5. the exact-ZOH SRBD plant step in vector form
     (models/srbd.py:srbd_step_vector math);
  6. next-tick foot/joint kinematics (swing FK + stance pinning IK).

All per-lane math is elementwise VPU work on [k, 128] tiles; the only MXU
ops are the cone matvecs inside the ADMM loop (precision=HIGHEST — see
NOTES.md on the bf16 silent-degradation class).

Numerics match the unfused composition (control/rollout.py:_plant_step_ref)
to f32 roundoff; asserted by tests/test_tick_fused.py in interpreter mode
and by the on-chip bench quality gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_limx_control_tpu.ops.mpc_fused_pallas import (LANES, _pad_batch,
                                                       _prep_mpc)


def _atan(x):
    """Cephes-style f32 arctangent from Mosaic-lowerable primitives
    (Mosaic TPU has no atan/atan2/acos): range-reduce |x|>1 via
    atan(x) = pi/2 - atan(1/x), then z>tan(pi/8) via
    atan(z) = pi/4 + atan((z-1)/(z+1)), then the cephes atanf minimax
    polynomial (~1 ulp over the reduced range)."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-30), ax)
    red = z > 0.4142135623730951
    z = jnp.where(red, (z - 1.0) / (z + 1.0), z)
    w = z * z
    p = (((8.05374449538e-2 * w - 1.38776856032e-1) * w
          + 1.99777106478e-1) * w - 3.33329491539e-1) * w * z + z
    r = jnp.where(red, 0.7853981633974483 + p, p)
    r = jnp.where(inv, 1.5707963267948966 - r, r)
    return jnp.where(x < 0, -r, r)


def _atan2(y, x):
    """Quadrant-correct atan2 built on :func:`_atan`."""
    xs = jnp.where(x == 0.0, 1.0, x)
    q = _atan(y / xs)
    pi = 3.141592653589793
    q = jnp.where(x < 0.0, jnp.where(y < 0.0, q - pi, q + pi), q)
    return jnp.where(
        x == 0.0,
        jnp.where(y > 0.0, pi / 2, jnp.where(y < 0.0, -pi / 2, 0.0)),
        q)


def _acos(c):
    """arccos via atan2."""
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0)), c)


def _wrap(a):
    """Wrap angle to (-pi, pi]."""
    return _atan2(jnp.sin(a), jnp.cos(a))


def _fmod_pos(t, period: float):
    """t mod period for t >= 0 (floor form — avoids lax.rem sign fixups)."""
    return t - jnp.floor(t * (1.0 / period)) * period


def _cross(a, b):
    """[3, L] x [3, L] -> [3, L]."""
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1],
    ], axis=0)


def _rot_rpy(rpy):
    """[3, L] (roll, pitch, yaw) -> [3, 3, L] Rz(y)Ry(p)Rx(r)."""
    cr, sr = jnp.cos(rpy[0:1]), jnp.sin(rpy[0:1])
    cp, sp = jnp.cos(rpy[1:2]), jnp.sin(rpy[1:2])
    cy, sy = jnp.cos(rpy[2:3]), jnp.sin(rpy[2:3])
    r0 = jnp.concatenate([cy * cp, cy * sp * sr - sy * cr,
                          cy * sp * cr + sy * sr], axis=0)
    r1 = jnp.concatenate([sy * cp, sy * sp * sr + cy * cr,
                          sy * sp * cr - cy * sr], axis=0)
    r2 = jnp.concatenate([-sp, cp * sr, cp * cr], axis=0)
    return jnp.stack([r0, r1, r2], axis=0)


def _mv(R, v):
    """R [3,3,L] @ v [3,L] -> [3,L]."""
    return (R[:, 0, :] * v[0:1] + R[:, 1, :] * v[1:2]
            + R[:, 2, :] * v[2:3])


def _mtv(R, v):
    """R^T [3,3,L] @ v [3,L] -> [3,L]."""
    return R[0] * v[0:1] + R[1] * v[1:2] + R[2] * v[2:3]


def _tick_kernel(N: int, nx: int, nu: int, mu_: int, iters: int,
                 rho: float, alpha: float,
                 # static physics / gait / geometry (Python floats):
                 ts: float, dt: float, mass: float, height_des: float,
                 cycle: float, swing_t: float, stance_t: float,
                 gait_height: float, p_rel_max: float, ground_h: float,
                 k_cap: float, use_capture: bool, anchor_band: float,
                 anchor_gain: float, yaw_band: float,
                 off_l: tuple, off_r: tuple, geom: tuple,
                 stand: bool, est_kf: bool, est_c: tuple, hold: bool,
                 # refs (inputs):
                 xi_ref, xe_ref, q_ref, fl_ref, fr_ref, zw_ref, yw_ref,
                 anc_ref, it_ref, vdes_ref, wdes_ref,
                 qv_ref, pv_ref, dblk_ref, gmat_ref, gmt_ref, h_ref,
                 iinv_ref,
                 # with hold: +1 input (grf_held [6]); with est_kf:
                 # +4 inputs (kfx, kfP, prev_v, prev_q), +2 outputs
                 # (kfx', kfP'), +3 scratch (Skf, Xk, dgk) — parsed from
                 # *rest in pallas positional order
                 *rest,
                 prof_skip=(), solve_form="subst"):
    rest = list(rest)
    grf_in = rest.pop(0) if hold else None
    if est_kf:
        (kfx_in, kfp_in, pvel_in, pq_in,
         xi_out, q_out, fl_out, fr_out, z_out, y_out, anc_out,
         res_out, grf_out, tgt_out, kfx_out, kfp_out,
         S, w_ref, qe_ref, f_ref, dg_ref, Yv, ad_s, bd_s, arms_s,
         Skf, Xk, dgk) = rest
    else:
        (xi_out, q_out, fl_out, fr_out, z_out, y_out, anc_out,
         res_out, grf_out, tgt_out,
         S, w_ref, qe_ref, f_ref, dg_ref, Yv, ad_s, bd_s, arms_s) = rest
    L = LANES
    f32 = jnp.float32
    (ax_a, ay_a, az_a, hx, hy, hz, kx, ky, kz, fx, fy, fz) = geom
    # planar 2R constants of the analytic IK (models/kinematics.py:152-157)
    la2 = kx * kx + kz * kz
    lb2 = fx * fx + fz * fz
    rho_c = float(np.sqrt(la2 * lb2))
    psi = float(np.arctan2(kx * fz - kz * fx, kx * fx + kz * fz))
    y_chain_l = hy + ky + fy                   # left-side distal y offset

    xi = xi_ref[:]                                        # [13, L] truth
    xe = xe_ref[:]                                        # [13, L] estimate
    q6 = q_ref[:]                                         # [6, L]
    fl = fl_ref[:]                                        # [3, L]
    fr = fr_ref[:]                                        # [3, L]
    it = it_ref[:]                                        # [1, L]
    vdes = vdes_ref[:]                                    # [3, L]
    wdes = wdes_ref[:]                                    # [1, L]

    # plant-truth state (drives the SRBD step + foot pinning, §7-8)
    theta = xi[0:3]
    pos = xi[3:6]
    w_b = xi[6:9]
    vel = xi[9:12]
    g_state = xi[12:13]
    # controller-visible state (the odometry the control stack consumes:
    # truth mode passes xi twice; KF mode passes the filter estimate —
    # the split mirrors _plant_step_ref feeding ctrl.tick with `odom`
    # while stepping the plant from state.xi)
    th_e = xe[0:3]
    pos_e = xe[3:6]
    vel_e = xe[9:12]

    # ---- 1. gait clock (control/gait.py:gait_clock) -------------------
    t_now = it * dt
    phase = _fmod_pos(t_now, cycle)
    ls = (phase < swing_t).astype(f32)                    # left_swing [1,L]
    remain = jnp.where(ls > 0.5, swing_t - phase, cycle - phase)
    progress = (swing_t - remain) * (1.0 / swing_t)

    # ---- 2. FK both legs + world transform ----------------------------
    def fk_leg(q3, mir):
        """q3 [3,L], mir [1,L] (+1 left / -1 right) -> contact pos [3,L]
        in the base frame (models/kinematics.py:forward_kinematics with
        Ry(q1)Ry(q2) collapsed to Ry(q1+q2))."""
        c0, s0 = jnp.cos(q3[0:1]), jnp.sin(q3[0:1])
        c1, s1 = jnp.cos(q3[1:2]), jnp.sin(q3[1:2])
        q12 = q3[1:2] + q3[2:3]
        c12, s12 = jnp.cos(q12), jnp.sin(q12)
        ux = hx + c1 * kx + s1 * kz + c12 * fx + s12 * fz
        uy = y_chain_l * mir
        uz = hz - s1 * kx + c1 * kz - s12 * fx + c12 * fz
        px = ax_a + ux
        py = ay_a * mir + c0 * uy - s0 * uz
        pz = az_a + s0 * uy + c0 * uz
        return jnp.concatenate([px, py, pz], axis=0)

    one = jnp.ones((1, L), f32)

    def jac_vel(q3, dq3, mir):
        """Closed-form contact-Jacobian velocity J(q) dq [3, L] in the
        base frame (the analytic form of models/kinematics.py:
        contact_jacobian for the Rx(q0)Ry(q1)Ry(q2) chain)."""
        c0, s0 = jnp.cos(q3[0:1]), jnp.sin(q3[0:1])
        c1, s1 = jnp.cos(q3[1:2]), jnp.sin(q3[1:2])
        q12 = q3[1:2] + q3[2:3]
        c12, s12 = jnp.cos(q12), jnp.sin(q12)
        a1 = c1 * kx + s1 * kz
        b1 = -s1 * kx + c1 * kz
        a2 = c12 * fx + s12 * fz
        b2 = -s12 * fx + c12 * fz
        uy = y_chain_l * mir
        uz = hz + b1 + b2
        d0, d1, d2 = dq3[0:1], dq3[1:2], dq3[2:3]
        vx = d1 * (b1 + b2) + d2 * b2
        vz_pl = -(d1 * (a1 + a2) + d2 * a2)          # planar z-rate
        vy = d0 * (-s0 * uy - c0 * uz) - s0 * vz_pl
        vz = d0 * (c0 * uy - s0 * uz) + c0 * vz_pl
        return jnp.concatenate([vx, vy, vz], axis=0)

    # ---- 2a. in-kernel 12-state Kalman filter (est_kf) ----------------
    # (ops/kf.py math verbatim, batch-last: predict with IMU accel,
    # contact-gated noise x{high_suspect}, innovation Cholesky, covariance
    # symmetrization + xy conditioning — include/stateEstimator.h:217-306.
    # The structured C [14,12] never materializes: C P, S = C P C' + R and
    # the K-gain products are slice arithmetic on P's blocks.)
    if est_kf:
        (ipp, ipv, fpp, fsp, fsv, fhn, big, foot_rad) = est_c
        kfx = kfx_in[:]                                   # [12, L]
        P = kfp_in[:]                                     # [12, 12, L]
        pl_b = fk_leg(q6[0:3], one)
        pr_b = fk_leg(q6[3:6], -one)
        R_t = _rot_rpy(theta)                             # truth / IMU
        dqj = (q6 - pq_in[:]) * (1.0 / dt)
        omega_w = w_b
        # accel measurement: body-frame specific force rotated straight
        # back to world (R^T then R cancels exactly in the synthesized-
        # sensor loop; ops/kf.py:96 accel_world = R a_imu + g)
        a_w = (vel - pvel_in[:]) * (1.0 / dt)
        pl_w = _mv(R_t, pl_b)
        pr_w = _mv(R_t, pr_b)
        vl_w = _mv(R_t, jac_vel(q6[0:3], dqj[0:3], one)) \
            + _cross(omega_w, pl_w)
        vr_w = _mv(R_t, jac_vel(q6[3:6], dqj[3:6], -one)) \
            + _cross(omega_w, pr_w)
        zero1 = jnp.zeros((1, L), f32)
        rad = jnp.full((1, L), foot_rad, f32)
        y_obs = jnp.concatenate([
            -pl_w[0:2], rad - pl_w[2:3], -pr_w[0:2], rad - pr_w[2:3],
            -vl_w, -vr_w, zero1, zero1], axis=0)          # [14, L]

        # predict
        xp_a = kfx[0:3] + dt * kfx[3:6] + (0.5 * dt * dt) * a_w
        xp_b = kfx[3:6] + dt * a_w
        x_pred = jnp.concatenate([xp_a, xp_b, kfx[6:12]], axis=0)
        # contact gating from the gait clock (walk: left stance = !ls;
        # stand: both feet in contact — _kf_estimate's mode=="stand"
        # branch)
        if stand:
            gl = jnp.ones((1, L), f32)
            gr = jnp.ones((1, L), f32)
        else:
            gl = jnp.where(ls > 0.5, big, 1.0)            # left in swing
            gr = jnp.where(ls > 0.5, 1.0, big)
        g3l = jnp.concatenate([gl, gl, gl], axis=0)
        g3r = jnp.concatenate([gr, gr, gr], axis=0)
        qdiag = jnp.concatenate([
            jnp.full((3, L), (dt / 20.0) * ipp, f32),
            jnp.full((3, L), (dt * 9.81 / 20.0) * ipv, f32),
            (dt * fpp) * g3l, (dt * fpp) * g3r], axis=0)  # [12, L]
        rdiag = jnp.concatenate([
            fsp * g3l, fsp * g3r, fsv * g3l, fsv * g3r,
            fhn * gl, fhn * gr], axis=0)                  # [14, L]
        # P_pred = A P A' + diag(q): A = I + dt E (position<-velocity)
        AP = jnp.concatenate([P[0:3] + dt * P[3:6], P[3:6], P[6:12]], 0)
        PP = jnp.concatenate(
            [AP[:, 0:3] + dt * AP[:, 3:6], AP[:, 3:6], AP[:, 6:12]], 1)
        eye12 = jnp.where(
            lax.broadcasted_iota(jnp.int32, (12, 12, 1), 0)
            == lax.broadcasted_iota(jnp.int32, (12, 12, 1), 1), 1.0, 0.0)
        P_pred = PP + eye12 * qdiag[:, None, :]
        # CP = C @ P_pred [14, 12, L] by block slices
        CP = jnp.concatenate([
            P_pred[0:3] - P_pred[6:9], P_pred[0:3] - P_pred[9:12],
            P_pred[3:6], P_pred[3:6], P_pred[8:9], P_pred[11:12]], 0)
        eye14 = jnp.where(
            lax.broadcasted_iota(jnp.int32, (14, 14, 1), 0)
            == lax.broadcasted_iota(jnp.int32, (14, 14, 1), 1), 1.0, 0.0)
        Skf[:] = jnp.concatenate([
            CP[:, 0:3] - CP[:, 6:9], CP[:, 0:3] - CP[:, 9:12],
            CP[:, 3:6], CP[:, 3:6], CP[:, 8:9], CP[:, 11:12]],
            1) + eye14 * rdiag[:, None, :]
        # innovation
        ym = jnp.concatenate([
            x_pred[0:3] - x_pred[6:9], x_pred[0:3] - x_pred[9:12],
            x_pred[3:6], x_pred[3:6], x_pred[8:9], x_pred[11:12]], 0)
        ey = y_obs - ym                                   # [14, L]
        # RHS [14, 13, L]: col 0 = ey, cols 1:13 = CP
        Xk[:] = jnp.concatenate([ey[:, None, :], CP], axis=1)
        # Cholesky of S (static trailing-slice, as the MPC factor)
        for j in range(14):
            colt = Skf[j, j:, :]
            d = jnp.maximum(colt[0:1], 1e-30)
            dgk[j:j + 1] = jnp.sqrt(d)
            if j + 1 < 14:
                colj = colt[1:] * lax.rsqrt(d)
                Skf[j, j + 1:, :] = colj
                Skf[j + 1:, j + 1:, :] = (
                    Skf[j + 1:, j + 1:, :]
                    - colj[:, None, :] * colj[None, :, :])
        dgi = 1.0 / jnp.maximum(dgk[:], 1e-30)            # [14, L]
        for j in range(14):
            rj = Xk[j] * dgi[j:j + 1]                     # [13, L]
            Xk[j] = rj
            if j + 1 < 14:
                Xk[j + 1:] = (Xk[j + 1:]
                              - Skf[j, j + 1:, :][:, None, :]
                              * rj[None, :, :])
        for j in range(13, -1, -1):
            if j + 1 < 14:
                part = jnp.sum(Skf[j, j + 1:, :][:, None, :]
                               * Xk[j + 1:], axis=0)
            else:
                part = 0.0
            Xk[j] = (Xk[j] - part) * dgi[j:j + 1]
        s_ey = Xk[:, 0, :]                                # [14, L]
        SCP = Xk[:, 1:13, :]                              # [14, 12, L]
        # x_new = x_pred + (P C') S^-1 ey;  (P C')[i,k] = CP[k,i]
        x_new = x_pred + jnp.sum(CP * s_ey[:, None, :], axis=0)
        # P_new = P_pred - (P C') (S^-1 C P)
        corr = CP[0][:, None, :] * SCP[0][None, :, :]
        for k in range(1, 14):
            corr = corr + CP[k][:, None, :] * SCP[k][None, :, :]
        P_new = P_pred - corr
        P_new = 0.5 * (P_new + jnp.transpose(P_new, (1, 0, 2)))
        # xy conditioning (include/stateEstimator.h:299-306)
        det_xy = (P_new[0:1, 0, :] * P_new[1:2, 1, :]
                  - P_new[0:1, 1, :] * P_new[1:2, 0, :])  # [1, L]
        # Build the xy-block mask/scale in-kernel (Pallas rejects captured
        # host constants): zero the xy<->rest cross-covariances and shrink
        # the xy block by 0.1, matching stateEstimator.h:299-306.
        row_xy = lax.broadcasted_iota(jnp.int32, (12, 12, 1), 0) < 2
        col_xy = lax.broadcasted_iota(jnp.int32, (12, 12, 1), 1) < 2
        cond_mask = jnp.where(row_xy == col_xy, 1.0, 0.0)
        cond_scale = jnp.where(row_xy & col_xy, 0.1, 1.0)
        P_cond = P_new * cond_mask * cond_scale
        P_new = jnp.where((det_xy > 1e-6)[:, None, :], P_cond, P_new)
        kfx_out[:] = x_new
        kfp_out[:] = P_new
        # controller consumes the posterior estimate; orientation and
        # angular velocity come from the IMU (= truth in this loop)
        xe = jnp.concatenate(
            [xe[0:3], x_new[0:3], xe[6:9], x_new[3:6], xe[12:13]], 0)
        th_e = xe[0:3]
        pos_e = xe[3:6]
        vel_e = xe[9:12]
        R_e = R_t
        p_l_w = pos_e + pl_w
        p_r_w = pos_e + pr_w
    else:
        R_e = _rot_rpy(th_e)
        if "fk" in prof_skip:
            p_l_w, p_r_w = pos_e, pos_e
        else:
            p_l_w = pos_e + _mv(R_e, fk_leg(q6[0:3], one))
            p_r_w = pos_e + _mv(R_e, fk_leg(q6[3:6], -one))

    # ---- 3. foot placement (control/gait.py:foot_placement) -----------
    # reference anchor (controller.tick ref_anchor math): [3, L] =
    # (x, y, yaw).  Clip xy to the band around the current position and
    # yaw to yaw_band around the current heading; the MPC reference
    # ramps from the clipped pose and the placement gets the integral
    # correction k*(pos - anchor).  bands = 0 -> anc_used == pose
    # (receding reference, zero correction).
    anc = anc_ref[:]                                      # [3, L]
    anc_xy = jnp.clip(anc[0:2], pos_e[0:2] - anchor_band,
                      pos_e[0:2] + anchor_band)
    yaw_now = th_e[2:3]
    anc_yaw = jnp.clip(anc[2:3], yaw_now - yaw_band, yaw_now + yaw_band)
    anc_used = jnp.concatenate([anc_xy, anc_yaw], axis=0)
    anc_out[:] = jnp.concatenate(
        [anc_xy + vdes[0:2] * dt, anc_yaw + wdes * dt], axis=0)
    if use_capture:
        v_pred = vel_e
        corr_x = k_cap * (vel_e[0:1] - vdes[0:1])
        corr_y = k_cap * (vel_e[1:2] - vdes[1:2])
    else:
        v_pred = vdes
        corr_x = jnp.zeros((1, L), f32)
        corr_y = jnp.zeros((1, L), f32)
    pred = pos_e + v_pred * remain
    prx = jnp.clip(v_pred[0:1] * (0.5 * stance_t) + corr_x,
                   -p_rel_max, p_rel_max)
    pry = jnp.clip(v_pred[1:2] * (0.5 * stance_t) + corr_y,
                   -p_rel_max, p_rel_max)
    tgt_x = pred[0:1] + prx + jnp.where(ls > 0.5, off_l[0], off_r[0])
    tgt_y = pred[1:2] + pry + jnp.where(ls > 0.5, off_l[1], off_r[1])
    if anchor_gain > 0.0:
        tgt_x = tgt_x + anchor_gain * (pos_e[0:1] - anc_used[0:1])
        tgt_y = tgt_y + anchor_gain * (pos_e[1:2] - anc_used[1:2])
    tgt_z = jnp.full((1, L), ground_h, f32)
    target = jnp.concatenate([tgt_x, tgt_y, tgt_z], axis=0)
    tgt_out[:] = target

    # ---- 4. swing trajectory + analytic IK (walking only) -------------
    if not stand:
        foot_now = jnp.where(ls > 0.5, p_l_w, p_r_w)
        nxt = foot_now + (target - foot_now) * progress
        swing_z = ground_h + gait_height * jnp.sin(jnp.pi * progress)
        nxt = jnp.concatenate([nxt[0:2], swing_z], axis=0)
        next_b = _mtv(R_e, nxt - pos_e)

    def ik_leg(tgt_b, q_ref3, mir):
        """Closed-form position IK (models/kinematics.py:
        inverse_kinematics_analytic), branch selected nearest q_ref3."""
        vx = tgt_b[0:1] - ax_a
        vy = tgt_b[1:2] - ay_a * mir
        vz = tgt_b[2:3] - az_a
        y_chain = y_chain_l * mir
        r = jnp.sqrt(vy * vy + vz * vz)
        phi = _atan2(vz, vy)
        c = jnp.clip(y_chain / jnp.maximum(r, 1e-9), -1.0, 1.0)
        d0 = _acos(c)
        cand0a = _wrap(phi - d0)
        cand0b = _wrap(phi + d0)
        pick0 = (jnp.abs(_wrap(cand0a - q_ref3[0:1]))
                 <= jnp.abs(_wrap(cand0b - q_ref3[0:1])))
        q0 = jnp.where(pick0, cand0a, cand0b)
        c0, s0 = jnp.cos(q0), jnp.sin(q0)
        ux = vx - hx
        uz = -s0 * vy + c0 * vz - hz
        k2 = (ux * ux + uz * uz - la2 - lb2) * 0.5
        c2 = jnp.clip(k2 * (1.0 / rho_c), -1.0, 1.0)
        d2 = _acos(c2)
        cand2a = _wrap(psi - d2)
        cand2b = _wrap(psi + d2)
        pick2 = (jnp.abs(_wrap(cand2a - q_ref3[2:3]))
                 <= jnp.abs(_wrap(cand2b - q_ref3[2:3])))
        q2 = jnp.where(pick2, cand2a, cand2b)
        wx = kx + jnp.cos(q2) * fx + jnp.sin(q2) * fz
        wz = kz - jnp.sin(q2) * fx + jnp.cos(q2) * fz
        q1 = _wrap(_atan2(wz, wx) - _atan2(uz, ux))
        return jnp.concatenate([q0, q1, q2], axis=0)

    if not stand:
        mir_sw = jnp.where(ls > 0.5, 1.0, -1.0)           # swing side
        q_guess = jnp.where(ls > 0.5, q6[0:3], q6[3:6])
        swing_q = q_guess if "ik" in prof_skip \
            else ik_leg(next_b, q_guess, mir_sw)

    # ---- 5/6 (hold): the dtMPC held-force tick — NO MPC solve ---------
    # (controller.tick's grf_override path, include/MPCParam.h:46-47:
    # the held force belongs to the foot NOW in stance; warm QP state
    # passes through untouched)
    if hold:
        z_out[:] = zw_ref[:]
        y_out[:] = yw_ref[:]
        res_out[:] = jnp.zeros((1, L), f32)

    # ---- 5. contact schedule + moment arms over the horizon -----------
    # (control/gait.py:contact_schedule; arms per controller.tick:364-374)
    if hold:
        pass
    elif stand:
        # both feet in stance for the whole horizon, arms step-invariant
        # (controller.tick's mode == "stand" branch): the MPC pushes the
        # COM over the support midpoint (stance_mpc's pos_anchor)
        arms2 = (p_l_w, p_r_w)
        anchor_mpc = jnp.concatenate(
            [0.5 * (p_l_w[0:2] + p_r_w[0:2]), th_e[2:3]], axis=0)
    else:
        arm_l = jnp.where(ls > 0.5, target, p_l_w)
        arm_r = jnp.where(ls > 0.5, p_r_w, target)
        if "arms" not in prof_skip:
            for k in range(N):
                ph_k = _fmod_pos(t_now + (k * ts), cycle)
                on_k = ph_k >= swing_t                    # left stance
                arms_s[k] = jnp.where(on_k, arm_l, arm_r)

    # ---- 6. the fused MPC solve (re-entering _prep_mpc) ---------------
    if not hold:
        _prep_mpc(N, nx, nu, mu_, iters, rho, alpha, ts, mass,
                  height_des, xe,
                  (lambda k: arms2) if stand else (lambda k: arms_s[k]),
                  vdes, wdes, iinv_ref[:],
                  zw_ref, yw_ref, qv_ref, pv_ref, dblk_ref,
                  gmat_ref, gmt_ref, h_ref,
                  z_out, y_out, res_out, None,
                  S, w_ref, qe_ref, f_ref, dg_ref, Yv, ad_s, bd_s,
                  anchor=anchor_mpc if stand else anc_used,
                  prof_skip=prof_skip, two_feet=stand,
                  solve_form=solve_form)

    # ---- 7. GRF split + exact-ZOH SRBD plant step ---------------------
    # (controller.tick grf packing + models/srbd.py:srbd_step_vector)
    if "post" in prof_skip:
        xi_out[:] = xi
        q_out[:] = q6
        fl_out[:] = fl
        fr_out[:] = fr
        grf_out[:] = jnp.zeros((6, L), f32)
        return
    if hold and stand:
        f_l = grf_in[0:3]
        f_r = grf_in[3:6]
    elif hold:
        # the held force belongs to the foot NOW in stance (the gait
        # phase may have switched since the solve) —
        # controller.tick:429-438
        f_any = grf_in[0:3] + grf_in[3:6]
        on0 = 1.0 - ls                                    # left stance now
        f_l = f_any * on0
        f_r = f_any * ls
    elif stand:
        f_l = z_out[0:3]
        f_r = z_out[3:6]
    else:
        u0 = z_out[0:3]
        on0 = 1.0 - ls                                    # left stance now
        f_l = u0 * on0
        f_r = u0 * ls
    grf_out[:] = jnp.concatenate([f_l, f_r], axis=0)

    tau_w = _cross(fl - pos, f_l) + _cross(fr - pos, f_r)
    f_tot = f_l + f_r
    cy, sy = jnp.cos(theta[2:3]), jnp.sin(theta[2:3])

    def rz_t(u):
        return jnp.concatenate([cy * u[0:1] + sy * u[1:2],
                                -sy * u[0:1] + cy * u[1:2],
                                u[2:3]], axis=0)

    def rz(u):
        return jnp.concatenate([cy * u[0:1] - sy * u[1:2],
                                sy * u[0:1] + cy * u[1:2],
                                u[2:3]], axis=0)

    Iinv = iinv_ref[:]                                    # [3, 3]
    tb = rz_t(tau_w)
    ib = jnp.concatenate([
        Iinv[0:1, 0:1] * tb[0:1] + Iinv[0:1, 1:2] * tb[1:2]
        + Iinv[0:1, 2:3] * tb[2:3],
        Iinv[1:2, 0:1] * tb[0:1] + Iinv[1:2, 1:2] * tb[1:2]
        + Iinv[1:2, 2:3] * tb[2:3],
        Iinv[2:3, 0:1] * tb[0:1] + Iinv[2:3, 1:2] * tb[1:2]
        + Iinv[2:3, 2:3] * tb[2:3],
    ], axis=0)
    wd = rz(ib)
    gz = jnp.concatenate([jnp.zeros((2, L), f32), g_state], axis=0)
    acc = f_tot * (1.0 / mass) + gz

    half = dt * dt / 2.0
    theta_new = theta + dt * rz_t(w_b) + half * rz_t(wd)
    p_new = pos + dt * vel + half * acc
    w_new = w_b + dt * wd
    v_new = vel + dt * acc
    xi_out[:] = jnp.concatenate(
        [theta_new, p_new, w_new, v_new, g_state], axis=0)

    # ---- 8. next-tick foot/joint kinematics ---------------------------
    # (control/rollout.py swing FK + stance pinning IK, select-then-compute)
    R_new = _rot_rpy(theta_new)
    if stand:
        # both feet stay pinned; both legs re-IK'd from the new base pose
        # (_plant_step_ref's mode == "stand" branch)
        fl_out[:] = fl
        fr_out[:] = fr
        q_l = q6[0:3] if "ik" in prof_skip \
            else ik_leg(_mtv(R_new, fl - p_new), q6[0:3], one)
        q_r = q6[3:6] if "ik" in prof_skip \
            else ik_leg(_mtv(R_new, fr - p_new), q6[3:6], -one)
        q_out[:] = jnp.concatenate([q_l, q_r], axis=0)
        return
    p_sw_w = p_new + _mv(R_new, fk_leg(swing_q, mir_sw))
    # rigid ground: clamp swing-foot penetration (see control/rollout.py
    # — breaks the estimator-bias touchdown-sink feedback loop)
    p_sw_w = jnp.concatenate(
        [p_sw_w[0:2], jnp.maximum(p_sw_w[2:3], ground_h)], axis=0)
    fl_new = jnp.where(ls > 0.5, p_sw_w, fl)
    fr_new = jnp.where(ls > 0.5, fr, p_sw_w)
    fl_out[:] = fl_new
    fr_out[:] = fr_new

    foot_st = jnp.where(ls > 0.5, fr_new, fl_new)
    q_prev_st = jnp.where(ls > 0.5, q6[3:6], q6[0:3])
    q_st = q_prev_st if "ik" in prof_skip \
        else ik_leg(_mtv(R_new, foot_st - p_new), q_prev_st, -mir_sw)
    q_out[:] = jnp.where(
        (jnp.zeros((6, 1), f32) + ls) > 0.5,
        jnp.concatenate([swing_q, q_st], axis=0),
        jnp.concatenate([q_st, swing_q], axis=0))


@functools.partial(
    jax.jit,
    static_argnames=("N", "iters", "rho", "alpha", "ts", "dt", "mass",
                     "height_des", "cycle", "swing_t", "stance_t",
                     "gait_height", "p_rel_max", "ground_h", "k_cap",
                     "use_capture", "anchor_band", "anchor_gain",
                     "yaw_band", "off_l", "off_r",
                     "geom", "q_diag", "r_diag", "p_diag", "Gu", "h",
                     "inertia", "stand", "est_c", "interpret",
                     "prof_skip", "solve_form"))
def fused_walking_tick(xi, xi_est, q, foot_l, foot_r, z_warm, y_warm,
                       anchor, it, v_des, yaw_rate,
                       kf_x=None, kf_p=None, prev_v=None, prev_q=None,
                       grf_held=None, *,
                       N: int, iters: int, rho: float, alpha: float,
                       ts: float, dt: float, mass: float,
                       height_des: float, cycle: float, swing_t: float,
                       stance_t: float, gait_height: float,
                       p_rel_max: float, ground_h: float, k_cap: float,
                       use_capture: bool, anchor_band: float,
                       anchor_gain: float, yaw_band: float,
                       off_l, off_r, geom,
                       q_diag, r_diag, p_diag, Gu, h, inertia,
                       stand: bool = False, est_c: tuple = (),
                       interpret: bool = False, prof_skip: tuple = (),
                       solve_form: str = "subst"):
    """Batched whole-tick kernel dispatch.

    xi [B,13] (plant truth); xi_est [B,13] (controller-visible odometry —
    pass xi for truth mode, the KF estimate packed by srbd.initial_state
    for estimator_mode == "kf"); q [B,6]; foot_l/foot_r [B,3];
    z_warm [B,N*nu]; y_warm [B,N*mu]; anchor [B,3] (x, y, yaw); it [B];
    v_des [B,3];
    yaw_rate [B].  Returns (xi', q', foot_l', foot_r', z, y, anchor',
    residual [B], grf [B,6], target [B,3]).

    With kf_x [B,12] / kf_p [B,12,12] / prev_v [B,3] / prev_q [B,6] the
    12-state Kalman filter runs IN-KERNEL (est_kf): sensors synthesized
    from the plant truth, posterior estimate drives the control stack
    (xi_est is then ignored), and the outputs gain (kf_x', kf_p').

    With grf_held [B,6] the tick is the dtMPC HELD-force variant
    (controller.tick's grf_override path): no MPC solve — gait, swing
    tracking, KF, and the plant step run with the held force applied to
    the current stance foot; z/y pass through, residual is 0.
    """
    est_kf = kf_x is not None
    B = xi.shape[0]
    nx = xi.shape[-1]
    nu = 6 if stand else 3     # two-foot GRF decision variable standing
    mu_ = len(Gu)
    n = N * nu
    m = N * mu_
    f32 = jnp.float32

    B_pad = ((B + LANES - 1) // LANES) * LANES
    xi = _pad_batch(xi, B_pad)
    xi_est = _pad_batch(xi_est, B_pad)
    q = _pad_batch(q, B_pad)
    foot_l = _pad_batch(foot_l, B_pad)
    foot_r = _pad_batch(foot_r, B_pad)
    z_warm = _pad_batch(z_warm, B_pad)
    y_warm = _pad_batch(y_warm, B_pad)
    anchor = _pad_batch(anchor, B_pad)
    it = _pad_batch(it, B_pad)
    v_des = _pad_batch(v_des, B_pad)
    yaw_rate = _pad_batch(yaw_rate, B_pad)

    if est_kf:
        kf_x = _pad_batch(kf_x, B_pad)
        kf_p = _pad_batch(kf_p, B_pad)
        prev_v = _pad_batch(prev_v, B_pad)
        prev_q = _pad_batch(prev_q, B_pad)
    grf_t = None
    if grf_held is not None:
        grf_t = jnp.transpose(
            _pad_batch(grf_held, B_pad), (1, 0)).astype(jnp.float32)

    xi_t = jnp.transpose(xi, (1, 0)).astype(f32)
    xe_t = jnp.transpose(xi_est, (1, 0)).astype(f32)
    q_t = jnp.transpose(q, (1, 0)).astype(f32)
    fl_t = jnp.transpose(foot_l, (1, 0)).astype(f32)
    fr_t = jnp.transpose(foot_r, (1, 0)).astype(f32)
    zw_t = jnp.transpose(z_warm, (1, 0)).astype(f32)
    yw_t = jnp.transpose(y_warm, (1, 0)).astype(f32)
    anc_t = jnp.transpose(anchor, (1, 0)).astype(f32)
    it_t = it[None].astype(f32)
    vd_t = jnp.transpose(v_des, (1, 0)).astype(f32)
    wd_t = yaw_rate[None].astype(f32)
    kf_t = None
    if est_kf:
        kf_t = (jnp.transpose(kf_x, (1, 0)).astype(f32),
                jnp.transpose(kf_p, (1, 2, 0)).astype(f32),
                jnp.transpose(prev_v, (1, 0)).astype(f32),
                jnp.transpose(prev_q, (1, 0)).astype(f32))

    outs = _fused_tick_core(
        xi_t, xe_t, q_t, fl_t, fr_t, zw_t, yw_t, anc_t, it_t, vd_t,
        wd_t, kf_t,
        N=N, iters=iters, rho=rho, alpha=alpha, ts=ts, dt=dt, mass=mass,
        height_des=height_des, cycle=cycle, swing_t=swing_t,
        stance_t=stance_t, gait_height=gait_height, p_rel_max=p_rel_max,
        ground_h=ground_h, k_cap=k_cap, use_capture=use_capture,
        anchor_band=anchor_band, anchor_gain=anchor_gain,
        yaw_band=yaw_band, off_l=off_l,
        off_r=off_r, geom=geom, q_diag=q_diag, r_diag=r_diag,
        p_diag=p_diag, Gu=Gu, h=h, inertia=inertia, stand=stand,
        est_c=est_c, interpret=interpret, prof_skip=prof_skip,
        solve_form=solve_form, grf_t=grf_t)

    (xi_n, q_n, fl_n, fr_n, z_t, y_t, anc_n, res_t, grf_t, tgt_t,
     *kf_outs) = outs
    tr = lambda a: jnp.transpose(a, (1, 0))[:B]
    base = (tr(xi_n), tr(q_n), tr(fl_n), tr(fr_n), tr(z_t), tr(y_t),
            tr(anc_n), res_t[0, :B], tr(grf_t), tr(tgt_t))
    if est_kf:
        kfx_n, kfp_n = kf_outs
        return base + (tr(kfx_n), jnp.transpose(kfp_n, (2, 0, 1))[:B])
    return base


def _fused_tick_core(xi_t, xe_t, q_t, fl_t, fr_t, zw_t, yw_t, anc_t,
                     it_t, vd_t, wd_t, kf_t, *,
                     N, iters, rho, alpha, ts, dt, mass, height_des,
                     cycle, swing_t, stance_t, gait_height, p_rel_max,
                     ground_h, k_cap, use_capture, anchor_band,
                     anchor_gain, yaw_band, off_l, off_r, geom, q_diag,
                     r_diag, p_diag, Gu, h, inertia, stand, est_c,
                     interpret, prof_skip, solve_form="subst",
                     grf_t=None):
    """Transposed-layout kernel dispatch: every per-lane array is
    batch-last [k, B_pad] with B_pad a multiple of LANES.  This is the
    layout the kernel consumes natively — the batch-first wrapper above
    pays two transposes of ~20 small arrays per tick for API
    convenience, which the RESIDENT rollout (control/rollout.py:
    rollout_fused_resident) avoids by carrying this layout through its
    lax.scan.  kf_t is None or (kf_x [12,B], kf_p [12,12,B], prev_v
    [3,B], prev_q [6,B]); returns the raw transposed output tuple."""
    est_kf = kf_t is not None
    hold = grf_t is not None
    nx = xi_t.shape[0]
    nu = 6 if stand else 3
    mu_ = len(Gu)
    n = N * nu
    m = N * mu_
    f32 = jnp.float32
    B_pad = xi_t.shape[-1]
    assert B_pad % LANES == 0, B_pad

    q_np = np.asarray(q_diag, np.float32)[:, None]
    p_np = np.asarray(p_diag, np.float32)[:, None]
    Gu_np = np.asarray(Gu, np.float32)
    reg = 1e-6
    dblk_np = (2.0 * np.diag(np.asarray(r_diag, np.float32))
               + float(rho) * (Gu_np.T @ Gu_np)
               + float(reg) * np.eye(nu, dtype=np.float32))
    gmat_np = np.kron(np.eye(N, dtype=np.float32), Gu_np)
    h_np = np.asarray(h, np.float32)[:, None]
    iinv_np = np.linalg.inv(
        np.asarray(inertia, np.float64).reshape(3, 3)).astype(np.float32)

    kernel = functools.partial(
        _tick_kernel, N, nx, nu, mu_, iters, float(rho), float(alpha),
        float(ts), float(dt), float(mass), float(height_des),
        float(cycle), float(swing_t), float(stance_t), float(gait_height),
        float(p_rel_max), float(ground_h), float(k_cap), bool(use_capture),
        float(anchor_band), float(anchor_gain), float(yaw_band),
        tuple(off_l), tuple(off_r), tuple(geom),
        bool(stand), bool(est_kf), tuple(est_c), bool(hold),
        prof_skip=tuple(prof_skip), solve_form=str(solve_form))

    grid = (B_pad // LANES,)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (*shape, LANES),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, (lambda i, _nd=nd: (0,) * _nd),
            memory_space=pltpu.VMEM)

    in_specs = [
        spec((nx,)),           # xi (plant truth)
        spec((nx,)),           # xi_est (controller odometry)
        spec((6,)),            # q
        spec((3,)),            # foot_l
        spec((3,)),            # foot_r
        spec((n,)),            # z_warm
        spec((m,)),            # y_warm
        spec((3,)),            # reference anchor pose (x, y, yaw)
        spec((1,)),            # iteration
        spec((3,)),            # v_des
        spec((1,)),            # yaw_rate
        const_spec((nx, 1)),   # q_diag
        const_spec((nx, 1)),   # p_diag
        const_spec((nu, nu)),  # diag block
        const_spec((m, n)),    # Gmat
        const_spec((n, m)),    # Gmat'
        const_spec((m, 1)),    # h
        const_spec((3, 3)),    # I^{-1}
    ]
    out_specs = [spec((nx,)), spec((6,)), spec((3,)), spec((3,)),
                 spec((n,)), spec((m,)), spec((3,)), spec((1,)),
                 spec((6,)), spec((3,))]
    out_shape = [
        jax.ShapeDtypeStruct((nx, B_pad), f32),
        jax.ShapeDtypeStruct((6, B_pad), f32),
        jax.ShapeDtypeStruct((3, B_pad), f32),
        jax.ShapeDtypeStruct((3, B_pad), f32),
        jax.ShapeDtypeStruct((n, B_pad), f32),
        jax.ShapeDtypeStruct((m, B_pad), f32),
        jax.ShapeDtypeStruct((3, B_pad), f32),
        jax.ShapeDtypeStruct((1, B_pad), f32),
        jax.ShapeDtypeStruct((6, B_pad), f32),
        jax.ShapeDtypeStruct((3, B_pad), f32),
    ]
    scratch_shapes = [
        pltpu.VMEM((n, n, LANES), f32),        # S
        pltpu.VMEM((N * nx, nx, LANES), f32),  # w_ref
        pltpu.VMEM((N, nx, LANES), f32),       # qe_ref
        pltpu.VMEM((n, LANES), f32),           # f_ref
        pltpu.VMEM((n, LANES), f32),           # dg_ref
        pltpu.VMEM((n, LANES), f32),           # Yv
        pltpu.VMEM((nx, nx, LANES), f32),      # ad_s
        pltpu.VMEM((N * nx, nu, LANES), f32),  # bd_s
        pltpu.VMEM((N, 3, LANES), f32),        # arms_s
    ]
    # kernel positional ref order: 11 per-lane inputs, 7 const inputs,
    # then (hold only) the held GRF, then (est_kf only) the 4 filter
    # inputs, outputs, scratch
    hold_args = []
    if hold:
        in_specs += [spec((6,))]
        hold_args = [grf_t]
    kf_args = []
    if est_kf:
        in_specs += [spec((12,)), spec((12, 12)), spec((3,)), spec((6,))]
        kf_args = list(kf_t)
        out_specs += [spec((12,)), spec((12, 12))]
        out_shape += [jax.ShapeDtypeStruct((12, B_pad), f32),
                      jax.ShapeDtypeStruct((12, 12, B_pad), f32)]
        scratch_shapes += [
            pltpu.VMEM((14, 14, LANES), f32),  # Skf
            pltpu.VMEM((14, 13, LANES), f32),  # Xk (rhs: ey | C P)
            pltpu.VMEM((14, LANES), f32),      # dgk
        ]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            # whole-tick working set (condensation scratch + S factor
            # + ADMM state + KF scratch, 128-lane batched) can exceed
            # the 16 MB default scoped-vmem limit; v5e VMEM is 128 MB
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xi_t, xe_t, q_t, fl_t, fr_t, zw_t, yw_t, anc_t, it_t, vd_t, wd_t,
      jnp.asarray(q_np), jnp.asarray(p_np), jnp.asarray(dblk_np),
      jnp.asarray(gmat_np), jnp.asarray(gmat_np.T), jnp.asarray(h_np),
      jnp.asarray(iinv_np), *hold_args, *kf_args)


def supports_fused_tick(cfg) -> bool:
    """True when the config matches the kernel's closed form: walk OR
    stand mode, truth OR KF odometry, analytic IK, warm admm_fused
    solver.  Walking bakes the controller.tick:364-374 arm/schedule
    logic (single-support gait); standing runs the two-foot nu = 6 MPC
    with step-invariant arms and both feet pinned (controller.stance_mpc
    + _plant_step_ref's stand branch).  In KF mode the 12-state filter
    runs IN-KERNEL: sensor synthesis from the true plant state,
    contact-gated predict/update (stateEstimator.h:260-279 — both feet
    in contact for stand), and the xy covariance conditioning
    (stateEstimator.h:299-306), with the filter state/covariance
    threaded through four extra kernel operands (kf_x, kf_p, prev_v,
    prev_q) and two extra outputs."""
    return (cfg.mode in ("walk", "stand")
            and cfg.estimator_mode in ("truth", "kf")
            and cfg.ik_method == "analytic"
            and cfg.qp_warm_start
            and cfg.srbd.solver.method == "admm_fused"
            and cfg.placement_mode in ("capture", "reference")
            # the in-kernel reference is level-attitude only; the
            # "receding" parity form runs the XLA composition
            and cfg.srbd.attitude_ref == "level")


def make_tick_fused(cfg, use_pallas=None, prof_skip=(), hold=False):
    """Whole-tick stepper from the full controller config:
    fn(xi, q, foot_l, foot_r, z, y, anc, it, v_des, yaw_rate) — one
    simulation tick per scenario (vmap for batches).  For
    cfg.estimator_mode == "kf" the signature gains four trailing inputs
    (kf_x [12], kf_p [12,12], prev_v [3], prev_q [6]) and two trailing
    outputs (kf_x', kf_p'): the 12-state filter runs IN-KERNEL and its
    posterior drives the control stack while the plant steps from truth.

    Off-TPU (and unbatched) it runs the reference XLA composition
    (control/rollout.py:_plant_step_ref); under vmap on TPU the whole
    tick is ONE Pallas program.  `use_pallas="interpret"` runs the kernel
    through the interpreter (CPU parity tests).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    statics, statics_kf, est_input = _tick_statics(cfg, prof_skip)
    if est_input and not use_pallas:
        # the XLA fallback composition reconstructs odometry internally
        # (truth mode only); KF-mode dispatch requires the kernel
        raise ValueError("make_tick_fused KF mode needs use_pallas "
                         "(True or 'interpret')")
    return _make_tick_step(cfg, statics, statics_kf, est_input,
                           use_pallas, hold=hold)


def _tick_statics(cfg, prof_skip=()):
    """Compile-time constants of the whole-tick kernel from the config:
    (statics, statics_kf, est_input).  statics' keys match both
    fused_walking_tick's static kwargs and _fused_tick_core's."""
    c = cfg.srbd
    N = c.horizon
    stand = cfg.mode == "stand"
    mu = float(c.friction_mu)
    Gu1 = ((1.0, 0.0, -mu), (-1.0, 0.0, -mu),
           (0.0, 1.0, -mu), (0.0, -1.0, -mu),
           (0.0, 0.0, 1.0), (0.0, 0.0, -1.0))
    hu1 = (0.0, 0.0, 0.0, 0.0, float(c.fz_max), -float(c.fz_min))
    if stand:
        # two-foot standing form: block-diag cone [12, 6], bounds and
        # input weights duplicated (controller.stance_mpc's warm path —
        # full-stance constants)
        Gu_np2 = np.zeros((12, 6), np.float32)
        Gu_np2[:6, :3] = np.asarray(Gu1, np.float32)
        Gu_np2[6:, 3:] = np.asarray(Gu1, np.float32)
        Gu = tuple(tuple(float(v) for v in row) for row in Gu_np2)
        hu = tuple(hu1) * 2
        r_diag = tuple(float(v) for v in c.r_diag) * 2
    else:
        Gu = Gu1
        hu = hu1
        r_diag = tuple(float(v) for v in c.r_diag)
    h = tuple(hu) * N
    q_diag = tuple(float(v) for v in c.q_diag)
    p_diag = tuple(float(c.p_scale) * float(v) for v in c.q_diag)
    inertia = tuple(float(v) for v in np.asarray(
        cfg.robot.inertia, np.float64).reshape(-1))
    legs = cfg.robot.legs
    geom = tuple(float(v) for v in (
        *legs.abad_offset,
        *legs.hip_offset,
        *legs.knee_offset,
        *(a + b for a, b in zip(legs.foot_offset, legs.contact_offset)),
    ))
    use_capture = cfg.placement_mode == "capture"
    if use_capture:
        off_l = tuple(float(v) for v in cfg.robot.nominal_foot_offset_left[:2])
        off_r = tuple(float(v) for v in cfg.robot.nominal_foot_offset_right[:2])
    else:
        off_l = tuple(float(v) for v in cfg.robot.static_foot_offset_left[:2])
        off_r = tuple(float(v) for v in cfg.robot.static_foot_offset_right[:2])
    k_cap = float(cfg.capture_gain_scale) * float(
        np.sqrt(cfg.base_height / 9.81))

    statics = dict(
        N=N, iters=int(c.solver.admm_warm_iters),
        rho=float(c.solver.admm_rho), alpha=float(c.solver.admm_alpha),
        ts=float(c.ts), dt=float(cfg.gait.dt), mass=float(cfg.robot.mass),
        height_des=float(cfg.ground_height) + float(cfg.base_height),
        cycle=float(cfg.gait.cycle_time), swing_t=float(cfg.gait.swing_time),
        stance_t=float(cfg.gait.stance_time),
        gait_height=float(cfg.gait.gait_height),
        p_rel_max=float(cfg.gait.p_rel_max),
        ground_h=float(cfg.ground_height), k_cap=k_cap,
        use_capture=use_capture,
        anchor_band=float(cfg.ref_anchor_band),
        anchor_gain=float(cfg.anchor_placement_gain),
        yaw_band=float(cfg.yaw_anchor_band),
        off_l=off_l, off_r=off_r, geom=geom,
        q_diag=q_diag, r_diag=r_diag, p_diag=p_diag, Gu=Gu, h=h,
        inertia=inertia, stand=stand, prof_skip=tuple(prof_skip),
        solve_form=str(getattr(c.solver, "solve_form", "subst")))

    est_input = cfg.estimator_mode == "kf"
    if est_input:
        e = cfg.estimator
        statics_kf = dict(est_c=(
            float(e.imu_process_noise_position),
            float(e.imu_process_noise_velocity),
            float(e.foot_process_noise_position),
            float(e.foot_sensor_noise_position),
            float(e.foot_sensor_noise_velocity),
            float(e.foot_height_sensor_noise),
            float(e.high_suspect_number),
            float(e.foot_radius)))
    else:
        statics_kf = {}
    return statics, statics_kf, est_input


def _make_tick_step(cfg, statics, statics_kf, est_input, use_pallas,
                    hold=False):
    def _xla_batched(xi, q, fl, fr, z, y, anc, it, v_des, yaw_rate,
                     grf=None):
        """Reference composition, batched (off-TPU fallback)."""
        from mpc_limx_control_tpu.control import rollout as ro

        def one(xi1, q1, fl1, fr1, z1, y1, anc1, it1, vd1, *g1):
            st = ro.PlantState(xi=xi1, q=q1, foot_l=fl1, foot_r=fr1,
                               qp_z=z1, qp_lam=y1, ref_anchor=anc1)
            st2, mets = ro._plant_step_ref(
                cfg, st, it1, v_des=vd1,
                grf_override=g1[0] if g1 else None)
            return (st2.xi, st2.q, st2.foot_l, st2.foot_r,
                    st2.qp_z, st2.qp_lam, st2.ref_anchor,
                    mets["qp_residual"], mets["grf"],
                    mets["foot_target"])

        del yaw_rate  # the composition reads cfg.desired_yaw_rate
        if grf is None:
            return jax.vmap(one)(xi, q, fl, fr, z, y, anc, it, v_des)
        return jax.vmap(one)(xi, q, fl, fr, z, y, anc, it, v_des, grf)

    def _call_batched(args):
        """args = (xi, q, fl, fr, z, y, anc, it, v_des, w [, grf]
        [, kf_x, kf_p, prev_v, prev_q])."""
        xi, q, fl, fr, z, y, anc, it, v_des, w, *rest = args
        grf = rest.pop(0) if hold else None
        kf = rest
        if est_input:
            return fused_walking_tick(
                xi, xi, q, fl, fr, z, y, anc, it, v_des, w, *kf,
                grf_held=grf, **statics, **statics_kf,
                interpret=use_pallas == "interpret")
        if use_pallas:
            return fused_walking_tick(
                xi, xi, q, fl, fr, z, y, anc, it, v_des, w,
                grf_held=grf, **statics,
                interpret=use_pallas == "interpret")
        return _xla_batched(xi, q, fl, fr, z, y, anc, it, v_des, w,
                            grf=grf)

    n_in = 10 + (1 if hold else 0) + (4 if est_input else 0)

    @jax.custom_batching.custom_vmap
    def step(*args):
        # single-scenario deployment shape (the 1 kHz real-time loop):
        # one 128-lane kernel instance beats ~100 small XLA ops
        assert len(args) == n_in, (len(args), n_in)
        outs = _call_batched(tuple(a[None] for a in args))
        return tuple(o[0] for o in outs)

    @step.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = tuple(a if b else jnp.broadcast_to(a, (axis_size, *a.shape))
                     for a, b in zip(args, in_batched))
        outs = _call_batched(args)
        return tuple(outs), tuple(True for _ in outs)

    return step
