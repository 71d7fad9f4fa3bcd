"""Whole-tick fused Pallas kernel: the ENTIRE walking plant tick in VMEM.

After the fused MPC kernel (ops/mpc_fused_pallas.py) collapsed the
condensation+solve to ~6.5 ms at B=4096, the OTHER half of the tick —
gait clock, foot placement, swing trajectory, FK, analytic IK, SRBD plant
step, foot pinning (reference call stack MPC::run,
include/MPCController.h:183-196, plus the plant x<-Ad x+Bd u of
src/QPSolver.cpp:108-111) — became the bottleneck: ~100 small
fusion-bounded XLA ops, each a [B, <16]-shaped HBM round trip
(tools/profile_rest.py: ~4.8 ms at B=4096).

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
                 anchor_gain: float,
                 off_l: tuple, off_r: tuple, geom: tuple,
                 # refs (inputs):
                 xi_ref, q_ref, fl_ref, fr_ref, zw_ref, yw_ref, anc_ref,
                 it_ref, vdes_ref, wdes_ref,
                 qv_ref, pv_ref, dblk_ref, gmat_ref, gmt_ref, h_ref,
                 iinv_ref,
                 # refs (outputs):
                 xi_out, q_out, fl_out, fr_out, z_out, y_out, anc_out,
                 res_out, grf_out, tgt_out,
                 # refs (scratch):
                 S, w_ref, qe_ref, f_ref, dg_ref, Yv, ad_s, bd_s, arms_s,
                 prof_skip=()):
    L = LANES
    f32 = jnp.float32
    (ax_a, ay_a, az_a, hx, hy, hz, kx, ky, kz, fx, fy, fz) = geom
    # planar 2R constants of the analytic IK (models/kinematics.py:152-157)
    la2 = kx * kx + kz * kz
    lb2 = fx * fx + fz * fz
    rho_c = float(np.sqrt(la2 * lb2))
    psi = float(np.arctan2(kx * fz - kz * fx, kx * fx + kz * fz))
    y_chain_l = hy + ky + fy                   # left-side distal y offset

    xi = xi_ref[:]                                        # [13, L]
    q6 = q_ref[:]                                         # [6, L]
    fl = fl_ref[:]                                        # [3, L]
    fr = fr_ref[:]                                        # [3, L]
    it = it_ref[:]                                        # [1, L]
    vdes = vdes_ref[:]                                    # [3, L]
    wdes = wdes_ref[:]                                    # [1, L]

    theta = xi[0:3]
    pos = xi[3:6]
    w_b = xi[6:9]
    vel = xi[9:12]
    g_state = xi[12:13]

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
    R_wb = _rot_rpy(theta)
    if "fk" in prof_skip:
        p_l_w, p_r_w = pos, pos
    else:
        p_l_w = pos + _mv(R_wb, fk_leg(q6[0:3], one))
        p_r_w = pos + _mv(R_wb, fk_leg(q6[3:6], -one))

    # ---- 3. foot placement (control/gait.py:foot_placement) -----------
    # reference anchor (controller.tick ref_anchor math): clip to the
    # band around the current position; the MPC reference ramps from it
    # and the placement gets the integral correction k*(pos - anchor).
    # band = 0 -> anc_used == pos (receding reference, zero correction).
    anc = anc_ref[:]                                      # [2, L]
    anc_used = jnp.clip(anc, pos[0:2] - anchor_band,
                        pos[0:2] + anchor_band)
    anc_out[:] = anc_used + vdes[0:2] * dt
    if use_capture:
        v_pred = vel
        corr_x = k_cap * (vel[0:1] - vdes[0:1])
        corr_y = k_cap * (vel[1:2] - vdes[1:2])
    else:
        v_pred = vdes
        corr_x = jnp.zeros((1, L), f32)
        corr_y = jnp.zeros((1, L), f32)
    pred = pos + v_pred * remain
    prx = jnp.clip(v_pred[0:1] * (0.5 * stance_t) + corr_x,
                   -p_rel_max, p_rel_max)
    pry = jnp.clip(v_pred[1:2] * (0.5 * stance_t) + corr_y,
                   -p_rel_max, p_rel_max)
    tgt_x = pred[0:1] + prx + jnp.where(ls > 0.5, off_l[0], off_r[0])
    tgt_y = pred[1:2] + pry + jnp.where(ls > 0.5, off_l[1], off_r[1])
    if anchor_gain > 0.0:
        tgt_x = tgt_x + anchor_gain * (pos[0:1] - anc_used[0:1])
        tgt_y = tgt_y + anchor_gain * (pos[1:2] - anc_used[1:2])
    tgt_z = jnp.full((1, L), ground_h, f32)
    target = jnp.concatenate([tgt_x, tgt_y, tgt_z], axis=0)
    tgt_out[:] = target

    # ---- 4. swing trajectory + analytic IK ----------------------------
    foot_now = jnp.where(ls > 0.5, p_l_w, p_r_w)
    nxt = foot_now + (target - foot_now) * progress
    swing_z = ground_h + gait_height * jnp.sin(jnp.pi * progress)
    nxt = jnp.concatenate([nxt[0:2], swing_z], axis=0)
    next_b = _mtv(R_wb, nxt - pos)

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

    mir_sw = jnp.where(ls > 0.5, 1.0, -1.0)               # swing side
    q_guess = jnp.where(ls > 0.5, q6[0:3], q6[3:6])
    swing_q = q_guess if "ik" in prof_skip \
        else ik_leg(next_b, q_guess, mir_sw)

    # ---- 5. contact schedule + moment arms over the horizon -----------
    # (control/gait.py:contact_schedule; arms per controller.tick:364-374)
    arm_l = jnp.where(ls > 0.5, target, p_l_w)
    arm_r = jnp.where(ls > 0.5, p_r_w, target)
    if "arms" not in prof_skip:
        for k in range(N):
            ph_k = _fmod_pos(t_now + (k * ts), cycle)
            on_k = ph_k >= swing_t                        # left stance
            arms_s[k] = jnp.where(on_k, arm_l, arm_r)

    # ---- 6. the fused MPC solve (re-entering _prep_mpc) ---------------
    _prep_mpc(N, nx, nu, mu_, iters, rho, alpha, ts, mass, height_des,
              xi, lambda k: arms_s[k], vdes, wdes, iinv_ref[:],
              zw_ref, yw_ref, qv_ref, pv_ref, dblk_ref,
              gmat_ref, gmt_ref, h_ref,
              z_out, y_out, res_out, None,
              S, w_ref, qe_ref, f_ref, dg_ref, Yv, ad_s, bd_s,
              anchor=anc_used, prof_skip=prof_skip)

    # ---- 7. GRF split + exact-ZOH SRBD plant step ---------------------
    # (controller.tick grf packing + models/srbd.py:srbd_step_vector)
    if "post" in prof_skip:
        xi_out[:] = xi
        q_out[:] = q6
        fl_out[:] = fl
        fr_out[:] = fr
        grf_out[:] = jnp.zeros((6, L), f32)
        return
    u0 = z_out[0:3]
    on0 = 1.0 - ls                                        # left stance now
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
    p_sw_w = p_new + _mv(R_new, fk_leg(swing_q, mir_sw))
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
                     "off_l", "off_r",
                     "geom", "q_diag", "r_diag", "p_diag", "Gu", "h",
                     "inertia", "interpret", "prof_skip"))
def fused_walking_tick(xi, q, foot_l, foot_r, z_warm, y_warm, anchor,
                       it, v_des, yaw_rate, *,
                       N: int, iters: int, rho: float, alpha: float,
                       ts: float, dt: float, mass: float,
                       height_des: float, cycle: float, swing_t: float,
                       stance_t: float, gait_height: float,
                       p_rel_max: float, ground_h: float, k_cap: float,
                       use_capture: bool, anchor_band: float,
                       anchor_gain: float, off_l, off_r, geom,
                       q_diag, r_diag, p_diag, Gu, h, inertia,
                       interpret: bool = False, prof_skip: tuple = ()):
    """Batched whole-tick kernel dispatch.

    xi [B,13]; q [B,6]; foot_l/foot_r [B,3]; z_warm [B,N*nu];
    y_warm [B,N*mu]; anchor [B,2]; it [B]; v_des [B,3]; yaw_rate [B].
    Returns (xi', q', foot_l', foot_r', z, y, anchor', residual [B],
    grf [B,6], target [B,3]).
    """
    B = xi.shape[0]
    nx = xi.shape[-1]
    nu = 3
    mu_ = len(Gu)
    n = N * nu
    m = N * mu_
    f32 = jnp.float32

    B_pad = ((B + LANES - 1) // LANES) * LANES
    xi = _pad_batch(xi, B_pad)
    q = _pad_batch(q, B_pad)
    foot_l = _pad_batch(foot_l, B_pad)
    foot_r = _pad_batch(foot_r, B_pad)
    z_warm = _pad_batch(z_warm, B_pad)
    y_warm = _pad_batch(y_warm, B_pad)
    anchor = _pad_batch(anchor, B_pad)
    it = _pad_batch(it, B_pad)
    v_des = _pad_batch(v_des, B_pad)
    yaw_rate = _pad_batch(yaw_rate, B_pad)

    xi_t = jnp.transpose(xi, (1, 0)).astype(f32)
    q_t = jnp.transpose(q, (1, 0)).astype(f32)
    fl_t = jnp.transpose(foot_l, (1, 0)).astype(f32)
    fr_t = jnp.transpose(foot_r, (1, 0)).astype(f32)
    zw_t = jnp.transpose(z_warm, (1, 0)).astype(f32)
    yw_t = jnp.transpose(y_warm, (1, 0)).astype(f32)
    anc_t = jnp.transpose(anchor, (1, 0)).astype(f32)
    it_t = it[None].astype(f32)
    vd_t = jnp.transpose(v_des, (1, 0)).astype(f32)
    wd_t = yaw_rate[None].astype(f32)

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
        float(anchor_band), float(anchor_gain),
        tuple(off_l), tuple(off_r), tuple(geom), prof_skip=tuple(prof_skip))

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

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((nx,)),           # xi
            spec((6,)),            # q
            spec((3,)),            # foot_l
            spec((3,)),            # foot_r
            spec((n,)),            # z_warm
            spec((m,)),            # y_warm
            spec((2,)),            # reference anchor xy
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
        ],
        out_specs=(spec((nx,)), spec((6,)), spec((3,)), spec((3,)),
                   spec((n,)), spec((m,)), spec((2,)), spec((1,)),
                   spec((6,)), spec((3,))),
        out_shape=(
            jax.ShapeDtypeStruct((nx, B_pad), f32),
            jax.ShapeDtypeStruct((6, B_pad), f32),
            jax.ShapeDtypeStruct((3, B_pad), f32),
            jax.ShapeDtypeStruct((3, B_pad), f32),
            jax.ShapeDtypeStruct((n, B_pad), f32),
            jax.ShapeDtypeStruct((m, B_pad), f32),
            jax.ShapeDtypeStruct((2, B_pad), f32),
            jax.ShapeDtypeStruct((1, B_pad), f32),
            jax.ShapeDtypeStruct((6, B_pad), f32),
            jax.ShapeDtypeStruct((3, B_pad), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), f32),        # S
            pltpu.VMEM((N * nx, nx, LANES), f32),  # w_ref
            pltpu.VMEM((N, nx, LANES), f32),       # qe_ref
            pltpu.VMEM((n, LANES), f32),           # f_ref
            pltpu.VMEM((n, LANES), f32),           # dg_ref
            pltpu.VMEM((n, LANES), f32),           # Yv
            pltpu.VMEM((nx, nx, LANES), f32),      # ad_s
            pltpu.VMEM((N * nx, nu, LANES), f32),  # bd_s
            pltpu.VMEM((N, 3, LANES), f32),        # arms_s
        ],
        interpret=interpret,
    )(xi_t, q_t, fl_t, fr_t, zw_t, yw_t, anc_t, it_t, vd_t, wd_t,
      jnp.asarray(q_np), jnp.asarray(p_np), jnp.asarray(dblk_np),
      jnp.asarray(gmat_np), jnp.asarray(gmat_np.T), jnp.asarray(h_np),
      jnp.asarray(iinv_np))

    xi_n, q_n, fl_n, fr_n, z_t, y_t, anc_n, res_t, grf_t, tgt_t = outs
    tr = lambda a: jnp.transpose(a, (1, 0))[:B]
    return (tr(xi_n), tr(q_n), tr(fl_n), tr(fr_n), tr(z_t), tr(y_t),
            tr(anc_n), res_t[0, :B], tr(grf_t), tr(tgt_t))


def supports_fused_tick(cfg) -> bool:
    """True when the walking config matches the kernel's closed form:
    walk mode, truth odometry, analytic IK, warm admm_fused solver,
    single-support gait (the kernel bakes the controller.tick:364-374
    arm/schedule logic for cfg.mode == 'walk')."""
    return (cfg.mode == "walk"
            and cfg.estimator_mode == "truth"
            and cfg.ik_method == "analytic"
            and cfg.qp_warm_start
            and cfg.srbd.solver.method == "admm_fused"
            and cfg.placement_mode in ("capture", "reference"))


def make_tick_fused(cfg, use_pallas=None, prof_skip=()):
    """Whole-tick stepper from the full controller config:
    fn(xi, q, foot_l, foot_r, z, y, it, v_des, yaw_rate) — one simulation
    tick per scenario (vmap for batches).

    Off-TPU (and unbatched) it runs the reference XLA composition
    (control/rollout.py:_plant_step_ref); under vmap on TPU the whole
    tick is ONE Pallas program.  `use_pallas="interpret"` runs the kernel
    through the interpreter (CPU parity tests).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    c = cfg.srbd
    N = c.horizon
    mu = float(c.friction_mu)
    Gu = ((1.0, 0.0, -mu), (-1.0, 0.0, -mu),
          (0.0, 1.0, -mu), (0.0, -1.0, -mu),
          (0.0, 0.0, 1.0), (0.0, 0.0, -1.0))
    hu = (0.0, 0.0, 0.0, 0.0, float(c.fz_max), -float(c.fz_min))
    h = tuple(hu) * N
    q_diag = tuple(float(v) for v in c.q_diag)
    r_diag = tuple(float(v) for v in c.r_diag)
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
        off_l=off_l, off_r=off_r, geom=geom,
        q_diag=q_diag, r_diag=r_diag, p_diag=p_diag, Gu=Gu, h=h,
        inertia=inertia, prof_skip=tuple(prof_skip))

    def _xla_batched(xi, q, fl, fr, z, y, anc, it, v_des, yaw_rate):
        """Reference composition, batched (off-TPU fallback)."""
        from mpc_limx_control_tpu.control import rollout as ro

        def one(xi1, q1, fl1, fr1, z1, y1, anc1, it1, vd1):
            st = ro.PlantState(xi=xi1, q=q1, foot_l=fl1, foot_r=fr1,
                               qp_z=z1, qp_lam=y1, ref_anchor=anc1)
            st2, mets = ro._plant_step_ref(cfg, st, it1, v_des=vd1)
            return (st2.xi, st2.q, st2.foot_l, st2.foot_r,
                    st2.qp_z, st2.qp_lam, st2.ref_anchor,
                    mets["qp_residual"], mets["grf"],
                    mets["foot_target"])

        del yaw_rate  # the composition reads cfg.desired_yaw_rate
        return jax.vmap(one)(xi, q, fl, fr, z, y, anc, it, v_des)

    @jax.custom_batching.custom_vmap
    def step(xi, q, fl, fr, z, y, anc, it, v_des, yaw_rate):
        if use_pallas:
            # single-scenario deployment shape (the 1 kHz real-time loop):
            # one 128-lane kernel instance beats ~100 small XLA ops
            outs = fused_walking_tick(
                xi[None], q[None], fl[None], fr[None], z[None], y[None],
                anc[None], it[None], v_des[None], yaw_rate[None],
                **statics, interpret=use_pallas == "interpret")
        else:
            outs = _xla_batched(xi[None], q[None], fl[None], fr[None],
                                z[None], y[None], anc[None], it[None],
                                v_des[None], yaw_rate[None])
        return tuple(o[0] for o in outs)

    @step.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else jnp.broadcast_to(a, (axis_size, *a.shape))
                for a, b in zip(args, in_batched)]
        if use_pallas:
            outs = fused_walking_tick(
                *args, **statics, interpret=use_pallas == "interpret")
        else:
            outs = _xla_batched(*args)
        return tuple(outs), tuple(True for _ in outs)

    return step
