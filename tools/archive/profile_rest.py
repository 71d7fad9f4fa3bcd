"""Fine-grained on-chip profile of the NON-MPC part of the walking tick.

NOTES.md's round-2 breakdown: fused MPC kernel ~6.5 ms, "rest" ~4.8 ms at
B=4096.  This decomposes the rest into its stages so the next optimization
targets the real cost, not a guess:

  gait    — gait_clock + foot_placement + swing_trajectory + schedule
  fk      — both-leg FK + world transforms + quat/rot conversions
  ik      — one analytic swing IK
  jac     — stance contact Jacobian + torque map
  plant   — SRBD step via linearize_shared + discretize_srbd + matvec
            (the current matrix-form path in control/rollout.py:165-182)
  plantv  — the same exact-ZOH update in explicit vector form (candidate)
  pin     — plant foot kinematics: swing FK + stance pinning IK
  rest    — the whole plant_step with grf_override (MPC skipped)

Methodology per NOTES.md: scalar host fetch for timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro
from mpc_limx_control_tpu.control import gait as gaitmod
from mpc_limx_control_tpu.models import kinematics as kin
from mpc_limx_control_tpu.models import srbd
from mpc_limx_control_tpu.utils import rotations as rot


def timeit(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    cfg = ControllerConfig.walking()
    dev = jax.devices()[0]
    B = int(os.environ.get("BENCH_BATCH",
                           4096 if dev.platform != "cpu" else 256))
    dtype = jnp.float32
    state0 = ro.initial_plant_state(cfg, batch=(B,))
    key = jax.random.PRNGKey(0)
    state0 = state0.replace(xi=state0.xi.at[:, 9].add(
        0.05 * jax.random.normal(key, (B,), dtype)))
    it0 = jnp.asarray(260.0, dtype)
    grf0 = jnp.zeros((B, 6), dtype)
    grf0 = grf0.at[:, 2].set(94.0)
    v_des = jnp.broadcast_to(jnp.asarray(cfg.desired_velocity, dtype),
                             (B, 3))

    gl = kin.leg_geometry(cfg.robot.legs, "left", dtype)
    gr = kin.leg_geometry(cfg.robot.legs, "right", dtype)

    # ---- whole rest ----
    @jax.jit
    def rest(state, grf):
        s, m = jax.vmap(
            lambda s, g: ro.plant_step(cfg, s, it0, grf_override=g))(
            state, grf)
        return s.xi.sum()

    # ---- gait pipeline ----
    @jax.jit
    def gait_stage(state):
        def one(s):
            g = gaitmod.gait_clock(cfg.gait, it0)
            tgt = gaitmod.foot_placement(cfg, g, s.xi[3:6], v_des[0],
                                         v_actual=s.xi[9:12])
            nxt = gaitmod.swing_trajectory(cfg.gait, g, s.foot_l, tgt,
                                           ground_height=cfg.ground_height)
            sched = gaitmod.contact_schedule(cfg.gait, it0,
                                             cfg.srbd.horizon, cfg.srbd.ts)
            return nxt.sum() + sched.sum() + tgt.sum()
        return jax.vmap(one)(state).sum()

    # ---- FK + transforms ----
    @jax.jit
    def fk_stage(state):
        def one(s):
            quat = rot.rpy_to_quat(s.xi[0:3])
            R_wb = rot.quat_to_rot(quat)
            p_l = kin.forward_kinematics(gl, s.q[:3])
            p_r = kin.forward_kinematics(gr, s.q[3:])
            p_l_w = s.xi[3:6] + R_wb @ p_l
            p_r_w = s.xi[3:6] + R_wb @ p_r
            return p_l_w.sum() + p_r_w.sum()
        return jax.vmap(one)(state).sum()

    # ---- one analytic IK ----
    @jax.jit
    def ik_stage(state):
        def one(s):
            q = kin.inverse_kinematics_analytic(
                gl, s.foot_l - s.xi[3:6], s.q[:3])
            return q.sum()
        return jax.vmap(one)(state).sum()

    # ---- stance Jacobian + torque ----
    @jax.jit
    def jac_stage(state, grf):
        def one(s, g):
            J = kin.contact_jacobian(gl, s.q[:3])
            return (-J.T @ g[:3]).sum()
        return jax.vmap(one)(state, grf).sum()

    # ---- plant, matrix form (current) ----
    @jax.jit
    def plant_mat(state, grf):
        def one(s, g):
            yaw = s.xi[2]
            feet = jnp.stack([s.foot_l, s.foot_r], axis=-2)
            Ac, Bc2 = srbd.linearize_shared(cfg.robot, feet, s.xi[3:6],
                                            yaw, dtype)
            Bc = jnp.concatenate([Bc2[0], Bc2[1]], axis=-1)
            Ad, Bd = srbd.discretize_srbd(Ac, Bc, cfg.gait.dt)
            return (Ad @ s.xi + Bd @ g).sum()
        return jax.vmap(one)(state, grf).sum()

    # ---- plant, explicit vector form (candidate) ----
    @jax.jit
    def plant_vec(state, grf):
        def one(s, g):
            return srbd.srbd_step_vector(
                cfg.robot, s.xi,
                jnp.stack([s.foot_l, s.foot_r], -2),
                g.reshape(2, 3), cfg.gait.dt).sum()
        return jax.vmap(one)(state, grf).sum()

    # ---- plant foot kinematics (swing FK + stance pin IK) ----
    @jax.jit
    def pin_stage(state):
        def one(s):
            R_new = rot.quat_to_rot(rot.rpy_to_quat(s.xi[0:3]))
            p_sw_b = kin.forward_kinematics(gl, s.q[:3])
            p_sw_w = s.xi[3:6] + R_new @ p_sw_b
            q_st = kin.inverse_kinematics_analytic(
                gr, R_new.T @ (s.foot_r - s.xi[3:6]), s.q[3:])
            return p_sw_w.sum() + q_st.sum()
        return jax.vmap(one)(state).sum()

    stages = [("rest (whole, grf held)", rest, (state0, grf0))]
    if hasattr(srbd, "srbd_step_vector"):
        stages.append(("plant vector form", plant_vec, (state0, grf0)))
    stages += [
        ("plant matrix form", plant_mat, (state0, grf0)),
        ("gait+placement+swing+sched", gait_stage, (state0,)),
        ("fk both legs + rot", fk_stage, (state0,)),
        ("one analytic IK", ik_stage, (state0,)),
        ("stance jac+torque", jac_stage, (state0, grf0)),
        ("pin kinematics (fk+ik)", pin_stage, (state0,)),
    ]
    print(f"B={B} device={dev}")
    for name, fn, args in stages:
        try:
            t = timeit(fn, *args)
            print(f"{name:28s}: {t*1e3:7.3f} ms")
        except Exception as e:
            print(f"{name:28s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
