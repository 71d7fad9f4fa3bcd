"""Gait schedule, foot placement, and swing-foot trajectory.

Pure-functional, batched counterparts of the reference's live control brain
(include/MPCController.h):

* :func:`gait_clock` — the fixed-cycle phase clock of MPC::calculateGait
  (include/MPCController.h:61-75): phase = fmod(iter*dt, swing+stance);
  phase < swing_time => left swings / right stands, else flipped.
* :func:`foot_placement` — MPC::computeFootPlacement
  (include/MPCController.h:106-132): predicted base position from the
  desired velocity plus half-stance capture offset clamped to +/-0.3 m,
  z = 0, plus the static leg offset.
* :func:`swing_trajectory` — MPC::computeSwingFootDesiredPosition
  (include/MPCController.h:134-158): linear interpolation toward the
  target scaled by elapsed swing fraction, sinusoidal apex height.
* :func:`contact_schedule` — horizon-long support-foot schedule for
  contact-scheduled (LTV) SRBD MPC; the reference only ever linearizes
  about the instantaneous support foot.

Everything broadcasts over arbitrary leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpc_limx_control_tpu.core.config import ControllerConfig, GaitParams
from mpc_limx_control_tpu.core.types import GaitState


def gait_clock(gait: GaitParams, iteration: jnp.ndarray) -> GaitState:
    """Leg states at control tick `iteration` (int or float array)."""
    t = iteration * gait.dt
    cycle = gait.cycle_time
    phase = jnp.mod(t, cycle)
    left_swing = phase < gait.swing_time
    remain = jnp.where(left_swing, gait.swing_time - phase, cycle - phase)
    progress = (gait.swing_time - remain) / gait.swing_time
    return GaitState(left_swing=left_swing, phase=phase,
                     remain_swing_time=remain, swing_progress=progress)


def foot_placement(cfg: ControllerConfig, state: GaitState,
                   base_pos: jnp.ndarray, v_des: jnp.ndarray,
                   v_actual: jnp.ndarray | None = None) -> jnp.ndarray:
    """Swing-foot touchdown target [..., 3] in world frame.

    placement_mode == "reference" mirrors include/MPCController.h:106-132
    including its quirks: prediction and capture offset from the *desired*
    velocity only, z of the predicted position is 0 and the static offset's
    z is NOT added (the reference only assigns x,y of finalPosition at
    :126-130, leaving z to the swing-height profile).

    placement_mode == "capture" is the working law: prediction and
    half-stance offset from the *measured* velocity (as the commented-out
    variant at include/MPCController.h:78-103 did) plus the Raibert/
    capture-point correction sqrt(h/g) (v - v_des).
    """
    gait = cfg.gait
    if cfg.placement_mode == "capture" and v_actual is not None:
        v_pred = v_actual
        k_cap = cfg.capture_gain_scale * jnp.sqrt(cfg.base_height / 9.81)
        correction = k_cap * (v_actual[..., :2] - v_des[..., :2])
    else:
        v_pred = v_des
        correction = 0.0
    predicted = base_pos + v_pred * state.remain_swing_time[..., None]
    p_rel = jnp.clip(v_pred[..., :2] * (0.5 * gait.stance_time)
                     + correction,
                     -gait.p_rel_max, gait.p_rel_max)
    xy = predicted[..., :2] + p_rel

    if cfg.placement_mode == "reference":
        # reference-literal offsets, including their swapped y signs
        off_l = jnp.asarray(cfg.robot.static_foot_offset_left[:2], xy.dtype)
        off_r = jnp.asarray(cfg.robot.static_foot_offset_right[:2], xy.dtype)
    else:
        off_l = jnp.asarray(cfg.robot.nominal_foot_offset_left[:2], xy.dtype)
        off_r = jnp.asarray(cfg.robot.nominal_foot_offset_right[:2], xy.dtype)
    offset = jnp.where(state.left_swing[..., None], off_l, off_r)
    xy = xy + offset
    z = jnp.full((*xy.shape[:-1], 1), cfg.ground_height, xy.dtype)
    return jnp.concatenate([xy, z], axis=-1)


def swing_trajectory(gait: GaitParams, state: GaitState,
                     foot_now: jnp.ndarray,
                     target: jnp.ndarray,
                     ground_height: float = 0.0) -> jnp.ndarray:
    """Next swing-foot position [..., 3] (world frame).

    Linear x/y interpolation by elapsed swing fraction; z replaced by the
    sinusoidal height profile gait_height * sin(pi * s)
    (include/MPCController.h:155-158).
    """
    s = state.swing_progress[..., None]
    nxt = foot_now + (target - foot_now) * s
    z = (ground_height
         + gait.gait_height * jnp.sin(jnp.pi * state.swing_progress))
    return nxt.at[..., 2].set(z)


def contact_schedule(gait: GaitParams, iteration: jnp.ndarray, N: int,
                     dt_mpc: float):
    """Support-foot schedule over the MPC horizon.

    Returns left_stance [..., N] bool: True when the LEFT foot is the
    support foot at horizon step k (the gait clock advanced k*dt_mpc from
    `iteration`).  Left stands when the left leg is NOT swinging.
    """
    t0 = iteration * gait.dt
    k = jnp.arange(N, dtype=jnp.result_type(t0, jnp.float32))
    t = t0[..., None] + k * dt_mpc
    phase = jnp.mod(t, gait.cycle_time)
    left_swing = phase < gait.swing_time
    return ~left_swing
