"""Gait clock / foot placement / swing trajectory tests vs the reference
semantics (include/MPCController.h:61-175)."""

import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig, GaitParams
from mpc_limx_control_tpu.control import gait as gaitmod


CFG = ControllerConfig()
G = CFG.gait


def ref_gait(iteration):
    """Literal transcription of MPC::calculateGait semantics for testing."""
    t = iteration * G.dt
    cycle = G.swing_time + G.stance_time
    phase = np.fmod(t, cycle)
    if phase < G.swing_time:
        return True, phase, G.swing_time - phase
    return False, phase, cycle - phase


def test_gait_clock_matches_reference_semantics():
    for it in [0, 1, 250, 499, 500, 501, 750, 999, 1000, 1001, 12345]:
        st = gaitmod.gait_clock(G, jnp.asarray(float(it)))
        left, phase, remain = ref_gait(it)
        assert bool(st.left_swing) == left, it
        np.testing.assert_allclose(float(st.phase), phase, atol=1e-5)
        np.testing.assert_allclose(float(st.remain_swing_time), remain,
                                   atol=1e-5)


def test_gait_clock_batched():
    its = jnp.arange(0, 2000, 7, dtype=jnp.float32)
    st = gaitmod.gait_clock(G, its)
    assert st.left_swing.shape == its.shape
    # duty factor ~0.5
    frac = float(jnp.mean(st.left_swing.astype(jnp.float32)))
    assert 0.45 < frac < 0.55


def test_foot_placement_formula():
    """Check against a hand evaluation of include/MPCController.h:106-131."""
    st = gaitmod.gait_clock(G, jnp.asarray(100.0))   # left swing, 0.4s left
    base = jnp.asarray([1.0, 2.0, 0.6])
    v_des = jnp.asarray([1.0, 0.0, 0.0])
    target = gaitmod.foot_placement(CFG, st, base, v_des)

    remain = 0.5 - 0.1
    predicted = np.array([1.0, 2.0, 0.6]) + np.array([1.0, 0, 0]) * remain
    pfx = min(max(1.0 * 0.5 * G.stance_time, -0.3), 0.3)
    expected_x = predicted[0] + pfx + CFG.robot.nominal_foot_offset_left[0]
    expected_y = predicted[1] + 0.0 + CFG.robot.nominal_foot_offset_left[1]
    np.testing.assert_allclose(float(target[0]), expected_x, rtol=1e-6)
    np.testing.assert_allclose(float(target[1]), expected_y, rtol=1e-6)
    assert float(target[2]) == 0.0


def test_placement_clamp():
    st = gaitmod.gait_clock(G, jnp.asarray(100.0))
    base = jnp.zeros(3)
    v_des = jnp.asarray([5.0, -5.0, 0.0])    # would exceed p_rel_max
    t_fast = gaitmod.foot_placement(CFG, st, base, v_des)
    v_des2 = jnp.asarray([0.3 / (0.5 * G.stance_time), -0.3 / (0.5 * G.stance_time), 0.0])
    # the capture offset saturates at +/-0.3 (include/MPCController.h:111-117)
    t_sat = gaitmod.foot_placement(CFG, st, base, v_des2)
    # difference only from the (unclamped) predicted-position term
    dv = (np.asarray(v_des) - np.asarray(v_des2)) * float(
        st.remain_swing_time)
    np.testing.assert_allclose(np.asarray(t_fast - t_sat)[:2], dv[:2],
                               rtol=1e-5)


def test_swing_trajectory_profile():
    st = gaitmod.gait_clock(G, jnp.asarray(250.0))   # mid-swing (s = 0.5)
    foot = jnp.asarray([0.0, 0.105, 0.0])
    target = jnp.asarray([0.4, 0.105, 0.0])
    nxt = gaitmod.swing_trajectory(G, st, foot, target)
    np.testing.assert_allclose(float(nxt[0]), 0.2, atol=1e-6)
    # apex height at mid swing = gait_height (include/MPCController.h:158)
    np.testing.assert_allclose(float(nxt[2]), G.gait_height, atol=1e-6)


def test_contact_schedule_spans_switch():
    N = 20
    sched = gaitmod.contact_schedule(G, jnp.asarray(400.0), N, 0.025)
    sched = np.asarray(sched)
    # at t=0.4s left swings (left_stance False); switch at 0.5s -> step 4
    assert not sched[0:4].any()
    assert sched[4:20].all()
