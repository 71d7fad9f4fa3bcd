"""Whole-tick fused Pallas kernel vs the XLA reference composition.

The kernel (ops/tick_fused_pallas.py) must reproduce the unfused tick
(control/rollout.py:_plant_step_ref — gait, placement, swing IK,
contact-scheduled fused MPC, SRBD plant step, foot pinning) on identical
inputs.  The only allowed deviation is the fused MPC core's
exact-triangular-solve vs the generic ADMM's explicit f32 K^-1 (bounded
well under closed-loop tolerance — tests/test_mpc_fused.py).

Runs in interpreter mode on CPU; the real-backend validation is
tools/smoke_tpu.py (compile+run of every kernel variant on the chip —
a required snapshot gate, see NOTES.md) plus the bench quality gate.

Interpret-mode cost scales ~N^2 with the MPC horizon (the unrolled
condensation), so the DEFAULT suite runs one smoke-level parity per
kernel mode at horizon 8 (~N^2/6 the graph; every code path — gait,
placement, IK, condensation, Cholesky, warm ADMM, plant, in-kernel KF —
still executes), while the full-size (N=20) equivalence suite runs
under RUN_SLOW=1, which remains a binding pre-snapshot gate (NOTES.md).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro
from mpc_limx_control_tpu.ops import tick_fused_pallas as tf

RUN_SLOW = os.environ.get("RUN_SLOW", "") == "1"
slow = pytest.mark.skipif(
    not RUN_SLOW,
    reason="full-size (N=20) interpret-mode kernel equivalence; "
           "RUN_SLOW=1 — binding pre-snapshot gate (NOTES.md)")


def _small(cfg):
    """Horizon-8 variant of a controller config (fast interpret)."""
    return dataclasses.replace(
        cfg, srbd=dataclasses.replace(cfg.srbd, horizon=8))


@pytest.fixture(autouse=True)
def _free_compile_memory():
    """Every test here compiles 1-2 GB of interpret-mode Pallas kernels
    (measured); without freeing them the accumulated XLA executables
    abort the full-suite process near the end of this module.  Drop the
    step-function lru cache (which pins compiled callables) and JAX's
    compilation caches after each test."""
    yield
    import gc
    ro._fused_tick_fn.cache_clear()
    jax.clear_caches()
    gc.collect()


def _states(B, key, cfg):
    s0 = ro.initial_plant_state(cfg, batch=(B,))
    k1, k2, k3 = jax.random.split(key, 3)
    xi = s0.xi.at[:, 9].add(0.08 * jax.random.normal(k1, (B,), jnp.float32))
    xi = xi.at[:, 10].add(0.05 * jax.random.normal(k2, (B,), jnp.float32))
    xi = xi.at[:, 2].add(0.1 * jax.random.normal(k3, (B,), jnp.float32))
    return s0.replace(xi=xi)


def _run_ref(cfg, s, its, v_des):
    def one(s1, it1):
        st, m = ro._plant_step_ref(cfg, s1, it1, v_des=v_des)
        return st, m
    return jax.vmap(one)(s, its)


def _run_fused(cfg, s, its, v_des):
    step = tf.make_tick_fused(cfg, use_pallas="interpret")
    dtype = s.xi.dtype
    vd = jnp.broadcast_to(jnp.asarray(v_des, dtype), (s.xi.shape[0], 3))
    wd = jnp.zeros((s.xi.shape[0],), dtype) + cfg.desired_yaw_rate
    anc = (s.ref_anchor if s.ref_anchor is not None
           else jnp.concatenate([s.xi[..., 3:5], s.xi[..., 2:3]], -1))
    outs = jax.vmap(step)(s.xi, s.q, s.foot_l, s.foot_r,
                          s.qp_z, s.qp_lam, anc, its, vd, wd)
    xi, q, fl, fr, z, y, anc_n, res, grf, tgt = outs
    st = s.replace(xi=xi, q=q, foot_l=fl, foot_r=fr, qp_z=z, qp_lam=y,
                   ref_anchor=(anc_n if s.ref_anchor is not None
                               else None))
    return st, {"grf": grf, "qp_residual": res, "foot_target": tgt}


@slow
def test_tick_fused_matches_composition_one_step():
    cfg = ControllerConfig.walking()
    B = 6
    s = _states(B, jax.random.PRNGKey(0), cfg)
    # stagger phases across the batch: both swing sides + near-switch
    its = jnp.asarray([0.0, 40.0, 180.0, 299.0, 300.0, 455.0], jnp.float32)
    v_des = (0.5, 0.0, 0.0)

    st_r, m_r = _run_ref(cfg, s, its, v_des)
    st_f, m_f = _run_fused(cfg, s, its, v_des)

    # xi atol: the kernel's exact triangular solves vs the generic
    # ADMM's explicit f32 K^-1 leave a per-solve control gap that the
    # round-4 5-iteration warm budget closes less than 8 iterations did
    # (measured 2e-4 worst element; closed-loop tolerance is ~1e-1)
    np.testing.assert_allclose(np.asarray(st_f.xi), np.asarray(st_r.xi),
                               atol=3e-4)
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(st_f.foot_l),
                               np.asarray(st_r.foot_l), atol=5e-4)
    np.testing.assert_allclose(np.asarray(st_f.foot_r),
                               np.asarray(st_r.foot_r), atol=5e-4)
    np.testing.assert_allclose(np.asarray(m_f["foot_target"]),
                               np.asarray(m_r["foot_target"]), atol=1e-5)
    # the reference anchor must thread identically (integral placement
    # action state; cfg.ref_anchor_band > 0 in the walking preset)
    assert (st_f.ref_anchor is None) == (st_r.ref_anchor is None)
    if st_f.ref_anchor is not None:
        np.testing.assert_allclose(np.asarray(st_f.ref_anchor),
                                   np.asarray(st_r.ref_anchor), atol=1e-5)
    # GRF on a ~100 N scale; the fused MPC core deviates from the generic
    # ADMM only via exact-vs-explicit-inverse solves
    np.testing.assert_allclose(np.asarray(m_f["grf"]),
                               np.asarray(m_r["grf"]),
                               atol=5e-2)
    # warm-start trajectory: the near horizon (what feeds the next tick's
    # first controls) must agree tightly; the far tail may deviate by the
    # documented exact-solve vs explicit-f32-K^-1 gap (NOTES.md: the XLA
    # path's K^-1 error alone is ~1 N on a 108 N scale)
    np.testing.assert_allclose(np.asarray(st_f.qp_z)[:, :9],
                               np.asarray(st_r.qp_z)[:, :9], atol=5e-2)
    np.testing.assert_allclose(np.asarray(st_f.qp_z),
                               np.asarray(st_r.qp_z), atol=5.0)


@slow
def test_tick_fused_multi_step_warm_threading():
    """Warm state (z, y) must thread tick-to-tick identically: run 5
    consecutive ticks and compare the final state."""
    cfg = ControllerConfig.walking()
    B = 3
    s_r = _states(B, jax.random.PRNGKey(1), cfg)
    s_f = s_r
    its0 = jnp.asarray([10.0, 200.0, 310.0], jnp.float32)
    v_des = (0.5, 0.0, 0.0)
    for j in range(5):
        its = its0 + float(j)
        s_r, m_r = _run_ref(cfg, s_r, its, v_des)
        s_f, m_f = _run_fused(cfg, s_f, its, v_des)

    np.testing.assert_allclose(np.asarray(s_f.xi), np.asarray(s_r.xi),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_f.q), np.asarray(s_r.q),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(m_f["grf"]),
                               np.asarray(m_r["grf"]), atol=2e-1)


def test_supports_fused_tick_predicate():
    cfg = ControllerConfig.walking()
    assert tf.supports_fused_tick(cfg)
    assert tf.supports_fused_tick(ControllerConfig.standing())
    assert tf.supports_fused_tick(
        dataclasses.replace(cfg, estimator_mode="kf"))
    assert not tf.supports_fused_tick(
        dataclasses.replace(cfg, ik_method="damped_ls"))
    assert not tf.supports_fused_tick(
        dataclasses.replace(cfg, qp_warm_start=False))


@slow
def test_tick_fused_stand_matches_composition():
    """Standing (two-foot nu = 6) whole-tick kernel vs the unfused
    composition: one tick from perturbed initial states."""
    cfg = ControllerConfig.standing()
    B = 4
    s = _states(B, jax.random.PRNGKey(2), cfg)
    its = jnp.asarray([0.0, 17.0, 310.0, 599.0], jnp.float32)
    v_des = (0.0, 0.0, 0.0)

    st_r, m_r = _run_ref(cfg, s, its, v_des)
    st_f, m_f = _run_fused(cfg, s, its, v_des)

    np.testing.assert_allclose(np.asarray(st_f.xi), np.asarray(st_r.xi),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(st_f.q), np.asarray(st_r.q),
                               atol=1e-4)
    # feet stay pinned
    np.testing.assert_allclose(np.asarray(st_f.foot_l),
                               np.asarray(s.foot_l), atol=0)
    np.testing.assert_allclose(np.asarray(st_f.foot_r),
                               np.asarray(s.foot_r), atol=0)
    np.testing.assert_allclose(np.asarray(m_f["foot_target"]),
                               np.asarray(m_r["foot_target"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_f["grf"]),
                               np.asarray(m_r["grf"]), atol=5e-2)
    np.testing.assert_allclose(np.asarray(st_f.qp_z)[:, :18],
                               np.asarray(st_r.qp_z)[:, :18], atol=5e-2)


@slow
def test_tick_fused_stand_multi_step():
    """Standing warm threading: 5 consecutive ticks, final state parity,
    and the closed loop stays upright (height near the set point)."""
    cfg = ControllerConfig.standing()
    B = 3
    s_r = s_f = _states(B, jax.random.PRNGKey(3), cfg)
    its0 = jnp.asarray([3.0, 150.0, 410.0], jnp.float32)
    v_des = (0.0, 0.0, 0.0)
    for j in range(5):
        its = its0 + float(j)
        s_r, m_r = _run_ref(cfg, s_r, its, v_des)
        s_f, m_f = _run_fused(cfg, s_f, its, v_des)

    np.testing.assert_allclose(np.asarray(s_f.xi), np.asarray(s_r.xi),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_f.q), np.asarray(s_r.q),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(m_f["grf"]),
                               np.asarray(m_r["grf"]), atol=2e-1)
    assert np.all(np.abs(np.asarray(s_f.xi)[:, 5] - 0.65) < 0.05)


@slow
def test_tick_fused_kf_mode_matches_composition(monkeypatch):
    """KF-in-the-loop fused dispatch (12-state filter IN-KERNEL:
    sensor synthesis + contact-gated predict/update + xy conditioning)
    vs the full unfused composition, threaded over 5 consecutive ticks
    (filter state, warm QP state, and anchor must all agree)."""
    monkeypatch.setenv("MPC_TPU_FUSED_TICK", "interpret")
    cfg = dataclasses.replace(ControllerConfig.walking(),
                              estimator_mode="kf")
    B = 3
    s0 = ro.initial_plant_state(cfg, batch=(B,))
    k1 = jax.random.PRNGKey(3)
    s0 = s0.replace(xi=s0.xi.at[:, 9].add(
        0.06 * jax.random.normal(k1, (B,), jnp.float32)))
    its0 = jnp.asarray([5.0, 210.0, 320.0], jnp.float32)

    assert ro._use_fused_tick(cfg, s0)
    s_r = s_f = s0
    for j in range(5):
        its = its0 + float(j)
        s_r, m_r = jax.vmap(
            lambda s1, it1: ro._plant_step_ref(cfg, s1, it1))(s_r, its)
        s_f, m_f = jax.vmap(
            lambda s1, it1: ro.plant_step(cfg, s1, it1))(s_f, its)

    np.testing.assert_allclose(np.asarray(s_f.xi), np.asarray(s_r.xi),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_f.kf.x_hat),
                               np.asarray(s_r.kf.x_hat), atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_f.kf.p_cov),
                               np.asarray(s_r.kf.p_cov), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_f["grf"]),
                               np.asarray(m_r["grf"]), atol=2e-1)
    np.testing.assert_allclose(np.asarray(m_f["est_error"]),
                               np.asarray(m_r["est_error"]), atol=1e-4)
    assert "kf_cov_pos" in m_f and "kf_cov_vel" in m_f


def test_plant_step_dispatcher_off_tpu_unchanged():
    """On CPU the dispatcher must stay on the reference composition."""
    cfg = ControllerConfig.walking()
    s = _states(2, jax.random.PRNGKey(2), cfg)
    assert not ro._use_fused_tick(cfg, s)  # cpu backend in tests
    st, m = jax.vmap(lambda s1, it1: ro.plant_step(cfg, s1, it1))(
        s, jnp.asarray([0.0, 100.0], jnp.float32))
    assert np.isfinite(np.asarray(st.xi)).all()


@slow
def test_tick_fused_stand_kf_matches_composition(monkeypatch):
    """Standing + in-kernel KF (both-feet contact gating): fused dispatch
    vs the unfused composition over 4 consecutive ticks."""
    monkeypatch.setenv("MPC_TPU_FUSED_TICK", "interpret")
    cfg = dataclasses.replace(ControllerConfig.standing(),
                              estimator_mode="kf")
    B = 2
    s0 = ro.initial_plant_state(cfg, batch=(B,))
    s0 = s0.replace(xi=s0.xi.at[:, 9].add(
        0.04 * jax.random.normal(jax.random.PRNGKey(5), (B,),
                                 jnp.float32)))
    its0 = jnp.asarray([2.0, 330.0], jnp.float32)

    assert ro._use_fused_tick(cfg, s0)
    s_r = s_f = s0
    for j in range(4):
        its = its0 + float(j)
        s_r, m_r = jax.vmap(
            lambda s1, it1: ro._plant_step_ref(cfg, s1, it1))(s_r, its)
        s_f, m_f = jax.vmap(
            lambda s1, it1: ro.plant_step(cfg, s1, it1))(s_f, its)

    np.testing.assert_allclose(np.asarray(s_f.xi), np.asarray(s_r.xi),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_f.kf.x_hat),
                               np.asarray(s_r.kf.x_hat), atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_f.kf.p_cov),
                               np.asarray(s_r.kf.p_cov), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_f["grf"]),
                               np.asarray(m_r["grf"]), atol=2e-1)


@slow
@pytest.mark.parametrize("est", ["truth", "kf"])
def test_resident_rollout_matches_plant_step_scan(monkeypatch, est):
    """batched_rollout_resident (batch-last carry, one transpose per
    rollout) must reproduce the plant_step-dispatch scan (transposes
    every tick) exactly — identical kernel invocations, layout only."""
    monkeypatch.setenv("MPC_TPU_FUSED_TICK", "interpret")
    cfg = dataclasses.replace(ControllerConfig.walking(),
                              estimator_mode=est)
    B, T = 2, 4
    s0 = ro.initial_plant_state(cfg, batch=(B,))
    s0 = s0.replace(xi=s0.xi.at[:, 9].add(
        0.05 * jax.random.normal(jax.random.PRNGKey(9), (B,),
                                 jnp.float32)))
    assert ro._use_fused_tick(cfg, s0)

    f_ref, m_ref = ro.batched_rollout(cfg, s0, T)
    f_res, m_res = ro.batched_rollout_resident(cfg, s0, T,
                                               use_pallas="interpret")

    np.testing.assert_allclose(np.asarray(f_res.xi), np.asarray(f_ref.xi),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_res.q), np.asarray(f_ref.q),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_res.qp_z),
                               np.asarray(f_ref.qp_z), atol=1e-6)
    for k in ("height", "velocity", "grf", "qp_residual", "foot_target",
              "est_error"):
        np.testing.assert_allclose(np.asarray(m_res[k]),
                                   np.asarray(m_ref[k]), atol=1e-6,
                                   err_msg=k)
    if est == "kf":
        np.testing.assert_allclose(np.asarray(f_res.kf.x_hat),
                                   np.asarray(f_ref.kf.x_hat), atol=1e-6)
        for k in ("kf_cov_pos", "kf_cov_vel"):
            np.testing.assert_allclose(np.asarray(m_res[k]),
                                       np.asarray(m_ref[k]), atol=1e-6,
                                       err_msg=k)


@slow
def test_fused_hold_tick_matches_composition(monkeypatch):
    """The dtMPC schedule (solve every 5th tick, hold in between) with
    the HOLD variant of the whole-tick kernel vs the unfused
    composition: 10 consecutive ticks (2 solve + 8 hold)."""
    cfg = ControllerConfig.walking()
    B = 2
    s0 = _states(B, jax.random.PRNGKey(11), cfg)
    its0 = jnp.asarray([5.0, 210.0], jnp.float32)

    def run(env):
        monkeypatch.setenv("MPC_TPU_FUSED_TICK", env)
        s = s0
        grf = None
        ms = []
        for j in range(10):
            its = its0 + float(j)
            if j % 5 == 0:
                s, m = jax.vmap(
                    lambda s1, it1: ro.plant_step(cfg, s1, it1))(s, its)
                grf = m["grf"]
            else:
                s, m = jax.vmap(
                    lambda s1, it1, g1: ro.plant_step(
                        cfg, s1, it1, grf_override=g1))(s, its, grf)
            ms.append(m)
        return s, ms

    s_r, m_r = run("0")            # unfused composition
    s_f, m_f = run("interpret")    # fused solve + fused HOLD kernels

    np.testing.assert_allclose(np.asarray(s_f.xi), np.asarray(s_r.xi),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_f.q), np.asarray(s_r.q),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_f.foot_l),
                               np.asarray(s_r.foot_l), atol=1e-3)
    # held ticks: identical grf passthrough, zero residual
    for j in (1, 2, 6, 7):
        np.testing.assert_allclose(np.asarray(m_f[j]["grf"]),
                                   np.asarray(m_r[j]["grf"]), atol=2e-1)
        assert float(np.abs(np.asarray(m_f[j]["qp_residual"])).max()) \
            == 0.0


@pytest.mark.parametrize("mode", ["walk", "stand", "kf", "hold"])
def test_tick_fused_smoke_parity_small_horizon(monkeypatch, mode):
    """DEFAULT-suite fused-vs-unfused parity, one per kernel mode, at
    horizon 8 (~6x smaller interpret graph than N=20; every kernel code
    path — gait clock, placement, swing IK, in-kernel SRBD
    linearization/ZOH/reference, condensation, Cholesky, warm ADMM,
    plant step, and for "kf" the in-kernel 12-state filter — still
    executes).  The full-size N=20 equivalence tests above run under
    RUN_SLOW=1 (binding pre-snapshot gate, NOTES.md)."""
    monkeypatch.setenv("MPC_TPU_FUSED_TICK", "interpret")
    if mode == "stand":
        cfg = _small(ControllerConfig.standing())
    elif mode == "kf":
        cfg = _small(dataclasses.replace(ControllerConfig.walking(),
                                         estimator_mode="kf"))
    else:
        cfg = _small(ControllerConfig.walking())
    B = 2
    s0 = ro.initial_plant_state(cfg, batch=(B,))
    s0 = s0.replace(xi=s0.xi.at[:, 9].add(
        0.05 * jax.random.normal(jax.random.PRNGKey(13), (B,),
                                 jnp.float32)))
    its = jnp.asarray([5.0, 320.0], jnp.float32)
    assert ro._use_fused_tick(cfg, s0)

    def run(env, steps=2):
        monkeypatch.setenv("MPC_TPU_FUSED_TICK", env)
        s, grf = s0, None
        for j in range(steps):
            if mode == "hold" and j > 0:
                s, m = jax.vmap(lambda s1, it1, g1: ro.plant_step(
                    cfg, s1, it1, grf_override=g1))(s, its + float(j),
                                                    grf)
            else:
                s, m = jax.vmap(lambda s1, it1: ro.plant_step(
                    cfg, s1, it1))(s, its + float(j))
                grf = m["grf"]
        return s, m

    s_f, m_f = run("interpret")
    s_r, m_r = run("0")

    np.testing.assert_allclose(np.asarray(s_f.xi), np.asarray(s_r.xi),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_f.q), np.asarray(s_r.q),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(m_f["grf"]),
                               np.asarray(m_r["grf"]), atol=2e-1)
    if mode == "kf":
        np.testing.assert_allclose(np.asarray(s_f.kf.x_hat),
                                   np.asarray(s_r.kf.x_hat), atol=5e-4)
        np.testing.assert_allclose(np.asarray(s_f.kf.p_cov),
                                   np.asarray(s_r.kf.p_cov), atol=5e-4)
    if mode == "hold":
        assert float(np.abs(np.asarray(m_f["qp_residual"])).max()) == 0.0
