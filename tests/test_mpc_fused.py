"""Fused condensation+ADMM Pallas kernel vs the XLA reference composition.

The kernel (ops/mpc_fused_pallas.py) must produce the same ADMM iterates
as ops/condense.py:condense + ops/qp.py:_batched_admm on identical
walking-shaped inputs (same iteration count, same warm state) — the only
allowed deviation is the exact-triangular-solve vs explicit-f32-inverse
difference, well under closed-loop tolerance.

Runs in interpreter mode on CPU; the real-TPU validation is the bench
quality gate + examples/run_walking.py flows.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.models import srbd
from mpc_limx_control_tpu.ops import condense as cnd
from mpc_limx_control_tpu.ops import mpc_fused_pallas as fused
from mpc_limx_control_tpu.ops import qp as qps

RUN_SLOW = os.environ.get("RUN_SLOW", "") == "1"
slow = pytest.mark.skipif(
    not RUN_SLOW,
    reason="full-size (N=20) interpret-mode kernel equivalence; "
           "RUN_SLOW=1 — binding pre-snapshot gate (NOTES.md)")


def _small_cfg():
    cfg = ControllerConfig.walking()
    return dataclasses.replace(
        cfg, srbd=dataclasses.replace(cfg.srbd, horizon=8))


def _walking_inputs(B, key, cfg=None):
    """Realistic single-support walking QP inputs for B scenarios."""
    cfg = cfg or ControllerConfig.walking()
    c = cfg.srbd
    N = c.horizon
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pos = jnp.asarray([0.0, 0.0, 0.65], jnp.float32) + \
        0.02 * jax.random.normal(k1, (B, 3), jnp.float32)
    yaw = 0.1 * jax.random.normal(k2, (B,), jnp.float32)
    arms = pos[:, None, :] + jnp.asarray([0.02, 0.1, -0.65]) + \
        0.03 * jax.random.normal(k3, (B, N, 3), jnp.float32)
    Ac, Bc_t = jax.vmap(
        lambda a, p, y: srbd.linearize_shared(cfg.robot, a, p, y,
                                              jnp.float32))(arms, pos, yaw)
    Ad, Bd_t = srbd.discretize_srbd(Ac, Bc_t, c.ts)
    xi0 = jax.vmap(srbd.initial_state)(
        jnp.concatenate([0.01 * jax.random.normal(k4, (B, 2)),
                         yaw[:, None]], -1),
        pos,
        jnp.zeros((B, 3)),
        jnp.asarray([0.4, 0.0, 0.0]) + jnp.zeros((B, 3)))
    v_des = jnp.broadcast_to(jnp.asarray([0.5, 0.0, 0.0]), (B, 3))
    x_ref = jax.vmap(lambda x, v: srbd.walking_reference(
        x, c, N, v, jnp.zeros(()), height_des=0.65))(xi0, v_des)
    return cfg, Ad.astype(jnp.float32), Bd_t.astype(jnp.float32), \
        x_ref.astype(jnp.float32), xi0.astype(jnp.float32)


def _xla_reference(cfg, Ad, Bd_t, x_ref, xi0, z_w, y_w, iters):
    c = cfg.srbd
    N = c.horizon
    Q = jnp.diag(jnp.asarray(c.q_diag, jnp.float32))
    R = jnp.diag(jnp.asarray(c.r_diag, jnp.float32))
    P = c.p_scale * Q
    G, h = srbd.friction_cone_rows(c, N, jnp.float32)
    qp = jax.vmap(lambda a, b, xr, x0: cnd.condense(
        a, b, Q, R, P, N, x0, xr, None, None, extra_G=G,
        extra_h=h))(Ad, Bd_t, x_ref, xi0)
    B = Ad.shape[0]
    sol, zy = qps._batched_admm(
        qp.H, qp.f, jnp.broadcast_to(G, (B, *G.shape)),
        jnp.broadcast_to(h, (B, *h.shape)), z_w, y_w,
        iters, c.solver.admm_rho, c.solver.admm_alpha, False)
    return sol, zy


@slow
@pytest.mark.parametrize("B", [4, 130])
def test_fused_matches_xla_reference(B):
    key = jax.random.PRNGKey(3)
    cfg, Ad, Bd_t, x_ref, xi0 = _walking_inputs(B, key)
    c = cfg.srbd
    N = c.horizon
    kz, ky = jax.random.split(jax.random.PRNGKey(9))
    z_w = 5.0 * jax.random.normal(kz, (B, 3 * N), jnp.float32)
    y_w = jnp.abs(jax.random.normal(ky, (B, 6 * N), jnp.float32))
    iters = c.solver.admm_warm_iters

    sol_ref, (z_ref, y_ref) = _xla_reference(
        cfg, Ad, Bd_t, x_ref, xi0, z_w, y_w, iters)

    solver = fused.make_admm_fused(c, use_pallas="interpret")
    with pltpu.force_tpu_interpret_mode():
        sol_f, (z_f, y_f) = jax.vmap(solver)(Ad, Bd_t, x_ref, xi0,
                                             z_w, y_w)

    scale = float(jnp.max(jnp.abs(z_ref))) + 1.0
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_ref),
                               atol=2e-3 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-3 * scale, rtol=0)
    # residuals agree in magnitude
    np.testing.assert_allclose(np.asarray(sol_f.residual),
                               np.asarray(sol_ref.residual),
                               atol=1e-2, rtol=0.5)


def test_fused_unbatched_path():
    """The unbatched (single-scenario) path runs the XLA reference."""
    key = jax.random.PRNGKey(5)
    cfg, Ad, Bd_t, x_ref, xi0 = _walking_inputs(1, key)
    c = cfg.srbd
    N = c.horizon
    z_w = jnp.zeros((3 * N,), jnp.float32)
    y_w = jnp.zeros((6 * N,), jnp.float32)
    solver = fused.make_admm_fused(c, use_pallas="interpret")
    sol, (z, y) = solver(Ad[0], Bd_t[0], x_ref[0], xi0[0], z_w, y_w)
    assert z.shape == (3 * N,)
    assert y.shape == (6 * N,)
    assert np.isfinite(np.asarray(sol.u)).all()


@slow
def test_fused_condensation_matches_condense_lti_diag():
    """Cross-check: the kernel's band math equals condense_lti_diag,
    which equals the generic condense (already pinned by
    tests/test_condense_fast.py) — here we only verify the fused solver
    on a second seed to guard the f/H sweeps."""
    key = jax.random.PRNGKey(11)
    B = 8
    cfg, Ad, Bd_t, x_ref, xi0 = _walking_inputs(B, key)
    c = cfg.srbd
    N = c.horizon
    z_w = jnp.zeros((B, 3 * N), jnp.float32)
    y_w = jnp.zeros((B, 6 * N), jnp.float32)
    sol_ref, _ = _xla_reference(cfg, Ad, Bd_t, x_ref, xi0, z_w, y_w,
                                c.solver.admm_warm_iters)
    solver = fused.make_admm_fused(c, use_pallas="interpret")
    with pltpu.force_tpu_interpret_mode():
        sol_f, _ = jax.vmap(solver)(Ad, Bd_t, x_ref, xi0, z_w, y_w)
    scale = float(jnp.max(jnp.abs(sol_ref.u))) + 1.0
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_ref.u),
                               atol=2e-3 * scale, rtol=0)


def _walking_prep_inputs(B, key, cfg=None):
    """Inputs for the prep-fused variant: raw (arms, x0, v_des, yaw_rate)."""
    cfg = cfg or ControllerConfig.walking()
    c = cfg.srbd
    N = c.horizon
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pos = jnp.asarray([0.0, 0.0, 0.65], jnp.float32) + \
        0.02 * jax.random.normal(k1, (B, 3), jnp.float32)
    yaw = 0.1 * jax.random.normal(k2, (B,), jnp.float32)
    arms = pos[:, None, :] + jnp.asarray([0.02, 0.1, -0.65]) + \
        0.03 * jax.random.normal(k3, (B, N, 3), jnp.float32)
    xi0 = jax.vmap(srbd.initial_state)(
        jnp.concatenate([0.01 * jax.random.normal(k4, (B, 2)),
                         yaw[:, None]], -1),
        pos, jnp.zeros((B, 3)),
        jnp.asarray([0.4, 0.0, 0.0]) + jnp.zeros((B, 3)))
    v_des = jnp.broadcast_to(jnp.asarray([0.5, 0.0, 0.0]), (B, 3))
    yaw_rate = 0.05 * jax.random.normal(jax.random.PRNGKey(17), (B,))
    return cfg, arms.astype(jnp.float32), xi0.astype(jnp.float32), \
        v_des.astype(jnp.float32), yaw_rate.astype(jnp.float32)


@slow
def test_prep_fused_matches_xla_composition():
    """The in-kernel SRBD linearization + ZOH + reference synthesis must
    reproduce the XLA composition (linearize_shared + discretize_srbd +
    walking_reference + condense + ADMM) end to end."""
    B = 6
    cfg, arms, xi0, v_des, yaw_rate = _walking_prep_inputs(
        B, jax.random.PRNGKey(21))
    c = cfg.srbd
    N = c.horizon
    kz, ky = jax.random.split(jax.random.PRNGKey(9))
    z_w = 5.0 * jax.random.normal(kz, (B, 3 * N), jnp.float32)
    y_w = jnp.abs(jax.random.normal(ky, (B, 6 * N), jnp.float32))

    # receding reference (anchor at the current pose: x, y, yaw)
    anc = jnp.concatenate([xi0[:, 3:5], xi0[:, 2:3]], -1)
    solver_xla = fused.make_walking_fused(cfg, use_pallas=False)
    sol_ref, xp_ref, zy_ref = jax.vmap(solver_xla)(
        arms, xi0, v_des, yaw_rate, z_w, y_w, anc)

    solver_k = fused.make_walking_fused(cfg, use_pallas="interpret")
    with pltpu.force_tpu_interpret_mode():
        sol_f, xp_f, zy_f = jax.vmap(solver_k)(
            arms, xi0, v_des, yaw_rate, z_w, y_w, anc)

    scale = float(jnp.max(jnp.abs(sol_ref.u))) + 1.0
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_ref.u),
                               atol=2e-3 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(zy_f[1]), np.asarray(zy_ref[1]),
                               atol=2e-3 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(xp_f), np.asarray(xp_ref),
                               atol=1e-3 * scale, rtol=0)


def test_fused_matches_xla_reference_small_horizon():
    """DEFAULT-suite fused-QP parity at horizon 8 (same math, ~6x
    smaller interpret graph); the N=20 equivalence runs under
    RUN_SLOW=1."""
    B = 4
    cfg, Ad, Bd_t, x_ref, xi0 = _walking_inputs(
        B, jax.random.PRNGKey(3), cfg=_small_cfg())
    c = cfg.srbd
    N = c.horizon
    kz, ky = jax.random.split(jax.random.PRNGKey(9))
    z_w = 5.0 * jax.random.normal(kz, (B, 3 * N), jnp.float32)
    y_w = jnp.abs(jax.random.normal(ky, (B, 6 * N), jnp.float32))
    sol_ref, (z_ref, y_ref) = _xla_reference(
        cfg, Ad, Bd_t, x_ref, xi0, z_w, y_w, c.solver.admm_warm_iters)
    solver = fused.make_admm_fused(c, use_pallas="interpret")
    with pltpu.force_tpu_interpret_mode():
        sol_f, (z_f, y_f) = jax.vmap(solver)(Ad, Bd_t, x_ref, xi0,
                                             z_w, y_w)
    scale = float(jnp.max(jnp.abs(z_ref))) + 1.0
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_ref),
                               atol=2e-3 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=2e-3 * scale, rtol=0)


def test_prep_fused_matches_xla_small_horizon():
    """DEFAULT-suite prep-fused (in-kernel linearize+ZOH+reference)
    parity at horizon 8; the N=20 version runs under RUN_SLOW=1."""
    B = 3
    cfg, arms, xi0, v_des, yaw_rate = _walking_prep_inputs(
        B, jax.random.PRNGKey(21), cfg=_small_cfg())
    c = cfg.srbd
    N = c.horizon
    kz, ky = jax.random.split(jax.random.PRNGKey(9))
    z_w = 5.0 * jax.random.normal(kz, (B, 3 * N), jnp.float32)
    y_w = jnp.abs(jax.random.normal(ky, (B, 6 * N), jnp.float32))
    anc = jnp.concatenate([xi0[:, 3:5], xi0[:, 2:3]], -1)
    solver_xla = fused.make_walking_fused(cfg, use_pallas=False)
    sol_ref, xp_ref, zy_ref = jax.vmap(solver_xla)(
        arms, xi0, v_des, yaw_rate, z_w, y_w, anc)
    solver_k = fused.make_walking_fused(cfg, use_pallas="interpret")
    with pltpu.force_tpu_interpret_mode():
        sol_f, xp_f, zy_f = jax.vmap(solver_k)(
            arms, xi0, v_des, yaw_rate, z_w, y_w, anc)
    scale = float(jnp.max(jnp.abs(sol_ref.u))) + 1.0
    np.testing.assert_allclose(np.asarray(sol_f.u), np.asarray(sol_ref.u),
                               atol=2e-3 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(xp_f), np.asarray(xp_ref),
                               atol=1e-3 * scale, rtol=0)


def test_solve_form_inv_matches_subst():
    """solve_form="inv" (in-place factor inverse + full-array
    contractions) must match the substitution sweeps.  Measured on chip
    at throughput parity with subst at the 5-iteration warm budget
    (NOTES.md round 5); kept as a validated option — this test keeps it
    that way."""
    B = 4
    cfg, Ad, Bd_t, x_ref, xi0 = _walking_inputs(
        B, jax.random.PRNGKey(3), cfg=_small_cfg())
    c = cfg.srbd
    N = c.horizon
    z_w = 5.0 * jax.random.normal(jax.random.PRNGKey(1), (B, 3 * N),
                                  jnp.float32)
    y_w = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (B, 6 * N),
                                    jnp.float32))
    outs = {}
    for form in ("subst", "inv"):
        cs = dataclasses.replace(c, solver=dataclasses.replace(
            c.solver, solve_form=form))
        solver = fused.make_admm_fused(cs, use_pallas="interpret")
        with pltpu.force_tpu_interpret_mode():
            sol, (z, y) = jax.vmap(solver)(Ad, Bd_t, x_ref, xi0,
                                           z_w, y_w)
        outs[form] = (np.asarray(z), np.asarray(y))
    scale = float(np.abs(outs["subst"][0]).max()) + 1.0
    np.testing.assert_allclose(outs["inv"][0], outs["subst"][0],
                               atol=1e-4 * scale, rtol=0)
    np.testing.assert_allclose(outs["inv"][1], outs["subst"][1],
                               atol=1e-4 * scale, rtol=0)
