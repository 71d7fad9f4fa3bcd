"""Parity tests on the reference-literal SRBD formulation.

The reference's mpcQP is dead code with type errors, but its *intended*
pipeline — literal (Ac, Bc) of include/mpcQP.h:152-181 with Ts = 1 ms,
N = 20, Q = diag(1,1,10,100,...,0.1), R = 0.1 I, P = 20 Q
(include/mpcQP.h:37-56) through discretization, condensation, and QP —
must be runnable in this framework so results can be compared against the
reference formulation on identical inputs (SURVEY.md §7 "keep the
linearization a pluggable input").
"""

import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import RobotParams, SRBDConfig
from mpc_limx_control_tpu.models import srbd
from mpc_limx_control_tpu.ops import condense as cnd
from mpc_limx_control_tpu.ops import discretize as dsc
from mpc_limx_control_tpu.ops import qp as jqp
from mpc_limx_control_tpu.oracle import pipeline as oracle
from mpc_limx_control_tpu.oracle.qp_oracle import solve_qp_oracle

ROBOT = RobotParams()
CFG = SRBDConfig()      # literal defaults: ts=1e-3, N=20


def _literal_problem(dtype=jnp.float64):
    foot = jnp.asarray([0.05, -0.105, 0.0], dtype)
    base = jnp.asarray([0.0, 0.0, 0.6], dtype)
    Ac, Bc = srbd.linearize_reference_literal(ROBOT, foot, base, dtype)
    xi0 = srbd.initial_state(
        jnp.asarray([0.01, -0.02, 0.1], dtype),
        base,
        jnp.asarray([0.0, 0.0, 0.05], dtype),
        jnp.asarray([0.2, 0.0, 0.0], dtype), g_state=-9.8)
    x_ref = srbd.walking_reference(
        xi0, CFG, CFG.horizon,
        v_des=jnp.asarray([CFG.ref_velocity_x, 0.0, 0.0], dtype),
        yaw_rate=jnp.asarray(CFG.ref_yaw_rate, dtype))
    return Ac, Bc, xi0, x_ref


def test_literal_pipeline_matches_oracle():
    """JAX discretize+condense of the literal matrices == float64 NumPy
    oracle on identical inputs."""
    Ac, Bc, xi0, x_ref = _literal_problem()
    N = CFG.horizon
    Q = np.diag(CFG.q_diag)
    R = np.diag(CFG.r_diag)
    P = CFG.p_scale * Q

    Ad_o, Bd_o = oracle.zoh_discretize(np.asarray(Ac), np.asarray(Bc),
                                       CFG.ts)
    Ad_j, Bd_j = dsc.zoh(Ac, Bc, CFG.ts)
    np.testing.assert_allclose(np.asarray(Ad_j), Ad_o, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Bd_j), Bd_o, atol=1e-12)

    H_o, f_o, G_o, h_o = oracle.build_qp(
        Ad_o, Bd_o, Q, R, P, N, np.asarray(xi0),
        np.asarray(x_ref).T, CFG.u_min, CFG.u_max)
    qp = cnd.condense(Ad_j, Bd_j, jnp.asarray(Q), jnp.asarray(R),
                      jnp.asarray(P), N, xi0, x_ref, CFG.u_min, CFG.u_max)
    np.testing.assert_allclose(np.asarray(qp.H), H_o, atol=1e-8)
    np.testing.assert_allclose(np.asarray(qp.f), f_o, atol=1e-8)

    z_o, _, info = solve_qp_oracle(H_o, f_o, G_o, h_o)
    assert max(info["residuals"]) < 1e-7
    sol = jqp.pdip_qp(qp.H, qp.f, qp.G, qp.h, iters=30)
    np.testing.assert_allclose(np.asarray(sol.u), z_o, atol=1e-6)


def test_literal_u_extraction():
    """u = first column of U_opt (include/mpcQP.h:118): the first 3
    entries of the stacked solution."""
    Ac, Bc, xi0, x_ref = _literal_problem()
    Q = jnp.asarray(np.diag(CFG.q_diag))
    R = jnp.asarray(np.diag(CFG.r_diag))
    P = CFG.p_scale * Q
    Ad, Bd = dsc.zoh(Ac, Bc, CFG.ts)
    qp = cnd.condense(Ad, Bd, Q, R, P, CFG.horizon, xi0, x_ref,
                      CFG.u_min, CFG.u_max)
    sol = jqp.pdip_qp(qp.H, qp.f, qp.G, qp.h, iters=30)
    u = sol.u[:3]
    assert u.shape == (3,)
    # box respected
    assert float(jnp.max(jnp.abs(sol.u))) <= CFG.u_max + 1e-6
