"""Unit tests: discretize + condense + QP solvers vs the float64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_limx_control_tpu.ops import condense as jcond
from mpc_limx_control_tpu.ops import discretize as jdisc
from mpc_limx_control_tpu.ops import qp as jqp
from mpc_limx_control_tpu.oracle import pipeline as oracle


@pytest.fixture(scope="module")
def di_system():
    Ac, Bc = oracle.double_integrator_matrices()
    Ad, Bd = oracle.zoh_discretize(Ac, Bc, 0.01)
    return Ac, Bc, Ad, Bd


def test_zoh_matches_scipy(di_system):
    Ac, Bc, Ad, Bd = di_system
    Ad_j, Bd_j = jdisc.zoh(jnp.asarray(Ac), jnp.asarray(Bc), 0.01)
    np.testing.assert_allclose(np.asarray(Ad_j), Ad, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Bd_j), Bd, atol=1e-12)


def test_zoh_taylor_matches_exact(di_system):
    Ac, Bc, Ad, Bd = di_system
    Ad_j, Bd_j = jdisc.zoh_taylor(jnp.asarray(Ac), jnp.asarray(Bc), 0.01)
    np.testing.assert_allclose(np.asarray(Ad_j), Ad, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Bd_j), Bd, atol=1e-12)


def test_zoh_batched(di_system):
    Ac, Bc, Ad, Bd = di_system
    AcB = jnp.broadcast_to(jnp.asarray(Ac), (3, 4, 4))
    BcB = jnp.broadcast_to(jnp.asarray(Bc), (3, 4, 2))
    Ad_j, Bd_j = jdisc.zoh(AcB, BcB, 0.01)
    assert Ad_j.shape == (3, 4, 4)
    np.testing.assert_allclose(np.asarray(Ad_j[1]), Ad, atol=1e-12)


def test_prediction_matrices_match_power_form(di_system):
    _, _, Ad, Bd = di_system
    N = 15
    A_blocks, B_blocks = jcond.prediction_matrices(
        jnp.asarray(Ad), jnp.asarray(Bd), N)
    A_aug, B_aug, _, _ = oracle.condense(
        Ad, Bd, np.eye(4), np.eye(2), np.eye(4), N)
    np.testing.assert_allclose(
        np.asarray(A_blocks).reshape(-1, 4), A_aug, atol=1e-12)
    B_mat = np.asarray(B_blocks).transpose(0, 2, 1, 3).reshape(64, 30)
    np.testing.assert_allclose(B_mat, B_aug, atol=1e-12)


def test_prediction_matrices_ltv_reduces_to_lti(di_system):
    _, _, Ad, Bd = di_system
    N = 7
    A1, B1 = jcond.prediction_matrices(jnp.asarray(Ad), jnp.asarray(Bd), N)
    AdT = jnp.broadcast_to(jnp.asarray(Ad), (N, 4, 4))
    BdT = jnp.broadcast_to(jnp.asarray(Bd), (N, 4, 2))
    A2, B2 = jcond.prediction_matrices(AdT, BdT, N)
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), atol=1e-13)
    np.testing.assert_allclose(np.asarray(B1), np.asarray(B2), atol=1e-13)


def test_prediction_matrices_genuinely_ltv():
    """LTV condensation against a hand-rolled simulation."""
    rng = np.random.default_rng(3)
    N, nx, nu = 5, 3, 2
    Ads = rng.normal(size=(N, nx, nx)) * 0.3 + np.eye(nx)
    Bds = rng.normal(size=(N, nx, nu))
    us = rng.normal(size=(N, nu))
    x0 = rng.normal(size=nx)

    A_blocks, B_blocks = jcond.prediction_matrices(
        jnp.asarray(Ads), jnp.asarray(Bds), N)
    x = x0.copy()
    xs = [x.copy()]
    for t in range(N):
        x = Ads[t] @ x + Bds[t] @ us[t]
        xs.append(x.copy())
    pred = (np.asarray(A_blocks) @ x0
            + np.einsum("ijxu,ju->ix", np.asarray(B_blocks), us))
    np.testing.assert_allclose(pred, np.array(xs), atol=1e-12)


def _oracle_qp(x0, with_state_constraints=True):
    Ac, Bc = oracle.double_integrator_matrices()
    Ad, Bd = oracle.zoh_discretize(Ac, Bc, 0.01)
    Q = np.diag([50.0, 5.0, 50.0, 5.0])
    R = 0.1 * np.eye(2)
    P = 20.0 * Q
    x_ref = oracle.circle_reference(0, 0.01, 15)
    xm = np.array([-5.0, -3.0, -5.0, -3.0])
    H, f, G, h = oracle.build_qp(
        Ad, Bd, Q, R, P, 15, x0, x_ref, -8.0, 8.0,
        xm if with_state_constraints else None,
        -xm if with_state_constraints else None)
    return (Ad, Bd, Q, R, P, x_ref), (H, f, G, h)


def test_condense_matches_oracle(di_system):
    _, _, Ad, Bd = di_system
    x0 = np.array([2.0, 0.3, -1.0, 0.2])
    (Ad, Bd, Q, R, P, x_ref), (H, f, G, h) = _oracle_qp(x0)
    qp = jcond.condense(
        jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(Q), jnp.asarray(R),
        jnp.asarray(P), 15, jnp.asarray(x0), jnp.asarray(x_ref.T),
        -8.0, 8.0, jnp.asarray([-5.0, -3.0, -5.0, -3.0]),
        jnp.asarray([5.0, 3.0, 5.0, 3.0]))
    np.testing.assert_allclose(np.asarray(qp.H), H, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qp.f), f, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qp.G), G, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qp.h), h, atol=1e-10)


@pytest.mark.parametrize("x0", [
    [2.0, 0.0, 0.0, 0.0],          # constraints inactive
    [0.0, 0.0, 0.0, 0.0],          # input box active
    [4.0, 0.0, -4.0, 0.0],         # state + input constraints active
])
def test_pdip_matches_oracle_f64(x0):
    from mpc_limx_control_tpu.oracle.qp_oracle import solve_qp_oracle
    x0 = np.asarray(x0, np.float64)
    _, (H, f, G, h) = _oracle_qp(x0)
    z_ref, _, info = solve_qp_oracle(H, f, G, h)
    assert max(info["residuals"]) < 1e-8
    sol = jqp.pdip_qp(jnp.asarray(H), jnp.asarray(f), jnp.asarray(G),
                      jnp.asarray(h), iters=30)
    np.testing.assert_allclose(np.asarray(sol.u), z_ref, atol=2e-6)


@pytest.mark.parametrize("x0,iters", [
    ([2.0, 0.0, 0.0, 0.0], 25),    # nominal closed-loop instance
    ([0.0, 0.0, 0.0, 0.0], 50),    # saturated input box
])
def test_pdip_f32_tolerance(x0, iters):
    from mpc_limx_control_tpu.oracle.qp_oracle import solve_qp_oracle
    x0 = np.asarray(x0)
    _, (H, f, G, h) = _oracle_qp(x0)
    z_ref, _, _ = solve_qp_oracle(H, f, G, h)
    sol = jqp.pdip_qp(
        jnp.asarray(H, jnp.float32), jnp.asarray(f, jnp.float32),
        jnp.asarray(G, jnp.float32), jnp.asarray(h, jnp.float32),
        iters=iters)
    # f32 target: control-sequence max error <= 1e-3 (BASELINE.md)
    assert np.max(np.abs(np.asarray(sol.u) - z_ref)) < 1e-3


def test_admm_matches_oracle():
    from mpc_limx_control_tpu.oracle.qp_oracle import solve_qp_oracle
    x0 = np.array([2.0, 0.0, 0.0, 0.0])
    (Ad, Bd, Q, R, P, x_ref), (H, f, G, h) = _oracle_qp(
        x0, with_state_constraints=False)
    z_ref, _, _ = solve_qp_oracle(H, f, G, h)
    # two-sided form: C = I (input box only)
    nz = 30
    C = jnp.eye(nz)
    sol = jqp.admm_qp(jnp.asarray(H), jnp.asarray(f), C,
                      jnp.full((nz,), -8.0), jnp.full((nz,), 8.0),
                      iters=300, rho=10.0)
    np.testing.assert_allclose(np.asarray(sol.u), z_ref, atol=1e-4)


def test_pdip_batched_vmap():
    rng = np.random.default_rng(0)
    x0s = rng.uniform(-1, 1, size=(8, 4)) * np.array([2.0, 1.0, 2.0, 1.0])
    Hs, fs, Gs, hs = [], [], [], []
    from mpc_limx_control_tpu.oracle.qp_oracle import solve_qp_oracle
    z_refs = []
    for x0 in x0s:
        _, (H, f, G, h) = _oracle_qp(x0)
        Hs.append(H), fs.append(f), Gs.append(G), hs.append(h)
        z_refs.append(solve_qp_oracle(H, f, G, h)[0])
    batched = jax.vmap(lambda H, f, G, h: jqp.pdip_qp(H, f, G, h, iters=30))
    sols = batched(jnp.asarray(np.array(Hs)), jnp.asarray(np.array(fs)),
                   jnp.asarray(np.array(Gs)), jnp.asarray(np.array(hs)))
    np.testing.assert_allclose(
        np.asarray(sols.u), np.array(z_refs), atol=2e-6)


def test_warm_admm_matches_oracle():
    """make_admm_warm (the production walking solver): cold-started with
    enough iterations it reaches the oracle; a warm start from a nearby
    solution reaches the same point in far fewer iterations."""
    from mpc_limx_control_tpu.oracle.qp_oracle import solve_qp_oracle
    x0 = np.array([2.0, 0.0, 0.0, 0.0])
    _, (H, f, G, h) = _oracle_qp(x0, with_state_constraints=False)
    z_ref, _, _ = solve_qp_oracle(H, f, G, h)
    Hj, fj, Gj, hj = (jnp.asarray(H), jnp.asarray(f),
                      jnp.asarray(G), jnp.asarray(h))
    nz, m = fj.shape[0], hj.shape[0]

    cold = jqp.make_admm_warm(iters=300, rho=1.0)
    sol_cold, (z_c, y_c) = cold(Hj, fj, Gj, hj,
                                jnp.zeros((nz,)), jnp.zeros((m,)))
    np.testing.assert_allclose(np.asarray(sol_cold.u), z_ref, atol=1e-4)

    # warm restart from the converged state: 8 iterations hold the answer
    warm = jqp.make_admm_warm(iters=8, rho=1.0)
    sol_warm, _ = warm(Hj, fj, Gj, hj, z_c, y_c)
    np.testing.assert_allclose(np.asarray(sol_warm.u), z_ref, atol=1e-4)


def test_warm_admm_batched_consistent():
    """vmapped make_admm_warm (batch-native path) matches per-problem
    unbatched solves."""
    rng = np.random.default_rng(1)
    x0s = rng.uniform(-1, 1, size=(5, 4)) * np.array([2.0, 1.0, 2.0, 1.0])
    Hs, fs, Gs, hs = [], [], [], []
    for x0 in x0s:
        _, (H, f, G, h) = _oracle_qp(x0, with_state_constraints=False)
        Hs.append(H), fs.append(f), Gs.append(G), hs.append(h)
    Hb = jnp.asarray(np.array(Hs), jnp.float32)
    fb = jnp.asarray(np.array(fs), jnp.float32)
    Gb = jnp.asarray(np.array(Gs), jnp.float32)
    hb = jnp.asarray(np.array(hs), jnp.float32)
    nz, m = fb.shape[1], hb.shape[1]
    solver = jqp.make_admm_warm(iters=100, rho=1.0)
    z0 = jnp.zeros((nz,), jnp.float32)
    y0 = jnp.zeros((m,), jnp.float32)
    sols, _ = jax.vmap(lambda H, f, G, h: solver(H, f, G, h, z0, y0))(
        Hb, fb, Gb, hb)
    for i in range(len(x0s)):
        s_i, _ = solver(Hb[i], fb[i], Gb[i], hb[i], z0, y0)
        np.testing.assert_allclose(np.asarray(sols.u[i]),
                                   np.asarray(s_i.u), atol=2e-5)
