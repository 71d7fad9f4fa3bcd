"""Interpret-mode correctness of the Pallas kernels on CPU: the batched
Cholesky family and the experimental fused PDIP kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from mpc_limx_control_tpu.ops import chol_pallas
from mpc_limx_control_tpu.ops import qp as jqp
from mpc_limx_control_tpu.ops import qp_pallas


@pytest.fixture(scope="module")
def spd_batch():
    B, n = 128, 60
    rng = np.random.default_rng(0)
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    M = jnp.asarray(np.einsum("bij,bkj->bik", A, A) / n
                    + 3 * np.eye(n, dtype=np.float32))
    r = jnp.asarray(rng.normal(size=(B, n, 2)).astype(np.float32))
    return M, r


def test_pallas_cholesky_interpret(spd_batch):
    M, r = spd_batch
    with pltpu.force_tpu_interpret_mode():
        L = chol_pallas.cholesky(M)
    L_ref = np.linalg.cholesky(np.asarray(M, np.float64))
    np.testing.assert_allclose(np.asarray(L), L_ref, atol=2e-5)


def test_pallas_solvers_interpret(spd_batch):
    M, r = spd_batch
    x_ref = np.linalg.solve(np.asarray(M, np.float64), np.asarray(r))
    with pltpu.force_tpu_interpret_mode():
        L = chol_pallas.cholesky(M)
        x1 = chol_pallas.chol_solve(L, r)
        x2 = chol_pallas.posdef_solve(M, r)
        x3 = chol_pallas.posdef_solve_fast(M, r)
    for x in (x1, x2, x3):
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=5e-5)


def test_fused_pdip_interpret_matches_batched():
    B, n, m = 128, 30, 64
    rng = np.random.default_rng(1)
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    H = jnp.asarray(np.einsum("bij,bkj->bik", A, A) / n
                    + 3 * np.eye(n, dtype=np.float32))
    f = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    G = jnp.asarray(rng.normal(size=(B, m, n)).astype(np.float32))
    h = jnp.asarray((np.abs(rng.normal(size=(B, m))) + 1.0)
                    .astype(np.float32))
    z0 = jnp.zeros((B, n), jnp.float32)
    s0 = jnp.ones((B, m), jnp.float32)
    lam0 = jnp.ones((B, m), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        zb, merit, _, _ = qp_pallas.pdip_fused(H, f, G, h, z0, s0, lam0,
                                               iters=10)
    sol, _ = jqp._batched_pdip(H, f, G, h, 10, use_pallas=False,
                               z_warm=z0, lam_warm=lam0)
    # same algorithm, different arithmetic order: agree to f32 tolerance
    np.testing.assert_allclose(np.asarray(zb), np.asarray(sol.u),
                               atol=5e-2)
    assert np.isfinite(np.asarray(merit)).all()
