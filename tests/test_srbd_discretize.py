"""Equivalence tests for the fast SRBD linearization/discretization path:
linearize_shared == vmapped linearize; discretize_srbd (nilpotent exact
ZOH) == expm-based ZOH."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import RobotParams
from mpc_limx_control_tpu.models import srbd
from mpc_limx_control_tpu.ops import discretize as dsc

ROBOT = RobotParams()


def _sample(n=5, seed=0):
    rng = np.random.default_rng(seed)
    arms = jnp.asarray(rng.normal(0, 0.2, (n, 3)), jnp.float64)
    base = jnp.asarray([0.1, -0.05, 0.62], jnp.float64)
    yaw = jnp.asarray(0.4, jnp.float64)
    return arms, base, yaw


def test_linearize_shared_matches_per_arm():
    arms, base, yaw = _sample()
    Ac_s, Bc_s = srbd.linearize_shared(ROBOT, arms, base, yaw, jnp.float64)
    for k in range(arms.shape[0]):
        Ac_k, Bc_k = srbd.linearize(ROBOT, arms[k], base, yaw, jnp.float64)
        np.testing.assert_allclose(np.asarray(Ac_s), np.asarray(Ac_k),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(Bc_s[k]), np.asarray(Bc_k),
                                   atol=1e-12)


def test_ac_nilpotent():
    arms, base, yaw = _sample(1)
    Ac, _ = srbd.linearize_shared(ROBOT, arms, base, yaw, jnp.float64)
    Ac3 = np.asarray(Ac @ Ac @ Ac)
    assert np.abs(Ac3).max() < 1e-14


def test_discretize_srbd_exact_vs_expm():
    arms, base, yaw = _sample()
    Ac, Bc = srbd.linearize_shared(ROBOT, arms, base, yaw, jnp.float64)
    ts = 0.02
    Ad_fast, Bd_fast = srbd.discretize_srbd(Ac, Bc, ts)
    for k in range(arms.shape[0]):
        Ad_ref, Bd_ref = dsc.zoh(Ac, Bc[k], ts)
        np.testing.assert_allclose(np.asarray(Ad_fast), np.asarray(Ad_ref),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(Bd_fast[k]),
                                   np.asarray(Bd_ref), atol=1e-12)


def test_discretize_srbd_2d_bc():
    arms, base, yaw = _sample(1)
    Ac, Bc = srbd.linearize_shared(ROBOT, arms, base, yaw, jnp.float64)
    Ad1, Bd1 = srbd.discretize_srbd(Ac, Bc[0], 0.01)
    Ad2, Bd2 = srbd.discretize_srbd(Ac, Bc, 0.01)
    np.testing.assert_allclose(np.asarray(Bd1), np.asarray(Bd2[0]),
                               atol=1e-14)


def test_srbd_step_vector_matches_matrix_path():
    """The explicit vector-form plant step (srbd_step_vector) is
    bit-level-close to Ad @ xi + Bd @ u from the matrix path, batched."""
    rng = np.random.default_rng(3)
    B = 64
    xi = jnp.asarray(rng.normal(0, 0.3, (B, 13)), jnp.float64)
    xi = xi.at[:, 5].add(0.65).at[:, 12].set(-9.81)
    feet = jnp.asarray(rng.normal(0, 0.2, (B, 2, 3)), jnp.float64)
    forces = jnp.asarray(rng.normal(0, 40.0, (B, 2, 3)), jnp.float64)
    ts = 0.001

    def mat_step(x, ft, f):
        Ac, Bc2 = srbd.linearize_shared(ROBOT, ft, x[3:6], x[2],
                                        jnp.float64)
        Bc = jnp.concatenate([Bc2[0], Bc2[1]], axis=-1)
        Ad, Bd = srbd.discretize_srbd(Ac, Bc, ts)
        return Ad @ x + Bd @ f.reshape(6)

    a = jax.vmap(mat_step)(xi, feet, forces)
    b = srbd.srbd_step_vector(ROBOT, xi, feet, forces, ts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
