"""Full-length 500-step closed-loop parity vs the oracle — the exact
scenario of src/qpSolver_test.cpp:38 / src/linear_mpc_example.cpp:133.

Slow (~1 min): run with RUN_SLOW=1, e.g.
    RUN_SLOW=1 python -m pytest tests/test_full_parity.py -q
The 120-step version runs in the default suite (tests/test_closed_loop.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_limx_control_tpu.control import linear_mpc
from mpc_limx_control_tpu.core.config import MPCConfig, SolverConfig
from mpc_limx_control_tpu.oracle import pipeline as oracle

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"), reason="slow; set RUN_SLOW=1")


def test_500_step_circle_tracking_parity():
    steps = 500
    ref = oracle.run_closed_loop(steps=steps)
    cfg = MPCConfig(solver=SolverConfig(iters=25))
    params = linear_mpc.setup(cfg, dtype=jnp.float32)
    run = jax.jit(
        lambda x0: linear_mpc.closed_loop(cfg, params, x0, steps)
    )(jnp.asarray([2.0, 0.0, 0.0, 0.0], jnp.float32))
    u_err = np.max(np.abs(np.asarray(run["controls"]) - ref["controls"]))
    assert u_err < 1e-3, u_err            # BASELINE.md budget
    # steady-state tracking error matches the oracle profile
    e = np.asarray(run["errors"])
    np.testing.assert_allclose(e[-100:].mean(),
                               ref["errors"][-100:].mean(), atol=1e-4)
