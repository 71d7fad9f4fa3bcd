"""dtMPC re-solve schedule tests: mpc_every=5 (reference mpcStep,
include/MPCParam.h:46-47) must walk comparably to per-tick solving."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro


def test_held_grf_walks():
    cfg = ControllerConfig.walking()
    s0 = ro.initial_plant_state(cfg)
    final, m = jax.jit(
        lambda s: ro.rollout(cfg, s, 1200, mpc_every=5))(s0)
    h = np.asarray(m["height"])
    v = np.asarray(m["velocity"])
    assert h.shape == (1200,)
    assert h.min() > 0.55, h.min()
    assert abs(v[-400:, 0].mean() - 0.5) < 0.2
    assert not np.isnan(np.asarray(final.xi)).any()


def test_schedule_solves_only_every_5():
    """Intermediate ticks carry zero residual (no QP was solved)."""
    cfg = ControllerConfig.walking()
    s0 = ro.initial_plant_state(cfg)
    _, m = jax.jit(lambda s: ro.rollout(cfg, s, 20, mpc_every=5))(s0)
    res = np.asarray(m["qp_residual"])
    solved = res > 0
    assert solved[::5].all()
    assert not solved[np.arange(20) % 5 != 0].any()
