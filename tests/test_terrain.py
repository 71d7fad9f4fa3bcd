"""Terrain (ground-plane height) support: placement, swing profile,
reference height, and initial stance all shift with cfg.ground_height."""

import dataclasses

import jax
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro


def test_walking_on_raised_ground():
    g = 0.15
    cfg = dataclasses.replace(ControllerConfig.walking(), ground_height=g)
    s0 = ro.initial_plant_state(cfg)
    # initial stance sits on the terrain
    np.testing.assert_allclose(float(s0.foot_l[2]), g, atol=1e-6)
    np.testing.assert_allclose(float(s0.xi[5]), g + cfg.base_height,
                               atol=1e-6)

    final, m = jax.jit(lambda s: ro.rollout(cfg, s, 900))(s0)
    h = np.asarray(m["height"])
    assert abs(h[-300:].mean() - (g + cfg.base_height)) < 0.02
    # stance feet stay on the terrain plane
    fl = np.asarray(final.foot_l)
    fr = np.asarray(final.foot_r)
    assert min(fl[2], fr[2]) > g - 0.02
    assert not np.isnan(np.asarray(final.xi)).any()
