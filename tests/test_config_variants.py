"""Controller configuration variants: iterative IK path, ADMM solver path,
reference-literal placement — each must still produce a working gait
(shorter rollouts than the main walking tests)."""

import dataclasses

import jax
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig, SolverConfig
from mpc_limx_control_tpu.control import rollout as ro


def _run(cfg, steps=700):
    s0 = ro.initial_plant_state(cfg)
    final, m = jax.jit(lambda s: ro.rollout(cfg, s, steps))(s0)
    return np.asarray(m["height"]), np.asarray(m["velocity"]), final


def test_walking_with_damped_ls_ik():
    """The fixed-iteration damped-LS IK (the reference's iterative method,
    include/pinocchio_kinematics.h:61-149) also supports the gait."""
    cfg = dataclasses.replace(ControllerConfig.walking(),
                              ik_method="damped_ls")
    h, v, final = _run(cfg)
    assert h.min() > 0.5, h.min()
    assert not np.isnan(np.asarray(final.xi)).any()


def test_walking_with_log6_ik():
    """The reference's literal SE(3) log6 6-DoF IK loop
    (include/pinocchio_kinematics.h:61-149, ik_method="log6") in the
    controller: the swing foot lands short of the target (the 6-DoF
    error trades position against the unreachable identity orientation)
    but the gait must survive — height held, no NaN."""
    cfg = dataclasses.replace(ControllerConfig.walking(),
                              ik_method="log6")
    h, v, final = _run(cfg)
    assert h.min() > 0.45, h.min()
    assert not np.isnan(np.asarray(final.xi)).any()


def test_walking_with_admm_solver():
    base = ControllerConfig.walking()
    cfg = dataclasses.replace(
        base,
        qp_warm_start=False,
        srbd=dataclasses.replace(
            base.srbd, solver=SolverConfig(method="admm", iters=60,
                                           admm_rho=0.1)))
    h, v, final = _run(cfg)
    assert h.min() > 0.45, h.min()
    assert not np.isnan(np.asarray(final.xi)).any()


def test_reference_literal_placement_mode():
    """The reference's open-loop placement law walks for a short window
    (it cannot catch a lateral fall long-term — documented deviation #4)."""
    cfg = dataclasses.replace(ControllerConfig.walking(),
                              placement_mode="reference")
    h, v, final = _run(cfg, steps=400)
    assert h.min() > 0.4
    assert not np.isnan(np.asarray(final.xi)).any()


def test_walking_with_warm_pdip_solver():
    """The interior-point warm path (pre-ADMM production default) still
    drives a stable gait."""
    base = ControllerConfig.walking()
    cfg = dataclasses.replace(
        base, srbd=dataclasses.replace(
            base.srbd, solver=SolverConfig(method="pdip", iters=12)))
    h, v, final = _run(cfg)
    assert h.min() > 0.5, h.min()
    assert not np.isnan(np.asarray(final.xi)).any()
