"""Closed-loop walking/standing on KF-ESTIMATED state (estimator_mode="kf")
— the full intended pipeline of the reference's broken mpc_control.cpp:
synthesized joint/IMU sensors -> contact-gated KF -> MPC -> plant."""

import dataclasses

import jax
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro


def test_walking_on_estimated_state():
    cfg = dataclasses.replace(ControllerConfig.walking(),
                              estimator_mode="kf")
    s0 = ro.initial_plant_state(cfg)
    final, m = jax.jit(lambda s: ro.rollout(cfg, s, 1200))(s0)
    h = np.asarray(m["height"])
    v = np.asarray(m["velocity"])
    e = np.asarray(m["est_error"])
    assert h.min() > 0.5, h.min()
    assert abs(v[-400:, 0].mean() - 0.5) < 0.25
    # leg-odometry drift: absolute x is only observable through stance-foot
    # pinning, so a slow drift (~10% of distance traveled) is inherent;
    # bound the total drift over 1.2 s / ~0.5 m traveled
    assert e[-1] < 0.12, e[-1]
    assert not np.isnan(np.asarray(final.xi)).any()


def test_standing_on_estimated_state():
    cfg = dataclasses.replace(ControllerConfig.standing(),
                              estimator_mode="kf")
    s0 = ro.initial_plant_state(cfg)
    final, m = jax.jit(lambda s: ro.rollout(cfg, s, 400))(s0)
    h = np.asarray(m["height"])
    e = np.asarray(m["est_error"])
    assert h.min() > 0.55
    assert e[-100:].mean() < 0.05, e[-100:].mean()


def test_kf_covariance_surfaced_in_metrics():
    """Covariance health is observable per tick (the reference publishes
    odom+pose WITH covariance at 200 Hz, include/stateEstimator.h:404-419):
    the rollout metrics carry the filter's position/velocity covariance
    diagonal, finite and converging from the large prior."""
    cfg = dataclasses.replace(ControllerConfig.walking(),
                              estimator_mode="kf")
    s0 = ro.initial_plant_state(cfg)
    _, m = jax.jit(lambda s: ro.rollout(cfg, s, 300))(s0)
    cp = np.asarray(m["kf_cov_pos"])       # [T, 3]
    cv = np.asarray(m["kf_cov_vel"])
    assert cp.shape == (300, 3) and cv.shape == (300, 3)
    assert np.isfinite(cp).all() and np.isfinite(cv).all()
    assert (cp >= 0).all()
    # the filter actually converges from the large initial prior
    assert cp[-1].mean() < cp[0].mean()
