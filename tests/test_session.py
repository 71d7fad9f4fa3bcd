"""Control-session tests over the native UDP loopback: move-to-zero,
group/single joint moves, the 1 kHz MPC loop, and the smoke-test helpers.

The "robot" is an ideal-servo simulator thread speaking the pf_runtime
wire protocol — the role Gazebo + limxsdk play for the reference.
"""

import threading
import time

import numpy as np
import pytest

from mpc_limx_control_tpu import runtime as rt
from mpc_limx_control_tpu.control import session as ses


class LoopbackRobot:
    """Ideal position-servo robot: q tracks commanded q instantly."""

    def __init__(self, state_port, cmd_port, q0=None, hz=2000.0):
        self.host = rt.RobotHost(state_port=state_port, cmd_port=cmd_port)
        self.q = np.zeros(6, np.float32) if q0 is None else np.asarray(
            q0, np.float32)
        self.hz = hz
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        rate = rt.Rate(self.hz)
        try:
            while not self._stop.is_set():
                cmd = self.host.poll_cmd()
                if cmd is not None:
                    # ideal servo: position-mode joints follow commands
                    track = cmd["kp"] > 0
                    self.q[track] = cmd["q"][track]
                self.host.publish_state(
                    self.q, quat=(0, 0, 0, 1), acc=(0, 0, 9.81))
                rate.sleep()
        finally:
            rate.close()

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2.0)
        self.host.close()


@pytest.fixture
def robot_ports():
    # distinct ports per test run to avoid rebinding races
    base = 17300 + int(time.time() * 10) % 300
    return base, base + 1


def test_move_group_joints_reaches_zero(robot_ports):
    sp, cp = robot_ports
    robot = LoopbackRobot(sp, cp, q0=[0.4, -0.3, 0.5, -0.2, 0.3, -0.4])
    try:
        with rt.RobotLink("127.0.0.1", sp, cp) as link:
            ok = ses.move_group_joints(link, np.zeros(6), duration_iters=200,
                                       hz=500.0, max_iters=3000)
        assert ok
        np.testing.assert_allclose(robot.q, 0.0, atol=0.1)
    finally:
        robot.close()


def test_move_single_joint(robot_ports):
    sp, cp = robot_ports
    robot = LoopbackRobot(sp, cp)
    try:
        with rt.RobotLink("127.0.0.1", sp, cp) as link:
            ok = ses.move_single_joint(link, 2, 0.7, duration_iters=200,
                                       hz=500.0, max_iters=3000)
        assert ok
        assert abs(robot.q[2] - 0.7) < 0.1
    finally:
        robot.close()


def test_session_mpc_loop(robot_ports):
    sp, cp = robot_ports
    robot = LoopbackRobot(sp, cp)
    try:
        with ses.ControlSession(host_ip="127.0.0.1", state_port=sp,
                                cmd_port=cp) as session:
            session.init()
            assert session.start(timeout_iters=2000)
            stats = session.run(iterations=30, hz=200.0)
        assert stats["sent"] == 30
    finally:
        robot.close()


def test_session_kf_loop(robot_ports):
    """The use_kf path: KF-estimated odometry drives the tick (the
    intended real-hardware loop of src/mpc_control.cpp:158-192)."""
    sp, cp = robot_ports
    robot = LoopbackRobot(sp, cp)
    try:
        with ses.ControlSession(host_ip="127.0.0.1", state_port=sp,
                                cmd_port=cp) as session:
            stats = session.run(iterations=15, hz=100.0, use_kf=True)
        assert stats["sent"] == 15
        # the filter state advanced
        assert float(abs(session.kf.x_hat).max()) > 0.0
    finally:
        robot.close()


def test_odometry_over_the_wire(robot_ports):
    sp, cp = robot_ports
    robot = LoopbackRobot(sp, cp)
    try:
        with rt.RobotLink("127.0.0.1", sp, cp) as link:
            deadline = time.time() + 2.0
            got = None
            while got is None and time.time() < deadline:
                robot.host.publish_odom(
                    pos=(0.1, 0.2, 0.65), v_pos=(0.5, 0, 0), stamp_ns=5)
                time.sleep(0.002)
                got = link.recv_odom()
        assert got is not None
        np.testing.assert_allclose(got["pos"], [0.1, 0.2, 0.65], atol=1e-7)
        np.testing.assert_allclose(got["v_pos"], [0.5, 0, 0], atol=1e-7)
    finally:
        robot.close()


def test_error_test_semantics():
    assert ses.error_test([0] * 6, [0.05] * 6, 0.1)
    assert not ses.error_test([0] * 6, [0.05, 0.2, 0, 0, 0, 0], 0.1)


def test_square_wave_torque():
    t0 = ses.square_wave_torque(0)
    t1 = ses.square_wave_torque(1000)
    np.testing.assert_allclose(t0[[0, 3]], 20.0)
    np.testing.assert_allclose(t1[[0, 3]], -20.0)
    assert (t0[[1, 2, 4, 5]] == 0).all()


def test_zero_torque_and_damping(robot_ports):
    """The PFControllerBase safety commands
    (src/pf_controller_base.cpp:72-97): zeroTorque sends all-zero
    gains/targets; damping sends kd = 4 only."""
    sp, cp = robot_ports
    with rt.RobotHost(state_port=sp, cmd_port=cp) as host, \
            ses.ControlSession(host_ip="127.0.0.1", state_port=sp,
                               cmd_port=cp) as session:
        deadline = time.time() + 2.0
        got = None
        while got is None and time.time() < deadline:
            session.zero_torque()
            time.sleep(0.002)
            got = host.poll_cmd()
        assert got is not None
        for k in ("q", "dq", "tau", "kp", "kd"):
            np.testing.assert_allclose(got[k], 0.0, atol=1e-7)

        got = None
        deadline = time.time() + 2.0
        while got is None and time.time() < deadline:
            session.damping()
            time.sleep(0.002)
            c = host.poll_cmd()
            if c is not None and c["kd"][0] == 4.0:
                got = c
        assert got is not None
        np.testing.assert_allclose(got["kd"], 4.0, atol=1e-7)
        for k in ("q", "dq", "tau", "kp"):
            np.testing.assert_allclose(got[k], 0.0, atol=1e-7)


def test_calibration_gate_aborts(robot_ports):
    """A calibration diagnostic with nonzero code trips init() — the
    abort() gate of src/mpc_control_fake_state.cpp:27-34, now fed by a
    real wire channel instead of a hardcoded True."""
    sp, cp = robot_ports
    with rt.RobotHost(state_port=sp, cmd_port=cp) as host, \
            ses.ControlSession(host_ip="127.0.0.1", state_port=sp,
                               cmd_port=cp) as session:
        # publish failure repeatedly while init polls
        stop = threading.Event()

        def spam():
            while not stop.is_set():
                host.publish_diag(rt.DIAG_CALIBRATION, code=1, level=2)
                time.sleep(0.002)

        t = threading.Thread(target=spam, daemon=True)
        t.start()
        try:
            with pytest.raises(ses.CalibrationError):
                session.init(settle_s=1.0)
            assert not session.calibrated
        finally:
            stop.set()
            t.join(timeout=2.0)


def test_calibration_gate_passes(robot_ports):
    sp, cp = robot_ports
    with rt.RobotHost(state_port=sp, cmd_port=cp) as host, \
            ses.ControlSession(host_ip="127.0.0.1", state_port=sp,
                               cmd_port=cp) as session:
        host.publish_diag(rt.DIAG_CALIBRATION, code=0)
        time.sleep(0.05)
        session.init(settle_s=0.1)   # must not raise
        assert session.calibrated


def test_session_kf_publishes_est_odom(robot_ports):
    """run(use_kf=True) publishes KF odometry + covariance back over the
    wire (include/stateEstimator.h:404-419 analogue)."""
    sp, cp = robot_ports
    robot = LoopbackRobot(sp, cp)
    try:
        with ses.ControlSession(host_ip="127.0.0.1", state_port=sp,
                                cmd_port=cp) as session:
            stats = session.run(iterations=12, hz=100.0, use_kf=True,
                                est_odom_every=2)
        assert stats["est_odom_published"] >= 5
        time.sleep(0.05)
        got = robot.host.poll_est_odom()
        assert got is not None
        # covariance health is on the wire and finite
        assert np.isfinite(got["cov_diag"]).all()
        assert (got["cov_diag"] >= 0).all()
    finally:
        robot.close()
