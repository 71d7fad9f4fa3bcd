"""The bundled URDF description must match the hardcoded constants.

The reference loads its kinematics from a URDF
(include/pinocchio_kinematics.h:24) AND hardcodes the same chain
(include/MPCParam.h:13-38) with no consistency check; here
tools/check_urdf.py proves mpc_limx_control_tpu/data/robot_tron1_pf.urdf
and core/config.py agree, so model drift is test-visible.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import check_urdf  # noqa: E402

URDF = os.path.join(REPO, "mpc_limx_control_tpu", "data",
                    "robot_tron1_pf.urdf")


def test_bundled_urdf_matches_config():
    errs = check_urdf.check(URDF)
    assert errs == [], "\n".join(errs)


def test_urdf_checker_detects_drift(tmp_path):
    """A perturbed offset must be flagged (the checker actually checks)."""
    text = open(URDF).read()
    assert 'xyz="-0.077 0.02050 0.0"' in text
    bad = text.replace('xyz="-0.077 0.02050 0.0"',
                       'xyz="-0.078 0.02050 0.0"', 1)
    p = tmp_path / "bad.urdf"
    p.write_text(bad)
    errs = check_urdf.check(str(p))
    assert any("hip_L_Joint origin" in e for e in errs), errs


def test_urdf_fk_consistency():
    """FK of the URDF chain at q = 0 equals the analytic
    nominal_foot_offset (the URDF and models/kinematics.py describe the
    same robot, not just the same numbers)."""
    from mpc_limx_control_tpu.core.config import RobotParams
    rp = RobotParams()
    lo = rp.legs
    chain = (np.asarray(lo.abad_offset) + np.asarray(lo.hip_offset)
             + np.asarray(lo.knee_offset) + np.asarray(lo.foot_offset)
             + np.asarray(lo.contact_offset))
    np.testing.assert_allclose(chain,
                               np.asarray(rp.nominal_foot_offset_left),
                               atol=1e-12)
