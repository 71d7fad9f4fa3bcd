"""Cross-check core/config.py's hardcoded kinematic/inertial constants
against a URDF robot description (VERDICT r3 missing item 2).

The reference derives its Pinocchio model from `robot.urdf` at runtime
(include/pinocchio_kinematics.h:24 — a file its repo does not ship)
while its controller hardcodes the same chain as `kinematicValues`
(include/MPCParam.h:13-38), with nothing proving the two agree.  This
tool makes that drift visible here: it parses a URDF with a pure-python
xml walk and asserts, per leg,

  * the revolute-chain joint origins equal LegOffsets
    (abad/hip/knee, right leg y-mirrored),
  * the fixed foot/contact origins equal LegOffsets.foot/contact
    (right leg foot/contact y-mirrored — both are y=0 in TRON1),
  * the abad axis is x and the hip/knee axes are y
    (the Rx(q0)Ry(q1)Ry(q2) chain of models/kinematics.py),
  * base mass and the full 3x3 inertia tensor equal RobotParams.

Default target is the bundled canonical description
(mpc_limx_control_tpu/data/robot_tron1_pf.urdf); pass a real robot's
URDF path to validate against hardware.  Exit 0 = match.

Usage: python tools/check_urdf.py [path/to/robot.urdf]
Run in the suite by tests/test_urdf.py.
"""

from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TOL = 1e-9


def _vec(s: str):
    return tuple(float(v) for v in s.split())


def check(urdf_path: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = all good)."""
    from mpc_limx_control_tpu.core.config import RobotParams

    rp = RobotParams()
    lo = rp.legs
    root = ET.parse(urdf_path).getroot()
    joints = {j.get("name"): j for j in root.iter("joint")}
    links = {l.get("name"): l for l in root.iter("link")}
    errs = []

    def origin(jname):
        j = joints.get(jname)
        if j is None:
            errs.append(f"missing joint {jname}")
            return None
        o = j.find("origin")
        return _vec(o.get("xyz", "0 0 0")) if o is not None else (0, 0, 0)

    def axis(jname):
        j = joints.get(jname)
        a = j.find("axis") if j is not None else None
        return _vec(a.get("xyz")) if a is not None else None

    def expect(jname, got, want):
        if got is None:
            return
        if any(abs(g - w) > TOL for g, w in zip(got, want)):
            errs.append(f"{jname}: urdf {got} != config {want}")

    def mirror_y(t):
        return (t[0], -t[1], t[2])

    for side, mir in (("L", False), ("R", True)):
        m = mirror_y if mir else (lambda t: t)
        expect(f"abad_{side}_Joint origin",
               origin(f"abad_{side}_Joint"), m(lo.abad_offset))
        expect(f"hip_{side}_Joint origin",
               origin(f"hip_{side}_Joint"), m(lo.hip_offset))
        expect(f"knee_{side}_Joint origin",
               origin(f"knee_{side}_Joint"), m(lo.knee_offset))
        expect(f"foot_{side}_Joint origin",
               origin(f"foot_{side}_Joint"), m(lo.foot_offset))
        expect(f"contact_{side}_Joint origin",
               origin(f"contact_{side}_Joint"), m(lo.contact_offset))
        expect(f"abad_{side}_Joint axis",
               axis(f"abad_{side}_Joint"), (1.0, 0.0, 0.0))
        expect(f"hip_{side}_Joint axis",
               axis(f"hip_{side}_Joint"), (0.0, 1.0, 0.0))
        expect(f"knee_{side}_Joint axis",
               axis(f"knee_{side}_Joint"), (0.0, 1.0, 0.0))

    # ---- leg link inertials vs LegInertialParams (round 5) -----------
    from mpc_limx_control_tpu.models.dynamics import LegInertialParams

    lp = LegInertialParams()
    leg_vals = {
        "abad": (lp.masses[0], lp.com_abad, lp.inertia_abad),
        "hip": (lp.masses[1], lp.com_hip, lp.inertia_hip),
        "knee": (lp.masses[2], lp.com_knee, lp.inertia_knee),
    }
    for side, mir in (("L", False), ("R", True)):
        m = mirror_y if mir else (lambda t: t)
        for ln, (mass_w, com_w, in_w) in leg_vals.items():
            link = links.get(f"{ln}_{side}_Link")
            if link is None or link.find("inertial") is None:
                errs.append(f"missing inertial on {ln}_{side}_Link")
                continue
            inertial = link.find("inertial")
            got_m = float(inertial.find("mass").get("value"))
            if abs(got_m - mass_w) > TOL:
                errs.append(f"{ln}_{side} mass: urdf {got_m} != "
                            f"config {mass_w}")
            o = inertial.find("origin")
            got_c = _vec(o.get("xyz", "0 0 0")) if o is not None \
                else (0.0, 0.0, 0.0)
            expect(f"{ln}_{side} com", got_c, m(com_w))
            it = inertial.find("inertia")
            got_i = tuple(float(it.get(k)) for k in ("ixx", "iyy", "izz"))
            expect(f"{ln}_{side} inertia diag", got_i, in_w)
            for k in ("ixy", "ixz", "iyz"):
                if abs(float(it.get(k, "0"))) > TOL:
                    errs.append(f"{ln}_{side} inertia {k} nonzero (config"
                                " model is diagonal about the COM)")

    base = links.get("base_Link")
    if base is None:
        errs.append("missing link base_Link")
    else:
        inertial = base.find("inertial")
        mass = float(inertial.find("mass").get("value"))
        if abs(mass - rp.mass) > TOL:
            errs.append(f"base mass: urdf {mass} != config {rp.mass}")
        it = inertial.find("inertia")
        I = rp.inertia
        pairs = {"ixx": I[0], "ixy": I[1], "ixz": I[2],
                 "iyy": I[4], "iyz": I[5], "izz": I[8]}
        # tensor symmetry of the config itself
        for (a, b) in ((1, 3), (2, 6), (5, 7)):
            if abs(I[a] - I[b]) > TOL:
                errs.append(f"config inertia not symmetric: I[{a}]={I[a]}"
                            f" vs I[{b}]={I[b]}")
        for k, want in pairs.items():
            got = float(it.get(k))
            if abs(got - want) > TOL:
                errs.append(f"base inertia {k}: urdf {got} != "
                            f"config {want}")
    return errs


def main():
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "mpc_limx_control_tpu", "data", "robot_tron1_pf.urdf")
    path = sys.argv[1] if len(sys.argv) > 1 else default
    errs = check(path)
    if errs:
        for e in errs:
            print(f"MISMATCH: {e}", file=sys.stderr)
        raise SystemExit(1)
    print(f"URDF check OK: {path} matches core/config.py + "
          f"models/dynamics.py (10 joint origins, 6 axes, base mass + "
          f"full inertia tensor, 6 leg-link inertials)")


if __name__ == "__main__":
    main()
