#!/usr/bin/env python
"""Generate a ~30-DOF floating-base humanoid URDF (walkman-class scale)
for benchmarks and tests. All values are original to this project:
a generic biped with 3-DOF waist, 2x7-DOF arms, 2x6-DOF legs and a
crane attachment frame for suspended-base experiments."""

import numpy as np


def link_xml(name, mass, com, size, izz_scale=1.0):
    cx, cy, cz = com
    # rough box inertia about COM
    sx, sy, sz = size
    ixx = mass / 12 * (sy**2 + sz**2)
    iyy = mass / 12 * (sx**2 + sz**2)
    izz = mass / 12 * (sx**2 + sy**2) * izz_scale
    return f"""  <link name="{name}">
    <inertial>
      <mass value="{mass}"/>
      <origin xyz="{cx} {cy} {cz}"/>
      <inertia ixx="{ixx:.6f}" ixy="0" ixz="0" iyy="{iyy:.6f}" iyz="0" izz="{izz:.6f}"/>
    </inertial>
    <visual>
      <origin xyz="{cx} {cy} {cz}"/>
      <geometry><box size="{sx} {sy} {sz}"/></geometry>
    </visual>
    <collision>
      <origin xyz="{cx} {cy} {cz}"/>
      <geometry><box size="{sx} {sy} {sz}"/></geometry>
    </collision>
  </link>
"""


def joint_xml(name, parent, child, xyz, axis, lo, hi, effort=150, vel=3.0, jtype="revolute"):
    ax = " ".join(str(v) for v in axis)
    o = " ".join(str(v) for v in xyz)
    lim = (
        f'    <limit effort="{effort}" lower="{lo}" upper="{hi}" velocity="{vel}"/>\n'
        if jtype == "revolute"
        else ""
    )
    return f"""  <joint name="{name}" type="{jtype}">
    <origin xyz="{o}" rpy="0 0 0"/>
    <axis xyz="{ax}"/>
    <parent link="{parent}"/>
    <child link="{child}"/>
{lim}    <dynamics damping="0.7" friction="0.4"/>
  </joint>
"""


def build():
    parts = ['<?xml version="1.0"?>\n<robot name="humanoid30">\n']
    parts.append(link_xml("Waist", 12.0, (0, 0, 0.05), (0.25, 0.3, 0.2)))
    # crane attachment (suspended experiments)
    parts.append('  <link name="crane_ft"/>\n')
    parts.append(joint_xml("crane_joint", "Waist", "crane_ft", (0, 0, 0.6), (0, 0, 1), 0, 0, jtype="fixed"))

    # torso chain: waist yaw/pitch/roll -> chest
    parts.append(link_xml("torso_1", 2.0, (0, 0, 0.05), (0.15, 0.2, 0.1)))
    parts.append(joint_xml("WaistYaw", "Waist", "torso_1", (0, 0, 0.15), (0, 0, 1), -1.5, 1.5, 300))
    parts.append(link_xml("torso_2", 2.5, (0, 0, 0.05), (0.15, 0.2, 0.1)))
    parts.append(joint_xml("WaistPitch", "torso_1", "torso_2", (0, 0, 0.1), (0, 1, 0), -0.8, 1.2, 300))
    parts.append(link_xml("Chest", 18.0, (0, 0, 0.15), (0.3, 0.35, 0.35)))
    parts.append(joint_xml("WaistRoll", "torso_2", "Chest", (0, 0, 0.1), (1, 0, 0), -0.6, 0.6, 300))

    # head
    parts.append(link_xml("Head", 2.5, (0, 0, 0.1), (0.15, 0.15, 0.2)))
    parts.append(joint_xml("NeckPitch", "Chest", "Head", (0, 0, 0.35), (0, 1, 0), -0.7, 0.9, 30, 3.0))

    # arms (7 dof each)
    for side, sgn in (("L", 1), ("R", -1)):
        prev = "Chest"
        origin = (0, sgn * 0.25, 0.25)
        specs = [
            ("ShPitch", (0, 1, 0), 2.6, (0.1, 0.12, 0.12), -2.8, 2.8, 120),
            ("ShRoll", (1, 0, 0), 1.9, (0.09, 0.1, 0.18), -0.3 if sgn > 0 else -2.6, 2.6 if sgn > 0 else 0.3, 120),
            ("ShYaw", (0, 0, 1), 1.7, (0.08, 0.08, 0.2), -2.6, 2.6, 80),
            ("Elbow", (0, 1, 0), 1.5, (0.07, 0.08, 0.2), -2.4, 0.2, 80),
            ("WristYaw", (0, 0, 1), 0.9, (0.06, 0.06, 0.15), -2.5, 2.5, 35),
            ("WristPitch", (0, 1, 0), 0.6, (0.05, 0.06, 0.1), -1.4, 1.4, 35),
            ("WristRoll", (1, 0, 0), 0.5, (0.05, 0.05, 0.1), -1.4, 1.4, 35),
        ]
        drop = [(0, 0, 0), (0, sgn * 0.06, -0.05), (0, 0, -0.15), (0, 0, -0.2),
                (0, 0, -0.18), (0, 0, -0.14), (0, 0, -0.08)]
        for k, (jn, axis, m, size, lo, hi, eff) in enumerate(specs):
            ln = f"{side}Arm_{k+1}"
            parts.append(link_xml(ln, m, (0, 0, -size[2] / 2), size))
            parts.append(
                joint_xml(f"{side}{jn}", prev, ln, origin if k == 0 else drop[k], axis, lo, hi, eff)
            )
            prev = ln

    # legs (6 dof each)
    for side, sgn in (("L", 1), ("R", -1)):
        prev = "Waist"
        specs = [
            ("HipYaw", (0, 0, 1), 2.8, (0.12, 0.12, 0.12), -1.1, 1.1, 200),
            ("HipRoll", (1, 0, 0), 3.2, (0.12, 0.12, 0.15), -0.5, 0.9, 250),
            ("HipPitch", (0, 1, 0), 6.5, (0.13, 0.14, 0.35), -2.0, 0.9, 250),
            ("Knee", (0, 1, 0), 4.2, (0.11, 0.12, 0.35), -0.1, 2.2, 250),
            ("AnklePitch", (0, 1, 0), 1.6, (0.1, 0.1, 0.12), -1.2, 0.7, 150),
            ("AnkleRoll", (1, 0, 0), 1.8, (0.2, 0.1, 0.06), -0.6, 0.6, 150),
        ]
        drop = [(0, sgn * 0.12, -0.15), (0, 0, -0.05), (0, 0, -0.06),
                (0, 0, -0.38), (0, 0, -0.38), (0, 0, -0.05)]
        for k, (jn, axis, m, size, lo, hi, eff) in enumerate(specs):
            ln = f"{side}Leg_{k+1}"
            com = (0.03, 0, -0.02) if k == 5 else (0, 0, -size[2] / 2)
            parts.append(link_xml(ln, m, com, size))
            parts.append(joint_xml(f"{side}{jn}", prev, ln, drop[k], axis, lo, hi, eff))
            prev = ln
        # foot contact frame
        parts.append(f'  <link name="{side}_foot_ft"/>\n')
        parts.append(joint_xml(f"{side}_foot_ft_joint", prev, f"{side}_foot_ft",
                               (0.02, 0, -0.06), (0, 0, 1), 0, 0, jtype="fixed"))

    parts.append("</robot>\n")
    return "".join(parts)


if __name__ == "__main__":
    import os

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "humanoid30.urdf")
    with open(out, "w") as f:
        f.write(build())
    print(f"wrote {out}")
