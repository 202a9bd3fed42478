"""Visualizer: mesh rendering, snapshots, animation HTML."""

import os
import struct

import numpy as np

from flobaroid_tpu.dynamics.engine import DynamicsEngine
from flobaroid_tpu.models.urdf import load_urdf
from flobaroid_tpu.visualizer import Visualizer


def _write_cube_stl(path):
    c = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float) * 0.1
    faces = [(0, 1, 2), (0, 2, 3), (4, 6, 5), (4, 7, 6), (0, 4, 5), (0, 5, 1),
             (3, 2, 6), (3, 6, 7), (0, 3, 7), (0, 7, 4), (1, 5, 6), (1, 6, 2)]
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(faces)))
        for a, b, cc in faces:
            f.write(struct.pack("<3f", 0, 0, 1))
            for v in (c[a], c[b], c[cc]):
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))


URDF = """
<robot name="meshbot">
  <link name="base">
    <inertial><mass value="1.0"/><inertia ixx="0.1" iyy="0.1" izz="0.1"/></inertial>
    <visual><geometry><mesh filename="meshes/cube.stl"/></geometry></visual>
  </link>
  <link name="l1">
    <inertial><mass value="0.5"/><origin xyz="0 0 0.1"/>
      <inertia ixx="0.05" iyy="0.05" izz="0.05"/></inertial>
    <visual><origin xyz="0 0 0.05"/><geometry><mesh filename="meshes/cube.stl"/></geometry></visual>
  </link>
  <joint name="j1" type="revolute">
    <origin xyz="0 0 0.12"/><axis xyz="0 1 0"/><parent link="base"/><child link="l1"/>
    <limit lower="-2" upper="2" effort="10" velocity="3"/>
  </joint>
</robot>
"""


def test_mesh_rendering_and_animation(tmp_path):
    os.makedirs(tmp_path / "meshes", exist_ok=True)
    _write_cube_stl(str(tmp_path / "meshes" / "cube.stl"))
    urdf = str(tmp_path / "robot.urdf")
    open(urdf, "w").write(URDF)
    tree = load_urdf(urdf)
    viz = Visualizer(tree, DynamicsEngine(tree), urdf_path=urdf)
    assert set(viz.link_meshes) == {0, 1}  # both links got their STL
    assert viz.link_meshes[0][0][0].shape == (12, 3, 3)

    out = viz.snapshot(np.array([0.5]), str(tmp_path / "pose.png"))
    assert os.path.getsize(out) > 10000

    Q = np.linspace(-0.5, 0.5, 12)[:, None]
    html = viz.animate(Q, str(tmp_path / "traj.html"), step=4)
    content = open(html).read()
    assert content.count("data:image") >= 0 and "frames" in content

    # meshless fallback: no crash, no meshes
    viz2 = Visualizer(tree, DynamicsEngine(tree), draw_meshes=False)
    assert viz2.link_meshes == {}
