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


def test_webgl_viewer_export(tmp_path):
    """The interactive WebGL export embeds per-frame link transforms,
    geometry buffers, collision flags and torque bars in ONE offline
    HTML file."""
    import base64

    from flobaroid_tpu.collision import CollisionModel
    from flobaroid_tpu.webgl_viewer import export_webgl

    os.makedirs(tmp_path / "meshes", exist_ok=True)
    _write_cube_stl(str(tmp_path / "meshes" / "cube.stl"))
    urdf = str(tmp_path / "robot.urdf")
    open(urdf, "w").write(URDF)
    tree = load_urdf(urdf)
    eng = DynamicsEngine(tree)
    cm = CollisionModel(tree, eng, dict(checkCollisions=1, meshBaseDir="meshes",
                                        maxKinematicDistance=0))
    viz = Visualizer(tree, eng, collision_model=cm, urdf_path=urdf,
                     tau_limits=np.array([10.0]))
    Q = np.linspace(-0.5, 0.5, 30)[:, None]
    tau = np.linspace(-12, 12, 30)[:, None]  # crosses the limit
    out = export_webgl(viz, Q, str(tmp_path / "traj3d.html"), step=5,
                       torques=tau)
    content = open(out).read()
    assert "webgl" in content  # canvas context
    assert "orbit" in content  # interaction hint
    meta_json = content.split("const META=", 1)[1].split(";\n", 1)[0]
    import json

    meta = json.loads(meta_json)
    assert meta["frames"] == 6
    assert meta["num_links"] == tree.num_links
    assert meta["joints"] == list(tree.dof_names)
    # transform blob decodes to frames x links x 12 f32
    xf_b64 = content.split('const XF=f32("', 1)[1].split('"', 1)[0]
    xf = np.frombuffer(base64.b64decode(xf_b64), np.float32)
    assert xf.shape == (meta["frames"] * meta["num_links"] * 12,)
    assert np.all(np.isfinite(xf))
    # rotation part of frame 0, link 0 is an orthonormal basis
    R0 = xf[:9].reshape(3, 3)
    np.testing.assert_allclose(R0 @ R0.T, np.eye(3), atol=1e-5)
