"""Mesh-tier exact collision verification (collision_mesh.py).

The key guarantee (VERDICT r1 #6 'done' criterion): a configuration the
CAPSULE tier accepts but whose EXACT geometry overlaps must be caught
by the mesh verifier — thin plates approaching corner-to-corner are
exactly the shape class capsules cannot represent (reference handles
this with FCL convex hulls, identification/collision.py:19-267)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from flobaroid_tpu.collision import CollisionModel
from flobaroid_tpu.collision_mesh import (
    MeshCollisionVerifier,
    link_vertices,
    polytope_distance,
)
from flobaroid_tpu.dynamics.engine import DynamicsEngine
from flobaroid_tpu.models.urdf import load_urdf


def _box_verts(center, size):
    h = np.asarray(size) / 2.0
    c = np.asarray(center)
    return np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    ) * h + c


def test_polytope_distance_separated_boxes():
    A = jnp.asarray(_box_verts([0, 0, 0], [1, 1, 1]), jnp.float32)
    for gap in (0.05, 0.3, 1.7):
        B = jnp.asarray(_box_verts([1.0 + gap, 0, 0], [1, 1, 1]), jnp.float32)
        d = float(polytope_distance(A, B))
        assert abs(d - gap) < 2e-3, (gap, d)


def test_polytope_distance_overlap_and_diagonal():
    A = jnp.asarray(_box_verts([0, 0, 0], [1, 1, 1]), jnp.float32)
    B = jnp.asarray(_box_verts([0.6, 0.2, 0.0], [1, 1, 1]), jnp.float32)
    assert float(polytope_distance(A, B)) < 2e-3  # overlapping -> ~0
    # corner-to-corner diagonal gap
    B = jnp.asarray(_box_verts([1.2, 1.2, 1.2], [1, 1, 1]), jnp.float32)
    d = float(polytope_distance(A, B))
    assert abs(d - np.sqrt(3 * 0.2**2)) < 3e-3, d


PLATES_URDF = """<robot name="plates">
  <link name="base_plate">
    <inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial>
    <visual><geometry><box size="1.0 1.0 0.02"/></geometry></visual>
  </link>
  <link name="mid"><inertial><mass value="0.5"/><inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial></link>
  <link name="plate_b">
    <inertial><mass value="1"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial>
    <visual><geometry><box size="1.0 1.0 0.02"/></geometry></visual>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base_plate"/><child link="mid"/>
    <origin xyz="0.95 0.95 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14" effort="10" velocity="2"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="mid"/><child link="plate_b"/>
    <origin xyz="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14" effort="10" velocity="2"/>
  </joint>
</robot>
"""


@pytest.fixture()
def plates(tmp_path):
    p = tmp_path / "plates.urdf"
    p.write_text(PLATES_URDF)
    tree = load_urdf(str(p))
    eng = DynamicsEngine(tree)
    return tree, eng


def test_mesh_rejects_capsule_feasible_overlap(plates):
    """plate_b sits diagonally offset at (0.95, 0.95): the plates'
    CORNERS overlap (exact geometry interpenetrates) while the fitted
    capsules (radius ~0.45 around the long axis) still report positive
    clearance."""
    tree, eng = plates
    config = dict(
        checkCollisions=1, scaleCollisionHull=1.0, meshBaseDir="meshes",
        maxKinematicDistance=0, collisionMode="convex",
    )
    cm = CollisionModel(tree, eng, config)
    assert ("base_plate", "plate_b") in cm.self_pairs

    q0 = jnp.zeros(2)
    cap_clear = np.asarray(cm.distances(q0))
    i = cm.pair_names.index(("base_plate", "plate_b"))
    assert cap_clear[i] > 0, f"capsule tier must accept this pose ({cap_clear[i]})"

    ver = MeshCollisionVerifier(tree, eng, config, cm)
    assert ver.num_pairs >= 1
    ok, bad = ver.verify(np.zeros((1, 2)))
    assert not ok, "exact geometry overlaps: the mesh tier must reject"
    names = [p for p, _ in bad]
    assert ("base_plate", "plate_b") in names
    worst = dict(bad)[("base_plate", "plate_b")]
    assert worst <= 1e-3  # distance saturates at 0 under penetration

    # rotating plate_b by 45 deg pulls the corners apart -> both accept
    q_free = np.array([[0.0, np.pi / 4]])
    ok2, bad2 = ver.verify(q_free)
    assert ok2, bad2


def test_link_vertices_modes(plates):
    tree, _ = plates
    vb = link_vertices(tree, "base_plate", mode="box")
    assert vb.shape == (8, 3)
    vc = link_vertices(tree, "base_plate", mode="convex")
    assert vc.shape[0] >= 8
    assert link_vertices(tree, "mid") is None
