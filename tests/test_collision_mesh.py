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


# ----------------------------------------------------------------------
# native triangle-exact narrowphase (collisionMode: full)
# ----------------------------------------------------------------------
def _write_stl(path, tris):
    """Binary STL from a (T, 3, 3) triangle array."""
    import struct

    tris = np.asarray(tris, dtype=float)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tris)))
        for t in tris:
            n = np.cross(t[1] - t[0], t[2] - t[0])
            nn = np.linalg.norm(n)
            n = n / nn if nn > 0 else n
            f.write(struct.pack(
                "<12fH", *n, *t[0], *t[1], *t[2], 0
            ))


def _box_soup(center, half):
    from flobaroid_tpu.collision_mesh import box_triangles

    v, t = box_triangles(center, half, np.eye(3))
    return v[t]


def test_native_meshdist_distances():
    nm = pytest.importorskip("flobaroid_tpu.native_meshdist")
    if not nm.available():
        pytest.skip("native toolchain unavailable")
    from flobaroid_tpu.collision_mesh import box_triangles

    va, ta = box_triangles((0, 0, 0), (0.5, 0.5, 0.5), np.eye(3))
    A = nm.NativeMesh(va, ta)
    B = nm.NativeMesh(va, ta)
    I4 = np.eye(4)

    def T(p):
        M = np.eye(4)
        M[:3, 3] = p
        return M

    assert abs(nm.distance(A, I4, B, T([2, 0, 0])) - 1.0) < 1e-9
    assert nm.distance(A, I4, B, T([0.5, 0, 0])) == 0.0  # penetration
    # rotated 45 deg about z: corner-to-face gap
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    R = np.eye(4)
    R[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    R[0, 3] = 2.0
    d = nm.distance(A, I4, B, R)
    assert abs(d - (1.5 - np.sqrt(2) * 0.5)) < 1e-9
    # BVH agrees with brute force on random soups
    rng = np.random.default_rng(0)
    for _ in range(3):
        v1 = rng.normal(size=(60, 3))
        t1 = np.arange(60, dtype=np.int32).reshape(-1, 3)
        v2 = rng.normal(size=(60, 3)) + [3.5, 0, 0]
        M1, M2 = nm.NativeMesh(v1, t1), nm.NativeMesh(v2, t2 := t1.copy())
        assert abs(
            nm.distance(M1, I4, M2, I4) - nm.distance(M1, I4, M2, I4, brute=True)
        ) < 1e-9

    # full containment: surface distance is positive but contained()
    # must flag it (the case surface-to-surface queries cannot see)
    vs, ts = box_triangles((0, 0, 0), (0.1, 0.1, 0.1), np.eye(3))
    S = nm.NativeMesh(vs, ts)
    assert nm.distance(A, I4, S, I4) > 0.3  # inner surface 0.4 m away
    assert nm.contained(A, I4, S, I4)
    assert nm.contained(S, I4, A, I4)
    assert not nm.contained(A, I4, B, T([2, 0, 0]))
    # point queries
    assert nm.contains_point(A, I4, [0.0, 0.0, 0.0])
    assert not nm.contains_point(A, I4, [0.9, 0.0, 0.0])


CHANNEL_URDF = """<robot name="channel">
  <link name="channel">
    <inertial><mass value="2"/><inertia ixx="0.1" iyy="0.1" izz="0.1" ixy="0" ixz="0" iyz="0"/></inertial>
    <visual><geometry><mesh filename="uchannel.stl"/></geometry></visual>
  </link>
  <link name="mid"><inertial><mass value="0.1"/><inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial></link>
  <link name="bar">
    <inertial><mass value="0.5"/><inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/></inertial>
    <visual><origin xyz="0.28 0 0"/><geometry><box size="0.1 0.1 0.1"/></geometry></visual>
  </link>
  <joint name="j1" type="revolute">
    <parent link="channel"/><child link="mid"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14" effort="10" velocity="2"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="mid"/><child link="bar"/>
    <origin xyz="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-3.14" upper="3.14" effort="10" velocity="2"/>
  </joint>
</robot>
"""


@pytest.fixture()
def channel(tmp_path):
    """U-channel (non-convex mesh link) + a bar that can swing inside
    the cavity: base slab z in [-0.1, 0], walls at |x| in [0.3, 0.5]
    up to z = 0.4 — the cavity is INSIDE the convex hull."""
    soup = np.concatenate([
        _box_soup((0, 0, -0.05), (0.5, 0.5, 0.05)),
        _box_soup((+0.4, 0, 0.2), (0.1, 0.5, 0.2)),
        _box_soup((-0.4, 0, 0.2), (0.1, 0.5, 0.2)),
    ])
    _write_stl(tmp_path / "uchannel.stl", soup)
    p = tmp_path / "channel.urdf"
    p.write_text(CHANNEL_URDF)
    tree = load_urdf(str(p))
    eng = DynamicsEngine(tree)
    return tree, eng


WORLD_URDF = """<robot name="room">
  <link name="cage">
    <inertial><mass value="100"/><inertia ixx="1" iyy="1" izz="1" ixy="0" ixz="0" iyz="0"/></inertial>
    <visual><origin xyz="0 0 0.2"/><geometry><box size="2.0 2.0 2.0"/></geometry></visual>
  </link>
</robot>
"""


def test_full_mode_rejects_containment(channel, tmp_path):
    """A link fully INSIDE a world obstacle has positive
    surface-to-surface triangle distance — the narrowphase must not
    un-flag the hull tier's (correct) verdict (ray-parity containment
    check)."""
    nm = pytest.importorskip("flobaroid_tpu.native_meshdist")
    if not nm.available():
        pytest.skip("native toolchain unavailable")
    tree, eng = channel
    wp = tmp_path / "room.urdf"
    wp.write_text(WORLD_URDF)
    world = load_urdf(str(wp))
    base = dict(
        checkCollisions=1, scaleCollisionHull=1.0, meshBaseDir="meshes",
        maxKinematicDistance=0,
    )
    cm = CollisionModel(tree, eng, dict(base, collisionMode="capsule"),
                        world_tree=world)
    assert ("bar", "cage") in cm.world_pairs
    full = MeshCollisionVerifier(
        tree, eng, dict(base, collisionMode="full"), cm, world_tree=world
    )
    # q2 = pi/2: the bar sits in the channel cavity — and entirely
    # inside the 2 m world cage
    ok, bad = full.verify(np.array([[0.0, np.pi / 2]]))
    assert not ok
    assert ("bar", "cage") in [p for p, _ in bad]


def test_full_mode_accepts_concave_clearance(channel):
    """The bar inside the channel cavity: the hull tier reports
    penetration (the hull fills the cavity) but the raw triangles clear
    by 0.15 m — `collisionMode: full` must accept, `convex` must
    reject (reference full-mesh semantics, optimizer.py:571-634)."""
    nm = pytest.importorskip("flobaroid_tpu.native_meshdist")
    if not nm.available():
        pytest.skip("native toolchain unavailable")
    tree, eng = channel
    base = dict(
        checkCollisions=1, scaleCollisionHull=1.0, meshBaseDir="meshes",
        maxKinematicDistance=0,
    )
    cm = CollisionModel(tree, eng, dict(base, collisionMode="capsule"))
    assert ("channel", "bar") in cm.self_pairs

    # q2 = +pi/2 swings the bar to (0, 0.28, 0.2): inside the cavity,
    # 0.15 m above the base slab, 0.25 m from either wall
    q_inside = np.array([[0.0, np.pi / 2]])

    convex = MeshCollisionVerifier(tree, eng, dict(base, collisionMode="convex"), cm)
    ok_c, bad_c = convex.verify(q_inside)
    assert not ok_c and ("channel", "bar") in [p for p, _ in bad_c], (
        "hull tier must (conservatively) reject the in-cavity pose"
    )

    full = MeshCollisionVerifier(tree, eng, dict(base, collisionMode="full"), cm)
    assert full._native, "native narrowphase must be active in full mode"
    ok_f, bad_f = full.verify(q_inside)
    assert ok_f, f"triangle-exact tier must accept the cavity pose: {bad_f}"

    # q = 0 leaves the bar at (0.28, 0, 0.2): x in [0.23, 0.33]
    # interpenetrates the +x wall (x >= 0.3) — full mode must reject too
    ok_p, bad_p = full.verify(np.array([[0.0, 0.0]]))
    assert not ok_p
    assert ("channel", "bar") in [p for p, _ in bad_p]
    assert dict(bad_p)[("channel", "bar")] <= 1e-3
