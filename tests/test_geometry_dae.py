"""Collada (.dae) mesh loading parity with the STL path.

The reference loads STL *and* DAE link meshes via trimesh
(reference identification/collision.py:19-130, visualizer meshes);
our self-contained reader must produce the same vertex cloud for the
same geometry so hull/box constraints and the BVH narrowphase are
format-independent."""

import struct

import numpy as np
import pytest

from flobaroid_tpu.models.geometry import (
    load_dae_mesh,
    load_mesh_triangles,
    load_mesh_vertices,
)

# a unit cube: 8 vertices, 12 triangles
_CUBE_V = np.array(
    [[x, y, z] for x in (0.0, 1.0) for y in (0.0, 1.0) for z in (0.0, 1.0)]
)
_CUBE_T = np.array(
    [
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ]
)


def _dae_text(up_axis="Z_UP", unit=1.0, polylist=False):
    v = " ".join(f"{c:g}" for c in _CUBE_V.ravel())
    idx = " ".join(str(i) for i in _CUBE_T.ravel())
    if polylist:
        prim = (
            f'<polylist count="12"><input semantic="VERTEX" '
            f'source="#verts" offset="0"/>'
            f'<vcount>{" ".join(["3"] * 12)}</vcount>'
            f"<p>{idx}</p></polylist>"
        )
    else:
        prim = (
            f'<triangles count="12"><input semantic="VERTEX" '
            f'source="#verts" offset="0"/><p>{idx}</p></triangles>'
        )
    return f"""<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><unit name="meter" meter="{unit}"/><up_axis>{up_axis}</up_axis></asset>
  <library_geometries>
    <geometry id="cube"><mesh>
      <source id="pos">
        <float_array id="pos-array" count="24">{v}</float_array>
        <technique_common>
          <accessor source="#pos-array" count="8" stride="3">
            <param name="X" type="float"/><param name="Y" type="float"/>
            <param name="Z" type="float"/>
          </accessor>
        </technique_common>
      </source>
      <vertices id="verts"><input semantic="POSITION" source="#pos"/></vertices>
      {prim}
    </mesh></geometry>
  </library_geometries>
</COLLADA>
"""


def _write_stl(path, V, T):
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(T)))
        for t in T:
            f.write(struct.pack("<3f", 0, 0, 0))
            for i in t:
                f.write(struct.pack("<3f", *V[i]))
            f.write(struct.pack("<H", 0))


@pytest.mark.parametrize("polylist", [False, True])
def test_dae_cube_roundtrip(tmp_path, polylist):
    p = tmp_path / "cube.dae"
    p.write_text(_dae_text(polylist=polylist))
    V, T = load_dae_mesh(str(p))
    assert V.shape == (8, 3) and T.shape == (12, 3)
    np.testing.assert_allclose(V, _CUBE_V)
    np.testing.assert_array_equal(T, _CUBE_T)


def test_dae_unit_and_up_axis(tmp_path):
    p = tmp_path / "cube_y.dae"
    p.write_text(_dae_text(up_axis="Y_UP", unit=0.01))
    V, _ = load_dae_mesh(str(p))
    # cm-unit, Y-up: scaled then rotated (x, y, z) -> (x, -z, y)
    exp = _CUBE_V * 0.01
    exp = np.stack([exp[:, 0], -exp[:, 2], exp[:, 1]], axis=1)
    np.testing.assert_allclose(V, exp)
    # the rotation preserves the bounding box volume
    assert np.allclose(
        np.ptp(V, axis=0), [0.01, 0.01, 0.01]
    )


def test_mesh_dispatch_matches_stl(tmp_path):
    """Same cube through STL and DAE gives the same hull points."""
    pd = tmp_path / "cube.dae"
    pd.write_text(_dae_text())
    ps = tmp_path / "cube.stl"
    _write_stl(str(ps), _CUBE_V, _CUBE_T)
    vd = load_mesh_vertices(str(pd))
    vs = load_mesh_vertices(str(ps))
    # STL is a facet soup — compare the deduplicated point sets
    dedup = lambda a: np.unique(np.round(a, 9), axis=0)
    np.testing.assert_allclose(dedup(vd), dedup(vs))
    Vd, Td = load_mesh_triangles(str(pd))
    Vs, Ts = load_mesh_triangles(str(ps))
    assert len(Td) == len(Ts) == 12
    # triangle soups cover the same surface: equal total area
    def area(V, T):
        e1 = V[T[:, 1]] - V[T[:, 0]]
        e2 = V[T[:, 2]] - V[T[:, 0]]
        return float(np.linalg.norm(np.cross(e1, e2), axis=1).sum() / 2)
    assert abs(area(Vd, Td) - area(Vs, Ts)) < 1e-9
