"""Spatial (Plücker) algebra primitives in JAX.

Motion vectors are ordered [angular(3); linear(3)], force vectors
[moment(3); force(3)]. All helpers are dtype-polymorphic and traceable,
so they can sit under jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """Skew-symmetric cross-product matrix S(v) with S(v) @ w = v x w."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def unskew(S):
    return jnp.stack([S[..., 2, 1], S[..., 0, 2], S[..., 1, 0]], axis=-1)


def _rpy_to_rot_impl(rpy, xp):
    """Rz(yaw) @ Ry(pitch) @ Rx(roll) (same convention as URDF /
    iDynTree), written against either numpy or jax.numpy: ONE copy of
    the convention serves the traced dynamics and the host staging
    path (engine.rpy_to_base_rot_np)."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = xp.cos(r), xp.sin(r)
    cp, sp = xp.cos(p), xp.sin(p)
    cy, sy = xp.cos(y), xp.sin(y)
    return xp.stack(
        [
            xp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            xp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            xp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def rpy_to_rot(rpy):
    """Rz(yaw) @ Ry(pitch) @ Rx(roll) (same convention as URDF / iDynTree)."""
    return _rpy_to_rot_impl(rpy, jnp)


def rot_to_rpy(R):
    """Inverse of rpy_to_rot (pitch in [-pi/2, pi/2])."""
    p = jnp.arctan2(-R[..., 2, 0], jnp.hypot(R[..., 0, 0], R[..., 1, 0]))
    y = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    r = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([r, p, y], axis=-1)


def axis_angle_rot(axis, angle):
    """Rodrigues rotation about a (unit) axis. axis: (...,3), angle: (...,)."""
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    K = skew(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=K.dtype), K.shape)
    aaT = axis[..., :, None] * axis[..., None, :]
    return c * eye + s * K + (1.0 - c) * aaT


def crm(v, m):
    """Motion cross product v x m for motion vectors [ang; lin]."""
    w, vl = v[..., :3], v[..., 3:]
    wm, vm = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, wm), jnp.cross(w, vm) + jnp.cross(vl, wm)], axis=-1
    )


def crf(v, f):
    """Force cross product v x* f, f = [moment; force]."""
    w, vl = v[..., :3], v[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
    )


def inertia_matrix_from_params(p10):
    """Spatial inertia (6x6, [ang;lin] ordering) from the 10 standard
    link-frame parameters [m, h, Ixx, Ixy, Ixz, Iyy, Iyz, Izz]."""
    m = p10[..., 0]
    h = p10[..., 1:4]
    Io = inertia_tensor_from_vec(p10[..., 4:10])
    Sh = skew(h)
    eye = jnp.eye(3, dtype=p10.dtype)
    top = jnp.concatenate([Io, Sh], axis=-1)
    bot = jnp.concatenate([-Sh, m[..., None, None] * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def inertia_tensor_from_vec(ivec):
    """Symmetric 3x3 from [Ixx, Ixy, Ixz, Iyy, Iyz, Izz]."""
    ixx, ixy, ixz, iyy, iyz, izz = (ivec[..., k] for k in range(6))
    return jnp.stack(
        [
            jnp.stack([ixx, ixy, ixz], axis=-1),
            jnp.stack([ixy, iyy, iyz], axis=-1),
            jnp.stack([ixz, iyz, izz], axis=-1),
        ],
        axis=-2,
    )


def inertia_vec_from_tensor(I3):
    return jnp.stack(
        [
            I3[..., 0, 0],
            I3[..., 0, 1],
            I3[..., 0, 2],
            I3[..., 1, 1],
            I3[..., 1, 2],
            I3[..., 2, 2],
        ],
        axis=-1,
    )


def L_of(w):
    """L(w) with L(w) @ ivec = I(ivec) @ w for the 6-vector inertia layout.

    Rows: (I w)_x = Ixx wx + Ixy wy + Ixz wz, etc.
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([wx, wy, wz, z, z, z], axis=-1),
            jnp.stack([z, wx, z, wy, wz, z], axis=-1),
            jnp.stack([z, z, wx, z, wy, wz], axis=-1),
        ],
        axis=-2,
    )
