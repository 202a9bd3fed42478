"""Energy-based (Euler-Lagrange) inverse dynamics oracle.

A fully independent formulation of the robot dynamics used to validate
the recursive engine: link velocities come from jax.jvp through forward
kinematics (not from the engine's velocity propagation), and torques
come from autodiff of the Lagrangian (not from Newton-Euler wrench
sums). Agreement between the two is a strong correctness oracle —
this replaces the reference's reliance on iDynTree as ground truth
(reference: tests/test_regressors.py uses iDynTree inverse dynamics as
the oracle; iDynTree is exactly what this package re-implements).

Also exposes kinetic/potential energy, used by tests and by the
suspended-base simulation checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import spatial as sp
from .engine import DynamicsEngine


def _body_twists_from_fk(Rw, pw, Rd, pd):
    """Body-frame [w; v] from FK values and their time derivatives."""
    RwT = jnp.swapaxes(Rw, -1, -2)
    Wl = RwT @ Rd
    Wl = 0.5 * (Wl - jnp.swapaxes(Wl, -1, -2))
    w = sp.unskew(Wl)
    v = jnp.einsum("lij,lj->li", RwT, pd)
    return jnp.concatenate([w, v], axis=-1)


def _world_fk(engine: DynamicsEngine, x):
    """World FK from generalized coords x = [p_base(3), rpy(3), q(n)].

    Uses the npz storage convention world_R_base = RPY(rpy)^T
    (see engine.rpy_to_base_rot)."""
    pb, rpy, q = x[:3], x[3:6], x[6:]
    Rwb = sp.rpy_to_rot(rpy).T
    R, p = engine.fk(q)
    Rw = Rwb @ R
    pw = pb + (Rwb @ p[..., None])[..., 0]
    return Rw, pw


def energies(engine: DynamicsEngine, pi, x, xd):
    """Kinetic and potential energy at generalized state (x, xd)."""
    (Rw, pw), (Rd, pd) = jax.jvp(lambda xx: _world_fk(engine, xx), (x,), (xd,))
    nu = _body_twists_from_fk(Rw, pw, Rd, pd)
    p10 = pi.reshape(engine.num_links, 10)
    I6 = sp.inertia_matrix_from_params(p10)
    T = 0.5 * jnp.einsum("li,lij,lj->", nu, I6, nu)
    g = jnp.asarray(engine.gravity, dtype=x.dtype)
    # V = -sum_i m_i g . c_i^world ; m*c^world = R h + m p
    h_w = jnp.einsum("lij,lj->li", Rw, p10[:, 1:4]) + p10[:, 0:1] * pw
    V = -jnp.sum(h_w @ g)
    return T, V


def _lagrangian(engine, pi, x, xd):
    T, V = energies(engine, pi, x, xd)
    return T - V


def omega_world(rpy, drpy):
    """World angular velocity for the rpy convention R_wb = RPY(rpy)^T."""
    R, Rd = jax.jvp(lambda r: sp.rpy_to_rot(r).T, (rpy,), (drpy,))
    W = Rd @ R.T
    return sp.unskew(0.5 * (W - W.T))


def euler_map(rpy):
    """E(rpy) with omega_world = E @ rpy_dot."""
    return jax.jacobian(lambda rd: omega_world(rpy, rd))(jnp.zeros_like(rpy))


def inverse_dynamics_fixed(engine: DynamicsEngine, pi, q, dq, ddq):
    """Fixed-base joint torques from the Euler-Lagrange equations."""
    n = engine.num_dofs
    z = jnp.zeros(6, dtype=q.dtype)
    x = jnp.concatenate([z, q])
    xd = jnp.concatenate([z, dq])
    xdd = jnp.concatenate([z, ddq])
    gen = _generalized_forces(engine, pi, x, xd, xdd)
    return gen[6:]


def inverse_dynamics_floating(
    engine: DynamicsEngine, pi, q, dq, ddq, rpy, drpy, ddrpy, dpb, ddpb
):
    """Floating-base [base wrench (mixed, world origin); joint torques].

    Base position is pinned to the world origin (as everywhere in this
    toolkit); base linear velocity/acceleration dpb/ddpb are free.
    The moment conjugate to rpy-rates is mapped back to the mixed base
    moment via the transpose of the Euler-rate map (power equivalence).
    """
    x = jnp.concatenate([jnp.zeros(3, dtype=q.dtype), rpy, q])
    xd = jnp.concatenate([dpb, drpy, dq])
    xdd = jnp.concatenate([ddpb, ddrpy, ddq])
    gen = _generalized_forces(engine, pi, x, xd, xdd)
    f_base = gen[:3]
    E = euler_map(rpy)
    n_base = jnp.linalg.solve(E.T, gen[3:6])
    return jnp.concatenate([f_base, n_base, gen[6:]])


def _generalized_forces(engine, pi, x, xd, xdd):
    dLdxd = jax.grad(lambda a, b: _lagrangian(engine, pi, a, b), argnums=1)
    _, dt_p = jax.jvp(lambda a, b: dLdxd(a, b), (x, xd), (xd, xdd))
    dLdx = jax.grad(lambda a, b: _lagrangian(engine, pi, a, b), argnums=0)(x, xd)
    return dt_p - dLdx
