"""JAX log-barrier interior-point solver for the physical-consistency
programs.

Replaces the reference's cvxpy + CLARABEL/SCS backend
(identification/sdp.py, sdp_helpers.py): the problems there are
least-squares (or log-det-divergence) objectives over per-link PSD
cones plus linear inequalities. cvxpy reformulates the quadratic via a
Schur-complement epigraph SDP; here the quadratic stays a quadratic
and a primal barrier method follows the central path with damped
Newton steps:

    psi_t(x) = t * f(x) - sum_j log(-g_j(x)) - sum_k logdet(M_k(x))

with affine g (linear inequalities) and affine matrix maps M_k
(spatial-inertia / pseudo-inertia blocks). Gradients and Hessians come
from jax.grad / jax.hessian — dimensions are parameter-space small
(<= ~500), so each Newton step is a dense Cholesky. All functions are
dtype-generic; f64 on CPU is the default for solver robustness
(matching the reference's reliance on f64 conic solvers), f32 works
for well-scaled problems.

Infeasible starts are handled by a standard phase-I program
(minimize s s.t. g <= s, M + s I >= eps I).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BarrierProblem:
    """minimize f(x) s.t. A x <= b and M_k(x) >> eps*I."""

    objective: Callable  # x -> scalar (JAX-traceable, convex)
    A: np.ndarray | None = None  # (m, n)
    b: np.ndarray | None = None  # (m,)
    psd_maps: list[Callable] = field(default_factory=list)  # x -> (d,d) affine
    psd_eps: float = 1e-6


def _neg_slack_barrier(prob: BarrierProblem, x):
    """-sum log(slacks); +inf (nan) when infeasible."""
    total = 0.0
    if prob.A is not None and prob.A.shape[0] > 0:
        s = jnp.asarray(prob.b) - jnp.asarray(prob.A) @ x
        total = total - jnp.sum(jnp.log(s))
    for M in prob.psd_maps:
        Mx = M(x) - prob.psd_eps * jnp.eye(M(x).shape[0], dtype=x.dtype)
        # logdet via cholesky: nan when not PD (used as infeasibility signal)
        L = jnp.linalg.cholesky(Mx)
        total = total - 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return total


def barrier_minimize(
    prob: BarrierProblem,
    x0: np.ndarray,
    t0: float | None = None,
    mu: float = 20.0,
    gap_tol: float = 1e-7,
    newton_tol: float = 1e-9,
    max_newton: int = 60,
    max_outer: int = 14,
    stop_fn=None,
    verbose: bool = False,
):
    """Primal barrier path following. Returns (x, status).

    status: 'optimal' | 'infeasible_start' | 'max_iter' | 'stopped'.
    x0 must be strictly feasible (see phase1 below). stop_fn(x) -> bool
    allows early termination (used by phase-I once a strictly feasible
    point is found). The duality-gap test is anchored to the objective
    scale at the START (a diverging objective must not loosen it)."""
    dtype = np.float64
    x = jnp.asarray(x0, dtype=dtype)

    nu = float(prob.A.shape[0] if prob.A is not None else 0)
    for M in prob.psd_maps:
        nu += M(x).shape[0]
    nu = max(nu, 1.0)

    def psi(x, t):
        return t * prob.objective(x) + _neg_slack_barrier(prob, x)

    val_grad = jax.jit(jax.value_and_grad(psi))
    hess = jax.jit(jax.hessian(psi))

    f0_scale = max(1.0, abs(float(prob.objective(x))))
    if t0 is None:
        # balance t*f against the barrier at the start
        t0 = max(1.0, nu / f0_scale)

    v0, _ = val_grad(x, t0)
    if not np.isfinite(float(v0)):
        return np.asarray(x), "infeasible_start"

    t = t0
    for _outer in range(max_outer):
        if stop_fn is not None and stop_fn(np.asarray(x)):
            return np.asarray(x), "stopped"
        # Newton centering
        for _it in range(max_newton):
            v, g = val_grad(x, t)
            H = hess(x, t)
            Hn = np.asarray(H, dtype=dtype)
            gn = np.asarray(g, dtype=dtype)
            # regularize minimally for numerical safety
            lam = 1e-12 * max(1.0, float(np.trace(Hn)) / Hn.shape[0])
            try:
                dx = np.linalg.solve(Hn + lam * np.eye(Hn.shape[0]), -gn)
            except np.linalg.LinAlgError:
                dx = -gn
            decrement = float(-gn @ dx)
            if not np.isfinite(decrement) or decrement < 0:
                dx = -gn
                decrement = float(gn @ gn)
            if decrement / 2.0 < newton_tol:
                break
            # backtracking line search keeping strict feasibility
            step = 1.0
            accepted = False
            for _ls in range(50):
                xn = x + step * jnp.asarray(dx)
                vn, _ = val_grad(xn, t)
                vn = float(vn)
                if np.isfinite(vn) and vn <= float(v) - 1e-4 * step * decrement:
                    x = xn
                    accepted = True
                    break
                step *= 0.5
            if not accepted:
                break
        if stop_fn is not None and stop_fn(np.asarray(x)):
            return np.asarray(x), "stopped"
        if nu / t < gap_tol * f0_scale:
            break
        t *= mu
    gap = nu / t
    status = "optimal" if gap < 1e-3 * f0_scale else "max_iter"
    return np.asarray(x), status


def phase1(prob: BarrierProblem, x0: np.ndarray, margin: float = 1e-8, verbose=False):
    """Find a strictly feasible point by minimizing the max violation s:
    g <= s, M_k + s I >> eps I. Returns (x, feasible: bool)."""
    n = len(x0)
    x0 = np.asarray(x0, dtype=float)

    # initial s: strict upper bound on current violation
    s0 = 0.0
    if prob.A is not None and prob.A.shape[0] > 0:
        s0 = max(s0, float(np.max(prob.A @ x0 - prob.b)))
    for M in prob.psd_maps:
        ev = np.linalg.eigvalsh(np.asarray(M(jnp.asarray(x0))))
        s0 = max(s0, prob.psd_eps - float(ev[0]))
    if s0 <= 0:
        return x0, True  # already strictly feasible
    s0 = s0 * 1.5 + 1e-6

    A1 = None
    b1 = None
    if prob.A is not None and prob.A.shape[0] > 0:
        A1 = np.hstack([prob.A, -np.ones((prob.A.shape[0], 1))])
        b1 = prob.b

    def lift(M):
        d = None

        def Ms(z):
            Mx = M(z[:-1])
            return Mx + z[-1] * jnp.eye(Mx.shape[0], dtype=z.dtype)

        return Ms

    # The feasible set is typically unbounded (masses/inertias/friction
    # have no upper bound), so a pure min-s phase-I would drift toward a
    # nonexistent analytic center. A small proximal term anchors x near
    # x0, and stop_fn exits as soon as strict feasibility is reached.
    x0j = jnp.asarray(x0)
    prox = 1e-6

    p1 = BarrierProblem(
        objective=lambda z: z[-1] + prox * jnp.sum((z[:-1] - x0j) ** 2),
        A=A1,
        b=b1,
        psd_maps=[lift(M) for M in prob.psd_maps],
        psd_eps=prob.psd_eps,
    )
    z0 = np.concatenate([x0, [s0]])

    def strictly_feasible(z):
        return float(z[-1]) < -margin

    z, status = barrier_minimize(
        p1, z0, gap_tol=1e-6, max_outer=10, mu=20.0, stop_fn=strictly_feasible,
        verbose=verbose,
    )
    s_final = float(z[-1])
    if s_final < -1e-12:
        return z[:-1], True
    return z[:-1], False


def solve(prob: BarrierProblem, x0: np.ndarray, verbose: bool = False, **kw):
    """Phase-I (if needed) + barrier minimize. Returns (x, status).

    Interior-point iterations need ~1e-9 Newton decrements, so the whole
    solve is pinned to the host CPU in f64 regardless of the process's
    global x64 flag or default (TPU) device — a production process runs
    the regressor work on the accelerator in f32 while this
    parameter-space solve (n <= ~500) stays on the host. Without this,
    the solve silently truncates to f32 AND dispatches thousands of tiny
    Newton ops through the accelerator (measured: minutes instead of
    milliseconds)."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        x_feas, ok = phase1(prob, x0, verbose=verbose)
        if not ok:
            return np.asarray(x0), "infeasible"
        x, status = barrier_minimize(prob, x_feas, verbose=verbose, **kw)
    return x, status
