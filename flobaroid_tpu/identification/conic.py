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
(spatial-inertia / pseudo-inertia blocks). Performance structure:

  * ONE fused jitted Newton step per iteration (gradient, Hessian,
    regularized solve, and a vectorized 40-point backtracking line
    search evaluated by vmap) — a step-by-step Python loop costs ~6
    dispatches per iteration,
  * quadratic objectives declare their constant Hessian
    (`obj_hess_const`), so per-iteration autodiff covers only the
    barrier (the geometric log-det mode keeps the full autodiff path),
  * the whole solve is pinned to host CPU f64 (`jax.enable_x64` scope)
    regardless of the process's platform/precision defaults — the
    parameter space is <= ~500-dimensional, and interior points need
    ~1e-9 Newton decrements.

Infeasible starts are handled by a proximal phase-I program
(minimize s + eps*||x - x0||^2 s.t. g <= s, M + s I >= eps I) with an
early exit at the first strictly feasible point (a pure min-s phase-I
diverges: the feasible set is unbounded, so no analytic center exists).
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
    obj_hess_const: np.ndarray | None = None  # constant objective Hessian


def _neg_slack_barrier(prob: BarrierProblem, x):
    """-sum log(slacks); nan when infeasible (used as the signal)."""
    total = jnp.asarray(0.0, dtype=x.dtype)
    if prob.A is not None and prob.A.shape[0] > 0:
        s = jnp.asarray(prob.b, x.dtype) - jnp.asarray(prob.A, x.dtype) @ x
        total = total - jnp.sum(jnp.log(s))
    for M in prob.psd_maps:
        Mx = M(x)
        Mx = Mx - prob.psd_eps * jnp.eye(Mx.shape[0], dtype=x.dtype)
        L = jnp.linalg.cholesky(Mx)
        total = total - 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return total


_LS_STEPS = 0.5 ** np.arange(40)


def barrier_minimize(
    prob: BarrierProblem,
    x0: np.ndarray,
    t0: float | None = None,
    mu: float = 20.0,
    gap_tol: float = 1e-7,
    newton_tol: float = 1e-7,
    max_newton: int = 60,
    max_outer: int = 14,
    stop_fn=None,
    verbose: bool = False,
):
    """Primal barrier path following. Returns (x, status).

    status: 'optimal' | 'infeasible_start' | 'max_iter' | 'stopped'.
    x0 must be strictly feasible (see phase1). The duality-gap test is
    anchored to the objective scale at the START (a diverging objective
    must not loosen it)."""
    dtype = np.float64
    x = jnp.asarray(x0, dtype=dtype)

    nu = float(prob.A.shape[0] if prob.A is not None else 0)
    for M in prob.psd_maps:
        nu += M(x).shape[0]
    nu = max(nu, 1.0)

    def psi(x, t):
        return t * prob.objective(x) + _neg_slack_barrier(prob, x)

    grad_psi = jax.grad(psi)
    barrier_only = lambda x: _neg_slack_barrier(prob, x)
    hess_barrier = jax.hessian(barrier_only)
    H_const = (
        jnp.asarray(prob.obj_hess_const, dtype) if prob.obj_hess_const is not None else None
    )
    hess_obj = None if H_const is not None else jax.hessian(prob.objective)
    steps = jnp.asarray(_LS_STEPS, dtype)
    n = len(x0)

    @jax.jit
    def newton_step(x, t):
        g = grad_psi(x, t)
        Hb = hess_barrier(x)
        Ho = H_const if H_const is not None else hess_obj(x)
        H = t * Ho + Hb
        lam = 1e-12 * jnp.maximum(jnp.trace(H) / n, 1.0)
        dx = jnp.linalg.solve(H + lam * jnp.eye(n, dtype=dtype), -g)
        dec = -g @ dx
        bad = ~jnp.isfinite(dec) | (dec <= 0) | ~jnp.all(jnp.isfinite(dx))
        dx = jnp.where(bad, -g, dx)
        dec = jnp.where(bad, g @ g, dec)
        v0 = psi(x, t)
        cand = x[None, :] + steps[:, None] * dx[None, :]
        vals = jax.vmap(psi, in_axes=(0, None))(cand, t)
        ok = jnp.isfinite(vals) & (vals <= v0 - 1e-4 * steps * dec)
        any_ok = jnp.any(ok)
        idx = jnp.argmax(ok)
        x_new = jnp.where(any_ok, cand[idx], x)
        step_sel = jnp.where(any_ok, steps[idx], 0.0).astype(x.dtype)
        return x_new, dec, any_ok, step_sel

    f0_scale = max(1.0, abs(float(prob.objective(x))))
    if t0 is None:
        t0 = max(1.0, nu / f0_scale)

    if not np.isfinite(float(psi(x, t0))):
        return np.asarray(x), "infeasible_start"

    @jax.jit
    def newton_run(x, t, tol, max_iter):
        # one dispatch per centering stage (per-step host dispatches
        # cost ~1 ms each through the runtime)
        def cond(carry):
            x, it, dec, ok, step = carry
            # step < 1e-8: the line search is crawling at the f64 floor
            # (measured 2x60 wasted iterations per solve without this)
            return (it < max_iter) & ok & (dec / 2.0 >= tol) & (step >= 1e-8)

        def body(carry):
            x, it, _, _, _ = carry
            xn, dec, ok, step = newton_step(x, t)
            return (xn, it + 1, dec, ok, step)

        x, it, dec, ok, _ = jax.lax.while_loop(
            cond,
            body,
            (x, jnp.asarray(0), jnp.asarray(jnp.inf, x.dtype),
             jnp.asarray(True), jnp.asarray(1.0, x.dtype)),
        )
        return x, it, dec, ok

    t = t0
    for _outer in range(max_outer):
        if stop_fn is not None and stop_fn(np.asarray(x)):
            return np.asarray(x), "stopped"
        x, _, _, _ = newton_run(x, t, newton_tol, max_newton)
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

    s0 = 0.0
    if prob.A is not None and prob.A.shape[0] > 0:
        s0 = max(s0, float(np.max(prob.A @ x0 - prob.b)))
    # keep the eager PSD evaluations off the default (possibly remote
    # TPU) device — per-op dispatch there costs ~ms each
    with jax.default_device(jax.devices("cpu")[0]):
        for M in prob.psd_maps:
            ev = np.linalg.eigvalsh(np.asarray(M(jnp.asarray(x0))))
            s0 = max(s0, prob.psd_eps - float(ev[0]))
    if s0 <= 0:
        return x0, True

    s0 = s0 * 1.5 + 1e-6
    A1 = None
    b1 = None
    if prob.A is not None and prob.A.shape[0] > 0:
        A1 = np.hstack([prob.A, -np.ones((prob.A.shape[0], 1))])
        b1 = prob.b

    def lift(M):
        def Ms(z):
            Mx = M(z[:-1])
            return Mx + z[-1] * jnp.eye(Mx.shape[0], dtype=z.dtype)

        return Ms

    x0j = jnp.asarray(x0)
    prox = 1e-6
    Hq = np.zeros((n + 1, n + 1))
    Hq[:n, :n] = 2 * prox * np.eye(n)

    p1 = BarrierProblem(
        objective=lambda z: z[-1] + prox * jnp.sum((z[:-1] - x0j) ** 2),
        A=A1,
        b=b1,
        psd_maps=[lift(M) for M in prob.psd_maps],
        psd_eps=prob.psd_eps,
        obj_hess_const=Hq,
    )
    z0 = np.concatenate([x0, [s0]])

    def strictly_feasible(z):
        return float(z[-1]) < -margin

    z, status = barrier_minimize(
        p1, z0, gap_tol=1e-6, max_outer=10, mu=20.0, stop_fn=strictly_feasible,
        verbose=verbose,
    )
    if float(z[-1]) < -1e-12:
        return z[:-1], True
    return z[:-1], False


def solve(prob: BarrierProblem, x0: np.ndarray, verbose: bool = False, **kw):
    """Phase-I (if needed) + barrier minimize, pinned to host CPU f64
    (a production process defaults to the accelerator in f32; this
    parameter-space solve needs neither). Returns (x, status)."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        x_feas, ok = phase1(prob, x0, verbose=verbose)
        if not ok:
            return np.asarray(x0), "infeasible"
        x, status = barrier_minimize(prob, x_feas, verbose=verbose, **kw)
    return x, status


class QuadBarrierSolver:
    """Reusable barrier solver for QUADRATIC objectives over a fixed
    constraint structure.

    Measured: one Newton step costs 0.9 ms steady-state but ~5 s to
    compile — the generic path recompiles per solve because the
    objective lives in the closure. Here the quadratic (H, q) enters as
    traced ARGUMENTS, so all solves sharing the constraint structure
    (the usual case: feasible-std, closest-to-CAD and projection solves
    of one identification, and repeated identifications of the same
    robot) reuse one compilation."""

    def __init__(self, A, b, psd_maps, psd_eps, n):
        self.A = A
        self.b = b
        self.psd_maps = psd_maps
        self.psd_eps = psd_eps
        self.n = n
        self._build()

    def _nu(self):
        nu = float(self.A.shape[0] if self.A is not None else 0)
        for M in self.psd_maps:
            nu += M(jnp.zeros(self.n)).shape[0]
        return max(nu, 1.0)

    def _build(self):
        import jax

        cpu = jax.devices("cpu")[0]
        n = self.n
        psd_eps = self.psd_eps
        A = None if self.A is None else np.asarray(self.A, np.float64)
        b = None if self.b is None else np.asarray(self.b, np.float64)
        psd_maps = self.psd_maps
        steps = np.asarray(_LS_STEPS, np.float64)

        def barrier(x):
            total = jnp.asarray(0.0, dtype=x.dtype)
            if A is not None and A.shape[0] > 0:
                s = jnp.asarray(b) - jnp.asarray(A) @ x
                total = total - jnp.sum(jnp.log(s))
            for M in psd_maps:
                Mx = M(x) - psd_eps * jnp.eye(M(x).shape[0], dtype=x.dtype)
                L = jnp.linalg.cholesky(Mx)
                total = total - 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            return total

        def psi(x, t, H, q):
            return t * (0.5 * x @ (H @ x) + q @ x) + barrier(x)

        grad_psi = jax.grad(psi)
        hess_barrier = jax.hessian(barrier)
        stepsj = jnp.asarray(steps)

        def newton_step(x, t, H, q):
            g = grad_psi(x, t, H, q)
            Hm = t * H + hess_barrier(x)
            lam = 1e-12 * jnp.maximum(jnp.trace(Hm) / n, 1.0)
            dx = jnp.linalg.solve(Hm + lam * jnp.eye(n, dtype=x.dtype), -g)
            dec = -g @ dx
            bad = ~jnp.isfinite(dec) | (dec <= 0) | ~jnp.all(jnp.isfinite(dx))
            dx = jnp.where(bad, -g, dx)
            dec = jnp.where(bad, g @ g, dec)
            v0 = psi(x, t, H, q)
            cand = x[None, :] + stepsj[:, None] * dx[None, :]
            vals = jax.vmap(psi, in_axes=(0, None, None, None))(cand, t, H, q)
            ok = jnp.isfinite(vals) & (vals <= v0 - 1e-4 * stepsj * dec)
            any_ok = jnp.any(ok)
            idx = jnp.argmax(ok)
            step_sel = jnp.where(any_ok, stepsj[idx], 0.0).astype(x.dtype)
            return jnp.where(any_ok, cand[idx], x), dec, any_ok, step_sel

        def newton_run(x, t, H, q, tol, max_iter):
            """A whole centering stage in ONE dispatch: lax.while_loop
            over newton_step until the decrement converges or the line
            search fails. Per-step host dispatches cost ~1 ms each
            through the runtime — a stage used to be 20-60 of them."""

            def cond(carry):
                x, it, dec, ok, step = carry
                # step < 1e-8: line search crawling at the f64 floor
                return (
                    (it < max_iter) & ok & (dec / 2.0 >= tol) & (step >= 1e-8)
                )

            def body(carry):
                x, it, _, _, _ = carry
                xn, dec, ok, step = newton_step(x, t, H, q)
                return (xn, it + 1, dec, ok, step)

            x, it, dec, ok, _ = jax.lax.while_loop(
                cond,
                body,
                (x, jnp.asarray(0), jnp.asarray(jnp.inf, x.dtype),
                 jnp.asarray(True), jnp.asarray(1.0, x.dtype)),
            )
            return x, it, dec, ok

        def feas_slack(x):
            """max constraint violation at x (s0 for phase-I). Jitted —
            evaluating the PSD maps eagerly dispatches every small op
            through the default (TPU-relay) device at ~ms each;
            measured 0.4-0.5 s per phase1 call before this."""
            s = jnp.asarray(-jnp.inf, x.dtype)
            if A is not None and A.shape[0] > 0:
                s = jnp.maximum(s, jnp.max(jnp.asarray(A) @ x - jnp.asarray(b)))
            for M in psd_maps:
                ev = jnp.linalg.eigvalsh(M(x))
                s = jnp.maximum(s, psd_eps - ev[0])
            return s

        with jax.enable_x64(True), jax.default_device(cpu):
            self._newton = jax.jit(newton_step)
            self._newton_run = jax.jit(newton_run, static_argnames=())
            self._psi = jax.jit(psi)
            self._feas_slack = jax.jit(feas_slack)
        self._cpu = cpu
        self._nu_val = self._nu()

    def minimize(
        self,
        x0,
        H,
        q,
        const: float = 0.0,
        mu: float = 20.0,
        gap_tol: float = 1e-6,
        newton_tol: float = 1e-7,
        max_newton: int = 60,
        max_outer: int = 14,
        stop_fn=None,
    ):
        """Path following for f(x) = 0.5 x'Hx + q'x + const from a
        strictly feasible x0. Returns (x, status)."""
        import jax

        with jax.enable_x64(True), jax.default_device(self._cpu):
            x = jnp.asarray(x0, jnp.float64)
            Hj = jnp.asarray(H, jnp.float64)
            qj = jnp.asarray(q, jnp.float64)
            nu = self._nu_val
            f0 = 0.5 * float(x0 @ (H @ x0)) + float(q @ x0) + const
            f0_scale = max(1.0, abs(f0))
            t = max(1.0, nu / f0_scale)
            if not np.isfinite(float(self._psi(x, t, Hj, qj))):
                return np.asarray(x), "infeasible_start"
            for _outer in range(max_outer):
                # loose centering along the path (it re-centers every
                # stage); full precision is enforced by the final polish.
                # One dispatch per stage: the while_loop runs all Newton
                # iterations device-side.
                stage_tol = max(newton_tol, 1e-4)
                x, _, _, _ = self._newton_run(
                    x, t, Hj, qj, stage_tol, max_newton
                )
                if stop_fn is not None and stop_fn(np.asarray(x)):
                    return np.asarray(x), "stopped"
                if nu / t < gap_tol * f0_scale:
                    break
                t *= mu
            # final polish at the last t
            x, _, _, _ = self._newton_run(x, t, Hj, qj, newton_tol, max_newton)
            status = "optimal" if nu / t < 1e-3 * f0_scale else "max_iter"
            return np.asarray(x), status

    # ------------------------------------------------------------------
    def _phase1_solver(self):
        """Lazily built lifted-structure solver (n+1 vars, M + s I)."""
        if getattr(self, "_p1", None) is None:
            A1 = None
            b1 = None
            if self.A is not None and self.A.shape[0] > 0:
                A1 = np.hstack([self.A, -np.ones((self.A.shape[0], 1))])
                b1 = self.b

            def lift(M):
                def Ms(z):
                    Mx = M(z[:-1])
                    return Mx + z[-1] * jnp.eye(Mx.shape[0], dtype=z.dtype)

                return Ms

            self._p1 = QuadBarrierSolver(
                A1, b1, [lift(M) for M in self.psd_maps], self.psd_eps, self.n + 1
            )
        return self._p1

    def phase1(self, x0, margin: float = 1e-8):
        """Strictly feasible point near x0 (cached lifted solver)."""
        import jax

        x0 = np.asarray(x0, float)
        with jax.enable_x64(True), jax.default_device(self._cpu):
            s0 = float(self._feas_slack(jnp.asarray(x0, jnp.float64)))
        if s0 <= 0:
            return x0, True
        s0 = s0 * 1.5 + 1e-6
        prox = 1e-6
        n = self.n
        H = np.zeros((n + 1, n + 1))
        H[:n, :n] = 2 * prox * np.eye(n)
        qv = np.concatenate([-2 * prox * x0, [1.0]])
        z0 = np.concatenate([x0, [s0]])
        z, status = self._phase1_solver().minimize(
            z0, H, qv, const=float(prox * x0 @ x0 + s0),
            gap_tol=1e-6, max_outer=10,
            stop_fn=lambda z: float(z[-1]) < -margin,
        )
        if float(z[-1]) < -1e-12:
            return z[:-1], True
        return z[:-1], False

    def solve_quadratic(self, x0, H, q, const: float = 0.0, **kw):
        """Cached phase-I + cached-Newton path following."""
        x_feas, ok = self.phase1(np.asarray(x0, float))
        if not ok:
            return np.asarray(x0), "infeasible"
        return self.minimize(x_feas, H, q, const=const, **kw)
