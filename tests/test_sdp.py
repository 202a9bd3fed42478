"""SDP (physically consistent identification) acceptance suite.

Solver-agnostic acceptance criteria mirroring the reference's
tests/test_sdp_baseline.py: consistency, residual bounds, mass boxes,
hull mode, friction positivity, pinned params, closest-to-CAD,
regularization-mode differences.
"""

import shutil

import numpy as np
import pytest

from flobaroid_tpu.identification.identifier import Identification
from flobaroid_tpu.utils.config import load_config
from flobaroid_tpu.utils.helpers import consistency_per_link
from test_identification import synth_samples

ARM_URDF_PATH = "examples/models/sevenlink_arm.urdf"


def spatial_consistent(xstd_full, num_links, eps=-1e-8):
    """All links with nonzero params have PSD spatial inertia (the
    constraint the SDP enforces, reference sdp.py:123-148)."""
    from flobaroid_tpu.dynamics.spatial import inertia_matrix_from_params
    import jax.numpy as jnp

    ok = True
    for i in range(num_links):
        p = xstd_full[i * 10 : i * 10 + 10]
        if np.all(np.abs(p) < 1e-12):
            continue
        M = np.asarray(inertia_matrix_from_params(jnp.asarray(p)))
        if np.linalg.eigvalsh(M)[0] < eps:
            ok = False
    return ok


@pytest.fixture(scope="module")
def arm(tmp_path_factory):
    import os

    d = tmp_path_factory.mktemp("sdp_arm")
    src = os.path.join(os.path.dirname(__file__), "..", ARM_URDF_PATH)
    p = str(d / "arm.urdf")
    shutil.copy(src, p)
    samples, _ = synth_samples(p, n=1500, noise=0.05, seed=21)
    return p, samples


def sdp_opt(**kw):
    opt = load_config(None)
    opt.update(
        dict(
            verbose=0,
            floatingBase=0,
            useStructuralRegressor=1,
            randomSamples=1000,
            computeDtype="float64",
            estimateWith="std",
            constrainToConsistent=1,
            limitOverallMass=1,
            limitMassRange=1.0,
            limitMassToApriori=1,
            limitMassAprioriBoundary=0.3,
        )
    )
    opt.update(kw)
    return opt


def run_sdp(urdf, samples, **kw):
    opt = sdp_opt(**kw)
    idf = Identification(opt, urdf)
    idf.data.init_from_data(dict(samples))
    idf.estimateParameters()
    return idf


def test_sdp_consistent_and_accurate(arm):
    urdf, samples = arm
    idf = run_sdp(urdf, samples)
    assert idf.sdp.last_status == "optimal"
    xf = idf._full_xstd()
    assert spatial_consistent(xf, idf.model.num_links)
    # torque residual < 5% (reference tests/test_identification.py:205)
    assert idf.res_error < 5.0, f"SDP residual {idf.res_error}%"
    # mass boxes hold
    masses = xf[0 : idf.model.num_model_params : 10]
    apriori = idf.model.xStdModel[0 : idf.model.num_model_params : 10]
    tot_lo = apriori.sum() - 1.0
    tot_hi = apriori.sum() + 1.0
    assert tot_lo <= masses.sum() <= tot_hi
    nz = np.abs(apriori) > 1e-9
    assert np.all(np.abs(masses[nz] - apriori[nz]) <= 0.3 * np.abs(apriori[nz]) + 1e-6)


def test_sdp_pinned_params(arm):
    urdf, samples = arm
    pin = [20, 21, 22, 23]  # link 2 mass + first moments
    idf = run_sdp(urdf, samples, dontChangeParams=pin)
    xf = idf._full_xstd()
    np.testing.assert_allclose(xf[pin], idf.model.xStdModel[pin], atol=1e-12)
    assert idf.res_error < 5.0


def test_sdp_hull_mode(arm):
    urdf, samples = arm
    idf = run_sdp(urdf, samples, restrictCOMtoHull=1, limitCOMToApriori=0)
    assert idf.sdp.last_status == "optimal"
    xf = idf._full_xstd()
    for name, (lo, hi) in idf.sdp.link_hulls.items():
        i = idf.model.linkNames.index(name)
        mi = xf[i * 10]
        if mi < 1e-9:
            continue
        com = xf[i * 10 + 1 : i * 10 + 4] / mi
        assert np.all(com >= lo - 1e-5) and np.all(com <= hi + 1e-5), (name, com, lo, hi)


def test_sdp_friction_positive(arm):
    urdf, samples0 = arm
    fric = {"Fc": np.linspace(0.2, 0.5, 7), "Fv": np.linspace(0.05, 0.3, 7)}
    samples, _ = synth_samples(urdf, n=1500, noise=0.05, seed=31, fric=fric)
    idf = run_sdp(
        urdf,
        samples,
        identifyFrictionSimultaneously=1,
        identifySymmetricVelFriction=1,
    )
    xf = idf._full_xstd()
    nd = idf.model.num_dofs
    fs = idf.model.friction_params_start
    fv = xf[fs + nd : fs + 2 * nd]
    assert np.all(fv >= 0), fv
    np.testing.assert_allclose(fv, fric["Fv"], atol=0.1)
    assert idf.res_error < 5.0


def test_sdp_closest_to_cad(arm):
    urdf, samples = arm
    idf1 = run_sdp(urdf, samples)
    x1 = idf1._full_xstd()
    idf2 = run_sdp(urdf, samples, identifyClosestToCAD=1)
    x2 = idf2._full_xstd()
    cad = idf2.model.xStdModel
    d1 = np.linalg.norm(x1 - cad)
    d2 = np.linalg.norm(x2 - cad)
    assert d2 <= d1 + 1e-6, (d1, d2)
    # torque fit must stay good (base params constrained to step-1 solution)
    assert idf2.res_error < 5.0


@pytest.mark.timeout(90)
def test_sdp_geometric_mode_differs(arm):
    urdf, samples = arm
    idf_u = run_sdp(urdf, samples, cadRegularizationMode="uniform")
    idf_g = run_sdp(urdf, samples, cadRegularizationMode="geometric")
    xu = idf_u._full_xstd()
    xg = idf_g._full_xstd()
    assert np.all(np.isfinite(xg))
    assert idf_g.sdp.last_status == "optimal"
    assert spatial_consistent(xg, idf_g.model.num_links)
    assert idf_g.res_error < 5.0
    # the two regularizations produce different (both valid) decompositions
    assert np.linalg.norm(xu - xg) > 1e-6


@pytest.mark.timeout(90)
def test_sdp_geometric_observability_weighting(arm):
    """geometricObservabilityWeighting (reference sdp.py:379,413): the
    geo+obs prior must produce a finite, consistent, optimal result
    that differs from the unweighted geometric mode (it is the
    reference's best-scoring walkman decomposition)."""
    urdf, samples = arm
    idf_g = run_sdp(urdf, samples, cadRegularizationMode="geometric")
    idf_go = run_sdp(urdf, samples, cadRegularizationMode="geometric",
                     geometricObservabilityWeighting=1)
    xgo = idf_go._full_xstd()
    assert np.all(np.isfinite(xgo))
    assert idf_go.sdp.last_status == "optimal"
    assert spatial_consistent(xgo, idf_go.model.num_links)
    assert idf_go.res_error < 5.0
    assert np.linalg.norm(idf_g._full_xstd() - xgo) > 1e-8


def test_sdp_infeasible_apriori_recovers(arm, tmp_path):
    """Phase-I must recover when the a-priori URDF is physically
    inconsistent (negative-definite inertia on one link)."""
    urdf, samples = arm
    bad = str(tmp_path / "bad.urdf")
    txt = open(urdf).read()
    # corrupt link 3's inertia to be non-PSD
    txt = txt.replace('ixx="0.015"', 'ixx="-0.02"', 1)
    with open(bad, "w") as f:
        f.write(txt)
    idf = run_sdp(bad, samples, limitMassToApriori=0, limitOverallMass=0)
    xf = idf._full_xstd()
    if idf.sdp.last_status.startswith("optimal"):
        # gap-met solutions are accepted even when the final centering
        # stalled (status optimal_inexact) — both must be consistent
        assert spatial_consistent(xf, idf.model.num_links)
    else:
        # graceful fallback: a priori kept
        np.testing.assert_allclose(
            xf[: idf.model.num_model_params],
            idf.model.xStdModel[: idf.model.num_model_params],
        )


def test_sdp_certificate_small(arm):
    """Every successful solve must carry a KKT-level certificate
    (VERDICT r2 #6): duality gap met, final Newton decrement at the
    centering tolerance, iterate strictly inside the shifted cone."""
    urdf, samples = arm
    idf = run_sdp(urdf, samples)
    assert idf.sdp.last_status == "optimal"
    info = idf.sdp.last_info
    assert info is not None and info["status"] == "optimal"
    # lambda-corrected self-concordant gap bound certifies optimality
    assert info["cert_gap_rel"] < 1e-3
    assert info["newton_lambda"] < 0.25
    assert info["max_violation"] <= 0.0


@pytest.mark.timeout(90)
def test_sdp_30dof_kkt_certificate(tmp_path):
    """KKT-level certification at the hardest operating point: the
    streamed 30-DOF humanoid SDP (observability CAD regularization)
    must return a certified optimum, not merely a gap-met point
    (reference context: CLARABEL solving the 29-DOF walkman,
    CHANGELOG.md:118-120)."""
    import os

    src = os.path.join(
        os.path.dirname(__file__), "..", "examples", "models", "humanoid30.urdf"
    )
    urdf = str(tmp_path / "humanoid30.urdf")
    shutil.copy(src, urdf)
    cache = src + ".regressor.npz"
    if os.path.exists(cache):
        shutil.copy(cache, urdf + ".regressor.npz")
    opt = load_config(None, overrides=dict(
        verbose=0, floatingBase=1,
        identifyFrictionSimultaneously=1, identifySymmetricVelFriction=1,
        useStructuralRegressor=1, randomSamples=2000,
        materializeRegressor=0, estimateWith="std",
        constrainToConsistent=1, limitOverallMass=1, limitMassRange=5.0,
        limitMassToApriori=1, limitMassAprioriBoundary=0.5,
        cadRegularizationMode="observability",
    ))
    idf = Identification(dict(opt), urdf)
    m = idf.model
    nd = m.num_dofs
    N = 2000
    rng = np.random.default_rng(0)
    lims = m.limits
    lo = np.array([lims[j]["lower"] for j in m.jointNames])
    hi = np.array([lims[j]["upper"] for j in m.jointNames])
    samples = {
        "positions": lo + (hi - lo) * rng.random((N, nd)),
        "velocities": (rng.random((N, nd)) - 0.5) * 2,
        "accelerations": (rng.random((N, nd)) - 0.5) * 2,
        "torques": np.zeros((N, nd)),
        "times": np.arange(N) / 200.0, "frequency": np.float64(200.0),
        "base_rpy": np.zeros((N, 3)), "base_velocity": np.zeros((N, 6)),
        "base_acceleration": np.zeros((N, 6)),
    }
    tau = m.simulate_dynamics(samples, np.arange(N))
    samples["torques"] = tau[:, 6:] + rng.normal(0, 0.05, (N, nd))
    idf.data.init_from_data(dict(samples))
    idf.estimateParameters()
    assert idf.sdp.last_status == "optimal"
    info = idf.sdp.last_info
    assert info is not None and info["status"] == "optimal"
    # lambda-corrected self-concordant gap bound certifies optimality
    assert info["cert_gap_rel"] < 1e-3
    assert info["newton_lambda"] < 0.25
    assert info["max_violation"] <= 0.0
    # the certificate free-rides on the ladder stages: no explicit
    # certification run should have been needed on this geometry
    assert info["certify_iters"] == 0
    assert idf.res_error < 5.0


def test_conic_stopped_status_not_stale():
    """A solve interrupted by stop_fn must report 'stopped' in
    last_info — not the previous solve's certificate (review r3)."""
    from flobaroid_tpu.identification.conic import QuadBarrierSolver

    # tiny problem: minimize (x-2)^2 s.t. diag(x) - 0.1 I >= 0 (x >= 0.1)
    solver = QuadBarrierSolver(
        A=None, b=None,
        psd_maps=[lambda x: x[0].reshape(1, 1)],
        psd_eps=1e-3, n=1,
    )
    H = np.array([[2.0]])
    q = np.array([-4.0])
    x, status = solver.solve_quadratic(np.array([1.0]), H, q)
    assert status == "optimal"
    assert solver.last_info["status"] == "optimal"

    x2, status2 = solver.minimize(
        np.array([1.0]), H, q, stop_fn=lambda _x: True
    )
    assert status2 == "stopped"
    assert solver.last_info["status"] == "stopped"


def test_conic_warm_start_matches_cold():
    """Sequential-identification warm start (round 5): a second solve
    on the same structure starts from (x_last, t_last). The warm result
    must match a cold solve of the SAME perturbed objective to solver
    precision, carry a fresh certificate, and a WILDLY different
    objective must fall back to the cold ladder and still be optimal."""
    from flobaroid_tpu.identification.conic import QuadBarrierSolver

    rng = np.random.default_rng(11)
    n = 8
    M = rng.normal(size=(n, n))
    H = M @ M.T + np.eye(n)
    x_tgt = np.full(n, 0.5)
    q = -H @ x_tgt
    A = np.vstack([np.eye(n), -np.eye(n)])
    b = np.full(2 * n, 1.0)

    warm = QuadBarrierSolver(A=A, b=b, psd_maps=[], psd_eps=1e-6, n=n)
    x1, s1 = warm.solve_quadratic(np.zeros(n), H, q)
    assert s1 == "optimal" and "warm_start" not in (warm.last_info or {})

    # small perturbation: warm fast path should serve it
    H2 = H * 1.02
    q2 = -H2 @ (x_tgt * 0.98)
    x2w, s2 = warm.solve_quadratic(np.zeros(n), H2, q2)
    assert s2 == "optimal"
    assert warm.last_info.get("warm_start") is True
    cold = QuadBarrierSolver(A=A, b=b, psd_maps=[], psd_eps=1e-6, n=n)
    x2c, s2c = cold.solve_quadratic(np.zeros(n), H2, q2)
    assert s2c == "optimal"
    assert np.linalg.norm(x2w - x2c) < 1e-5, np.linalg.norm(x2w - x2c)
    # fresh certificate, not the previous solve's
    assert warm.last_info["max_violation"] <= 0.0
    assert warm.last_info["gap_rel"] < 1e-5

    # wildly different objective: warm point is far from optimal ->
    # certificate-guarded fallback to the cold ladder
    x_tgt3 = np.full(n, -0.8)
    q3 = -H @ x_tgt3
    x3, s3 = warm.solve_quadratic(np.zeros(n), H, q3)
    assert s3 == "optimal"
    x3c, _ = cold.solve_quadratic(np.zeros(n), H, q3)
    assert np.linalg.norm(x3 - x3c) < 1e-5, np.linalg.norm(x3 - x3c)


def test_conic_stress_certificate_truthful():
    """Certificate under stress (VERDICT r3 #8): a deliberately
    ill-conditioned quadratic (near-rank-deficient Gram, cond ~1e10)
    with tight box constraints and a starved Newton budget, so no
    ladder stage reaches the quadratic zone and the explicit certify
    rung (conic.py:541-552) also stalls. The solver must return a
    TRUTHFUL non-'optimal' qualification — never 'optimal' without a
    centred certificate — and the returned iterate must stay strictly
    feasible."""
    from flobaroid_tpu.identification.conic import QuadBarrierSolver

    rng = np.random.default_rng(5)
    n = 12
    # near-rank-deficient Gram: singular values spanning 10 orders
    U = np.linalg.qr(rng.normal(size=(n, n)))[0]
    s = np.logspace(0, -10, n)
    H = U @ np.diag(s) @ U.T
    H = (H + H.T) / 2 + 1e-12 * np.eye(n)
    x_tgt = rng.normal(0, 10.0, n)
    q = -H @ x_tgt
    # tight boxes |x_i| <= 0.05 keep the unconstrained minimizer far
    # outside; start strictly inside but near a corner
    A = np.vstack([np.eye(n), -np.eye(n)])
    b = np.full(2 * n, 0.05)
    solver = QuadBarrierSolver(A=A, b=b, psd_maps=[], psd_eps=1e-6, n=n)
    x0 = np.full(n, 0.045)
    x, status = solver.minimize(
        x0, H, q, const=float(0.5 * x_tgt @ H @ x_tgt), max_newton=1
    )
    info = solver.last_info
    assert status != "optimal", (status, info)
    assert status in ("optimal_inexact", "max_iter"), (status, info)
    assert info["status"] == status
    # the certificate must be truthful about the uncentred state: either
    # no stage reached the quadratic zone (lambda >= 0.25) or the
    # self-concordant bound is honestly loose
    assert info["newton_lambda"] >= 0.25 or info["cert_gap_rel"] >= 1e-3, info
    # returned iterate stays strictly feasible for the box constraints
    assert np.all(A @ x - b < 0.0), (A @ x - b).max()
    assert info["max_violation"] <= 0.0


def test_sparse_barrier_parity():
    """The block-sparse barrier derivatives (per-block active columns +
    scatter-add) must match the dense form and autodiff exactly — the
    sparse path carries the whole Newton iteration at humanoid scale."""
    import jax
    import jax.numpy as jnp

    from flobaroid_tpu.identification.conic import _BarrierCore

    rng = np.random.default_rng(0)
    n, K, d, m = 60, 7, 4, 12
    F = rng.normal(0, 0.1, (K, d, d, n))
    F = (F + np.swapaxes(F, 1, 2)) / 2
    for k in range(K):
        keep = rng.choice(n, 9, replace=False)
        msk = np.zeros(n, bool)
        msk[keep] = True
        F[k, :, :, ~msk] = 0
    F0 = np.broadcast_to(np.eye(d) * 2.0, (K, d, d)).copy()
    # sparse inequality rows (mass/COM-box style: <= 3 nonzeros)
    A = np.zeros((m, n))
    for i in range(m):
        c = rng.choice(n, 3, replace=False)
        A[i, c] = rng.normal(0, 0.2, 3)
    b = np.abs(rng.normal(2, 0.5, m))
    with jax.enable_x64(True):
        core = _BarrierCore(A, b, [(F0, F)], 1e-6, n)
        dense = _BarrierCore(A, b, [(F0, F)], 1e-6, n)
        dense.groups = [(g[0], g[1], None, None) for g in dense.groups]
        dense._A_sp = None
        assert core.groups[0][2] is not None  # sparse PSD path taken
        assert core._A_sp is not None  # sparse inequality path taken
        x = jnp.asarray(rng.normal(0, 0.05, n))
        np.testing.assert_allclose(
            float(core.value(x)), float(dense.value(x)), rtol=1e-12
        )
        g1, H1 = core.grad_hess(x)
        g2, H2 = dense.grad_hess(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H2),
                                   rtol=1e-10, atol=1e-12)
        ga = jax.grad(core.value)(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(ga),
                                   rtol=1e-8, atol=1e-10)
