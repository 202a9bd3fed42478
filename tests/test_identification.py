"""Synthetic ground-truth identification tests.

Mirrors the reference's core strategy (tests/test_identification.py):
generate N random states, compute torques from the KNOWN model (+ noise),
run the full Identification pipeline, assert parameter recovery and
torque residual bounds — results, not implementation.
"""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flobaroid_tpu.data import Data
from flobaroid_tpu.identification.identifier import Identification
from flobaroid_tpu.model import Model
from flobaroid_tpu.utils.config import load_config


def synth_samples(tree_path, n=2000, noise=0.05, floating=False, seed=0, fric=None, joint_order=None):
    """Random-state samples with torques from the URDF ground truth."""
    from flobaroid_tpu.dynamics.engine import DynamicsEngine, rpy_to_base_rot
    from flobaroid_tpu.models.urdf import load_urdf

    tree = load_urdf(tree_path, joint_order=joint_order)
    eng = DynamicsEngine(tree)
    pi = jnp.asarray(tree.std_params())
    nd = tree.num_dofs
    rng = np.random.default_rng(seed)
    lims = tree.joint_limits()
    lo = np.array([lims[j]["lower"] for j in tree.dof_names])
    hi = np.array([lims[j]["upper"] for j in tree.dof_names])
    vl = np.array([min(lims[j]["velocity"], 10.0) for j in tree.dof_names])
    lo = np.where(np.isfinite(lo), lo, -np.pi)
    hi = np.where(np.isfinite(hi), hi, np.pi)

    Q = lo + (hi - lo) * rng.random((n, nd))
    V = (rng.random((n, nd)) - 0.5) * 2 * vl
    A = (rng.random((n, nd)) - 0.5) * 2 * np.pi

    samples = {
        "positions": Q,
        "velocities": V,
        "accelerations": A,
        "times": np.arange(n) / 200.0,
        "frequency": np.array(200.0),
    }
    if floating:
        rpy = rng.random((n, 3)) * 0.2
        BR = np.asarray(rpy_to_base_rot(jnp.asarray(rpy)))
        BV = rng.random((n, 6)) * 1.0
        BA = rng.random((n, 6)) * 1.0
        samples["base_rpy"] = rpy
        samples["base_velocity"] = BV
        samples["base_acceleration"] = BA
        tau = jax.vmap(
            lambda q, dq, ddq, br, bv, ba: eng.inverse_dynamics(pi, q, dq, ddq, br, bv, ba)
        )(Q, V, A, jnp.asarray(BR), jnp.asarray(BV), jnp.asarray(BA))
    else:
        tau = jax.vmap(lambda q, dq, ddq: eng.inverse_dynamics(pi, q, dq, ddq, floating=False))(
            Q, V, A
        )
    tau = np.array(tau)
    if fric is not None:
        thresh = 0.02
        tau[:, 6 if floating else 0 :] += (
            fric["Fc"] * np.tanh(V / thresh) + fric["Fv"] * V
        )
    tau += noise * rng.standard_normal(tau.shape)
    samples["torques"] = tau
    return samples, tree


@pytest.fixture(scope="module")
def kuka_tmp(kuka_urdf, tmp_path_factory):
    # copy so the regressor cache can be written next to the urdf
    d = tmp_path_factory.mktemp("kuka")
    p = d / "kuka_lwr4.urdf"
    shutil.copy(kuka_urdf, p)
    return str(p)


def base_opt(**kw):
    opt = load_config(None)
    opt.update(
        dict(
            verbose=0,
            useStructuralRegressor=1,
            randomSamples=1000,
            computeDtype="float64",  # CPU tests: full precision
            estimateWith="std",
        )
    )
    opt.update(kw)
    return opt


@pytest.mark.timeout(90)
def test_ols_identification_kuka(kuka_tmp):
    """OLS on synthetic KUKA data: <5% base-param error, <1% residual
    (acceptance thresholds from reference tests/test_identification.py:163-164)."""
    samples, _ = synth_samples(kuka_tmp, n=2000, noise=0.05)
    opt = base_opt(floatingBase=0)
    idf = Identification(opt, kuka_tmp, urdf_file_real=kuka_tmp)
    idf.data.init_from_data(samples)
    idf.estimateParameters()

    xBase = idf.model.xBase
    xBaseModel = idf.model.xBaseModel
    rel = np.linalg.norm(xBase - xBaseModel) / np.linalg.norm(xBaseModel)
    assert rel < 0.05, f"relative base param error {rel}"
    assert idf.res_error < 1.0, f"torque residual {idf.res_error}%"

    # std params: projection must reproduce torques
    tauEst = idf.tauEstimated
    tauM = idf.model.tauMeasured
    assert np.linalg.norm(tauM - tauEst) / np.linalg.norm(tauM) < 0.01


@pytest.mark.timeout(90)
def test_ols_identification_floating(threelinks_urdf, tmp_path):
    p = tmp_path / "threeLinks.urdf"
    shutil.copy(threelinks_urdf, p)
    samples, _ = synth_samples(str(p), n=1500, noise=0.02, floating=True, seed=3)
    opt = base_opt(floatingBase=1)
    idf = Identification(opt, str(p))
    idf.data.init_from_data(samples)
    idf.estimateParameters()
    rel = np.linalg.norm(idf.model.xBase - idf.model.xBaseModel) / np.linalg.norm(
        idf.model.xBaseModel
    )
    assert rel < 0.05, f"floating base param error {rel}"
    assert idf.res_error < 2.0


def test_wls_identification(kuka_tmp):
    samples, _ = synth_samples(kuka_tmp, n=1500, noise=0.05, seed=7)
    opt = base_opt(floatingBase=0, useWLS=1)
    idf = Identification(opt, kuka_tmp)
    idf.data.init_from_data(samples)
    idf.estimateParameters()
    rel = np.linalg.norm(idf.model.xBase - idf.model.xBaseModel) / np.linalg.norm(
        idf.model.xBaseModel
    )
    assert rel < 0.05
    assert idf.res_error < 1.0


def test_essential_params(kuka_tmp):
    samples, _ = synth_samples(kuka_tmp, n=1500, noise=0.05, seed=11)
    opt = base_opt(floatingBase=0, useEssentialParams=1)
    idf = Identification(opt, kuka_tmp)
    idf.data.init_from_data(samples)
    idf.estimateParameters()
    assert idf.num_essential_params >= 2
    assert np.all(np.isfinite(idf.model.xStd))
    assert idf.res_error < 5.0


def test_friction_simultaneous(kuka_tmp):
    fric = {"Fc": np.linspace(0.3, 0.8, 7), "Fv": np.linspace(0.1, 0.4, 7)}
    samples, _ = synth_samples(kuka_tmp, n=2000, noise=0.03, seed=13, fric=fric)
    opt = base_opt(
        floatingBase=0,
        identifyFrictionSimultaneously=1,
        identifySymmetricVelFriction=1,
    )
    idf = Identification(opt, kuka_tmp)
    idf.data.init_from_data(samples)
    idf.estimateParameters()
    nd = idf.model.num_dofs
    fs = idf.model.friction_params_start
    xf = idf._full_xstd()
    np.testing.assert_allclose(xf[fs : fs + nd], fric["Fc"], atol=0.08)
    np.testing.assert_allclose(xf[fs + nd : fs + 2 * nd], fric["Fv"], atol=0.08)
    assert idf.res_error < 1.5


def test_base_wrench_two_step(threelinks_urdf, tmp_path):
    """Ayusawa two-step: base params from wrench rows only, then friction
    refit from the joint-torque residual."""
    p = tmp_path / "threeLinks.urdf"
    shutil.copy(threelinks_urdf, p)
    fric = {"Fc": np.array([0.4, 0.6]), "Fv": np.array([0.2, 0.3])}
    samples, _ = synth_samples(str(p), n=2000, noise=0.02, floating=True, seed=17, fric=fric)
    opt = base_opt(
        floatingBase=1,
        useBaseWrenchForBaseParams=1,
        postIdentifyFriction=1,
    )
    idf = Identification(opt, str(p))
    idf.data.init_from_data(samples)
    idf.estimateParameters()
    np.testing.assert_allclose(idf.postid_friction["Fc"], fric["Fc"], atol=0.1)
    np.testing.assert_allclose(idf.postid_friction["Fv"], fric["Fv"], atol=0.1)


def test_use_apriori_error_form(kuka_tmp):
    """useAPriori: identify the parameter error relative to CAD, then add
    back (reference identifier.py:328-341, getBaseParamsFromParamError)."""
    samples, _ = synth_samples(kuka_tmp, n=1500, noise=0.05, seed=41)
    opt = base_opt(floatingBase=0, useAPriori=1)
    idf = Identification(opt, kuka_tmp)
    idf.data.init_from_data(dict(samples))
    idf.estimateParameters()
    rel = np.linalg.norm(idf.model.xBase - idf.model.xBaseModel) / np.linalg.norm(
        idf.model.xBaseModel
    )
    assert rel < 0.05, rel
    assert idf.res_error < 1.5


def test_std_direct(kuka_tmp):
    """Rank-truncated-SVD direct standard estimation (Gautier 2013)."""
    samples, _ = synth_samples(kuka_tmp, n=1500, noise=0.05, seed=43)
    opt = base_opt(floatingBase=0, estimateWith="std_direct")
    idf = Identification(opt, kuka_tmp)
    idf.data.init_from_data(dict(samples))
    idf.estimateParameters()
    assert idf.res_error < 1.5
    assert np.all(np.isfinite(idf.model.xStd))


def test_trajectory_weighting(threelinks_urdf, tmp_path):
    """Per-file inverse-noise weighting of the base-wrench equations
    (useTrajectoryWeighting; reference identifier.py:655-681)."""
    p = tmp_path / "threeLinks.urdf"
    shutil.copy(threelinks_urdf, p)
    clean, _ = synth_samples(str(p), n=800, noise=0.005, floating=True, seed=51)
    noisy, _ = synth_samples(str(p), n=800, noise=0.5, floating=True, seed=52)
    f1 = tmp_path / "m1.npz"
    f2 = tmp_path / "m2.npz"
    np.savez(f1, **clean)
    np.savez(f2, **noisy)

    def run(weighting):
        opt = base_opt(
            floatingBase=1, useBaseWrenchForBaseParams=1, useTrajectoryWeighting=weighting
        )
        idf = Identification(opt, str(p))
        idf.data.init_from_files([[str(f1)], [str(f2)]])
        idf.estimateParameters()
        return np.linalg.norm(idf.model.xBase - idf.model.xBaseModel) / np.linalg.norm(
            idf.model.xBaseModel
        )

    err_plain = run(0)
    err_weighted = run(1)
    # weighting must not hurt, and should help when one file is junk
    assert err_weighted <= err_plain * 1.05, (err_weighted, err_plain)


@pytest.mark.timeout(90)
def test_validation_path(kuka_tmp, tmp_path):
    samples, _ = synth_samples(kuka_tmp, n=1200, noise=0.05, seed=61)
    val, _ = synth_samples(kuka_tmp, n=600, noise=0.05, seed=62)
    vf = tmp_path / "val.npz"
    np.savez(vf, **val)
    opt = base_opt(floatingBase=0)
    idf = Identification(opt, kuka_tmp, validation_file=str(vf))
    idf.data.init_from_data(dict(samples))
    idf.estimateParameters()
    idf.estimateValidationTorques()
    assert idf.val_error < 3.0, idf.val_error
    assert np.isfinite(idf.val_nrms)


def test_streaming_gram_matches_materialized(kuka_tmp):
    """materializeRegressor=0: OLS and SDP from accumulated Gram blocks
    must match the materialized-regressor results."""
    samples, _ = synth_samples(kuka_tmp, n=1200, noise=0.05, seed=71)
    base = dict(
        floatingBase=0,
        constrainToConsistent=1,
        limitOverallMass=1,
        limitMassRange=1.0,
        limitMassToApriori=1,
        limitMassAprioriBoundary=0.3,
    )
    opt_m = base_opt(**base, materializeRegressor=1)
    idf_m = Identification(opt_m, kuka_tmp)
    idf_m.data.init_from_data(dict(samples))
    idf_m.estimateParameters()

    opt_s = base_opt(**base, materializeRegressor=0, gramChunk=256)
    idf_s = Identification(opt_s, kuka_tmp)
    idf_s.data.init_from_data(dict(samples))
    idf_s.estimateParameters()

    assert idf_s.model.YStd is None  # truly streamed
    np.testing.assert_allclose(idf_s.model.xBase, idf_m.model.xBase, rtol=1e-6, atol=1e-8)
    # the SDP decomposition in weakly-determined null directions depends
    # on the finite barrier gap; compare the identifiable projection and
    # the fit, and bound the std difference loosely
    K = idf_m.model.K
    np.testing.assert_allclose(
        K @ np.asarray(idf_s.model.xStd), K @ np.asarray(idf_m.model.xStd),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        idf_s._full_xstd(), idf_m._full_xstd(), atol=0.05
    )
    assert abs(idf_s.res_error - idf_m.res_error) < 0.05


@pytest.mark.timeout(120)
def test_streaming_y_cache_matches_rebuild(kuka_tmp):
    """cacheRegressorDevice=1 keeps the built regressor chunks on device
    and serves reporting/WLS contractions from them; results must match
    the rebuild-every-contraction path exactly (same staged inputs, same
    build function — only reuse differs)."""
    samples, _ = synth_samples(kuka_tmp, n=900, noise=0.05, seed=83)
    base = dict(floatingBase=0, materializeRegressor=0, gramChunk=256,
                useWLS=1)
    opt_c = base_opt(**base, cacheRegressorDevice=1)
    idf_c = Identification(opt_c, kuka_tmp)
    idf_c.data.init_from_data(dict(samples))
    idf_c.estimateParameters()
    assert idf_c.model._staged.get("Ystack") is not None

    opt_r = base_opt(**base, cacheRegressorDevice=0)
    idf_r = Identification(opt_r, kuka_tmp)
    idf_r.data.init_from_data(dict(samples))
    idf_r.estimateParameters()
    assert idf_r.model._staged.get("Ystack") is None

    np.testing.assert_allclose(idf_c.model.xBase, idf_r.model.xBase,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(idf_c.tauEstimated, idf_r.tauEstimated,
                               rtol=1e-9, atol=1e-12)
    assert abs(idf_c.res_error - idf_r.res_error) < 1e-9


def test_streaming_data_qr_matches_materialized(kuka_tmp):
    """useStructuralRegressor=0 derives the base projection from the
    DATA Gram inside the streaming pass (computeRegressorLinDepsQR runs
    after the initial aggregates — a stale aggregate cache would corrupt
    G_base/g_base silently). Must match the materialized data-QR path."""
    samples, _ = synth_samples(kuka_tmp, n=1000, noise=0.05, seed=91)
    base = dict(floatingBase=0, useStructuralRegressor=0, useWLS=1)
    idf_m = Identification(base_opt(**base, materializeRegressor=1), kuka_tmp)
    idf_m.data.init_from_data(dict(samples))
    idf_m.estimateParameters()

    idf_s = Identification(
        base_opt(**base, materializeRegressor=0, gramChunk=256), kuka_tmp
    )
    idf_s.data.init_from_data(dict(samples))
    idf_s.estimateParameters()

    # the pivoted QR of the Gram may pick a DIFFERENT (equally valid)
    # independent-column permutation than the QR of the stacked
    # regressor — compare projection-invariant quantities: rank, fit,
    # and predicted torques
    assert idf_s.model.num_base_params == idf_m.model.num_base_params
    assert abs(idf_s.res_error - idf_m.res_error) < 0.05
    np.testing.assert_allclose(
        idf_s.tauEstimated, idf_m.tauEstimated, rtol=5e-3, atol=1e-3
    )


def test_streaming_long_recording_fallback(kuka_tmp):
    """>64 chunks takes the host-accumulation path (and per-chunk
    reporting contractions) instead of the one-dispatch scan — both
    must give the same estimate."""
    samples, _ = synth_samples(kuka_tmp, n=1200, noise=0.05, seed=77)
    base = dict(floatingBase=0, materializeRegressor=0)
    opt_scan = base_opt(**base, gramChunk=256)  # 5 chunks -> scan path
    idf_a = Identification(opt_scan, kuka_tmp)
    idf_a.data.init_from_data(dict(samples))
    idf_a.estimateParameters()
    assert idf_a.model._staged["stacks"] is not None

    opt_loop = base_opt(**base, gramChunk=16)  # 75 chunks -> fallback
    idf_b = Identification(opt_loop, kuka_tmp)
    idf_b.data.init_from_data(dict(samples))
    idf_b.estimateParameters()
    assert idf_b.model._staged["stacks"] is None
    assert isinstance(idf_b.model.G_rows, np.ndarray)

    np.testing.assert_allclose(idf_b.model.xBase, idf_a.model.xBase,
                               rtol=1e-6, atol=1e-9)
    assert abs(idf_b.res_error - idf_a.res_error) < 1e-6


def test_streaming_essential_and_direct_match_materialized(kuka_tmp):
    """materializeRegressor=0 now covers essential parameters and
    std_direct: the deletion loop runs on G_base subsets (rho only
    scales sigmas uniformly, so the deletion order matches), and the
    rank-truncated SVD becomes an eigendecomposition of the Gram."""
    samples, _ = synth_samples(kuka_tmp, n=1200, noise=0.05, seed=79)

    # essential parameters
    res = {}
    for mat in (1, 0):
        opt = base_opt(floatingBase=0, useEssentialParams=1,
                       materializeRegressor=mat, gramChunk=256)
        idf = Identification(opt, kuka_tmp)
        idf.data.init_from_data(dict(samples))
        idf.estimateParameters()
        res[mat] = idf
    assert res[0].model.YStd is None
    assert res[0].baseEssentialIdx == res[1].baseEssentialIdx
    np.testing.assert_allclose(
        res[0].xBase_essential, res[1].xBase_essential, rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(res[0].model.xStd), np.asarray(res[1].model.xStd),
        rtol=1e-4, atol=1e-6,
    )

    # std_direct
    res = {}
    for mat in (1, 0):
        opt = base_opt(floatingBase=0, estimateWith="std_direct",
                       materializeRegressor=mat, gramChunk=256)
        idf = Identification(opt, kuka_tmp)
        idf.data.init_from_data(dict(samples))
        idf.estimateParameters()
        res[mat] = idf
    assert res[0].model.YStd is None
    np.testing.assert_allclose(
        np.asarray(res[0].model.xStd), np.asarray(res[1].model.xStd),
        rtol=1e-4, atol=1e-6,
    )
    assert abs(res[0].res_error - res[1].res_error) < 0.05


def test_streaming_wls_matches_materialized(kuka_tmp):
    """materializeRegressor=0 + useWLS: the per-channel Gram reweighting
    must reproduce the materialized WLS base solution."""
    samples, _ = synth_samples(kuka_tmp, n=1200, noise=0.05, seed=73)
    # heteroscedastic noise so WLS actually changes the answer
    rng = np.random.default_rng(5)
    tq = np.array(samples["torques"])
    tq[:, 0] += rng.normal(0, 2.0, tq.shape[0])
    samples = dict(samples)
    samples["torques"] = tq

    opt_m = base_opt(floatingBase=0, useWLS=1, materializeRegressor=1)
    idf_m = Identification(opt_m, kuka_tmp)
    idf_m.data.init_from_data(dict(samples))
    idf_m.estimateParameters()

    opt_s = base_opt(floatingBase=0, useWLS=1, materializeRegressor=0, gramChunk=256)
    idf_s = Identification(opt_s, kuka_tmp)
    idf_s.data.init_from_data(dict(samples))
    idf_s.estimateParameters()

    assert idf_s.model.YStd is None
    np.testing.assert_allclose(
        idf_s.model.xBase, idf_m.model.xBase, rtol=1e-4, atol=1e-6
    )


def test_lazy_series_guard_after_restaging(kuka_tmp):
    """Streaming leaves tauEstimated lazy; materializing it after the
    model was re-staged on DIFFERENT data would silently contract the
    old parameters against the new dataset — it must fail loudly."""
    samples, _ = synth_samples(kuka_tmp, n=600, noise=0.05, seed=5)
    opt = base_opt(
        floatingBase=0, materializeRegressor=0, gramChunk=256,
        constrainToConsistent=0, identifyFrictionSimultaneously=1,
    )
    idf = Identification(opt, kuka_tmp)
    idf.data.init_from_data(dict(samples))
    idf.estimateParameters()
    if idf._tau_lazy_x is None:
        pytest.skip("series were materialized on this path")
    # re-stage the shared Model on different data (block-selection-style
    # re-entry), then read the stale lazy series
    other, _ = synth_samples(kuka_tmp, n=600, noise=0.05, seed=6)

    d2 = Data(idf.opt)
    d2.init_from_data(dict(other))
    idf.model.computeRegressors(d2)
    with pytest.raises(RuntimeError, match="re-staged"):
        _ = idf.tauEstimated
    # a fresh estimation restores normal behavior
    idf.data.init_from_data(dict(samples))
    idf.estimateParameters()
    assert idf.tauEstimated is not None
