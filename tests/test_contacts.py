"""Contact-wrench (walking-scenario) identification tests.

The reference's hardest real operating point: floating-base
identification through foot F/T contact wrenches (WALK-MAN walking
logs; reference documentation/analysis_findings.md:122-129, contact
stacking at identification/model.py:535-560, Ayusawa base-wrench
two-step at identifier.py:617-681). The original logs are git-lfs
stubs, so these tests drive the exact same code paths with a synthetic
scenario constructed from the repo's own engine
(flobaroid_tpu/simulation/scenarios.py) where
Y pi_true = tau_stack - J^T w holds by construction.

Covers: the J^T w torque contributions (model.computeRegressors
contact block), the contacts npz dict contract, the
contacts_in_torques re-entry guard, streaming-Gram parity with
contacts, useBaseWrenchForBaseParams + useTrajectoryWeighting, and
the skipSamples>0 measurements-aliasing regression (advisor r2).
"""

import os
import shutil

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
MODELS = os.path.join(HERE, "..", "examples", "models")

N = 1200


def _base_opt(**over):
    from flobaroid_tpu.utils.config import load_config

    opt = load_config(None, overrides=dict(
        floatingBase=1,
        identifyFrictionSimultaneously=1,
        identifySymmetricVelFriction=1,
        useStructuralRegressor=1,
        randomSamples=2000,
        estimateWith="std",
        constrainToConsistent=0,
        verbose=0,
    ))
    opt.update(over)
    return opt


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from flobaroid_tpu.identification.identifier import Identification
    from flobaroid_tpu.simulation.scenarios import walking_contact_scenario

    tmp = tmp_path_factory.mktemp("contacts")
    urdf = shutil.copy(os.path.join(MODELS, "humanoid30.urdf"), tmp)
    cache = os.path.join(MODELS, "humanoid30.urdf.regressor.npz")
    if os.path.exists(cache):
        shutil.copy(cache, str(urdf) + ".regressor.npz")

    gen = Identification(_base_opt(), str(urdf))
    m = gen.model
    noisy, _, _ = walking_contact_scenario(
        m, N=N, seed=0, torque_noise=0.02, wrench_noise=0.5
    )
    clean, tau_full, cf_true = walking_contact_scenario(m, N=N, seed=3)
    xb_true = m.K @ m.xStdModel[m.identified_params]
    return dict(
        urdf=str(urdf), noisy=noisy, clean=clean, tau_full=tau_full,
        cf_true=cf_true, xb_true=xb_true,
    )


def _identify(setup, samples, **over):
    from flobaroid_tpu.identification.identifier import Identification

    idf = Identification(_base_opt(**over), setup["urdf"])
    idf.data.init_from_data(dict(samples))
    idf.estimateParameters()
    return idf


def _rel(idf, xb_true):
    return float(
        np.linalg.norm(np.asarray(idf.model.xBase) - xb_true)
        / np.linalg.norm(xb_true)
    )


def test_contact_identification_noise_free_exact(setup):
    """With exact measurements the estimator must invert the generative
    construction: Y x = tau_stack - J^T w recovers pi_true to numerical
    precision (proves the J^T w sign/ordering conventions)."""
    idf = _identify(setup, setup["clean"])
    assert _rel(idf, setup["xb_true"]) < 1e-4
    assert idf.res_error < 0.01  # percent


def test_contact_identification_recovers_params(setup):
    """Realistic noise (2 cNm torque, 0.5 N/Nm F/T): base parameters
    recovered < 2% (VERDICT r2 acceptance) and torque residual < 1%."""
    idf = _identify(setup, setup["noisy"])
    assert _rel(idf, setup["xb_true"]) < 0.02
    assert idf.res_error < 1.0


def test_contact_torque_contribution_matches_truth(setup):
    """computeRegressors' contact block must reproduce the generating
    J^T w and stack tau = Y pi + cf on all rows."""
    from flobaroid_tpu.data import Data
    from flobaroid_tpu.identification.identifier import Identification

    idf = Identification(_base_opt(), setup["urdf"])
    m = idf.model
    data = Data(idf.opt)
    data.init_from_data(dict(setup["clean"]))
    m.computeRegressors(data)
    cf = np.asarray(m.contactForcesSum).reshape(N, -1)
    assert np.allclose(cf, setup["cf_true"], atol=1e-6 * np.abs(setup["cf_true"]).max())
    stack = np.asarray(m.torques_stack).reshape(N, -1)
    want = setup["tau_full"] + setup["cf_true"]
    assert np.abs(stack - want).max() < 1e-6 * np.abs(want).max()


def test_contacts_reentry_guard(setup):
    """A second computeRegressors pass over the same Data (block
    selection does this) must not add the contact contribution twice."""
    from flobaroid_tpu.data import Data
    from flobaroid_tpu.identification.identifier import Identification

    idf = Identification(_base_opt(), setup["urdf"])
    m = idf.model
    data = Data(idf.opt)
    data.init_from_data(dict(setup["clean"]))
    m.computeRegressors(data)
    first = np.array(m.torques_stack)
    assert data.contacts_in_torques
    m.computeRegressors(data)
    assert np.allclose(m.torques_stack, first)


def test_skipsamples_leaves_measurements_pristine(setup):
    """skipSamples>0 + contacts: the subsampled torque write-back must
    not mutate data.measurements (advisor r2 aliasing finding)."""
    from flobaroid_tpu.data import Data
    from flobaroid_tpu.identification.identifier import Identification

    opt = _base_opt(skipSamples=1)
    idf = Identification(opt, setup["urdf"])
    data = Data(idf.opt)
    data.init_from_data(dict(setup["clean"]))
    orig = np.array(data.measurements["torques"])
    idf.model.computeRegressors(data)
    assert data.measurements["torques"].shape == orig.shape
    assert np.allclose(data.measurements["torques"], orig)
    # the samples view did receive the subsampled contact-folded torques
    assert data.samples["torques"].shape[0] == data.num_used_samples


def test_streaming_contacts_parity(setup):
    """materializeRegressor=0 (device-resident streamed Grams) must give
    the same base estimate as the materialized path with contacts."""
    idf_mat = _identify(setup, setup["noisy"])
    idf_str = _identify(
        setup, setup["noisy"], materializeRegressor=0, gramChunk=512
    )
    xb_m = np.asarray(idf_mat.model.xBase)
    xb_s = np.asarray(idf_str.model.xBase)
    assert np.linalg.norm(xb_s - xb_m) / np.linalg.norm(xb_m) < 1e-3
    assert _rel(idf_str, setup["xb_true"]) < 0.02


def test_fused_contact_sum_matches_per_frame(setup):
    """_contact_torques_sum_staged (all frames, one dispatch from the
    staged device chunks) must equal the per-frame chunked path sum."""
    from flobaroid_tpu.identification.identifier import Identification

    idf = _identify(
        setup, setup["noisy"], materializeRegressor=0, gramChunk=512
    )
    m = idf.model
    staged = m._staged
    assert staged is not None and staged["stacks"] is not None
    cdict = setup["noisy"]["contacts"].item(0)
    skip = int(m.opt["skipSamples"])
    idx = np.arange(idf.data.num_used_samples) * (skip + 1)
    Q, V, A, BR, BV, BA = m._gather_state(idf.data.samples, idx)
    lis, Ws = [], []
    per_frame = 0.0
    for frame, wrench in cdict.items():
        li = m.tree.link_index[str(frame)]
        w = np.asarray(wrench)[idx]
        lis.append(li)
        Ws.append(w)
        per_frame = per_frame + m._contact_torques(li, Q, BR, w)
    fused = m._contact_torques_sum_staged(lis, staged, np.stack(Ws, axis=1))
    np.testing.assert_allclose(fused, per_frame, rtol=1e-5, atol=1e-6)


def test_base_wrench_two_step_with_weighting(setup, tmp_path):
    """Ayusawa base-wrench two-step over multiple measurement files with
    per-file inverse-noise weighting (reference identifier.py:617-681):
    base INERTIAL parameters recovered from the 6 friction-free wrench
    rows alone; friction base directions are unobservable there by
    construction (zero base-wrench friction columns) and are excluded
    from the bound."""
    from flobaroid_tpu.identification.identifier import Identification
    from flobaroid_tpu.simulation.scenarios import walking_contact_scenario

    gen = Identification(_base_opt(), setup["urdf"])
    m = gen.model
    files = []
    for i, tn in enumerate((0.01, 0.05, 0.3)):
        s, _, _ = walking_contact_scenario(
            m, N=N, seed=10 + i, torque_noise=tn, wrench_noise=0.2
        )
        fn = tmp_path / f"meas_{i}.npz"
        np.savez(fn, **s)
        files.append(str(fn))

    opt = _base_opt(
        useBaseWrenchForBaseParams=1, useTrajectoryWeighting=1, useWLS=0,
    )
    idf = Identification(opt, setup["urdf"], measurements_files=[files])
    idf.estimateParameters()

    # friction base directions: K rows supported only on friction columns
    K = idf.model.K
    nmp = idf.model.num_model_params
    fric_cols = np.array([p >= nmp for p in idf.model.identified_params])
    fric_rows = np.array([
        np.all(np.abs(K[j])[~fric_cols] < 1e-9) for j in range(K.shape[0])
    ])
    xb = np.asarray(idf.model.xBase)[~fric_rows]
    xt = setup["xb_true"][~fric_rows]
    assert np.linalg.norm(xb - xt) / np.linalg.norm(xt) < 0.02
