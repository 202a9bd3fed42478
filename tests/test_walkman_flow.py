"""Walkman-class acceptance test: the full 30-DOF suspended flow as CI.

Synthetic-ground-truth strategy at the walking operating point,
mirroring the reference's core test pattern (reference
tests/test_identification.py:163-205: simulate from a known model +
noise -> identify -> assert parameter recovery and residual bounds)
scaled from the 7-DOF KUKA to the 30-DOF suspended humanoid
(reference walkman scenario, documentation/analysis_findings.md:45-68):

    multi-sine excitation -> suspended ball-joint base simulation +
    measurement-effect chain -> streamed SDP-constrained
    identification with friction -> held-out validation NRMS.

Reduced N keeps it CI-sized; thresholds are generous multiples of the
measured operating point (res_error ~0.6%, base distance ~0.02,
val NRMS ~0.5% on this seed)."""

import os
import shutil
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS = os.path.join(REPO, "examples", "models")


@pytest.fixture(scope="module")
def flow(tmp_path_factory):
    sys.path.insert(0, REPO)
    import jax.numpy as jnp

    from flobaroid_tpu.excitation.optimizer import initial_candidate
    from flobaroid_tpu.excitation.trajectory import FourierSpec, fourier_traj
    from flobaroid_tpu.model import Model
    from flobaroid_tpu.utils.config import load_config
    from simulator import simulate_measurements

    tmp = str(tmp_path_factory.mktemp("walkman_flow"))
    urdf = os.path.join(tmp, "humanoid30.urdf")
    shutil.copy(os.path.join(MODELS, "humanoid30.urdf"), urdf)
    cache = os.path.join(MODELS, "humanoid30.urdf.regressor.npz")
    if os.path.exists(cache):
        shutil.copy(cache, urdf + ".regressor.npz")

    opt = load_config(None, overrides=dict(
        floatingBase=1, floatingBaseAttachment="suspended",
        floatingBaseAttachmentFrame="crane_ft", suspendedDamping=500.0,
        useStructuralRegressor=1, randomSamples=2000,
        excitationFrequency=50.0, verbose=0))
    model = Model(opt, urdf)
    nd = model.num_dofs

    # deterministic multi-sine excitation from the optimizer's own
    # harmonic-taper initializer (the D-opt stage has its own tests;
    # this flow exercises sim -> effects -> identify -> validate)
    rng = np.random.default_rng(3)
    spec = FourierSpec(
        nf=(3,) * nd,
        limits=tuple(
            (float(model.limits[j]["lower"]), float(model.limits[j]["upper"]))
            for j in model.jointNames
        ),
    )
    x = initial_candidate(spec, dict(opt, trajectoryCoeffInit=0.25), rng)
    x[0] = 1.3  # pulse wf within the walkman band
    # >= 2 * ~430 identified params of train samples after the 2/3
    # split: 8 periods at ~241 samples each -> ~1285 train rows
    freq, periods = 50.0, 8
    times = np.arange(int(2 * np.pi / x[0] * freq) * periods) / freq
    Q, V, A = (np.asarray(a) for a in
               fourier_traj(spec, jnp.asarray(x, jnp.float64), times))

    cfg = dict(opt)
    cfg.update(urdf=urdf, num_dofs=nd, jointNames=model.jointNames,
               simulateCableForces=0, simulateGravityCompResidual=0,
               simulateThermalDrift=0, simulateTimingJitter=0)
    meas = simulate_measurements(
        cfg, {"times": times, "positions": Q, "velocities": V,
              "accelerations": A}, interactive=False)

    # train / held-out split on period boundaries
    n = len(meas["times"])
    cut = (n * 2) // 3
    train, heldout = {}, {}
    for k, v in meas.items():
        arr = np.asarray(v)
        if arr.ndim and arr.shape[0] == n:
            train[k], heldout[k] = arr[:cut], arr[cut:]
        else:
            train[k] = heldout[k] = v
    heldout["times"] = heldout["times"] - heldout["times"][0]
    train_npz = os.path.join(tmp, "train.npz")
    val_npz = os.path.join(tmp, "val.npz")
    np.savez(train_npz, **train)
    np.savez(val_npz, **heldout)
    return dict(urdf=urdf, train=train_npz, val=val_npz)


@pytest.mark.timeout(1800)
def test_walkman_suspended_flow_recovers_parameters(flow):
    from flobaroid_tpu.identification.identifier import Identification
    from flobaroid_tpu.utils.config import load_config
    from flobaroid_tpu.utils.helpers import is_physical_consistent

    iopt = load_config(None, overrides=dict(
        floatingBase=1,
        identifyFrictionSimultaneously=1, identifySymmetricVelFriction=1,
        constrainToConsistent=1, limitOverallMass=1, limitMassRange=5.0,
        limitMassToApriori=1, limitMassAprioriBoundary=0.5,
        cadRegularizationMode="observability",
        useStructuralRegressor=1, randomSamples=2000,
        materializeRegressor=0, estimateWith="std", verbose=0))
    idf = Identification(iopt, flow["urdf"])
    idf.validation_file = flow["val"]
    idf.data.init_from_files([[flow["train"]]])
    idf.data.preprocess(imu=False)
    idf.estimateParameters()

    # residual at the operating point (reference walking logs measured
    # ~122% against REAL hardware; synthetic-truth recovery must be
    # near-exact — measured 0.6% on this seed)
    assert idf.res_error < 5.0, f"torque residual {idf.res_error:.2f}% too high"
    rel = float(
        np.linalg.norm(idf.model.xBase - idf.model.xBaseModel)
        / np.linalg.norm(idf.model.xBaseModel)
    )
    assert rel < 0.10, f"base-param distance {rel:.3f} too large"
    assert idf.sdp.last_status in ("optimal", "stalled"), idf.sdp.last_status
    xf = idf._full_xstd()
    assert is_physical_consistent(
        xf[: idf.model.num_model_params], idf.model.num_links
    ), "identified parameters not physically consistent"

    # held-out validation (reference identifier.py:241-320 semantics)
    idf.estimateValidationTorques()
    assert idf.val_nrms is not None
    assert idf.val_nrms < 3.0, f"held-out NRMS {idf.val_nrms:.2f}% too high"

    # friction truth from the simulator's effect chain (Fc=0.4, Fv=0.7)
    fs, nd = idf.model.friction_params_start, idf.model.num_dofs
    fc = xf[fs : fs + nd]
    fv = xf[fs + nd : fs + 2 * nd]
    assert np.median(np.abs(fc - 0.4)) < 0.15, f"Fc recovery off: {fc[:8]}"
    assert np.median(np.abs(fv - 0.7)) < 0.15, f"Fv recovery off: {fv[:8]}"
