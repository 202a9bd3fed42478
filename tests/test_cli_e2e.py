"""End-to-end CLI chain: trajectory.py -> simulator.py -> identifier.py.

Mirrors the reference's example-shell-script smoke tests
(tests/test_identification_fixed.py running examples/identify_kuka_lwr4.sh),
with a small budget so it stays within CI time."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ARM_URDF = os.path.join(REPO, "examples", "models", "sevenlink_arm.urdf")


@pytest.mark.slow
@pytest.mark.timeout(420)
def test_full_cli_pipeline(tmp_path):
    cfg = dict(
        excitationFrequency=50.0,
        floatingBase=0,
        verbose=0,
        trajectoryPulseMin=1.0,
        trajectoryPulseMax=2.0,
        trajectoryDefaultNf=3,
        globalOptSize=10,
        globalOptIterations=3,
        localOptIterations=2,
        useStructuralRegressor=1,
        randomSamples=800,
        transitionDuration=1.0,
        identifyFrictionSimultaneously=1,
        identifySymmetricVelFriction=1,
        constrainToConsistent=1,
        limitOverallMass=1,
        limitMassRange=1.0,
        limitMassToApriori=1,
        limitMassAprioriBoundary=0.5,
        simulateCableForces=0,
        simulateGravityCompResidual=0,
        simulateThermalDrift=0,
        simulateTimingJitter=0,
        createPlots=1,
        outputFilename=str(tmp_path / "report.html"),
        estimateWith="std",
    )
    cfg_file = tmp_path / "cfg.yaml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg, f)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    def run(script, *extra):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, script), "--config", str(cfg_file),
             "--model", ARM_URDF, *extra],
            capture_output=True, text=True, timeout=800, cwd=REPO, env=env,
        )
        assert r.returncode == 0, f"{script}: {r.stderr[-3000:]}"
        return r.stdout

    traj = tmp_path / "traj.npz"
    meas = tmp_path / "meas.npz"
    out_urdf = tmp_path / "identified.urdf"

    run("trajectory.py", "--filename", str(traj))
    run("simulator.py", "--trajectory", str(traj), "--filename", str(meas))
    out = run(
        "identifier.py",
        "--measurements", str(meas),
        "--validation", str(meas),
        "--model_real", ARM_URDF,
        "--model_output", str(out_urdf),
        "--trajectory", str(traj),
        "--plot",
    )
    assert "torque estimation error" in out
    assert "physically consistent" in out
    # --validation must visibly report held-out metrics (round-1 bug:
    # the console rendered before estimateValidationTorques ran)
    assert "validation:" in out
    assert out_urdf.exists(), "identified URDF not written"
    assert (tmp_path / "report.html").exists()

    # identified URDF is loadable and close to the truth
    from flobaroid_tpu.models.urdf import load_urdf

    t_id = load_urdf(str(out_urdf))
    t_true = load_urdf(ARM_URDF)
    m_id = t_id.std_params()[0::10]
    m_true = t_true.std_params()[0::10]
    nz = m_true > 0
    assert np.all(np.abs(m_id[nz] - m_true[nz]) / m_true[nz] < 0.5)
