"""CLI tools (tools/): csv2npz conversion incl. torque resimulation,
scaleInertia / scaleInertia2 (reference tools/ parity)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from test_identification import synth_samples

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ARM_URDF = os.path.join(REPO, "examples", "models", "sevenlink_arm.urdf")


def run_tool(name, *argv, timeout=400):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", name), *argv],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2500:])
    return r.stdout


@pytest.fixture(scope="module")
def csv_log(tmp_path_factory):
    """CSV with kinematics from the true model but GARBAGE torques
    (the gazebo situation)."""
    d = tmp_path_factory.mktemp("csv")
    samples, tree = synth_samples(ARM_URDF, n=400, noise=0.0)
    n, nd = samples["positions"].shape
    rng = np.random.default_rng(0)
    cols = np.hstack([
        samples["times"][:, None],
        samples["positions"],
        rng.standard_normal((n, nd)) * 50.0,  # junk torques
    ])
    f = d / "log.csv"
    np.savetxt(f, cols, delimiter=",")
    cfg = d / "cfg.yaml"
    with open(cfg, "w") as fh:
        yaml.safe_dump(dict(floatingBase=0, verbose=0, excitationFrequency=200.0), fh)
    return d, f, cfg, samples, tree


def test_csv2npz_basic(csv_log, tmp_path):
    d, f, cfg, samples, tree = csv_log
    out = tmp_path / "m.npz"
    run_tool("csv2npz.py", "--config", str(cfg), "--model", ARM_URDF,
             "--csv", str(f), "--time-col", "0",
             "--pos-cols", "1:8", "--tau-cols", "8:15", "--out", str(out))
    m = np.load(out)
    assert m["positions"].shape == samples["positions"].shape
    assert "velocities" in m and "torques" in m


def test_csv2npz_resimulates_torques(csv_log, tmp_path):
    """--resimulate-torques must replace the junk logged torques with
    model-consistent ones (reference gazebo mode)."""
    d, f, cfg, samples, tree = csv_log
    out = tmp_path / "m.npz"
    run_tool("csv2npz.py", "--config", str(cfg), "--model", ARM_URDF,
             "--csv", str(f), "--time-col", "0",
             "--pos-cols", "1:8", "--tau-cols", "8:15",
             "--resimulate-torques", "--out", str(out))
    m = np.load(out)
    # filtered positions differ slightly from the raw ones the oracle
    # used, so compare against a fresh simulation of the SAVED kinematics
    from flobaroid_tpu.model import Model
    from flobaroid_tpu.utils.config import load_config

    model = Model(load_config(str(cfg), overrides=dict(urdf=ARM_URDF)),
                  ARM_URDF, regressor_init=False)
    n = m["positions"].shape[0]
    sim = model.simulate_dynamics({k: m[k] for k in m.files}, np.arange(n))
    # the tool runs the production f32 path; this process runs f64 —
    # agreement is to f32 accumulation accuracy
    err = np.abs(m["torques"] - sim).max()
    assert err < 0.05, err
    # and they are NOT the junk torques
    raw = np.genfromtxt(f, delimiter=",")
    assert np.abs(m["torques"] - raw[:, 8:15]).max() > 1.0


def test_csv2npz_signs_and_order(csv_log, tmp_path):
    d, f, cfg, samples, tree = csv_log
    out = tmp_path / "m.npz"
    order = "1,0,2,3,4,5,6"
    signs = "-1,1,1,1,1,1,1"
    run_tool("csv2npz.py", "--config", str(cfg), "--model", ARM_URDF,
             "--csv", str(f), "--time-col", "0",
             "--pos-cols", "1:8", "--tau-cols", "8:15",
             f"--joint-order={order}", f"--joint-signs={signs}",
             "--out", str(out))
    m = np.load(out)
    raw = np.genfromtxt(f, delimiter=",")
    # joint 0 of the output = -1 * csv joint 1
    np.testing.assert_allclose(m["positions_raw"][:, 0], -raw[:, 2], atol=1e-12)


def test_scale_inertia2_preserves_comments(tmp_path):
    import re

    src = tmp_path / "in.urdf"
    urdf = re.sub(r"(<robot[^>]*>)", r"\1<!-- keep me -->", open(ARM_URDF).read(), count=1)
    src.write_text(urdf)
    out = tmp_path / "out.urdf"
    run_tool("scaleInertia2.py", "--model", str(src), "--output", str(out),
             "--scale", "2.0")
    txt = out.read_text()
    assert "keep me" in txt
    from flobaroid_tpu.models.urdf import load_urdf

    m_in = load_urdf(str(src)).std_params()[0::10]
    m_out = load_urdf(str(out)).std_params()[0::10]
    np.testing.assert_allclose(m_out, 2.0 * m_in, rtol=1e-12)
