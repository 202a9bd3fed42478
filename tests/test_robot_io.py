"""Native excitation server loopback: compile, run, drive, record."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SRC = os.path.join(REPO, "native", "excitation_server", "excitation_server.cpp")


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    binpath = str(d / "excitation_server")
    r = subprocess.run(
        ["g++", "-O2", "-std=c++17", "-pthread", SRC, "-o", binpath],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    port = 7791
    proc = subprocess.Popen([binpath, "--dofs", "3", "--port", str(port), "--rate", "500"])
    time.sleep(0.5)
    yield port
    proc.terminate()
    proc.wait(timeout=5)


def test_loopback_excitation(server):
    from flobaroid_tpu.robot_io.tcp_bridge import ExcitationClient

    c = ExcitationClient(port=server)
    assert c.num_dofs == 3
    assert c.control_rate == 500.0
    c.stream(True)
    target = [0.3, -0.2, 0.1]
    c.set_targets(target)
    states = []
    t_end = time.monotonic() + 1.5
    while time.monotonic() < t_end:
        s = c.read_state()
        if s is not None:
            states.append(s)
    c.stream(False)
    c.close()
    assert len(states) > 50
    t, q, dq, tau = states[-1]
    np.testing.assert_allclose(q, target, atol=0.05)
    ts = [s[0] for s in states]
    assert all(b >= a for a, b in zip(ts, ts[1:]))


def test_tcp_bridge_trajectory(server):
    """Full excite flow: trajectory streamed over TCP, state recorded."""
    from flobaroid_tpu.excitation.trajectory import ArrayTrajectory
    from flobaroid_tpu.robot_io import tcp_bridge

    n = 200
    tms = np.arange(n) / 50.0
    Q = 0.2 * np.sin(2 * np.pi * 0.5 * tms)[:, None] * np.ones((1, 3))
    V = 0.2 * np.pi * np.cos(2 * np.pi * 0.5 * tms)[:, None] * np.ones((1, 3))
    traj = ArrayTrajectory(tms, Q, V, np.zeros_like(Q))

    class A:
        periods = 1

    cfg = dict(num_dofs=3, excitationFrequency=50.0, tcpPort=server, args=A())
    out = {}
    tcp_bridge.main(cfg, traj, out)
    assert out["Q"].shape[1] == 3
    assert len(out["Q"]) > 50
    assert out["measured_frequency"] > 10
    assert np.max(np.abs(out["Q"][:, 0])) > 0.1


def test_excite_cli_tcp(server, tmp_path):
    """excite.py end to end against the native server."""
    import yaml

    arm = os.path.join(REPO, "examples", "models", "sevenlink_arm.urdf")
    # 3-dof trajectory matching the server's dofs: use a 3-dof model
    urdf3 = tmp_path / "three.urdf"
    import re

    txt = open(arm).read()
    # build a quick 3-dof chain by truncating after arm_3_link
    cut = txt.index("<joint name=\"arm_3_joint\"")
    txt3 = txt[:cut] + "</robot>\n"
    urdf3.write_text(txt3)

    n = 150
    tms = np.arange(n) / 50.0
    Q = 0.25 * np.sin(2 * np.pi * 0.4 * tms)[:, None] * np.ones((1, 3))
    V = 0.25 * 2 * np.pi * 0.4 * np.cos(2 * np.pi * 0.4 * tms)[:, None] * np.ones((1, 3))
    traj_file = tmp_path / "traj.npz"
    np.savez(traj_file, static=False, positions=Q, velocities=V,
             accelerations=np.zeros_like(Q), times=tms, frequency=np.float64(50.0))
    cfg = dict(excitationFrequency=50.0, exciteMethod="tcp", tcpPort=server,
               floatingBase=0, verbose=0, filterMedianSize=5,
               filterLowPass1=[8.0, 4], filterLowPass2=[6.0, 4], filterLowPass3=[3.0, 3])
    cfg_file = tmp_path / "cfg.yaml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg, f)
    out_file = tmp_path / "meas.npz"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "excite.py"), "--config", str(cfg_file),
         "--model", str(urdf3), "--trajectory", str(traj_file),
         "--filename", str(out_file)],
        capture_output=True, text=True, timeout=400, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    with np.load(out_file, allow_pickle=True) as f:
        assert f["positions"].shape[1] == 3
        assert "torques_raw" in f.files
        assert f["positions"].shape[0] > 50
