"""Model-layer details: joint ordering via regressor XML, skipSamples,
regressor filtering, base equations, gravity-only mode."""

import os

import numpy as np
import pytest

from flobaroid_tpu.data import Data
from flobaroid_tpu.model import Model
from flobaroid_tpu.utils.config import load_config
from test_identification import synth_samples

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ARM_URDF = os.path.join(REPO, "examples", "models", "sevenlink_arm.urdf")


def opt_base(**kw):
    o = load_config(None)
    o.update(
        dict(verbose=0, useStructuralRegressor=1, randomSamples=600,
             computeDtype="float64", floatingBase=0)
    )
    o.update(kw)
    return o


def test_regressor_xml_joint_order(tmp_path):
    """DOF ordering from a regressor XML whitelist
    (reference model.py:74-94)."""
    xml = tmp_path / "regr.xml"
    # reversed joint order
    names = [f"arm_{i}_joint" for i in reversed(range(7))]
    xml.write_text(
        "<regressor>" + "".join(f"<joint>{n}</joint>" for n in names) + "</regressor>"
    )
    m = Model(opt_base(), ARM_URDF, regressor_file=str(xml), regressor_init=False)
    assert m.jointNames == names
    # torque rows follow the requested order: gravity torque of the
    # reversed model equals reversed gravity torque of the default model
    import jax.numpy as jnp

    m2 = Model(opt_base(), ARM_URDF, regressor_init=False)
    q = np.linspace(-0.4, 0.4, 7)
    tau2 = np.asarray(
        m2.engine.inverse_dynamics(
            jnp.asarray(m2.xStdModel[: m2.num_model_params]),
            jnp.asarray(q), jnp.zeros(7), jnp.zeros(7), floating=False,
        )
    )
    tau1 = np.asarray(
        m.engine.inverse_dynamics(
            jnp.asarray(m.xStdModel[: m.num_model_params]),
            jnp.asarray(q[::-1].copy()), jnp.zeros(7), jnp.zeros(7), floating=False,
        )
    )
    np.testing.assert_allclose(tau1, tau2[::-1], rtol=1e-10)


def test_skip_samples(tmp_path):
    import shutil

    urdf = str(tmp_path / "arm.urdf")
    shutil.copy(ARM_URDF, urdf)
    samples, _ = synth_samples(urdf, n=600, noise=0.01)
    o = opt_base(skipSamples=2, simulateTorques=0)
    m = Model(o, urdf)
    d = Data(o)
    d.init_from_data(samples)
    assert d.num_used_samples == 200
    m.computeRegressors(d)
    assert m.YStd.shape[0] == 200 * 7
    # rows correspond to every third sample
    np.testing.assert_allclose(m.T, samples["times"][::3])


def test_filter_regressor(tmp_path):
    import shutil

    urdf = str(tmp_path / "arm.urdf")
    shutil.copy(ARM_URDF, urdf)
    samples, _ = synth_samples(urdf, n=500, noise=0.01)
    o1 = opt_base(filterRegressor=0)
    m1 = Model(o1, urdf)
    d1 = Data(o1)
    d1.init_from_data(dict(samples))
    m1.computeRegressors(d1)
    o2 = opt_base(filterRegressor=1, filterRegCutoff=5)
    m2 = Model(o2, urdf)
    d2 = Data(o2)
    d2.init_from_data(dict(samples))
    m2.computeRegressors(d2)
    assert m1.YBase.shape == m2.YBase.shape
    assert not np.allclose(m1.YBase[:, 0], m2.YBase[:, 0])


def test_base_equations_and_names():
    m = Model(opt_base(), ARM_URDF)
    eqs = m.base_equations_str()
    assert len(eqs) == m.num_base_params
    assert any("Izz" in e or "m_" in e for e in eqs)
    assert len(m.param_names) == m.num_identified_params


@pytest.mark.timeout(90)
def test_gravity_only_mode(tmp_path):
    import shutil

    urdf = str(tmp_path / "arm.urdf")
    shutil.copy(ARM_URDF, urdf)
    # static samples: zero velocity/acceleration, gravity torques only
    rng = np.random.default_rng(0)
    n = 400
    Q = rng.uniform(-1.0, 1.0, (n, 7))
    import jax
    import jax.numpy as jnp

    from flobaroid_tpu.dynamics.engine import DynamicsEngine
    from flobaroid_tpu.models.urdf import load_urdf

    tree = load_urdf(urdf)
    eng = DynamicsEngine(tree)
    pi = jnp.asarray(tree.std_params())
    tau = np.asarray(
        jax.vmap(lambda q: eng.inverse_dynamics(pi, q, jnp.zeros(7), jnp.zeros(7), floating=False))(
            jnp.asarray(Q)
        )
    ) + 0.01 * rng.standard_normal((n, 7))
    samples = {
        "positions": Q,
        "velocities": np.zeros((n, 7)),
        "accelerations": np.zeros((n, 7)),
        "torques": tau,
        "times": np.arange(n) / 100.0,
        "frequency": np.float64(100.0),
    }
    o = opt_base(identifyGravityParamsOnly=1)
    m = Model(o, urdf)
    assert m.num_identified_params == 8 * 4  # m + first moments per link
    from flobaroid_tpu.identification.identifier import Identification

    idf = Identification(o, urdf)
    idf.data.init_from_data(samples)
    idf.estimateParameters()
    assert idf.res_error < 3.0
    rel = np.linalg.norm(idf.model.xBase - idf.model.xBaseModel) / np.linalg.norm(
        idf.model.xBaseModel
    )
    assert rel < 0.05, rel


def test_structural_cache_sidecar(tmp_path):
    """A getRandomRegressor call with non-default options must not
    clobber the canonical <urdf>.regressor.npz (the checked-in cache a
    fresh environment relies on): mismatching results go to an
    options-keyed sidecar, and a repeat call reuses that sidecar."""
    import shutil

    urdf = str(tmp_path / "arm.urdf")
    shutil.copy(ARM_URDF, urdf)
    canonical = urdf + ".regressor.npz"
    shutil.copy(ARM_URDF + ".regressor.npz", canonical)
    before = open(canonical, "rb").read()

    # canonical hit: default-n request must not rewrite the file
    n_default = int(np.load(canonical)["n"])
    m = Model(opt_base(randomSamples=n_default), urdf, regressor_init=False)
    m.getRandomRegressor(n_default)
    assert open(canonical, "rb").read() == before

    # mismatching n: canonical preserved, sidecar written
    m2 = Model(opt_base(randomSamples=64), urdf, regressor_init=False)
    R, Q, RQ, PQ = m2.getRandomRegressor(64)
    assert open(canonical, "rb").read() == before
    sidecars = [f for f in os.listdir(tmp_path)
                if f.endswith(".regressor.npz") and f != os.path.basename(canonical)]
    assert len(sidecars) == 1, sidecars
    side = str(tmp_path / sidecars[0])
    mtime = os.path.getmtime(side)

    # repeat call: served from the sidecar, nothing rewritten
    R2, _, _, PQ2 = m2.getRandomRegressor(64)
    assert os.path.getmtime(side) == mtime
    np.testing.assert_array_equal(R, R2)
    np.testing.assert_array_equal(PQ, PQ2)


def test_structural_identifiability_triple():
    """Identifiability triple on the 7-DOF arm (reference
    documentation/design_notes.md:98-103 reports the analogous triple
    ~70/~213/~207 for the 29-DOF walkman). Fixed-base 7R chain:
    textbook inertial rank 43 (the golden KUKA cache's rank 64 minus
    its 21 friction columns), 37-direction null space."""
    o = opt_base(identifyFrictionSimultaneously=1)
    m = Model(o, ARM_URDF)
    t = m.structural_identifiability()
    assert t["n_inertial_params"] == 80
    assert t["base_directions"] == 43
    assert t["null_directions"] == 37
    # lumping exists: not every base direction is a single parameter
    assert t["individually_identifiable"] == 24
    assert all(p < m.num_model_params
               for p in t["individually_identifiable_params"])


def test_rank_threshold_tracks_actual_precision(tmp_path):
    """computeDtype=float64 with x64 DISABLED silently truncates the
    on-device Gram to f32; the QR rank threshold must follow the actual
    precision or f32 noise directions read as independent (measured:
    rank 80 instead of 64 on this arm). Needs a fresh process — the
    test session enables x64 globally."""
    import shutil
    import subprocess
    import sys

    urdf = str(tmp_path / "arm.urdf")
    shutil.copy(ARM_URDF, urdf)
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64
from flobaroid_tpu.model import Model
from flobaroid_tpu.utils.config import load_config
o = load_config(None)
o.update(dict(verbose=0, useStructuralRegressor=1, floatingBase=0,
              randomSamples=300, identifyFrictionSimultaneously=1,
              computeDtype="float64"))
m = Model(o, {urdf!r})
assert m.num_base_params == 64, m.num_base_params
print("rank-ok")
"""
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, cwd=REPO, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rank-ok" in r.stdout


@pytest.mark.timeout(120)
def test_sensor_placement_study():
    """Structural rank gain from added F/T sensors (reference
    documentation/design_notes.md:104-110: each added 6-axis F/T
    recovers ~3 null directions, roughly additive for disjoint
    placements). On the 7-DOF arm both placements give exactly +3 and
    compose additively — the reference's walkman measurement."""
    o = opt_base(identifyFrictionSimultaneously=0)
    m = Model(o, ARM_URDF, regressor_init=False)
    wrist, elbow = m.linkNames[-1], m.linkNames[4]
    s = m.sensor_placement_study(
        {"wrist": [wrist], "elbow": [elbow], "both": [wrist, elbow]},
        n_samples=600,
    )
    assert s["baseline_rank"] == 43 and s["null_directions"] == 37
    assert s["sets"]["wrist"]["gain"] == 3
    assert s["sets"]["elbow"]["gain"] == 3
    assert s["sets"]["both"]["gain"] == 6


def test_config_keys_are_wired():
    """Every key in DEFAULTS must be referenced somewhere outside
    config.py (a documented key wired to nothing silently lies to the
    user — shardSamples was one)."""
    import re
    import subprocess

    import flobaroid_tpu.utils.config as C

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    src = open(C.__file__).read()
    keys = set(re.findall(r'^\s+"([A-Za-z0-9_]+)":', src, re.M))
    # display/interactive toggles documented as headless no-ops
    noop = {
        "showOptimizationGraph", "showOptimizationTrajs",
        "showModelVisualization", "transparentLinks", "collisionMode",
        "fullMeshLinks", "outputModule", "showRandomRegressor",
        "showErrorHistogram", "showEssentialSteps",
    }
    unwired = []
    for k in sorted(keys - noop):
        r = subprocess.run(
            ["grep", "-rl", k, os.path.join(repo, "flobaroid_tpu"),
             os.path.join(repo, "tests")] +
            [os.path.join(repo, f) for f in
             ("trajectory.py", "simulator.py", "identifier.py", "excite.py", "bench.py")],
            capture_output=True, text=True,
        )
        files = [f for f in r.stdout.split() if not f.endswith("utils/config.py")]
        if not files:
            unwired.append(k)
    assert not unwired, f"config keys wired to nothing: {unwired}"
