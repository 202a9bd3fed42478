"""Measurement-effect transforms and suspended-base dynamics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flobaroid_tpu.models.urdf import load_urdf
from flobaroid_tpu.simulation import effects as fx

ARM_URDF = "examples/models/sevenlink_arm.urdf"

PENDULUM_URDF = """
<robot name="pendulum">
  <link name="hook"/>
  <joint name="hook_body" type="fixed">
    <origin xyz="0 0 -0.5" rpy="0 0 0"/>
    <parent link="hook"/><child link="body"/>
  </joint>
  <link name="body">
    <inertial>
      <mass value="2.0"/>
      <origin xyz="0 0 0"/>
      <inertia ixx="0.02" iyy="0.02" izz="0.01"/>
    </inertial>
  </link>
  <joint name="arm_joint" type="revolute">
    <origin xyz="0 0 -0.1" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <parent link="body"/><child link="arm"/>
    <limit effort="20" lower="-2" upper="2" velocity="5"/>
  </joint>
  <link name="arm">
    <inertial>
      <mass value="0.8"/>
      <origin xyz="0.15 0 0"/>
      <inertia ixx="0.002" iyy="0.01" izz="0.01"/>
    </inertial>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def arm_jp():
    import os

    path = os.path.join(os.path.dirname(__file__), "..", ARM_URDF)
    tree = load_urdf(path)
    return tree, fx.JointProperties.from_urdf(tree, tree.dof_names)


def test_joint_properties(arm_jp):
    tree, jp = arm_jp
    assert jp.num_dofs == 7
    assert np.all(jp.torque_limit > 0)
    assert np.all(jp.encoder_bits >= 13)
    assert np.all(jp.thermal_tau >= 300)
    assert np.all(np.diff(np.cumsum(jp.link_mass[::-1])[::-1]) <= 0)  # outboard mass decreasing


def test_effects_shapes_and_magnitudes(arm_jp):
    tree, jp = arm_jp
    N, nd = 400, 7
    rng = np.random.default_rng(0)
    freq = 200.0
    t = np.arange(N) / freq
    Q = jnp.asarray(0.5 * np.sin(2 * np.pi * 0.5 * t)[:, None] * np.ones((1, nd)))
    V = jnp.asarray(0.5 * 2 * np.pi * 0.5 * np.cos(2 * np.pi * 0.5 * t)[:, None] * np.ones((1, nd)))
    A = jnp.asarray(-0.5 * (2 * np.pi * 0.5) ** 2 * np.sin(2 * np.pi * 0.5 * t)[:, None] * np.ones((1, nd)))
    tau = jnp.asarray(rng.standard_normal((N, nd)))

    el = fx.add_joint_elasticity(tau, A, freq, jp)
    assert el.shape == tau.shape and np.all(np.isfinite(el))
    rp = fx.add_torque_ripple(N, Q, jp)
    assert rp.shape == (N, nd)
    fr = fx.add_friction(tau, V, jp)
    # friction opposes motion where |v| >> threshold
    mask = np.abs(np.asarray(V)) > 0.5
    assert np.all(np.sign(np.asarray(fr))[mask] == np.sign(np.asarray(V))[mask])
    th = fx.add_temperature_friction_drift(tau, V, jnp.asarray(t), jp)
    assert np.all(np.isfinite(th))
    cb = fx.add_cable_forces(tau, Q, jp, rng=np.random.default_rng(1))
    gr = fx.add_gravity_compensation_residual(tau, Q, jp)
    assert cb.shape == gr.shape == tau.shape
    tq = fx.add_torque_quantization(tau, jp)
    res = 2 * jp.torque_limit / 2 ** jp.torque_quant_bits
    np.testing.assert_allclose(
        np.asarray(tq) / res, np.round(np.asarray(tq) / res), atol=1e-9
    )
    pd = fx.add_structural_deflection(Q, tau, jp)
    assert pd.shape == Q.shape


def test_backlash_clamp(arm_jp):
    _, jp = arm_jp
    N = 200
    t = np.linspace(0, 2 * np.pi, N)
    Q = jnp.asarray(0.3 * np.sin(t)[:, None] * np.ones((1, 7)))
    V = jnp.asarray(0.3 * np.cos(t)[:, None] * np.ones((1, 7)))
    out = fx.add_backlash(Q, V, jp)
    err = np.abs(np.asarray(out) - np.asarray(Q))
    assert np.all(err <= jp.backlash + 1e-12)
    assert err.max() > 0  # effect does something


def test_quantization_straight_through(arm_jp):
    _, jp = arm_jp
    Q = jnp.ones((10, 7)) * 0.123

    def f(q):
        return jnp.sum(fx.add_encoder_quantization(q, jp))

    g = jax.grad(f)(Q)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_suspended_pendulum_period():
    """Spherical pendulum: small-angle period 2*pi*sqrt(L_com_eff/g)."""
    from flobaroid_tpu.excitation.suspended import SuspendedSimulator

    tree = load_urdf(PENDULUM_URDF)
    sim = SuspendedSimulator(tree, "hook", base_link="hook", damping=0.05)
    N, freq = 1200, 200.0
    t = np.arange(N) / freq
    Q = np.zeros((N, 1))
    V = np.zeros((N, 1))
    A = np.zeros((N, 1))
    rpy, vel, acc, pos = sim.simulate(Q, V, A, t, initial_rpy=np.array([0.15, 0.0, 0.0]))
    # attachment == base_link here; stored rpy is the inverse convention so
    # roll oscillates around the equilibrium
    roll = -rpy[:, 0]
    # compound pendulum about hook: m1 at 0.5m + arm at ~(0.6, 0.15->below)
    # measure the period from zero crossings of (roll - mean)
    sig = roll - np.mean(roll)
    crossings = np.where(np.diff(np.sign(sig)) != 0)[0]
    assert len(crossings) >= 3, "pendulum did not oscillate"
    half_periods = np.diff(crossings) / freq
    period = 2 * np.mean(half_periods)
    # analytic compound pendulum: I_hook = sum(m d^2 + I); tau = M g d_com
    # body: m=2 at 0.5; arm: m=0.8 at (0.15, 0, -0.6)
    I_hook = 2.0 * 0.5**2 + 0.02 + 0.8 * (0.15**2 + 0.6**2) + 0.01
    Mgd = (2.0 * 0.5 + 0.8 * 0.6) * 9.81  # z-moment arms (x offset affects eq tilt)
    T_analytic = 2 * np.pi * np.sqrt(I_hook / Mgd)
    assert abs(period - T_analytic) / T_analytic < 0.1, (period, T_analytic)


def test_suspended_locked_inertia_matches_rnea():
    """The closed-form alpha-response matrix (composite rigid-body
    inertia about the attachment, round 5) must equal the three
    unit-alpha RNEA sweeps it replaced, at random states."""
    import jax
    import jax.numpy as jnp

    from flobaroid_tpu.excitation.suspended import SuspendedSimulator

    tree = load_urdf(PENDULUM_URDF)
    sim = SuspendedSimulator(tree, "hook", base_link="body", damping=5.0)
    rng = np.random.default_rng(0)
    for _ in range(4):
        q = jnp.asarray(rng.uniform(-1.0, 1.0, tree.num_dofs))
        dq = jnp.asarray(rng.uniform(-2.0, 2.0, tree.num_dofs))
        ddq = jnp.asarray(rng.uniform(-5.0, 5.0, tree.num_dofs))
        att_rpy = jnp.asarray(rng.uniform(-0.3, 0.3, 3))
        att_omega = jnp.asarray(rng.uniform(-1.0, 1.0, 3))
        R_wr, pw, p_a, s, mask, v_r = sim._root_state(
            q, att_rpy, att_omega, dq
        )
        n0 = sim._moment_about_attachment(
            q, dq, ddq, R_wr, v_r, p_a, jnp.zeros(3, q.dtype), s, mask
        )
        cols = jax.vmap(
            lambda e: sim._moment_about_attachment(
                q, dq, ddq, R_wr, v_r, p_a, e, s, mask
            ) - n0
        )(jnp.eye(3, dtype=q.dtype))
        A_rnea = np.asarray(cols.T)
        A_closed = np.asarray(
            sim._locked_attachment_inertia(q, R_wr, pw, p_a)
        )
        np.testing.assert_allclose(
            A_closed, A_rnea, rtol=1e-8, atol=1e-10 * np.abs(A_rnea).max()
        )


def test_suspended_equilibrium_static():
    """Starting at equilibrium with static joints, the base barely moves
    (mirrors reference tests/test_suspended.py:36-60)."""
    from flobaroid_tpu.excitation.suspended import SuspendedSimulator

    tree = load_urdf(PENDULUM_URDF)
    sim = SuspendedSimulator(tree, "hook", base_link="body", damping=5.0)
    N, freq = 400, 200.0
    t = np.arange(N) / freq
    Q = np.full((N, 1), 0.4)
    V = np.zeros((N, 1))
    A = np.zeros((N, 1))
    rpy, vel, acc, pos = sim.simulate(Q, V, A, t)
    drift = np.abs(rpy - rpy[0]).max()
    assert drift < 0.02, f"base drifted {drift} rad from equilibrium"
    assert np.abs(vel).max() < 0.05


def test_suspended_roundtrip_identification():
    """Suspended sim -> floating-base torques -> identification recovers
    the parameters (validates every convention end to end)."""
    from flobaroid_tpu.data import Data
    from flobaroid_tpu.excitation.suspended import SuspendedSimulator
    from flobaroid_tpu.identification.identifier import Identification
    from flobaroid_tpu.model import Model
    from flobaroid_tpu.utils.config import load_config

    tree = load_urdf(PENDULUM_URDF)
    sim = SuspendedSimulator(tree, "hook", base_link="hook", damping=2.0)
    N, freq = 1500, 200.0
    t = np.arange(N) / freq
    # excite the single joint with a rich multi-sine
    Q = 0.8 * np.sin(2 * np.pi * 0.7 * t) + 0.4 * np.sin(2 * np.pi * 1.7 * t + 0.5)
    V = 0.8 * 2 * np.pi * 0.7 * np.cos(2 * np.pi * 0.7 * t) + 0.4 * 2 * np.pi * 1.7 * np.cos(
        2 * np.pi * 1.7 * t + 0.5
    )
    A = -0.8 * (2 * np.pi * 0.7) ** 2 * np.sin(2 * np.pi * 0.7 * t) - 0.4 * (
        2 * np.pi * 1.7
    ) ** 2 * np.sin(2 * np.pi * 1.7 * t + 0.5)
    Q, V, A = Q[:, None], V[:, None], A[:, None]
    rpy, bvel, bacc, bpos = sim.simulate(Q, V, A, t)

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        urdf = os.path.join(d, "pendulum.urdf")
        with open(urdf, "w") as f:
            f.write(PENDULUM_URDF)
        opt = load_config(
            None,
            overrides=dict(
                floatingBase=1,
                simulateTorques=1,
                useStructuralRegressor=1,
                randomSamples=800,
                computeDtype="float64",
                estimateWith="std",
                verbose=0,
            ),
        )
        samples = {
            "positions": Q,
            "velocities": V,
            "accelerations": A,
            "torques": np.zeros((N, 7)),
            "times": t,
            "frequency": np.array(freq),
            "base_rpy": rpy,
            "base_velocity": bvel,
            "base_acceleration": bacc,
        }
        idf = Identification(opt, urdf)
        idf.data.init_from_data(samples)
        idf.estimateParameters()
        rel = np.linalg.norm(idf.model.xBase - idf.model.xBaseModel) / np.linalg.norm(
            idf.model.xBaseModel
        )
        assert rel < 0.05, f"suspended roundtrip base error {rel}"
