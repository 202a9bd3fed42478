"""Core dynamics oracles.

Mirrors the reference's regressor-RNEA consistency oracle
(reference: tests/test_regressors.py:16-60) and strengthens it: since
iDynTree is not a dependency anymore, ground truth comes from a fully
independent Euler-Lagrange/autodiff formulation (dynamics/lagrangian.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flobaroid_tpu.dynamics import lagrangian as lag
from flobaroid_tpu.dynamics import spatial as sp
from flobaroid_tpu.dynamics.engine import DynamicsEngine, rpy_to_base_rot
from flobaroid_tpu.models.urdf import load_urdf

SIMPLE_URDF = """
<robot name="rr">
  <link name="base"/>
  <joint name="j0" type="revolute">
    <origin xyz="0 0 0.1" rpy="0 0 0"/>
    <axis xyz="0 0 1"/>
    <parent link="base"/><child link="l1"/>
    <limit effort="10" lower="-2" upper="2" velocity="2"/>
  </joint>
  <link name="l1">
    <inertial>
      <mass value="1.5"/>
      <origin xyz="0.2 0.01 -0.03" rpy="0.1 0.2 0.3"/>
      <inertia ixx="0.02" ixy="0.001" ixz="0.002" iyy="0.03" iyz="0.003" izz="0.04"/>
    </inertial>
  </link>
  <joint name="j1" type="revolute">
    <origin xyz="0.4 0 0" rpy="0.2 -0.1 0.4"/>
    <axis xyz="0 1 0"/>
    <parent link="l1"/><child link="l2"/>
    <limit effort="10" lower="-2" upper="2" velocity="2"/>
  </joint>
  <link name="l2">
    <inertial>
      <mass value="0.8"/>
      <origin xyz="0.15 -0.02 0.05"/>
      <inertia ixx="0.01" ixy="0" ixz="0.001" iyy="0.012" iyz="0" izz="0.014"/>
    </inertial>
  </link>
  <joint name="j2" type="prismatic">
    <origin xyz="0.3 0.05 0" rpy="0 0.3 0"/>
    <axis xyz="0.0 0.6 0.8"/>
    <parent link="l2"/><child link="l3"/>
    <limit effort="10" lower="-0.5" upper="0.5" velocity="1"/>
  </joint>
  <link name="l3">
    <inertial>
      <mass value="0.4"/>
      <origin xyz="0.0 0.05 0.1"/>
      <inertia ixx="0.005" ixy="0.0005" ixz="0" iyy="0.006" iyz="0.0002" izz="0.007"/>
    </inertial>
  </link>
  <joint name="jf" type="fixed">
    <origin xyz="0 0 0.2" rpy="0.1 0 0"/>
    <parent link="l3"/><child link="tool"/>
  </joint>
  <link name="tool">
    <inertial>
      <mass value="0.2"/>
      <origin xyz="0.01 0.02 0.03"/>
      <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.001"/>
    </inertial>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def rr():
    tree = load_urdf(SIMPLE_URDF)
    eng = DynamicsEngine(tree)
    pi = jnp.asarray(tree.std_params())
    return tree, eng, pi


def rand_state(eng, key, scale=1.0):
    n = eng.num_dofs
    ks = jax.random.split(key, 9)
    q = jax.random.uniform(ks[0], (n,), minval=-1.5, maxval=1.5)
    dq = scale * jax.random.normal(ks[1], (n,))
    ddq = scale * jax.random.normal(ks[2], (n,))
    rpy = 0.4 * jax.random.normal(ks[3], (3,))
    drpy = scale * jax.random.normal(ks[4], (3,))
    ddrpy = scale * jax.random.normal(ks[5], (3,))
    dpb = scale * jax.random.normal(ks[6], (3,))
    ddpb = scale * jax.random.normal(ks[7], (3,))
    return q, dq, ddq, rpy, drpy, ddrpy, dpb, ddpb


def mixed_base_args(rpy, drpy, ddrpy, dpb, ddpb):
    w, wd = jax.jvp(
        lambda r, rd: lag.omega_world(r, rd), (rpy, drpy), (drpy, ddrpy)
    )
    base_rot = sp.rpy_to_rot(rpy).T
    base_vel = jnp.concatenate([dpb, w])
    base_acc = jnp.concatenate([ddpb, wd])
    return base_rot, base_vel, base_acc


def test_urdf_parse(rr):
    tree, eng, pi = rr
    assert tree.num_links == 5
    assert tree.num_dofs == 3
    assert tree.link_names == ["base", "l1", "l2", "l3", "tool"]
    assert tree.dof_names == ["j0", "j1", "j2"]
    # massless base link -> zero params
    np.testing.assert_allclose(np.asarray(pi[:10]), 0.0)
    assert pi.shape == (50,)
    lims = tree.joint_limits()
    assert lims["j0"]["torque"] == 10


def test_regressor_matches_rnea_fixed(rr):
    _, eng, pi = rr
    for seed in range(5):
        q, dq, ddq, *_ = rand_state(eng, jax.random.PRNGKey(seed))
        Y = eng.regressor(q, dq, ddq)
        tau = eng.inverse_dynamics(pi, q, dq, ddq, floating=False)
        assert Y.shape == (3, 50)
        np.testing.assert_allclose(Y @ pi, tau, rtol=1e-10, atol=1e-10)


def test_regressor_matches_rnea_floating(rr):
    _, eng, pi = rr
    for seed in range(5):
        q, dq, ddq, rpy, drpy, ddrpy, dpb, ddpb = rand_state(
            eng, jax.random.PRNGKey(100 + seed)
        )
        br, bv, ba = mixed_base_args(rpy, drpy, ddrpy, dpb, ddpb)
        Y = eng.regressor(q, dq, ddq, br, bv, ba)
        tau = eng.inverse_dynamics(pi, q, dq, ddq, br, bv, ba)
        assert Y.shape == (9, 50)
        np.testing.assert_allclose(Y @ pi, tau, rtol=1e-9, atol=1e-10)


def test_sensor_wrench_regressor(rr):
    """F/T-sensor wrench regressor (sensor-placement analysis; the
    reference documents the analogous study in
    documentation/design_notes.md:104-110). Three oracles: a root-link
    sensor reproduces the floating-base wrench rows exactly; a mid-chain
    sensor's wrench equals the base wrench of the same state with all
    non-subtree parameters zeroed; columns of links outside the subtree
    are identically zero."""
    tree, eng, pi = rr
    q, dq, ddq, rpy, drpy, ddrpy, dpb, ddpb = rand_state(
        eng, jax.random.PRNGKey(7)
    )
    br, bv, ba = mixed_base_args(rpy, drpy, ddrpy, dpb, ddpb)
    Y = eng.regressor(q, dq, ddq, br, bv, ba)

    Ys0 = eng.sensor_wrench_regressor([0], q, dq, ddq, br, bv, ba)
    np.testing.assert_allclose(np.asarray(Ys0), np.asarray(Y[:6]),
                               rtol=1e-12, atol=1e-12)

    li = tree.link_names.index("l2")
    Ys = eng.sensor_wrench_regressor([li], q, dq, ddq, br, bv, ba)
    sub = eng.subtree_mask[li]
    pi_sub = (np.asarray(pi).reshape(-1, 10) * sub[:, None]).reshape(-1)
    np.testing.assert_allclose(np.asarray(Ys @ pi), np.asarray(Y[:6] @ pi_sub),
                               rtol=1e-9, atol=1e-10)
    outside = np.repeat(1 - sub, 10).astype(bool)
    np.testing.assert_allclose(np.asarray(Ys)[:, outside], 0.0, atol=0.0)

    # fixed-base variant: sensor above the first moving link sees the
    # whole arm's reaction = floating rows at the same (default) base
    li1 = tree.link_names.index("l1")
    Ys1 = eng.sensor_wrench_regressor([li1], q, dq, ddq)
    I = jnp.eye(3, dtype=q.dtype)
    z = jnp.zeros(6, dtype=q.dtype)
    Yfl = eng.regressor(q, dq, ddq, I, z, z)
    sub1 = np.repeat(eng.subtree_mask[li1], 10).astype(bool)
    np.testing.assert_allclose(np.asarray(Ys1)[:, sub1],
                               np.asarray(Yfl[:6])[:, sub1],
                               rtol=1e-10, atol=1e-10)


@pytest.mark.timeout(120)
def test_rnea_matches_lagrangian_fixed(rr):
    _, eng, pi = rr
    for seed in range(4):
        q, dq, ddq, *_ = rand_state(eng, jax.random.PRNGKey(200 + seed))
        tau_rnea = eng.inverse_dynamics(pi, q, dq, ddq, floating=False)
        tau_lag = lag.inverse_dynamics_fixed(eng, pi, q, dq, ddq)
        np.testing.assert_allclose(tau_rnea, tau_lag, rtol=1e-8, atol=1e-9)


def test_rnea_matches_lagrangian_floating(rr):
    _, eng, pi = rr
    for seed in range(4):
        q, dq, ddq, rpy, drpy, ddrpy, dpb, ddpb = rand_state(
            eng, jax.random.PRNGKey(300 + seed)
        )
        br, bv, ba = mixed_base_args(rpy, drpy, ddrpy, dpb, ddpb)
        out_rnea = eng.inverse_dynamics(pi, q, dq, ddq, br, bv, ba)
        out_lag = lag.inverse_dynamics_floating(
            eng, pi, q, dq, ddq, rpy, drpy, ddrpy, dpb, ddpb
        )
        np.testing.assert_allclose(out_rnea, out_lag, rtol=1e-7, atol=1e-8)


def test_mass_matrix_consistency(rr):
    _, eng, pi = rr
    key = jax.random.PRNGKey(7)
    q, dq, ddq, *_ = rand_state(eng, key)
    M = eng.mass_matrix(pi, q, floating=False)
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    assert np.all(np.linalg.eigvalsh(np.asarray(M)) > 0)
    h = eng.bias_forces(pi, q, dq, floating=False)
    tau = eng.inverse_dynamics(pi, q, dq, ddq, floating=False)
    np.testing.assert_allclose(M @ ddq + h, tau, rtol=1e-9, atol=1e-10)


def test_mass_matrix_floating_consistency(rr):
    _, eng, pi = rr
    q, dq, ddq, rpy, drpy, ddrpy, dpb, ddpb = rand_state(eng, jax.random.PRNGKey(17))
    br, bv, ba = mixed_base_args(rpy, drpy, ddrpy, dpb, ddpb)
    M = eng.mass_matrix(pi, q, base_rot=br, floating=True)
    np.testing.assert_allclose(M, M.T, atol=1e-9)
    h = eng.bias_forces(pi, q, dq, base_rot=br, base_vel=bv, floating=True)
    out = eng.inverse_dynamics(pi, q, dq, ddq, br, bv, ba)
    nu_dot = jnp.concatenate([ba, ddq])
    np.testing.assert_allclose(M @ nu_dot + h, out, rtol=1e-8, atol=1e-9)


def test_frame_jacobian_vs_autodiff(rr):
    _, eng, pi = rr
    q, dq, ddq, rpy, drpy, ddrpy, dpb, ddpb = rand_state(eng, jax.random.PRNGKey(23))
    br, bv, _ = mixed_base_args(rpy, drpy, ddrpy, dpb, ddpb)
    link = eng.num_links - 1

    def frame_pose(x):
        pb, rpy_, q_ = x[:3], x[3:6], x[6:]
        Rwb = sp.rpy_to_rot(rpy_).T
        R, p = eng.fk(q_)
        return Rwb @ R[link], pb + Rwb @ p[link]

    x = jnp.concatenate([jnp.zeros(3), rpy, q])
    xd = jnp.concatenate([dpb, drpy, dq])
    (Rf, pf), (Rd, pd) = jax.jvp(frame_pose, (x,), (xd,))
    w_world = sp.unskew(0.5 * (Rd @ Rf.T - Rf @ Rd.T))
    J = eng.frame_jacobian(link, q, br)
    vel = J @ jnp.concatenate([bv, dq])
    np.testing.assert_allclose(vel[:3], pd, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(vel[3:], w_world, rtol=1e-9, atol=1e-10)


def test_batched_regressor(rr):
    _, eng, pi = rr
    N = 16
    key = jax.random.PRNGKey(5)
    Q = jax.random.uniform(key, (N, eng.num_dofs), minval=-1, maxval=1)
    DQ = jax.random.normal(jax.random.PRNGKey(6), (N, eng.num_dofs))
    DDQ = jax.random.normal(jax.random.PRNGKey(8), (N, eng.num_dofs))
    Y = eng.regressor_batch(Q, DQ, DDQ)
    assert Y.shape == (N, eng.num_dofs, eng.num_links * 10)
    Y0 = eng.regressor(Q[0], DQ[0], DDQ[0])
    np.testing.assert_allclose(Y[0], Y0, rtol=1e-12, atol=1e-12)


@pytest.mark.timeout(90)
def test_reference_urdfs_load(threelinks_urdf, kuka_urdf):
    t3 = load_urdf(threelinks_urdf)
    assert t3.num_dofs == 2  # joint_1_2, joint_2_3 (base joint is fixed)
    assert t3.num_links == 5
    eng = DynamicsEngine(t3)
    pi = jnp.asarray(t3.std_params())
    q = jnp.array([0.3, -0.5])
    dq = jnp.array([0.2, 0.1])
    ddq = jnp.array([-0.4, 0.25])
    Y = eng.regressor(q, dq, ddq)
    tau = eng.inverse_dynamics(pi, q, dq, ddq, floating=False)
    np.testing.assert_allclose(Y @ pi, tau, rtol=1e-10, atol=1e-12)

    kuka = load_urdf(kuka_urdf)
    assert kuka.num_dofs == 7
    engk = DynamicsEngine(kuka)
    pik = jnp.asarray(kuka.std_params())
    qk = jnp.linspace(-0.5, 0.5, 7)
    tk = engk.inverse_dynamics(pik, qk, jnp.zeros(7), jnp.zeros(7), floating=False)
    tl = lag.inverse_dynamics_fixed(engk, pik, qk, jnp.zeros(7), jnp.zeros(7))
    np.testing.assert_allclose(tk, tl, rtol=1e-8, atol=1e-9)


def test_rpy_base_rot_convention():
    rpy = jnp.array([0.1, -0.2, 0.3])
    R = rpy_to_base_rot(rpy)
    np.testing.assert_allclose(np.asarray(R), np.asarray(sp.rpy_to_rot(rpy)).T)


def test_rpy_base_rot_np_matches_jax():
    # the staging path uses the host variant; it must agree with the
    # traced one bit-for-bit in convention (batched + single)
    from flobaroid_tpu.dynamics.engine import rpy_to_base_rot_np

    rng = np.random.default_rng(3)
    rpy = rng.uniform(-np.pi, np.pi, size=(17, 3))
    np.testing.assert_allclose(
        rpy_to_base_rot_np(rpy),
        np.asarray(rpy_to_base_rot(jnp.asarray(rpy))),
        rtol=1e-12, atol=1e-12,
    )
    one = rpy[0]
    np.testing.assert_allclose(
        rpy_to_base_rot_np(one),
        np.asarray(rpy_to_base_rot(jnp.asarray(one))),
        rtol=1e-12, atol=1e-12,
    )
