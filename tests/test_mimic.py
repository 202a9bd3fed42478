"""URDF robustness: unsupported joint types fail loudly; <mimic>
joints are fully supported (VERDICT r4 #5).

The reference inherits full URDF semantics from iDynTree ModelLoader
(reference identification/model.py:60-67); a parser that silently
treats planar/floating/mimic joints as fixed drops DOFs and produces
wrong identifications with no error. Here:

  * planar / floating / unknown joint types raise with a clear message,
  * mimic joints (q_m = mult*q_src + offset) carry no independent DOF
    but move, transmit forces, and contribute generalized torque
    mult * tau_m to their source dof,
  * correctness oracle: the energy-based Euler-Lagrange formulation
    (dynamics/lagrangian.py) differentiates through fk, so the mimic
    chain rule is automatic there — the recursive engine must agree,
  * the regressor identity Y @ pi == RNEA must keep holding,
  * frame_jacobian must match jax.jacobian of forward kinematics.
"""

import numpy as np
import pytest

HEADER = """<robot name="mimicbot">
  <link name="base"><inertial><mass value="4"/>
    <origin xyz="0 0 0.05"/>
    <inertia ixx="0.05" iyy="0.05" izz="0.02" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <link name="l1"><inertial><mass value="2"/>
    <origin xyz="0.1 0 0"/>
    <inertia ixx="0.01" iyy="0.03" izz="0.03" ixy="0.001" ixz="0" iyz="0"/>
  </inertial></link>
  <link name="l2"><inertial><mass value="1.5"/>
    <origin xyz="0.12 0.01 0"/>
    <inertia ixx="0.008" iyy="0.02" izz="0.02" ixy="0" ixz="0.001" iyz="0"/>
  </inertial></link>
  <link name="l3"><inertial><mass value="0.8"/>
    <origin xyz="0.08 0 0.01"/>
    <inertia ixx="0.004" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
  </inertial></link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.1" rpy="0 0 0"/><axis xyz="0 0 1"/>
    <limit lower="-2" upper="2" effort="50" velocity="3"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0.2 0 0" rpy="0.1 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-2" upper="2" effort="50" velocity="3"/>
  </joint>
"""

MIMIC_URDF = HEADER + """
  <joint name="j3" type="revolute">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="0.15 0 0" rpy="0 0.05 0"/><axis xyz="0 1 0"/>
    <limit lower="-3" upper="3" effort="50" velocity="3"/>
    <mimic joint="j2" multiplier="-1.5" offset="0.2"/>
  </joint>
</robot>
"""

PLAIN_URDF = HEADER + """
  <joint name="j3" type="revolute">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="0.15 0 0" rpy="0 0.05 0"/><axis xyz="0 1 0"/>
    <limit lower="-3" upper="3" effort="50" velocity="3"/>
  </joint>
</robot>
"""


def _write(tmp_path, text, name="robot.urdf"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_unsupported_joint_types_raise(tmp_path):
    from flobaroid_tpu.models.urdf import load_urdf

    for jt in ("planar", "floating", "ball"):
        bad = HEADER + f"""
  <joint name="j3" type="{jt}">
    <parent link="l2"/><child link="l3"/>
  </joint>
</robot>
"""
        with pytest.raises(ValueError, match="unsupported joint type"):
            load_urdf(_write(tmp_path, bad, f"bad_{jt}.urdf"))


def test_mimic_of_missing_or_mimic_source_raises(tmp_path):
    from flobaroid_tpu.models.urdf import load_urdf

    bad = HEADER + """
  <joint name="j3" type="revolute">
    <parent link="l2"/><child link="l3"/>
    <axis xyz="0 1 0"/><limit lower="-3" upper="3" effort="9" velocity="3"/>
    <mimic joint="nonexistent"/>
  </joint>
</robot>
"""
    with pytest.raises(ValueError, match="mimic joint"):
        load_urdf(_write(tmp_path, bad, "bad_src.urdf"))


def test_mimic_tree_layout(tmp_path):
    from flobaroid_tpu.models.urdf import load_urdf

    tree = load_urdf(_write(tmp_path, MIMIC_URDF))
    assert tree.num_dofs == 2
    assert tree.dof_names == ["j1", "j2"]
    assert len(tree.mimic_map) == 1
    ji, src, mult, off = tree.mimic_map[0]
    assert tree.joints[ji].name == "j3"
    assert src == 1 and mult == -1.5 and off == 0.2


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    from flobaroid_tpu.dynamics.engine import DynamicsEngine
    from flobaroid_tpu.models.urdf import load_urdf

    tmp = tmp_path_factory.mktemp("mimic")
    t_mim = load_urdf(_write(tmp, MIMIC_URDF, "mim.urdf"))
    t_pln = load_urdf(_write(tmp, PLAIN_URDF, "plain.urdf"))
    return DynamicsEngine(t_mim), DynamicsEngine(t_pln), t_mim, t_pln


def test_mimic_fk_matches_expanded_plain_model(engines):
    """FK of the 2-DOF mimic model at q must equal FK of the plain
    3-DOF model at [q1, q2, -1.5*q2 + 0.2]."""
    import jax.numpy as jnp

    eng_m, eng_p, _, _ = engines
    rng = np.random.default_rng(0)
    for _ in range(3):
        q = rng.uniform(-1, 1, 2)
        q3 = np.array([q[0], q[1], -1.5 * q[1] + 0.2])
        Rm, pm = eng_m.fk(jnp.asarray(q))
        Rp, pp = eng_p.fk(jnp.asarray(q3))
        np.testing.assert_allclose(np.asarray(Rm), np.asarray(Rp), atol=1e-12)
        np.testing.assert_allclose(np.asarray(pm), np.asarray(pp), atol=1e-12)


def test_mimic_rnea_matches_lagrangian_oracle(engines):
    """The recursive engine must agree with the independent
    Euler-Lagrange formulation, which gets the mimic chain rule from
    autodiff through fk — the strongest possible oracle here."""
    import jax.numpy as jnp

    from flobaroid_tpu.dynamics import lagrangian as lag

    eng_m, _, tree, _ = engines
    pi = jnp.asarray(tree.std_params())
    rng = np.random.default_rng(1)
    for _ in range(3):
        q, dq, ddq = (jnp.asarray(rng.uniform(-1, 1, 2)) for _ in range(3))
        tau_eng = eng_m.inverse_dynamics(pi, q, dq, ddq, floating=False)
        tau_lag = lag.inverse_dynamics_fixed(eng_m, pi, q, dq, ddq)
        np.testing.assert_allclose(
            np.asarray(tau_eng), np.asarray(tau_lag), rtol=1e-9, atol=1e-9
        )


def test_mimic_regressor_identity(engines):
    """Y(q,dq,ddq) @ pi == RNEA(q,dq,ddq; pi) with mimic joints, fixed
    and floating base (the reference's core invariant,
    tests/test_regressors.py:16-60)."""
    import jax.numpy as jnp

    eng_m, _, tree, _ = engines
    pi = jnp.asarray(tree.std_params())
    rng = np.random.default_rng(2)
    q, dq, ddq = (jnp.asarray(rng.uniform(-1, 1, 2)) for _ in range(3))
    Y = eng_m.regressor(q, dq, ddq)
    tau = eng_m.inverse_dynamics(pi, q, dq, ddq, floating=False)
    np.testing.assert_allclose(np.asarray(Y @ pi), np.asarray(tau),
                               rtol=1e-9, atol=1e-9)

    from flobaroid_tpu.dynamics.spatial import rpy_to_rot

    br = jnp.asarray(rpy_to_rot(np.array([0.1, -0.2, 0.3])).T)
    bv = jnp.asarray(rng.uniform(-1, 1, 6))
    ba = jnp.asarray(rng.uniform(-1, 1, 6))
    Yf = eng_m.regressor(q, dq, ddq, br, bv, ba)
    tauf = eng_m.inverse_dynamics(pi, q, dq, ddq, br, bv, ba)
    np.testing.assert_allclose(np.asarray(Yf @ pi), np.asarray(tauf),
                               rtol=1e-9, atol=1e-9)


def test_mimic_frame_jacobian_matches_autodiff(engines):
    """frame_jacobian's joint columns must equal d(p_frame)/dq from
    jax.jacobian through fk (linear rows; world frame, identity base)."""
    import jax
    import jax.numpy as jnp

    eng_m, _, tree, _ = engines
    li = tree.link_index["l3"]
    q = jnp.asarray(np.array([0.3, -0.7]))
    J = eng_m.frame_jacobian(li, q)  # (6, 6+2)
    Jq_lin = np.asarray(J[:3, 6:])
    Jad = np.asarray(jax.jacobian(lambda qq: eng_m.fk(qq)[1][li])(q))
    np.testing.assert_allclose(Jq_lin, Jad, rtol=1e-9, atol=1e-10)


@pytest.mark.timeout(120)
def test_mimic_identification_end_to_end(tmp_path):
    """Simulate torques with the known mimic model and identify: the
    base-parameter estimate must reproduce the generating model's
    projection and the torque residual must vanish."""
    from flobaroid_tpu.identification.identifier import Identification
    from flobaroid_tpu.utils.config import load_config

    urdf = _write(tmp_path, MIMIC_URDF)
    opt = load_config(None, overrides=dict(
        floatingBase=0, simulateTorques=1, estimateWith="std",
        useStructuralRegressor=1, randomSamples=1000,
        constrainToConsistent=0, verbose=0,
    ))
    idf = Identification(opt, urdf)
    nd = idf.model.num_dofs
    assert nd == 2
    rng = np.random.default_rng(3)
    n = 600
    samples = {
        "positions": rng.uniform(-1.5, 1.5, (n, nd)),
        "velocities": rng.uniform(-2, 2, (n, nd)),
        "accelerations": rng.uniform(-3, 3, (n, nd)),
        "torques": np.zeros((n, nd)),
        "times": np.arange(n) / 200.0,
        "frequency": np.array(200.0),
    }
    idf.data.init_from_data(samples)
    idf.estimateParameters()
    assert idf.res_error < 0.05  # percent (f32 compute-path noise floor)
    xb_true = idf.model.K @ idf.model.xStdModel[idf.model.identified_params]
    rel = np.linalg.norm(np.asarray(idf.model.xBase) - xb_true) / np.linalg.norm(xb_true)
    assert rel < 1e-3
