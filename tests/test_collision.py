"""Capsule fitting, segment distances, collision pairs and gradients."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flobaroid_tpu.collision import (
    Capsule,
    CollisionModel,
    fit_capsule,
    segment_segment_distance,
)
from flobaroid_tpu.dynamics.engine import DynamicsEngine
from flobaroid_tpu.models.urdf import load_urdf
from flobaroid_tpu.utils.config import load_config

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ARM_URDF = os.path.join(REPO, "examples", "models", "sevenlink_arm.urdf")

WORLD_URDF = """
<robot name="world">
  <link name="floor">
    <visual>
      <origin xyz="0 0 -0.5"/>
      <geometry><box size="4 4 1"/></geometry>
    </visual>
  </link>
</robot>
"""


def d(p1, q1, p2, q2):
    return float(
        segment_segment_distance(
            jnp.asarray(p1, jnp.float64),
            jnp.asarray(q1, jnp.float64),
            jnp.asarray(p2, jnp.float64),
            jnp.asarray(q2, jnp.float64),
        )
    )


def test_segment_distance_cases():
    # parallel segments
    assert abs(d([0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]) - 1.0) < 1e-9
    # crossing (skew) segments
    assert abs(d([-1, 0, 0], [1, 0, 0], [0, -1, 1], [0, 1, 1]) - 1.0) < 1e-9
    # endpoint-to-endpoint
    assert abs(d([0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]) - 1.0) < 1e-9
    # degenerate points
    assert abs(d([0, 0, 0], [0, 0, 0], [0, 0, 2], [0, 0, 2]) - 2.0) < 1e-8
    # intersecting segments -> ~0
    assert d([-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0]) < 1e-5
    # SECOND segment degenerate (sphere capsule): closest point must be
    # the projection onto segment 1, not its start (s = clamp(-c/a) —
    # previously returned |p1 - p2| = 0.502 instead of 0.05)
    assert abs(d([0, 0, 0], [1, 0, 0], [0.5, 0.05, 0], [0.5, 0.05, 0]) - 0.05) < 1e-9
    # FIRST segment degenerate: symmetric case
    assert abs(d([0.5, 0.05, 0], [0.5, 0.05, 0], [0, 0, 0], [1, 0, 0]) - 0.05) < 1e-9


def test_segment_distance_gradient():
    # closest pair is p itself to endpoint (-1,2,0): grad = (p-b)/|p-b|
    f = lambda p: segment_segment_distance(
        p, jnp.array([1.0, 0, 0]), jnp.array([-2.0, 2, 0]), jnp.array([-1.0, 2, 0])
    )
    g = jax.grad(f)(jnp.array([0.0, 0.0, 0.0]))
    expect = np.array([1.0, -2.0, 0.0]) / np.sqrt(5.0)
    np.testing.assert_allclose(np.asarray(g), expect, atol=1e-6)


def test_capsule_fitting():
    tree = load_urdf(ARM_URDF)
    cap = fit_capsule(tree, "arm_1_link")
    assert cap is not None
    # cylinder r=0.06 l=0.2 at z=0.1: segment z in [0, 0.2], radius 0.06
    np.testing.assert_allclose(cap.radius, 0.06, atol=1e-9)
    zs = sorted([cap.p0[2], cap.p1[2]])
    np.testing.assert_allclose(zs, [0.0, 0.2], atol=1e-9)


def test_collision_model_pairs_and_world():
    tree = load_urdf(ARM_URDF)
    eng = DynamicsEngine(tree)
    world = load_urdf(WORLD_URDF)
    cfg = load_config(None)
    cm = CollisionModel(tree, eng, cfg, world_tree=world)
    # adjacent links excluded; world pairs = n capsule links
    for a, b in cm.self_pairs:
        ia, ib = tree.link_index[a], tree.link_index[b]
        assert cm._kin_dist[ia, ib] > 1
    assert len(cm.world_pairs) == len(cm.capsules)

    q0 = np.zeros(tree.num_dofs)
    dist = np.asarray(cm.distances(jnp.asarray(q0, jnp.float64)))
    assert dist.shape == (cm.num_pairs,)
    # arm pointing straight up from z=0.12: well above the floor top (z=0)
    names = dict(zip(cm.pair_names, dist))
    fl = [v for (a, b), v in zip(cm.pair_names, dist) if b == "floor"]
    assert min(fl) > 0.0

    # bend the arm far down: elbow pitch towards the floor
    q = np.zeros(tree.num_dofs)
    q[1] = 2.0
    q[3] = -2.0
    dist2 = np.asarray(cm.distances(jnp.asarray(q, jnp.float64)))
    fl2 = [v for (a, b), v in zip(cm.pair_names, dist2) if b == "floor"]
    assert min(fl2) < min(fl)  # closer to the floor when bent down


@pytest.mark.slow
@pytest.mark.timeout(120)
def test_collision_constraint_in_objective():
    """Collision clearances feed the trajectory objective as constraints."""
    from flobaroid_tpu.excitation.objective import TrajectoryObjective
    from flobaroid_tpu.excitation.optimizer import initial_candidate
    from flobaroid_tpu.excitation.trajectory import FourierSpec
    from flobaroid_tpu.model import Model

    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as dtmp:
        urdf = os.path.join(dtmp, "arm.urdf")
        shutil.copy(ARM_URDF, urdf)
        opt = load_config(
            None,
            overrides=dict(
                floatingBase=0,
                useStructuralRegressor=1,
                randomSamples=500,
                computeDtype="float64",
                excitationFrequency=50.0,
                trajectoryPulseMin=1.0,
                verbose=0,
            ),
        )
        model = Model(opt, urdf)
        world = load_urdf(WORLD_URDF)
        cm = CollisionModel(model.tree, model.engine, opt, world_tree=world)
        lims = model.limits
        spec = FourierSpec(
            nf=(2,) * model.num_dofs,
            limits=tuple((lims[j]["lower"], lims[j]["upper"]) for j in model.jointNames),
        )
        obj = TrajectoryObjective(
            model, opt, spec, extra_constraints_fn=cm.constraint_fn(step=5), dtype=jnp.float64
        )
        x0 = initial_candidate(spec, opt, np.random.default_rng(0))
        obj.calibrate_scale(x0)
        f, g, _ = obj.evaluate(x0)
        assert len(g) == 4 * model.num_dofs + cm.num_pairs
        assert np.all(np.isfinite(g))
        # gradient flows through the collision constraints
        _, grad = obj.penalized_value_and_grad(x0, 100.0)
        assert np.all(np.isfinite(grad))


@pytest.mark.slow
@pytest.mark.timeout(180)
def test_transition_collision_constraints():
    """Reference parity (trajectoryOptimizer.py:361-437): the min-jerk
    ramp configurations and representative swung base poses are included
    in the per-pair clearance constraint."""
    tree = load_urdf(ARM_URDF)
    eng = DynamicsEngine(tree)
    world = load_urdf(WORLD_URDF)
    cfg = load_config(None)
    cm = CollisionModel(tree, eng, cfg, world_tree=world)

    # periodic part stays safely up; the boundary config dives toward
    # the floor, so only the ramp samples see the close approach
    nd = tree.num_dofs
    N = 40
    Q = np.zeros((N, nd))
    Q[:, 1] = 0.3 + 0.1 * np.sin(np.linspace(0, 2 * np.pi, N))
    Q[0, 1] = Q[-1, 1] = 2.4  # deep bend at the boundaries

    g_plain = np.asarray(cm.constraint_fn(step=1)(jnp.asarray(Q)))
    fn = cm.trajectory_constraint_fn(step=1, n_transition=8)
    g_trans = np.asarray(fn(jnp.asarray(Q)))
    assert g_trans.shape == (cm.num_pairs,)
    # more configurations can only reduce clearance (raise g)
    assert np.all(g_trans >= g_plain - 1e-9)

    # swung base poses: tilt the base 60 deg so the arm sweeps toward
    # the floor in world frame — constraint must tighten vs upright
    th = np.deg2rad(60.0)
    Rt = np.array(
        [[1, 0, 0], [0, np.cos(th), -np.sin(th)], [0, np.sin(th), np.cos(th)]]
    )
    BR = np.tile(np.eye(3), (N, 1, 1))
    BR[N // 2] = Rt  # one strongly swung sample
    BP = np.zeros((N, 3))
    g_swung = np.asarray(fn(jnp.asarray(Q), jnp.asarray(BR), jnp.asarray(BP)))
    # the extreme swung pose is detected (largest rotation angle) and the
    # ramp configs re-checked against it: some floor pair must tighten,
    # and since the identity poses stay in the checked set, no pair's
    # ramp clearance may loosen
    floor = np.array([b == "floor" for (a, b) in cm.pair_names])
    assert np.any(g_swung[floor] > g_trans[floor] + 1e-3)
    assert np.all(g_swung[floor] >= g_trans[floor] - 1e-9)

    # differentiable end-to-end
    grad = jax.grad(lambda Q_: jnp.sum(fn(Q_)))(jnp.asarray(Q))
    assert np.all(np.isfinite(np.asarray(grad)))


@pytest.mark.timeout(90)
def test_zero_pose_overlaps_auto_ignored():
    """Reference parity (optimizer.py:544-563): capsule pairs overlapping
    at the zero pose are artifacts and must be dropped from the
    optimizer's constraint set, not render every trajectory infeasible."""
    REPO_M = os.path.join(REPO, "examples", "models", "humanoid30.urdf")
    tree = load_urdf(REPO_M)
    eng = DynamicsEngine(tree)
    cfg = load_config(None)
    cm = CollisionModel(tree, eng, cfg, world_tree=None)
    viol = [(a, b) for (a, b), d in cm.find_colliding_at_zero() if b not in cm.world_boxes]
    assert len(viol) >= 4  # Chest/Waist vs upper arms on this model

    cfg2 = dict(cfg)
    cfg2["ignoreLinkPairsForCollision"] = [list(p) for p in viol]
    cm2 = CollisionModel(tree, eng, cfg2, world_tree=None)
    assert cm2.num_pairs == cm.num_pairs - len(viol)
    assert cm2.find_colliding_at_zero() == []


def test_ignore_collision_between_groups():
    tree = load_urdf(ARM_URDF)
    eng = DynamicsEngine(tree)
    cfg = load_config(None)
    cm0 = CollisionModel(tree, eng, cfg)
    cfg2 = dict(cfg)
    cfg2["ignoreCollisionBetweenGroups"] = [
        [["arm_1_link", "arm_2_link"], ["arm_6_link", "arm_7_link"]]
    ]
    cm1 = CollisionModel(tree, eng, cfg2)
    dropped = {tuple(sorted(p)) for p in cm0.self_pairs} - {
        tuple(sorted(p)) for p in cm1.self_pairs
    }
    assert dropped  # at least one cross-group pair existed and is gone
    for a, b in dropped:
        assert {a, b} <= {"arm_1_link", "arm_2_link", "arm_6_link", "arm_7_link"}
