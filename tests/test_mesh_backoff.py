"""Mesh-verification backoff recovery (VERDICT r2 weak #1).

When the exact-geometry tier rejects the capsule-feasible winner, the
optimizer must NOT destroy the trajectory with blind 0.85^k amplitude
shrinkage: it inflates the violating pairs' capsule margins by the
measured capsule-vs-mesh gap, re-runs an augmented-Lagrangian stage and
re-verifies (the reference re-optimizes through its normal loop,
reference excitation/optimizer.py:1099-1132).

The mesh tier is stubbed with a deterministic 'geometry' that sits a
fixed distance INSIDE the capsule surface of the closest pair — chosen
on first call so exactly the binding pair violates — which exercises
the full recovery loop independent of mesh-fitting specifics.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ARM_URDF = os.path.join(REPO, "examples", "models", "sevenlink_arm.urdf")


class FakeMeshVerifier:
    """Exact-geometry stand-in: for ONE pair whose clearance varies
    strongly with configuration (so mesh feasibility is achievable by
    re-shaping the trajectory, not only by shrinking it), the 'mesh'
    sits delta inside the capsule surface; delta is picked on the first
    verify() so that pair violates by ~4 mm. Same constructor/verify
    signature as collision_mesh.MeshCollisionVerifier."""

    geometry = None  # class-level (pair index, delta): fixed across rebuilds

    def __init__(self, tree, engine, config, capsule_model, world_tree=None):
        self.cm = capsule_model
        self.pair_names = capsule_model.pair_names

    @property
    def num_pairs(self):
        return len(self.pair_names)

    def _raw_per_sample(self, Q, base_rot, base_pos, step):
        """(N, P) margin-free capsule clearances."""
        import jax

        cm = self.cm
        Qs = jnp.asarray(np.asarray(Q)[::step])
        if base_rot is None:
            D = jax.vmap(lambda q: cm.distances(q))(Qs)
        else:
            BR = jnp.asarray(np.asarray(base_rot)[::step])
            BP = (
                jnp.zeros((len(Qs), 3))
                if base_pos is None
                else jnp.asarray(np.asarray(base_pos)[::step])
            )
            D = jax.vmap(cm.distances)(Qs, BR, BP)
        return np.asarray(D, dtype=float) + np.asarray(cm.margins)[None, :]

    def verify(self, Q, base_rot=None, base_pos=None, step=1, tol=1e-3):
        D = self._raw_per_sample(Q, base_rot, base_pos, step)
        if FakeMeshVerifier.geometry is None:
            rng_per_pair = D.max(axis=0) - D.min(axis=0)
            j = int(np.argmax(rng_per_pair))
            assert rng_per_pair[j] > 0.01, "no configuration-dependent pair"
            FakeMeshVerifier.geometry = (j, float(D[:, j].min()) + 0.002)
        j, delta = FakeMeshVerifier.geometry
        mesh_j = float(D[:, j].min()) - delta
        if mesh_j < tol:
            return False, [(self.pair_names[j], mesh_j)]
        return True, []


@pytest.mark.slow
@pytest.mark.timeout(1200)
def test_mesh_backoff_recovers_with_small_dopt_loss(monkeypatch):
    from flobaroid_tpu import collision_mesh
    from flobaroid_tpu.excitation.optimizer import optimize_trajectory
    from flobaroid_tpu.model import Model
    from flobaroid_tpu.utils.config import load_config

    monkeypatch.setattr(collision_mesh, "MeshCollisionVerifier", FakeMeshVerifier)
    FakeMeshVerifier.geometry = None

    opt = load_config(None, overrides=dict(
        floatingBase=0,
        useStructuralRegressor=1, randomSamples=500,
        computeDtype="float64",
        trajectoryDuration=2.0, trajectorySamplingRate=50.0,
        trajectoryDefaultNf=1,
        checkCollisions=1, collisionMode="convex",
        globalOptSize=8, globalOptIterations=2, globalOptRestarts=1,
        localOptIterations=1, localOptStages=2,
        verbose=0,
    ))
    model = Model(dict(opt), ARM_URDF)
    x, spec, obj, info = optimize_trajectory(
        model, dict(opt), rng=np.random.default_rng(4)
    )

    # the fake geometry forced a violation; recovery must end verified
    assert "dopt_before_backoff" in info, "stub never triggered a violation"
    assert info["mesh_collision_ok"], "recovery did not reach mesh feasibility"
    f0, f1 = info["dopt_before_backoff"], info["dopt_after_backoff"]
    loss = (f1 - f0) / abs(f0)
    assert loss < 0.05, f"D-opt loss {100 * loss:.1f}% exceeds 5%"
    assert info["feasible"]
