"""Optimizer robustness: interrupt best-so-far, augmented-Lagrangian
feasibility without amplitude repair, restart bookkeeping.

Mirrors the reference's guarantees: Ctrl-C at any stage returns a
usable trajectory (trajectoryOptimizer.py:860-882,
optimizer.py:1050-1060) and the local stage ends feasible
(IPOPT interior feasibility, optimizer.py:1138-1250)."""

import os

import numpy as np
import pytest

from flobaroid_tpu.excitation import optimizer as optmod
from flobaroid_tpu.excitation.optimizer import (
    global_search,
    initial_candidate,
    local_refine,
)
from flobaroid_tpu.excitation.objective import TrajectoryObjective
from flobaroid_tpu.excitation.trajectory import FourierSpec
from flobaroid_tpu.model import Model
from flobaroid_tpu.utils.config import load_config

import jax.numpy as jnp

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ARM_URDF = os.path.join(REPO, "examples", "models", "sevenlink_arm.urdf")


@pytest.fixture(scope="module")
def arm_obj():
    opt = load_config(
        None,
        overrides=dict(
            floatingBase=0,
            useStructuralRegressor=1,
            randomSamples=800,
            computeDtype="float64",
            excitationFrequency=50.0,
            trajectoryPulseMin=1.0,
            trajectoryPulseMax=2.0,
            trajectoryDefaultNf=2,
            globalOptSize=10,
            globalOptIterations=3,
            globalOptRestarts=2,
            localOptIterations=2,
            localOptStages=4,
            checkCollisions=0,
            verbose=0,
        ),
    )
    model = Model(opt, ARM_URDF)
    nf = tuple([2] * model.num_dofs)
    lims = model.limits
    spec = FourierSpec(
        nf=nf,
        limits=tuple((lims[j]["lower"], lims[j]["upper"]) for j in model.jointNames),
    )
    obj = TrajectoryObjective(model, opt, spec, dtype=jnp.float64)
    x0 = initial_candidate(spec, opt, np.random.default_rng(0))
    obj.calibrate_scale(x0)
    return obj, opt


def test_global_search_interrupt_returns_best_so_far(arm_obj):
    obj, opt = arm_obj
    calls = {"n": 0}

    def stop_after_two():
        calls["n"] += 1
        return calls["n"] > 2

    x, f, feas = global_search(obj, opt, should_stop=stop_after_two)
    # stopped early, but a candidate (with its score) was still returned
    assert x is not None and np.all(np.isfinite(x))
    assert np.isfinite(f)


def test_local_refine_interrupt_returns_start(arm_obj):
    obj, opt = arm_obj
    x0 = initial_candidate(obj.spec, opt, np.random.default_rng(1))
    x, f, feas = local_refine(obj, opt, x0, should_stop=lambda: True)
    assert np.all(np.isfinite(x))


@pytest.mark.slow
@pytest.mark.timeout(120)
def test_augmented_lagrangian_feasible_without_repair(arm_obj, monkeypatch):
    """From an infeasible start (oversized coefficients -> velocity/
    torque violations), the AL stage must end feasible WITHOUT the
    amplitude-backoff repair (VERDICT r1 #4 'done' criterion)."""
    obj, opt = arm_obj
    rng = np.random.default_rng(2)
    x0 = initial_candidate(obj.spec, opt, rng)
    x0[1 + obj.spec.num_dofs:] *= 3.0  # blow up amplitudes
    f0, g0, _ = obj.evaluate(x0)
    assert not obj.feasible(g0), "start must be infeasible for this test"

    def no_repair(*a, **k):
        raise AssertionError("amplitude repair must not be needed")

    monkeypatch.setattr(optmod, "amplitude_repair", no_repair)
    x, f, feas = local_refine(obj, opt, x0)
    assert feas, "AL refinement did not reach feasibility"
    fv, gv, _ = obj.evaluate(x)
    assert obj.feasible(gv)


def test_global_restarts_track_best(arm_obj):
    obj, opt = arm_obj
    cfg = dict(opt)
    cfg.update(globalOptSize=8, globalOptIterations=2, globalOptRestarts=3)
    x, f, feas = global_search(obj, cfg, rng=np.random.default_rng(3))
    assert np.isfinite(f) and np.all(np.isfinite(x))


@pytest.mark.slow
@pytest.mark.timeout(120)
def test_checkpoint_resume_matches_uninterrupted(arm_obj, tmp_path):
    """Mid-optimization resume (beyond the reference): a run killed
    after N generations and resumed from its checkpoint must reproduce
    the uninterrupted run exactly (same rng state, counters, best)."""
    obj, opt = arm_obj
    cfg = dict(opt)
    cfg.update(globalOptSize=8, globalOptIterations=4, globalOptRestarts=2,
               globalOptAmplitudeRepair=0,
               trajectoryCheckpointFile=str(tmp_path / "opt_ckpt.npz"))

    # uninterrupted reference run (no checkpoint file)
    ref_cfg = dict(cfg, trajectoryCheckpointFile="")
    x_ref, f_ref, _ = global_search(obj, ref_cfg, rng=np.random.default_rng(7))

    # interrupted run: stop after 3 generations, checkpoint retained
    calls = {"n": 0}
    x1, f1, _ = global_search(
        obj, cfg, rng=np.random.default_rng(7),
        should_stop=lambda: calls.__setitem__("n", calls["n"] + 1) or calls["n"] > 3,
    )
    assert os.path.exists(cfg["trajectoryCheckpointFile"])

    # resume with a FRESH rng (state comes from the checkpoint)
    x2, f2, _ = global_search(obj, cfg, rng=np.random.default_rng(999))
    np.testing.assert_allclose(x2, x_ref, rtol=0, atol=0)
    assert f2 == f_ref

    # local stage: interrupt after one stage, resume completes
    cfg_l = dict(cfg, localOptStages=3, localOptIterations=1)
    x0 = initial_candidate(obj.spec, cfg_l, np.random.default_rng(5))
    calls = {"n": 0}
    local_refine(obj, cfg_l, x0,
                 should_stop=lambda: calls.__setitem__("n", calls["n"] + 1)
                 or calls["n"] > 1)
    assert os.path.exists(cfg_l["trajectoryCheckpointFile"])
    x3, f3, feas3 = local_refine(obj, cfg_l, x0)
    assert np.all(np.isfinite(x3))


def test_checkpoint_resume_preserves_seeds(tmp_path):
    """A run killed BEFORE the seeded generation evaluates (the
    checkpoint saves pre-evaluation) must re-inject the seed solutions
    on resume even when the resuming caller does not pass them again
    (VERDICT r2 #8): seeds ride inside the checkpoint."""
    from flobaroid_tpu.excitation.optimizer import build_bounds, global_search
    from flobaroid_tpu.excitation.trajectory import FourierSpec

    spec = FourierSpec(nf=(1, 1), limits=((-1.0, 1.0), (-1.0, 1.0)))
    cfg = dict(
        globalOptSize=8, globalOptIterations=2, globalOptRestarts=1,
        globalOptAmplitudeRepair=0,
        trajectoryCheckpointFile=str(tmp_path / "seed_ckpt.npz"),
    )
    lo, hi = build_bounds(spec, cfg)
    seed = lo + 0.3717 * (hi - lo)  # recognizable, strictly inside bounds

    class StubObj:
        """Minimal objective: quadratic distance to a target; records
        every evaluated candidate row."""

        def __init__(self, die_on_first=False):
            self.spec = spec
            self.rows = []
            self.die = die_on_first

        def evaluate_batch(self, X):
            if self.die:
                self.die = False
                raise RuntimeError("simulated kill mid-generation")
            X = np.asarray(X, float)
            self.rows.append(X.copy())
            f = np.sum((X - 0.1) ** 2, axis=1)
            g = -np.ones((len(X), 1))  # always feasible
            return f, g, np.zeros(len(X), int)

        def evaluate(self, x):
            f, g, n = self.evaluate_batch(np.asarray(x)[None, :])
            return float(f[0]), g[0], int(n[0])

        def feasible(self, g):
            return bool(np.all(np.asarray(g) <= 0))

    # run 1: dies during the seeded generation, after the checkpoint
    with pytest.raises(RuntimeError):
        global_search(StubObj(die_on_first=True), cfg, seeds=[seed],
                      rng=np.random.default_rng(11))
    assert os.path.exists(cfg["trajectoryCheckpointFile"])

    # resume WITHOUT seeds: the checkpoint must restore them
    obj2 = StubObj()
    global_search(obj2, cfg, rng=np.random.default_rng(999))
    evaluated = np.concatenate(obj2.rows)
    match = np.min(np.linalg.norm(evaluated - np.clip(seed, lo, hi), axis=1))
    assert match < 1e-12, "seed was not re-injected on resume"
