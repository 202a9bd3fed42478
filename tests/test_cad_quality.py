"""CAD-regularization quality-study ordering on the suspended humanoid.

The reference's flagship estimation-quality result (reference
documentation/analysis_findings.md:45-68, geometric machinery at
identification/sdp.py:367-448): on a suspended humanoid with simulated
measurements from a perturbed real model, the L2 distance of the
identified parameters to the real model improves

    uniform > observability > geometric ~= geometric+obs

(reference, 29-DOF WALK-MAN: base 4.80 / 2.82 / 2.25 / 2.26; std
4.60 / 3.41 / 3.30 / 3.31). This test runs the same study on the
checked-in 30-DOF humanoid artifacts (real model = 8% uniformly
perturbed CAD, ball-joint suspended base motion from
excitation/suspended.py, effect-chain measurement noise) and asserts
the ordering with tolerance. Full-scale numbers: docs/design_notes.md.
"""

import os

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CAD = os.path.join(REPO, "examples", "models", "humanoid30.urdf")
REAL = os.path.join(REPO, "examples", "models", "humanoid30_real.urdf")
MEAS = os.path.join(REPO, "examples", "data", "humanoid30_suspended_cad.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REAL) and os.path.exists(MEAS)),
    reason="CAD-study artifacts not present (examples/cad_quality_study.py --generate)",
)


@pytest.fixture(scope="module")
def study():
    from flobaroid_tpu.identification.cad_study import run_cad_study

    # skipSamples=1 halves the sample count (CI budget); the ordering
    # is the scale-robust part of the result
    return run_cad_study(CAD, REAL, MEAS,
                         base_overrides=dict(skipSamples=1))


def test_all_modes_solve(study):
    for mode in ("uniform", "observability", "geometric", "geometric_obs"):
        assert str(study[mode]["status"]).startswith("optimal"), (
            mode, study[mode])
        assert study[mode]["res_error_pct"] < 5.0


def test_base_distance_ordering(study):
    b = {m: study[m]["base_dist"] for m in study if m != "apriori"}
    # uniform fills only the structurally non-identifiable directions
    # with CAD — clearly worst
    assert b["uniform"] > 1.05 * b["observability"], b
    # the geometric (whitened log-det Bregman) prior beats the Euclidean
    # observability pull
    assert b["observability"] > 1.02 * b["geometric"], b
    # observability-weighting the geometric prior is a no-op on a
    # uniformly perturbed CAD (reference analysis_findings.md:57-62)
    assert abs(b["geometric"] - b["geometric_obs"]) < 0.15 * b["geometric"], b
    # and the data actually improved on the a-priori (zero-information)
    # distance for the geometric modes
    assert b["geometric"] < study["apriori"]["base_dist"], (
        b, study["apriori"])


def test_std_distance_ordering(study):
    # std distances: uniform is catastrophically worst (unregularized
    # null-space excursions, only the non-id params pulled to CAD);
    # observability and geometric are a near-tie both here and in the
    # reference (3.41 vs 3.30, analysis_findings.md:51-56) — assert the
    # robust structure, not a sub-percent ranking
    s = {m: study[m]["std_dist"] for m in study if m != "apriori"}
    assert s["uniform"] > 2.0 * s["observability"], s
    assert abs(s["observability"] - s["geometric"]) < 0.2 * s["geometric"], s
    assert abs(s["geometric"] - s["geometric_obs"]) < 0.15 * s["geometric"], s
