#!/usr/bin/env python
"""F/T sensor-placement identifiability study on the 30-DOF humanoid.

Reproduces the reference's sensor-budget analysis (reference
documentation/design_notes.md:98-110): a structural identifiability
analysis bounds what adding 6-axis F/T sensors can recover from the
null space — on the reference's walkman each added F/T recovered only
~3 of ~207 null directions, roughly additive for disjoint placements.

Here: Model.structural_identifiability() gives the triple
(individually identifiable / base directions / null space), and
Model.sensor_placement_study() measures the structural rank gain of
candidate placements via the engine's subtree-wrench regressor rows.

Measured (round 4, f64, 2000 random states): humanoid30 triple
83 / 220 / 120 of 340; foot F/T pair +20 (the fixed-joint foot links'
full parameter blocks separate from their shanks), wrist pair +6
(+3 per sensor — the reference's number), all four +26 (additive).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="examples/models/humanoid30.urdf")
    ap.add_argument("--samples", type=int, default=2000)
    ap.add_argument("--cpu", action="store_true", help="force CPU (f64)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from flobaroid_tpu.model import Model
    from flobaroid_tpu.utils.config import load_config

    o = load_config(None)
    o.update(dict(verbose=0, useStructuralRegressor=1, floatingBase=1,
                  identifyFrictionSimultaneously=1,
                  identifySymmetricVelFriction=1,
                  randomSamples=args.samples,
                  computeDtype="float64" if args.cpu else "float32"))
    m = Model(o, args.model)

    tri = m.structural_identifiability()
    print(f"triple: {tri['individually_identifiable']} individually "
          f"identifiable / {tri['base_directions']} base / "
          f"{tri['null_directions']} null of {tri['n_inertial_params']}")

    names = set(m.linkNames)
    sets = {}
    feet = [n for n in ("L_foot_ft", "R_foot_ft") if n in names]
    wrists = [n for n in ("LArm_7", "RArm_7") if n in names]
    if feet:
        sets["feet"] = feet
    if wrists:
        sets["wrists"] = wrists
    if feet and wrists:
        sets["feet+wrists"] = feet + wrists
    if not sets:
        print("no default sensor links found in this model; pass a "
              "humanoid30-style URDF or edit the candidate sets")
        return

    t0 = time.time()
    study = m.sensor_placement_study(sets, n_samples=args.samples)
    print(f"baseline inertial rank {study['baseline_rank']} "
          f"({study['null_directions']} null) [{time.time()-t0:.1f} s]")
    for k, v in study["sets"].items():
        print(f"  + {k} ({', '.join(v['links'])}): rank {v['rank']} "
              f"(gain +{v['gain']})")


if __name__ == "__main__":
    main()
