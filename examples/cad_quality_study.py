#!/usr/bin/env python
"""CAD-regularization quality study on the suspended 30-DOF humanoid.

Reproduces the reference's flagship estimation-quality result
(reference documentation/analysis_findings.md:45-68): identified base-/
std-parameter L2 distance to the real model improves
uniform > observability > geometric ~= geometric+obs.

Default: run the study from the checked-in artifacts
(examples/models/humanoid30_real.urdf + examples/data/
humanoid30_suspended_cad.npz). With --generate, rebuild the artifacts
from scratch (perturbed real model, ball-joint suspended base motion
via excitation/suspended.py, effect-chain measurement noise) — takes a
few minutes on CPU.

Measured (round 4, N=2000 @ 50 Hz, 8% uniform perturbation, seed 0):
see docs/design_notes.md "CAD-regularization quality study".
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAD = "examples/models/humanoid30.urdf"
REAL = "examples/models/humanoid30_real.urdf"
MEAS = "examples/data/humanoid30_suspended_cad.npz"


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--generate", action="store_true",
                   help="regenerate the real model + measurement artifacts")
    p.add_argument("--duration", type=float, default=40.0)
    p.add_argument("--noise", type=float, default=0.08)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from flobaroid_tpu.identification.cad_study import (
        format_table, generate_suspended_measurements,
        make_perturbed_real_urdf, run_cad_study)

    if args.generate or not (os.path.exists(REAL) and os.path.exists(MEAS)):
        t0 = time.time()
        rel = make_perturbed_real_urdf(CAD, REAL, noise=args.noise,
                                       seed=args.seed)
        print(f"real model written (rel param dist {rel:.3f}, "
              f"{time.time()-t0:.1f}s)", flush=True)
        t0 = time.time()
        meas = generate_suspended_measurements(
            REAL, "/tmp/m_full.npz", duration=args.duration, freq=50.0,
            seed=args.seed)
        keep = {}
        for k, v in meas.items():
            a = np.asarray(v)
            keep[k] = a.astype(np.float32) if a.dtype == np.float64 and a.ndim else a
        os.makedirs(os.path.dirname(MEAS), exist_ok=True)
        np.savez_compressed(MEAS, **keep)
        print(f"measurements written ({time.time()-t0:.1f}s, "
              f"N={len(meas['times'])})", flush=True)

    t0 = time.time()
    res = run_cad_study(CAD, REAL, MEAS, verbose=True)
    print(f"\nstudy wall: {time.time()-t0:.1f}s")
    print(format_table(res))
    base = {m: res[m]["base_dist"] for m in
            ("uniform", "observability", "geometric", "geometric_obs")}
    ok = (base["uniform"] > base["observability"] > base["geometric"] * 0.999
          and abs(base["geometric"] - base["geometric_obs"])
          < 0.15 * base["geometric"])
    print("reference ordering (uniform > observability > geometric ~= "
          f"geo+obs): {'REPRODUCED' if ok else 'NOT reproduced'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
