#!/usr/bin/env python
"""Create a perturbed copy of a URDF (for identification test models).

Counterpart of the reference's tools/createNoisyURDF.py: gaussian-
perturb masses, COMs and inertias while keeping each link physically
consistent."""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from flobaroid_tpu.models.urdf import load_urdf, replace_params_in_urdf  # noqa: E402
from flobaroid_tpu.utils.helpers import is_physical_consistent  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_urdf")
    p.add_argument("output_urdf")
    p.add_argument("--noise", type=float, default=0.1, help="relative std of perturbation")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    tree = load_urdf(args.input_urdf)
    pi = tree.std_params()
    rng = np.random.default_rng(args.seed)
    for attempt in range(100):
        noisy = pi * (1.0 + args.noise * rng.standard_normal(pi.shape))
        # keep masses positive
        noisy[0::10] = np.abs(noisy[0::10])
        if is_physical_consistent(noisy, tree.num_links):
            break
    else:
        print("warning: could not find a consistent perturbation; writing last sample")
    replace_params_in_urdf(args.input_urdf, args.output_urdf, noisy, tree.link_names)
    rel = np.linalg.norm(noisy - pi) / np.linalg.norm(pi)
    print(f"wrote {args.output_urdf} (relative param distance {rel:.3f})")


if __name__ == "__main__":
    main()
