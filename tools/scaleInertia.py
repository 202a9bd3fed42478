#!/usr/bin/env python
"""Scale the inertial parameters of a URDF by a constant factor
(counterpart of the reference's tools/scaleInertia.py)."""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from flobaroid_tpu.models.urdf import load_urdf, replace_params_in_urdf  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_urdf")
    p.add_argument("output_urdf")
    p.add_argument("--mass-scale", type=float, default=1.0)
    p.add_argument("--inertia-scale", type=float, default=1.0)
    args = p.parse_args()
    tree = load_urdf(args.input_urdf)
    pi = tree.std_params()
    for i in range(tree.num_links):
        pi[i * 10 : i * 10 + 4] *= args.mass_scale
        pi[i * 10 + 4 : i * 10 + 10] *= args.inertia_scale
    replace_params_in_urdf(args.input_urdf, args.output_urdf, pi, tree.link_names)
    print(f"wrote {args.output_urdf}")


if __name__ == "__main__":
    main()
