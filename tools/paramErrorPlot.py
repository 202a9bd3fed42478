#!/usr/bin/env python
"""Bar plot of identified-vs-real standard parameter errors
(counterpart of the reference's tools/paramErrorPlot.py)."""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from flobaroid_tpu.models.urdf import load_urdf  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("identified_urdf")
    p.add_argument("real_urdf")
    p.add_argument("--out", default="param_errors.png")
    args = p.parse_args()
    t_id = load_urdf(args.identified_urdf)
    t_re = load_urdf(args.real_urdf)
    pi_id = t_id.std_params()
    pi_re = t_re.std_params()
    err = pi_id - pi_re
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(14, 4), constrained_layout=True)
    ax.bar(range(len(err)), err)
    ax.set_xlabel("standard parameter index")
    ax.set_ylabel("identified - real")
    ax.grid(alpha=0.3)
    fig.savefig(args.out, dpi=120)
    rel = np.linalg.norm(err) / max(np.linalg.norm(pi_re), 1e-12)
    print(f"relative L2 error {rel:.4f}; wrote {args.out}")


if __name__ == "__main__":
    main()
