#!/usr/bin/env python
"""Generate the project icon (counterpart of the reference's
tools/generate_icon.py): a stylized serial arm over a Gram-matrix
backdrop, written as PNG at several sizes."""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="icon.png")
    p.add_argument("--sizes", default="256,64,32",
                   help="comma-separated pixel sizes (largest written to --out, "
                        "others as <out>_<size>.png)")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(4)
    G = rng.random((8, 8))
    G = G @ G.T  # a PSD "Gram" backdrop

    # stylized 3-link arm
    angles = np.cumsum([0.9, -0.7, 0.5])
    pts = [np.zeros(2)]
    for a, L in zip(angles, (1.0, 0.8, 0.6)):
        pts.append(pts[-1] + L * np.array([np.cos(a), np.sin(a)]))
    pts = np.asarray(pts)

    sizes = [int(s) for s in args.sizes.split(",")]
    for size in sizes:
        fig = plt.figure(figsize=(1, 1), dpi=size)
        ax = fig.add_axes([0, 0, 1, 1])
        ax.imshow(G, cmap="Blues", extent=(-0.6, 2.6, -0.8, 2.4), alpha=0.55)
        ax.plot(pts[:, 0], pts[:, 1], "-", color="#16324f", lw=size / 18,
                solid_capstyle="round")
        ax.plot(pts[:, 0], pts[:, 1], "o", color="#e8833a",
                ms=size / 10, mec="#16324f", mew=size / 80)
        ax.set_xlim(-0.6, 2.6)
        ax.set_ylim(-0.8, 2.4)
        ax.axis("off")
        out = args.out if size == max(sizes) else (
            args.out.rsplit(".", 1)[0] + f"_{size}.png"
        )
        fig.savefig(out, transparent=True)
        plt.close(fig)
        print(f"wrote {out} ({size}x{size})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
