#!/usr/bin/env python
"""Print a summary of a measurements/trajectory npz file (keys, shapes,
ranges); counterpart of the reference's tools/inspectMeasurements.py."""

import sys

import numpy as np


def main():
    files = [f for f in sys.argv[1:] if not f.startswith("-")]
    if not files or "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        print("usage: inspectMeasurements.py file.npz [file2.npz ...]")
        return
    for fn in files:
        print(f"== {fn}")
        with np.load(fn, allow_pickle=True, encoding="latin1") as f:
            for k in f.files:
                a = f[k]
                if a.ndim == 0:
                    print(f"  {k}: {a}")
                else:
                    print(f"  {k}: shape {a.shape} dtype {a.dtype} "
                          f"range [{np.nanmin(a):.4g}, {np.nanmax(a):.4g}]")


if __name__ == "__main__":
    main()
