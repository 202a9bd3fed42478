#!/usr/bin/env python
"""Convert CSV joint logs to the measurements npz contract.

Counterpart of the reference's tools/csv2npz.py: reads per-channel CSV
files (or one combined CSV), applies the standard preprocessing chain
(filtering + differentiation) and writes a measurements npz compatible
with identifier.py.

Usage:
  python tools/csv2npz.py --config cfg.yaml --model robot.urdf \
      --csv log.csv --time-col 0 --pos-cols 1:8 --tau-cols 8:15 \
      --out measurements.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from flobaroid_tpu.data import Data  # noqa: E402
from flobaroid_tpu.utils.config import load_config  # noqa: E402


def parse_cols(spec: str):
    if ":" in spec:
        a, b = spec.split(":")
        return list(range(int(a), int(b)))
    return [int(v) for v in spec.split(",")]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--csv", required=True)
    p.add_argument("--time-col", type=int, default=0)
    p.add_argument("--pos-cols", required=True)
    p.add_argument("--vel-cols", default=None)
    p.add_argument("--tau-cols", required=True)
    p.add_argument("--delimiter", default=",")
    p.add_argument("--skip-header", type=int, default=1)
    p.add_argument("--out", default="measurements.npz")
    args = p.parse_args()

    cfg = load_config(args.config)
    cfg["urdf"] = args.model
    raw = np.genfromtxt(args.csv, delimiter=args.delimiter, skip_header=args.skip_header)
    t = raw[:, args.time_col]
    t = t - t[0]
    Q = raw[:, parse_cols(args.pos_cols)]
    Tau = raw[:, parse_cols(args.tau_cols)]
    if args.vel_cols:
        V = raw[:, parse_cols(args.vel_cols)]
    else:
        V = np.gradient(Q, t, axis=0)
    freq = 1.0 / float(np.median(np.diff(t)))

    samples = {
        "positions": Q,
        "velocities": V,
        "accelerations": np.zeros_like(V),
        "torques": Tau,
        "times": t,
        "frequency": np.float64(freq),
    }
    data = Data(cfg)
    data.init_from_data(samples)
    data.preprocess()
    np.savez(args.out, **data.samples)
    print(f"wrote {args.out}: {Q.shape[0]} samples at {freq:.1f} Hz, {Q.shape[1]} joints")


if __name__ == "__main__":
    main()
