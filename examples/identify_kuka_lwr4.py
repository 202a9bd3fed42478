#!/usr/bin/env python
"""KUKA LWR4 identification example — the reference's
examples/identify_kuka_lwr4.sh flow.

The reference runs its identifier on real hardware measurements
(data/KUKA/HW/measurements_{1,2,3}.npz). Those files are git-lfs
pointer stubs in this checkout, so this example reproduces the same
experiment from the artifacts that ARE shipped: torque measurements are
simulated with the reference's identified model (the closest available
proxy for the real robot) along the reference's own optimized
trajectory (model/kuka_lwr4.urdf.trajectory_opt_1.npz), then the full
pipeline identifies starting from the a-priori CAD URDF and validates
on held-out samples. Context and thresholds match
tests/test_reference_artifacts.py and the reference's reported
hardware numbers (held-out NRMS 0.176-0.211%, BASELINE.md).

Usage: python examples/identify_kuka_lwr4.py
(set FLOBAROID_REFERENCE if the upstream checkout is not /root/reference)
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.environ.get("FLOBAROID_REFERENCE", "/root/reference")
CFG = os.path.join(REF, "configs", "kuka_lwr4.yaml")
URDF = os.path.join(REF, "model", "kuka_lwr4.urdf")
URDF_ID = os.path.join(REF, "model", "kuka_lwr4_identified.urdf")
TRAJ = os.path.join(REF, "model", "kuka_lwr4.urdf.trajectory_opt_1.npz")

for f in (CFG, URDF, URDF_ID, TRAJ):
    if not os.path.exists(f):
        sys.exit(f"missing reference artifact: {f}")

from flobaroid_tpu.identification.identifier import Identification
from flobaroid_tpu.model import Model
from flobaroid_tpu.utils.cli import enable_compilation_cache
from flobaroid_tpu.utils.config import load_config

enable_compilation_cache()

opt = load_config(CFG)
opt.update(verbose=0, createPlots=0, useAPriori=1, startOffset=0)

with np.load(TRAJ, allow_pickle=True, encoding="latin1") as f:
    golden = {k: f[k] for k in ("positions", "velocities", "accelerations",
                                "times", "frequency")}

print("simulating measurements with the reference's identified model "
      "along its optimized trajectory...")
truth = Model(dict(opt), URDF_ID)
N = len(golden["times"])
tau = truth.simulate_dynamics(golden, np.arange(N))
rng = np.random.default_rng(7)
samples = dict(golden)
samples["torques"] = tau + rng.normal(0, 0.01, tau.shape)

split = N // 2
tmp = tempfile.mkdtemp(prefix="kuka_example_")
est_file = os.path.join(tmp, "est.npz")
val_file = os.path.join(tmp, "val.npz")
np.savez(est_file, **{k: (v[:split] if np.ndim(v) else v) for k, v in samples.items()})
np.savez(val_file, **{k: (v[split:] if np.ndim(v) else v) for k, v in samples.items()})

print("identifying from the a-priori CAD model (SDP-constrained, "
      "reference config as-is)...")
idf = Identification(
    opt, URDF, urdf_file_real=URDF_ID,
    measurements_files=[[est_file]], validation_file=val_file,
)
idf.estimateParameters()
idf.estimateValidationTorques()
print(f"  residual {idf.res_error:.4f}%  held-out NRMS {idf.val_nrms:.4f}% "
      f"(reference hardware runs: 0.176-0.211%)  sdp={idf.sdp.last_status}")

from flobaroid_tpu.output import OutputConsole

print(OutputConsole(idf).render())
