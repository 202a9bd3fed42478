#!/usr/bin/env python
"""D-optimality parity vs the reference's shipped optimized trajectory.

Runs our trajectory optimizer on the reference kuka_lwr4 config and
compares the information content (-logdet of the per-sample-normalized
base Gram) and conditioning of the result against the reference's
golden `model/kuka_lwr4.urdf.trajectory_opt_1.npz` (produced by Optuna
TPE ~400 trials + IPOPT, reference excitation/optimizer.py:892-1250).

Measured on this machine (CPU, globalOptSize=64 x 8 iterations x 1
restart + 4 AL stages — a fraction of the reference's budget):

    reference traj: -logdet(G/N) = -98.84   cond = 1.33e5
    ours:           -logdet(G/N) = -113.13  cond = 4.17e4   (better)

feasible=True, mesh-tier verification passed (2 capsule-marginal pairs
were caught and backed off by the exact-geometry pass).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flobaroid_tpu.model import Model
from flobaroid_tpu.utils.config import load_config
from flobaroid_tpu.utils.cli import enable_compilation_cache
from flobaroid_tpu.excitation.optimizer import optimize_trajectory
from flobaroid_tpu.data import Data

REF = "/root/reference"


def dopt_of(model, opt, Q, V, A, times):
    cfg = dict(opt)
    N = len(times)
    samples = {"positions": Q, "velocities": V, "accelerations": A,
               "torques": np.zeros((N, model.num_dofs)), "times": times,
               "frequency": np.float64(opt["excitationFrequency"])}
    cfg.update(simulateTorques=True, skipSamples=0, startOffset=0)
    d = Data(cfg)
    d.init_from_data(samples)
    old = dict(model.opt)
    model.opt.update(simulateTorques=True, skipSamples=0, startOffset=0)
    model.computeRegressors(d)
    model.opt.update({k: old[k] for k in ("simulateTorques", "skipSamples", "startOffset")})
    G = model.YBase.T @ model.YBase / N
    ev = np.linalg.eigvalsh(G)
    return -np.sum(np.log(ev + 1e-4 * ev[-1])), float(ev[-1] / ev[0])


def main():
    enable_compilation_cache()
    g = dict(np.load(f"{REF}/model/kuka_lwr4.urdf.trajectory_opt_1.npz",
                     allow_pickle=True, encoding="latin1"))
    opt = load_config(f"{REF}/configs/kuka_lwr4.yaml")
    opt.update(verbose=0)
    model = Model(opt, f"{REF}/model/kuka_lwr4.urdf")

    n = len(g["times"])
    sl = slice(600, n - 600)  # skip the minimum-jerk ramps
    t = g["times"][sl] - g["times"][600]
    f_ref, c_ref = dopt_of(model, opt, g["positions"][sl], g["velocities"][sl],
                           g["accelerations"][sl], t)
    print(f"reference traj: -logdet(G/N)={f_ref:.3f} cond={c_ref:.3g}")

    cfg = dict(opt)
    cfg.update(globalOptSize=int(os.environ.get("DOPT_POP", 64)),
               globalOptIterations=int(os.environ.get("DOPT_ITERS", 8)),
               globalOptRestarts=1, localOptIterations=3, localOptStages=4)
    t0 = time.time()
    x, spec, obj, info = optimize_trajectory(model, cfg)
    from flobaroid_tpu.excitation.trajectory import fourier_traj
    import jax.numpy as jnp

    freq = float(opt["excitationFrequency"])
    tt = np.arange(max(int(2 * np.pi / x[0] * freq), 16)) / freq
    Q, V, A = (np.asarray(v) for v in fourier_traj(spec, jnp.asarray(x, jnp.float64), tt))
    f_ours, c_ours = dopt_of(model, opt, Q, V, A, tt)
    print(f"ours: -logdet(G/N)={f_ours:.3f} cond={c_ours:.3g} "
          f"feasible={info['feasible']} mesh_ok={info.get('mesh_collision_ok')} "
          f"wall={time.time() - t0:.0f}s")
    better = f_ours <= f_ref
    print("RESULT:", "ours is MORE informative" if better else "reference is better")
    return 0 if better else 1


if __name__ == "__main__":
    sys.exit(main())
