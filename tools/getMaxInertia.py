#!/usr/bin/env python
"""Maximum apparent inertia per joint over random configurations
(counterpart of the reference's tools/getMaxInertia.py; useful for
controller gain tuning)."""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("urdf")
    p.add_argument("--samples", type=int, default=200)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flobaroid_tpu.dynamics.engine import DynamicsEngine
    from flobaroid_tpu.models.urdf import load_urdf

    tree = load_urdf(args.urdf)
    eng = DynamicsEngine(tree)
    pi = jnp.asarray(tree.std_params())
    lims = tree.joint_limits()
    lo = np.array([lims[j]["lower"] for j in tree.dof_names])
    hi = np.array([lims[j]["upper"] for j in tree.dof_names])
    lo = np.where(np.isfinite(lo), lo, -np.pi)
    hi = np.where(np.isfinite(hi), hi, np.pi)
    rng = np.random.default_rng(0)
    Q = lo + (hi - lo) * rng.random((args.samples, tree.num_dofs))
    M = jax.vmap(lambda q: eng.mass_matrix(pi, q, floating=False))(jnp.asarray(Q))
    diag = np.asarray(jnp.diagonal(M, axis1=1, axis2=2))
    for j, name in enumerate(tree.dof_names):
        print(f"{name}: max apparent inertia {diag[:, j].max():.4f} kg m^2 "
              f"(min {diag[:, j].min():.4f})")


if __name__ == "__main__":
    main()
