#!/usr/bin/env python
"""Optimize and sample an excitation trajectory.

CLI counterpart of the reference's trajectory.py: optimize Fourier
parameters (D-optimality + limits), sample the final kinematics,
optionally append minimum-jerk transitions / sudden stops / static
postures, run the observability analysis, and save the trajectory npz
with the reference's key contract (trajectory.py:197-266: a, b, q, nf,
wf, use_deg, static/angles, joint_limits, sampled kinematics,
unobservable_params / observability_threshold / n_observable_base_params).
"""

from __future__ import annotations

import numpy as np

from flobaroid_tpu.utils.cli import base_parser, load_cli_config, setup_jax


def sample_final(spec, x, config):
    from flobaroid_tpu.excitation.trajectory import fourier_traj

    import jax.numpy as jnp

    freq = float(config["excitationFrequency"])
    wf = float(x[0])
    duration = 2 * np.pi / wf
    n = max(int(duration * freq), 16)
    times = np.arange(n) / freq
    Q, V, A = fourier_traj(spec, jnp.asarray(x, jnp.float64), times)
    return times, np.asarray(Q), np.asarray(V), np.asarray(A)


def observability(model, Q, V, A, times, config):
    """SVD observability analysis of the final trajectory's base
    regressor (reference trajectory.py:226-264)."""
    from flobaroid_tpu.data import Data

    N = len(times)
    fb = 6 if config["floatingBase"] else 0
    samples = {
        "positions": Q,
        "velocities": V,
        "accelerations": A,
        "torques": np.zeros((N, model.num_dofs + fb)),
        "times": times,
        "frequency": np.float64(config["excitationFrequency"]),
        "base_rpy": np.zeros((N, 3)),
        "base_velocity": np.zeros((N, 6)),
        "base_acceleration": np.zeros((N, 6)),
    }
    cfg = dict(config)
    cfg.update(simulateTorques=True, skipSamples=0, startOffset=0)
    data = Data(cfg)
    data.init_from_data(samples)
    old = dict(model.opt)
    model.opt.update(simulateTorques=True, skipSamples=0, startOffset=0)
    model.computeRegressors(data)
    model.opt.update({k: old[k] for k in ("simulateTorques", "skipSamples", "startOffset")})
    YB = model.YBase
    U, S, Vt = np.linalg.svd(YB, full_matrices=False)
    thresh = float(config.get("observabilityThreshold", 1e-6))
    n_unobs = int(np.sum(S < S[0] * thresh))
    n_base = YB.shape[1]
    unobs_params = []
    if n_unobs > 0:
        V_un = Vt[-n_unobs:, :]
        energy = np.sum(V_un**2, axis=0)
        proj = model.B if config.get("useBasisProjection", 0) else model.Pb
        per_param = proj @ energy
        unobs_params = np.where(per_param > 0.5)[0].tolist()
    return unobs_params, thresh, n_base - n_unobs


def main():
    setup_jax()
    p = base_parser("Optimize an excitation trajectory")
    p.add_argument("--filename", help="output trajectory npz")
    p.add_argument("--world", help="world URDF for collision checks")
    p.add_argument(
        "--model_real",
        help="ground-truth URDF: posture optimizer minimizes the "
        "identified-parameter error against it (reference parity)",
    )
    args = p.parse_args()
    config = load_cli_config(args)
    if args.world:
        config["worldUrdf"] = args.world

    from flobaroid_tpu.excitation.optimizer import optimize_trajectory
    from flobaroid_tpu.excitation.trajectory import minimum_jerk_transition
    from flobaroid_tpu.model import Model
    from flobaroid_tpu.simulation.effects import add_sudden_stops

    model = Model(config, config["urdf"], regressor_file=config.get("regressor"))
    config.setdefault("num_dofs", model.num_dofs)
    config.setdefault("jointNames", model.jointNames)
    traj_file = args.filename or (config["urdf"] + ".trajectory.npz")
    freq = float(config["excitationFrequency"])

    explicit_postures = [
        list(p[: model.num_dofs])
        for p in (config.get("staticPostures") or [])
        if len(p) >= model.num_dofs
    ] if not config.get("floatingBase", 0) else []
    if config.get("useStaticTrajectories", 0) or explicit_postures:
        if explicit_postures and not config.get("useStaticTrajectories", 0):
            # reference: a staticPostures list in the config is played
            # back directly without posture optimization
            # (reference trajectory.py:158-161)
            angles = [np.asarray(p, dtype=float) for p in explicit_postures]
        else:
            from flobaroid_tpu.excitation.posture import optimize_postures

            x_std_real = None
            if args.model_real:
                from flobaroid_tpu.models.urdf import load_urdf

                x_std_real = load_urdf(args.model_real).std_params()
            angles = optimize_postures(model, config, x_std_real=x_std_real)
        from flobaroid_tpu.excitation.trajectory import FixedPositionTrajectory

        traj = FixedPositionTrajectory(config).initWithAngles(angles)
        arr = traj._array
        save = {
            "static": True,
            "angles": np.array([np.asarray(a) for a in angles], dtype=object),
            "positions": arr.positions,
            "velocities": arr.velocities,
            "accelerations": arr.accelerations,
            "times": arr.times,
            "frequency": np.float64(freq),
        }
        np.savez(traj_file, **save)
        print(f"Saved static trajectory to {traj_file}")
        return

    # seeds from previous solutions + measurement priors
    seeds = []
    for fn in config.get("trajectorySeedSolutions", []) or []:
        try:
            with np.load(fn, allow_pickle=True) as f:
                from flobaroid_tpu.excitation.trajectory import FourierSpec

                nf = tuple(int(v) for v in f["nf"])
                sp = FourierSpec(nf=nf)
                seeds.append(
                    sp.join(float(f["wf"]), np.asarray(f["q"], float), list(f["a"]), list(f["b"]))
                )
        except (OSError, KeyError) as e:
            print(f"could not load seed {fn}: {e}")

    yty_prior = None
    for fn in config.get("trajectoryPriorMeasurements", []) or []:
        from flobaroid_tpu.data import Data

        d = Data(config)
        d.init_from_files([[fn]])
        cfg2 = dict(config)
        m2 = Model(cfg2, config["urdf"], regressor_init=False)
        m2.Pb = model.Pb
        m2.B = getattr(model, "B", None)
        m2.K = model.K
        m2.num_base_params = model.num_base_params
        m2.num_base_inertial_params = model.num_base_inertial_params
        cfg2["useStructuralRegressor"] = 1
        m2.computeRegressors(d)
        G = m2.YBase.T @ m2.YBase
        yty_prior = G if yty_prior is None else yty_prior + G

    print("Optimizing trajectory (global + local)...")
    x, spec, obj, info = optimize_trajectory(model, config, yty_prior=yty_prior, seeds=seeds)
    print(f"result: f={info['f']:.2f} feasible={info['feasible']} "
          f"observable={info['n_observable']}/{model.num_base_params} "
          f"max violation={info['max_violation']:.4g}")

    times, Q, V, A = sample_final(spec, x, config)

    # transitions from/to zero posture (reference trajectory.py:150-190)
    trans_dur = float(config.get("transitionDuration", 3.0))
    if trans_dur > 0:
        t_in, q_in, v_in, a_in = minimum_jerk_transition(np.zeros(model.num_dofs), Q[0], trans_dur, freq)
        t_out, q_out, v_out, a_out = minimum_jerk_transition(Q[-1], np.zeros(model.num_dofs), trans_dur, freq)
        times = np.concatenate([t_in, times + t_in[-1] + 1 / freq, t_out + t_in[-1] + times[-1] + 2 / freq])
        Q = np.concatenate([q_in, Q, q_out])
        V = np.concatenate([v_in, V, v_out])
        A = np.concatenate([a_in, A, a_out])

    # reference key: simulateNumStops (trajectory.py:126);
    # simulateSuddenStops is this repo's earlier spelling
    num_stops = int(config.get("simulateNumStops", 0)
                    or config.get("simulateSuddenStops", 0) or 0)
    if num_stops:
        Q, V, A = add_sudden_stops(times, Q, V, A, freq, num_stops=num_stops)

    wf, q0, a_list, b_list = spec.ragged(x)
    save = {
        "use_deg": bool(config["useDeg"]),
        "static": False,
        "a": np.array([np.asarray(ai) for ai in a_list], dtype=object),
        "b": np.array([np.asarray(bi) for bi in b_list], dtype=object),
        "q": np.asarray(q0),
        "nf": np.asarray(spec.nf),
        "wf": float(wf),
        "positions": Q,
        "velocities": V,
        "accelerations": A,
        "times": times,
        "frequency": np.float64(freq),
    }
    if spec.limits is not None:
        save["joint_limits"] = np.asarray(spec.limits)

    unobs, thresh, n_obs = observability(model, Q, V, A, times, config)
    save["unobservable_params"] = np.asarray(unobs, dtype=np.int64)
    save["observability_threshold"] = thresh
    save["n_observable_base_params"] = n_obs
    print(f"Observability: {n_obs}/{model.num_base_params} base params; "
          f"{len(unobs)} unobservable std params")

    np.savez(traj_file, **save)
    print(f"Saved trajectory to {traj_file}")


if __name__ == "__main__":
    main()
