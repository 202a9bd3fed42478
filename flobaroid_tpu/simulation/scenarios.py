"""Synthetic measurement scenarios generated from the engine itself.

The reference's hardest real operating point is walking-log
identification through foot force/torque contacts (WALK-MAN logs,
200 Hz, 13 770 samples, 29 DOF; reference
documentation/analysis_findings.md:122-129; contact-wrench stacking at
identification/model.py:535-560). The original logs are git-lfs stubs
in this checkout, so this module constructs an equivalent synthetic
scenario from the repo's own dynamics engine: multi-harmonic joint
motion, base sway, and ground-reaction wrenches alternating between the
feet, with the measured arrays assembled to satisfy the estimator's
model exactly (reference identifier.py:715-726):

    Y(q, v, a) . pi_true = tau_measured_stack - J^T w

Conventions (mirroring reference identification/model.py:562-576):
measured JOINT torques already contain the contact contribution
(tau_j = (Y pi)_j + (J^T w)_j); the measured BASE wrench rows are the
net base wrench (Y pi)_b (what summed foot F/T measurements provide on
a real robot) — computeRegressors adds (J^T w)_b to them before
stacking.
"""

from __future__ import annotations

import numpy as np

__all__ = ["walking_contact_scenario", "twist_from_rpy_series"]


def twist_from_rpy_series(rpy, rpy_d, rpy_dd):
    """Exact world angular velocity/acceleration of the base for an
    analytic base_rpy series under the npz STORAGE convention
    world_R_base = RPY(rpy)^T (reference suspendedDynamics.py:176-182).

    omega satisfies dR_wb/dt = S(omega) R_wb; domega is its ordinary
    time derivative (the classical mixed acceleration convention).
    Derivatives are taken by jvp through the actual rotation map, so the
    same code path the estimator uses to interpret base_rpy defines the
    twist — the scenario can now catch rpy<->twist convention drift
    instead of being consistent-by-assumption (VERDICT r3 #5a)."""
    import jax
    import jax.numpy as jnp

    from ..dynamics import spatial as sp

    def omega_of(r, rd):
        R = sp.rpy_to_rot(r).T  # world_R_base (storage convention)
        _, Rd = jax.jvp(lambda x: sp.rpy_to_rot(x).T, (r,), (rd,))
        W = Rd @ R.T
        return sp.unskew(0.5 * (W - W.T))

    def both(r, rd, rdd):
        w, dw = jax.jvp(omega_of, (r, rd), (rd, rdd))
        return w, dw

    w, dw = jax.vmap(both)(
        jnp.asarray(rpy), jnp.asarray(rpy_d), jnp.asarray(rpy_dd)
    )
    return np.asarray(w, dtype=float), np.asarray(dw, dtype=float)


def _multi_harmonic(t, mid, amp0, rng, n_harm=3, base_hz=0.3):
    """Smooth per-joint motion with analytic derivatives: a few random
    harmonics, amplitude-tapered 1/k, total excursion <= 0.55 * amp0."""
    N, nd = len(t), len(mid)
    Q = np.tile(mid, (N, 1))
    V = np.zeros((N, nd))
    A = np.zeros((N, nd))
    for k in range(1, n_harm + 1):
        w = 2 * np.pi * (base_hz * k + 0.2 * rng.random(nd))
        ph = rng.random(nd) * 2 * np.pi
        a_k = 0.3 * amp0 / k
        arg = w[None, :] * t[:, None] + ph[None, :]
        Q += a_k * np.sin(arg)
        V += a_k * w * np.cos(arg)
        A += -a_k * w**2 * np.sin(arg)
    return Q, V, A


def walking_contact_scenario(
    model,
    N: int = 4000,
    freq: float = 200.0,
    seed: int = 0,
    contact_frames=("L_foot_ft", "R_foot_ft"),
    torque_noise: float = 0.0,
    wrench_noise: float = 0.0,
    imu: bool = False,
    n_harm: int = 3,
    amp_scale: float = 1.0,
):
    """Build a walking-style contact identification scenario.

    Returns (samples, tau_full, cf_true): a measurements dict ready for
    ``Data.init_from_data``/``np.savez`` (full (N, 6+nd) torques, a
    ``contacts`` dict npz object with one (N, 6) wrench per frame), the
    noise-free inverse-dynamics rows of the generating model, and the
    true contact torque contribution J^T w.

    Noise model: torque measurement noise and F/T sensor noise are
    independent — the TRUE wrench shapes the measured joint torques
    while the stored ``contacts`` carry the noisy F/T reading.
    """
    nd = model.num_dofs
    if not model.opt.get("floatingBase", 0):
        raise ValueError("walking_contact_scenario needs floatingBase=1")
    rng = np.random.default_rng(seed)
    t = np.arange(N) / freq

    lims = model.limits
    jn = model.jointNames
    lo = np.array([lims[j]["lower"] for j in jn])
    hi = np.array([lims[j]["upper"] for j in jn])
    lo = np.where(np.isfinite(lo), lo, -np.pi)
    hi = np.where(np.isfinite(hi), hi, np.pi)
    # n_harm / amp_scale shape the excitation quality: the defaults give
    # a well-excited dataset (cond(YBase) ~ 5e2); n_harm=1 with a small
    # amp_scale gives the repetitive, barely-excited regime of real
    # walking logs (the reference measured cond ~4.3e5 there,
    # documentation/analysis_findings.md:122-129)
    Q, V, A = _multi_harmonic(
        t, 0.5 * (lo + hi), amp_scale * 0.5 * (hi - lo), rng, n_harm=n_harm
    )

    # base sway: small rpy oscillation with the world angular velocity/
    # acceleration DERIVED from the rpy series through the storage
    # convention (twist_from_rpy_series) — kinematically consistent, so
    # an rpy<->twist convention bug in the estimator shows up as a
    # parameter-recovery failure here instead of cancelling out
    f_sway = np.array([0.9, 0.6, 0.45])
    ph_sway = rng.random(3) * 2 * np.pi
    arg = 2 * np.pi * f_sway[None, :] * t[:, None] + ph_sway[None, :]
    rpy = 0.06 * np.sin(arg)
    rpy_d = 0.06 * 2 * np.pi * f_sway * np.cos(arg)
    rpy_dd = -0.06 * (2 * np.pi * f_sway) ** 2 * np.sin(arg)
    omega, domega = twist_from_rpy_series(rpy, rpy_d, rpy_dd)
    f_lin = np.array([1.1, 0.9, 1.8])
    ph_lin = rng.random(3) * 2 * np.pi
    larg = 2 * np.pi * f_lin[None, :] * t[:, None] + ph_lin[None, :]
    pos = 0.02 * np.sin(larg)
    vlin = 0.02 * 2 * np.pi * f_lin * np.cos(larg)
    alin = -0.02 * (2 * np.pi * f_lin) ** 2 * np.sin(larg)

    samples = {
        "positions": Q,
        "velocities": V,
        "accelerations": A,
        "torques": np.zeros((N, 6 + nd)),
        "times": t,
        "frequency": np.float64(freq),
        "base_rpy": rpy,
        "base_position": pos,
        "base_velocity": np.concatenate([vlin, omega], axis=1),
        "base_acceleration": np.concatenate([alin, domega], axis=1),
    }
    if imu:
        # body-frame IMU readings consistent with the base motion, for
        # driving the Data IMU-preprocessing path (data.py:222-281) in
        # the walking loop: gyro = R_wb^T omega_w, accelerometer =
        # specific force R_wb^T (a_w - g), orientation estimate IMUrpy
        # in the DIRECT convention world_R_imu = RPY(IMUrpy)
        import jax

        from ..dynamics import spatial as sp

        def per_sample(r):
            R_wb = sp.rpy_to_rot(r).T  # storage convention
            return sp.rot_to_rpy(R_wb), R_wb

        imurpy, R_wb = jax.vmap(per_sample)(np.asarray(rpy))
        R_wb = np.asarray(R_wb)
        g_vec = np.array([0.0, 0.0, -9.81])
        samples["IMUrpy"] = np.asarray(imurpy, dtype=float)
        samples["IMUrotVel"] = np.einsum("nji,nj->ni", R_wb, omega)
        samples["IMUlinAcc"] = np.einsum(
            "nji,nj->ni", R_wb, alin - g_vec[None, :]
        )
    idx = np.arange(N)
    tau_full = model.simulate_dynamics(samples, idx)  # (N, 6+nd) incl. friction

    # ground-reaction-style wrenches: vertical load alternating between
    # the feet around half the body weight, small tangential forces and
    # moments (walking single/double-support rhythm)
    Mg = 9.81 * float(np.sum(model.xStdModel[: model.num_model_params : 10]))
    step = 2 * np.pi * 0.9 * t
    load = 0.5 * (1.0 + 0.7 * np.sin(step))
    shares = [load, 1.0 - load]

    Qs, _, _, BR, _, _ = model._gather_state(samples, idx)
    cf_true = np.zeros((N, 6 + nd))
    contacts = {}
    for frame, share in zip(contact_frames, shares):
        li = model.tree.link_index.get(str(frame))
        if li is None:
            raise KeyError(f"contact frame {frame!r} not in the model")
        w6 = np.zeros((N, 6))
        w6[:, 2] = Mg * share
        w6[:, 0] = 0.08 * Mg * share * np.sin(2 * np.pi * 1.3 * t + 1.0)
        w6[:, 1] = 0.08 * Mg * share * np.cos(2 * np.pi * 1.1 * t)
        w6[:, 3] = 0.02 * Mg * share * np.sin(2 * np.pi * 0.7 * t)
        w6[:, 4] = 0.02 * Mg * share * np.cos(2 * np.pi * 0.8 * t + 0.5)
        Jt = model._contact_jacobians(li, Qs, BR)  # (N, 6+nd, 6) J^T
        cf_true += np.einsum("nkc,nc->nk", Jt, w6)
        w_meas = w6
        if wrench_noise > 0:
            w_meas = w6 + rng.normal(0, wrench_noise, w6.shape)
        contacts[str(frame)] = w_meas

    torq = tau_full.copy()
    torq[:, 6:] += cf_true[:, 6:]
    if torque_noise > 0:
        torq = torq + rng.normal(0, torque_noise, torq.shape)
    samples["torques"] = torq
    samples["contacts"] = np.array(contacts)
    return samples, tau_full, cf_true
