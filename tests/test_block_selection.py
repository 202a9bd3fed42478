"""Venture-2009 block selection (reference identification/data.py:205-344,
identifier.py:1564-1589): well-excited blocks must be preferred over
poorly excited ones, and identification on the selected blocks must
beat identification on an equal number of bad blocks."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from flobaroid_tpu.data import Data
from flobaroid_tpu.identification.identifier import Identification
from flobaroid_tpu.utils.config import load_config

from test_identification import synth_samples

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ARM_URDF = os.path.join(REPO, "examples", "models", "sevenlink_arm.urdf")


def mixed_blocks_samples(n_blocks=8, bs=250, seed=0):
    """Alternating well-excited / near-static blocks. Returns
    (samples, good_block_ids)."""
    good, _ = synth_samples(ARM_URDF, n=n_blocks * bs, noise=0.02, seed=seed)
    bad, _ = synth_samples(ARM_URDF, n=n_blocks * bs, noise=0.02, seed=seed + 1)
    # degrade the bad source: almost no motion -> gravity-only rows
    for k in ("velocities", "accelerations"):
        bad[k] = bad[k] * 1e-3
    # recompute bad torques for the degraded states
    from flobaroid_tpu.dynamics.engine import DynamicsEngine
    from flobaroid_tpu.models.urdf import load_urdf
    import jax, jax.numpy as jnp

    tree = load_urdf(ARM_URDF)
    eng = DynamicsEngine(tree)
    pi = jnp.asarray(tree.std_params())
    tau = jax.vmap(lambda q, dq, ddq: eng.inverse_dynamics(pi, q, dq, ddq, floating=False))(
        jnp.asarray(bad["positions"]), jnp.asarray(bad["velocities"]),
        jnp.asarray(bad["accelerations"]))
    rng = np.random.default_rng(seed + 2)
    bad["torques"] = np.asarray(tau) + 0.02 * rng.standard_normal(tau.shape)

    out = {}
    good_ids = []
    for k in good:
        gv, bv = np.asarray(good[k]), np.asarray(bad[k])
        if gv.ndim == 0:
            out[k] = gv
            continue
        parts = []
        for b in range(n_blocks):
            src = gv if b % 2 == 0 else bv
            parts.append(src[b * bs:(b + 1) * bs])
        out[k] = np.concatenate(parts)
    good_ids = [b for b in range(n_blocks) if b % 2 == 0]
    out["times"] = np.arange(n_blocks * bs) / 200.0
    return out, good_ids


def _opt(**kw):
    o = load_config(None, overrides=dict(
        floatingBase=0, verbose=0, useStructuralRegressor=1, randomSamples=800,
        computeDtype="float64", estimateWith="std", constrainToConsistent=0,
        startOffset=0, skipSamples=0,
    ))
    o.update(kw)
    return o


@pytest.mark.timeout(120)
def test_selection_prefers_excited_blocks(tmp_path):
    samples, good_ids = mixed_blocks_samples()
    f = tmp_path / "m.npz"
    np.savez(f, **samples)

    opt = _opt(blockSize=250, selectBestPerenctage=50)
    idf = Identification(opt, ARM_URDF, measurements_files=[[str(f)]])
    m = idf.model
    m.computeRegressors(idf.data)
    rows_per = m.num_dofs
    conds, link_conds, grams = [], [], []
    n_blocks = idf.data.num_blocks()
    for b in range(n_blocks):
        Yb = m.YBase[b * 250 * rows_per:(b + 1) * 250 * rows_per]
        conds.append(float(np.linalg.cond(Yb)))
        grams.append(Yb.T @ Yb)
        link_conds.append(m.getSubregressorsConditionNumbers(YBase=Yb))
    idf.data.select_blocks_from_stats(conds, link_conds, grams)
    sel = set(idf.data.selected_blocks)
    # every well-excited block beats every near-static block on cond
    assert set(good_ids).issubset(sel) or len(sel & set(good_ids)) >= 3
    bad_kept = sel - set(good_ids)
    assert len(bad_kept) <= 1, f"kept degenerate blocks {bad_kept}"

    # identification on selection beats the same-size bad-block subset
    idf.estimateParameters()
    err_sel = np.linalg.norm(m.xBase - m.xBaseModel) / np.linalg.norm(m.xBaseModel)

    opt2 = _opt(blockSize=250, selectBestPerenctage=50)
    idf2 = Identification(opt2, ARM_URDF, measurements_files=[[str(f)]])
    idf2.data.selected_blocks = [b for b in range(n_blocks) if b % 2 == 1][: len(sel)]
    idf2.data.assemble_selected_blocks()
    idf2.estimateParameters()
    m2 = idf2.model
    err_bad = np.linalg.norm(m2.xBase - m2.xBaseModel) / np.linalg.norm(m2.xBaseModel)
    assert err_sel < err_bad, (err_sel, err_bad)


def test_variance_dedup_drops_near_duplicates():
    d = Data(dict(verbose=0, blockSize=10, selectBestPerenctage=100,
                  skipSamples=0, startOffset=0))
    d.measurements = {"positions": np.zeros((40, 2)), "times": np.arange(40.0)}
    # 4 blocks: two with identical link-cond variance patterns
    conds = [1.0, 1.1, 1.2, 50.0]
    link_conds = [
        [10.0, 20.0], [10.0, 20.0],  # near-duplicates
        [5.0, 400.0], [300.0, 1e4],
    ]
    d.select_blocks_from_stats(conds, link_conds)
    assert len(d.selected_blocks) < 4
    assert not {0, 1}.issubset(set(d.selected_blocks))


@pytest.mark.timeout(90)
def test_cli_block_selection(tmp_path):
    samples, good_ids = mixed_blocks_samples()
    f = tmp_path / "m.npz"
    np.savez(f, **samples)
    cfg = dict(
        floatingBase=0, verbose=0, useStructuralRegressor=1, randomSamples=800,
        estimateWith="std", constrainToConsistent=0, startOffset=0,
        selectBlocksFromMeasurements=1, blockSize=250, selectBestPerenctage=50,
        preprocessMeasurements=0,
    )
    cfg_file = tmp_path / "cfg.yaml"
    with open(cfg_file, "w") as fh:
        yaml.safe_dump(cfg, fh)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "identifier.py"), "--config", str(cfg_file),
         "--model", ARM_URDF, "--measurements", str(f)],
        capture_output=True, text=True, timeout=500, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "selected blocks:" in r.stdout
