"""Reporting backends: console tables, LaTeX, HTML(SVG), TikZ export
(reference identification/output.py:35-960)."""

import os

import numpy as np
import pytest

from flobaroid_tpu.identification.identifier import Identification
from flobaroid_tpu.output import OutputConsole, OutputMatplotlib
from flobaroid_tpu.utils.config import load_config

from test_identification import synth_samples

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ARM_URDF = os.path.join(REPO, "examples", "models", "sevenlink_arm.urdf")


@pytest.fixture(scope="module")
def idf_done(tmp_path_factory):
    samples, _ = synth_samples(ARM_URDF, n=900, noise=0.02)
    d = tmp_path_factory.mktemp("out")
    f = d / "m.npz"
    np.savez(f, **samples)
    opt = load_config(None, overrides=dict(
        floatingBase=0, verbose=0, useStructuralRegressor=1, randomSamples=800,
        computeDtype="float64", estimateWith="std", constrainToConsistent=0,
        startOffset=0,
    ))
    idf = Identification(opt, ARM_URDF, urdf_file_real=ARM_URDF,
                         measurements_files=[[str(f)]], validation_file=str(f))
    idf.estimateParameters()
    idf.estimateValidationTorques()
    return idf


def test_console_includes_validation(idf_done, capsys):
    text = OutputConsole(idf_done).render()
    assert "validation:" in text
    assert "torque estimation error" in text


def test_html_report_has_validation_figure(idf_done, tmp_path):
    out = tmp_path / "report.html"
    html = OutputMatplotlib(idf_done, text="console").render(str(out))
    assert out.exists()
    assert "Validation torques" in html or "validation" in html


def test_tikz_export(idf_done, tmp_path):
    om = OutputMatplotlib(idf_done)
    tex = om.render_tikz(str(tmp_path / "plots.tex"))
    assert (tmp_path / "plots.tex").exists()
    assert "\\begin{axis}" in tex and "\\addplot" in tex
    # one axis per joint torque plot + per validation plot
    assert tex.count("\\begin{axis}") == 2 * idf_done.model.num_dofs
    # outputAs: tikz flows through render()
    idf_done.opt["outputAs"] = "tikz"
    idf_done.opt["outputFilename"] = str(tmp_path / "r.html")
    om.render()
    assert (tmp_path / "r.tex").exists()
    idf_done.opt["outputAs"] = "html"


def test_latex_table(idf_done):
    tex = OutputConsole(idf_done).render_latex()
    assert "\\begin{tabular}" in tex


def test_bench_json_safe_strips_nonfinite():
    """The bench's JSON line must stay strict-JSON even when the SDP
    certificate carries inf/nan (e.g. newton_lambda on an uncentered
    solve) — json.dumps would otherwise emit the invalid tokens
    Infinity/NaN."""
    import importlib.util
    import json
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = bench
    spec.loader.exec_module(bench)
    raw = {"a": float("inf"), "b": [float("nan"), 1.0],
           "c": {"d": -float("inf"), "e": "x"}}
    out = bench._json_safe(raw)
    s = json.dumps(out)  # must not raise / contain Infinity
    assert "Infinity" not in s and "NaN" not in s
    assert json.loads(s) == {"a": None, "b": [None, 1.0],
                             "c": {"d": None, "e": "x"}}
