"""Byte-compatibility with the reference's config files: every shipped
YAML must load through load_config and drive Model construction against
its corresponding URDF (reference configs/*.yaml)."""

import os

import numpy as np
import pytest

from flobaroid_tpu.model import Model
from flobaroid_tpu.utils.config import load_config

REF = "/root/reference"

CASES = [
    ("threeLinks.yaml", "threeLinks.urdf", "threeLinks_regressor.xml"),
    ("kuka_lwr4.yaml", "kuka_lwr4.urdf", "kuka_lwr4_regressor.xml"),
    ("kuka_lwr4_static.yaml", "kuka_lwr4.urdf", None),
    ("walkman_left_arm.yaml", "walkman_left_arm.urdf", "walkman_left_arm_regressor.xml"),
    ("walkman_full.yaml", "walkman_apriori.urdf", "walkman_regressor.xml"),
    ("walkman_static.yaml", "walkman_apriori.urdf", "walkman_regressor.xml"),
    ("walkman_cad.yaml", "walkman_apriori.urdf", "walkman_regressor.xml"),
]


@pytest.mark.parametrize("cfg,urdf,regr", CASES)
def test_reference_config_loads(cfg, urdf, regr, tmp_path):
    cfg_path = os.path.join(REF, "configs", cfg)
    urdf_path = os.path.join(REF, "model", urdf)
    if not (os.path.exists(cfg_path) and os.path.exists(urdf_path)):
        pytest.skip("reference files not available")
    opt = load_config(cfg_path)
    # every key from the file must already be known or at least accepted
    assert isinstance(opt, dict) and opt["excitationFrequency"] > 0
    regr_path = os.path.join(REF, "model", regr) if regr else None
    if regr_path and not os.path.exists(regr_path):
        regr_path = None
    # build the model (regressor projection skipped for the big ones to
    # keep CI fast; structure and parameter layout are the parity target)
    big = "walkman" in urdf
    m = Model(opt, urdf_path, regressor_file=regr_path, regressor_init=False)
    assert m.num_dofs > 0 and m.num_links > m.num_dofs / 10
    assert len(m.xStdModel) == m.num_all_params
    if not big:
        m.computeRegressorLinDepsQR()
        assert 0 < m.num_base_params <= m.num_identified_params
