"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Note: the environment may pre-import jax (sitecustomize) with
# JAX_PLATFORMS baked in, so the env var alone is not enough — the
# config update below is what actually forces the CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from flobaroid_tpu.utils.cli import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")
REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="session")
def reference_model_dir():
    d = REFERENCE / "model"
    if not d.exists():
        pytest.skip("reference model dir not available")
    return d


@pytest.fixture(scope="session")
def threelinks_urdf(reference_model_dir):
    return str(reference_model_dir / "threeLinks.urdf")


@pytest.fixture(scope="session")
def kuka_urdf(reference_model_dir):
    return str(reference_model_dir / "kuka_lwr4.urdf")
