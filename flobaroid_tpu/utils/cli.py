"""Shared CLI plumbing for the pipeline scripts (trajectory / simulator /
excite / identifier), mirroring the reference's argparse + YAML pattern
(reference: identifier.py:1441-1505, simulator.py:20-80)."""

from __future__ import annotations

import argparse
import os

from .config import load_config


def setup_jax() -> None:
    """Honor JAX_PLATFORMS from the environment.

    Some environments pre-import jax via sitecustomize with their own
    platform baked in, which silently overrides the env var. Re-apply it
    through the config API so `JAX_PLATFORMS=cpu python simulator.py ...`
    behaves as documented."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except RuntimeError:
            pass  # backends already initialized


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True, help="YAML configuration file")
    p.add_argument("--model", required=True, help="robot URDF model file")
    p.add_argument("--regressor", help="regressor XML with joint name ordering")
    return p


def load_cli_config(args) -> dict:
    cfg = load_config(args.config)
    cfg["urdf"] = args.model
    if getattr(args, "regressor", None):
        cfg["regressor"] = args.regressor
    return cfg
