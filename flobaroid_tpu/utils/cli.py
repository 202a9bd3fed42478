"""Shared CLI plumbing for the pipeline scripts (trajectory / simulator /
excite / identifier), mirroring the reference's argparse + YAML pattern
(reference: identifier.py:1441-1505, simulator.py:20-80)."""

from __future__ import annotations

import argparse
import os

from .config import load_config


def setup_jax(prefer_cpu: bool = False) -> None:
    """Honor JAX_PLATFORMS from the environment and enable the
    persistent compilation cache. prefer_cpu pins the process to the
    host backend unless the environment explicitly asks otherwise —
    for CLIs with no accelerator content (visualization), where
    per-frame dispatches through a remote-execution relay would
    dominate the wall clock.

    Some environments pre-import jax via sitecustomize with their own
    platform baked in, which silently overrides the env var. Re-apply it
    through the config API so `JAX_PLATFORMS=cpu python simulator.py ...`
    behaves as documented.

    The compilation cache matters a lot here: big unrolled-tree graphs
    (30-DOF regressor batches, suspended-base scans) take 10-600 s to
    compile but re-load in <1 s across processes."""
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if prefer_cpu:
        # the platform env var is typically baked in by the runtime
        # harness, not chosen by the user — for host-only CLIs override
        # it outright (must run before any backend initialization)
        plat = "cpu"
    if plat:
        # keep the host backend registered: the parameter-space solvers
        # (conic.py) pin themselves to jax.devices("cpu"), and an
        # exclusive accelerator platform list would hide it
        # (RuntimeError: Unknown backend cpu)
        plats = [p.strip() for p in plat.split(",") if p.strip()]
        if "cpu" not in plats:
            plats.append("cpu")
        try:
            jax.config.update("jax_platforms", ",".join(plats))
        except RuntimeError:
            pass  # backends already initialized
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    if os.environ.get("FLOBAROID_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "FLOBAROID_COMPILE_CACHE", os.path.expanduser("~/.cache/flobaroid_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (RuntimeError, OSError):
        pass


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True, help="YAML configuration file")
    p.add_argument("-m", "--model", required=True, help="robot URDF model file")
    p.add_argument("--regressor", help="regressor XML with joint name ordering")
    return p


def load_cli_config(args) -> dict:
    cfg = load_config(args.config)
    cfg["urdf"] = args.model
    if getattr(args, "regressor", None):
        cfg["regressor"] = args.regressor
    return cfg
