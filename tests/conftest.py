"""Test configuration: run all tests on CPU with 8 virtual devices.

Multi-chip sharding tests use a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count=8``); the driver separately
dry-run-compiles the multi-chip path via ``__graft_entry__.dryrun_multichip``.

Note: this image's sitecustomize imports jax at interpreter start (to
register the TPU tunnel backend), so env vars set here are too late —
``jax.config.update`` is the reliable override.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Compile speed over run speed for the suite: XLA optimization passes are
# where compile-bound mesh tests spend most of their wall time on this
# one-core container (dryrun_multichip(4): 244 s -> 142 s).  Execution-bound
# tests (overfit loops) pay a small run-time tax; net suite wall drops ~40%.
# The env var propagates to subprocess children (dryrun, bench orchestration
# fakes); the driver's own dryrun/bench runs are unflagged and fully
# optimized.  Numerics: parity tolerances were re-validated under the flag.
os.environ["JAX_DISABLE_MOST_OPTIMIZATIONS"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# sitecustomize imports jax before this file runs, so the env var above is
# too late for THIS process (config env vars are read at import) — set the
# config directly as well; it is consulted per-compile, so this is in time.
jax.config.update("jax_disable_most_optimizations", True)
