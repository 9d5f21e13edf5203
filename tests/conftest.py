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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
