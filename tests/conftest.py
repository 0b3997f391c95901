"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

All tests run on CPU so they are hermetic and fast; multi-chip sharding
paths are exercised on the 8 virtual devices (the driver separately
dry-runs the multichip path via __graft_entry__.dryrun_multichip).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
