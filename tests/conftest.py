"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never touch real TPU hardware; multi-chip sharding is validated on
``xla_force_host_platform_device_count=8`` CPU devices (the driver
separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Must happen before jax import: disable the axon TPU backend registration
# and force an 8-device CPU platform.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
