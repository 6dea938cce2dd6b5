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

# sitecustomize may have registered the axon TPU backend before this file
# ran; force the platform at the config level too so default_backend() is
# cpu regardless of import order.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the suite's 3D kernels take minutes to
# compile on CPU; cache across runs
_cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
