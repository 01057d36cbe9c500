"""Test harness config: run everything on a virtual 8-device CPU mesh.

This is the TPU-side analogue of the reference's (nonexistent) multi-device
test story — shardings are validated on fake CPU devices exactly as the
driver's dryrun_multichip does (SURVEY.md §4).

Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-register an accelerator plugin and force its
# platform programmatically (which overrides the env var), so set the
# config knob too — tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite compiles ~10 large training graphs;
# caching them across runs cuts repeat wall time substantially.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
