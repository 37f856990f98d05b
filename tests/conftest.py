"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

The engine is validated numerically on CPU with x64 enabled (the reference
is all-double); TPU execution uses f32 with re-centering and is exercised
by bench.py / __graft_entry__.py on real hardware.
"""

import os

# Must be set before jax is imported anywhere. Force CPU: the session env
# pins JAX_PLATFORMS to the tunneled TPU backend, which tests must not use.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the engine compiles a handful of large
# programs (optimize / marginalize per window geometry); caching them on
# disk makes repeated test runs start in seconds instead of minutes.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
