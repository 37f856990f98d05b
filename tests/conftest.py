"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

The engine is validated numerically on CPU with x64 enabled (the reference
is all-double); TPU execution uses f32 with re-centering and is exercised
by bench.py / __graft_entry__.py on real hardware.
"""

import os

# Raise the stack ceiling: XLA:CPU's compiler recurses deeply on the large
# fused solver programs and can overflow the default 8 MB main-thread stack
# (observed as a segfault inside backend_compile_and_load).
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except Exception:
    pass

# Must be set before jax is imported anywhere. Force CPU: the session env
# pins JAX_PLATFORMS to the tunneled TPU backend, which tests must not use.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon sitecustomize imports jax at interpreter startup
# and sets jax_platforms="axon,cpu" (TPU tunnel first) — by then the env
# var above is too late, so force the config key directly as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU AOT
# artifacts are machine-feature specific, and reloading them on a host with
# a different feature set segfaults (observed in this environment).

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module: running several
    estimator-heavy modules in one process accumulates XLA:CPU JIT state
    until the compiler segfaults (observed repeatedly in this environment,
    always inside backend_compile_and_load after ~3 heavy modules)."""
    yield
    jax.clear_caches()
