"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Env vars alone are NOT enough on hosts whose sitecustomize force-registers a
TPU platform plugin and overwrites ``jax_platforms`` at interpreter start —
we must override the config again, before any backend initialization (this
file imports before every test module, so placing it here is sufficient).

Selection policy: compile-heavy tests (full-pipeline / scanner / stream
programs, minutes of cold XLA compile each) carry ``@pytest.mark.slow``.
``pytest tests/ -m "not slow"`` is the quick gate (~90 tests, <3 min cold);
the FULL suite is the pre-merge bar and runs warm in ~5 min once the
persistent compilation cache (JAX_COMPILATION_CACHE_DIR) is populated.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
# same freeze applies to the cache env vars — set the config explicitly so
# recompiles actually persist across test runs
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
assert len(jax.devices()) >= 8, "virtual 8-device CPU mesh not active"
