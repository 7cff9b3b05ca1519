"""TPU-only tests: exercise the REAL Mosaic/Pallas kernels on a live chip.

The main suite (``tests/``) pins itself to a virtual CPU mesh; there the
Pallas kernels take the ``_hat_pass_jnp`` fallback except in
``tests/test_kernel_parity.py``, which flips interpreter mode to check the
kernel LOGIC. This suite is the complement: it runs nothing unless
``jax.default_backend() == "tpu"`` and validates the compiled Mosaic
LOWERING of the same kernels (layout, dynamic lane slicing, roll ladder).

Run manually on a TPU host:  ``python -m pytest tests_tpu/ -q``
(it is intentionally NOT collected by ``pytest tests/``).
"""

import pytest

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires a real TPU backend")
        for item in items:
            item.add_marker(skip)
