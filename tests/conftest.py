"""Test configuration: run JAX on CPU with 8 virtual devices.

Mirrors the survey's test-strategy note (SURVEY.md §4): CPU-visible JAX
makes 'distributed' testable with a virtual device mesh, so the
pjit/mesh paths get exercised without TPU hardware.

Note: this environment pre-imports JAX at interpreter startup (axon
sitecustomize) with JAX_PLATFORMS=axon, so plain env vars in conftest
are too late — we must override through jax.config before first use.
Unit tests must run on CPU: fast, deterministic, fp32 (the TPU's bf16
matmul default would break fp32 tolerances).
"""

import os

# Persistent compilation cache: compiles dominate test wall-time on the
# single-core CPU host, and they are identical run to run.
_CACHE = os.path.abspath(os.path.join(os.path.dirname(__file__), '..',
                                      '.jax_cache'))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', _CACHE)
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '0')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_compilation_cache_dir', _CACHE)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
