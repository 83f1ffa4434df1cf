"""Test config: force the CPU backend with 8 virtual devices.

The environment pre-imports jax via an axon sitecustomize and pins
``JAX_PLATFORMS=axon`` (a tunneled TPU with seconds of per-compile latency),
so plain env-var overrides are too late — ``jax.config.update`` is the only
reliable switch. Multi-device sharding tests run on a virtual host mesh
(``--xla_force_host_platform_device_count=8``) so the suite never needs real
TPU hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent XLA compilation cache: the suite is compile-bound on the 1-CPU
# test host; repeat runs hit the cache and finish in a fraction of the time
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_compilation_cache",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow end-to-end tests")
