"""Test config: force the CPU backend with 8 virtual devices.

Multi-device sharding tests run on a virtual host mesh
(``--xla_force_host_platform_device_count=8``) so the suite never needs real
TPU hardware. Must run before the first ``import jax``.
"""

import os

# Hard override: the environment pre-sets JAX_PLATFORMS=axon (a tunneled TPU
# with ~seconds of per-op latency); the test suite must run on local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
