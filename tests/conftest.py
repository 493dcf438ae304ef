"""Test configuration: CPU backend, x64, 8 virtual devices for sharding tests.

Mirrors the reference's test conditions (CPU + float64,
``/root/reference/tests/test_solvers.py:17-18``) and adds the standard JAX
substitute for a multi-device fixture: ``xla_force_host_platform_device_count``
so ``shard_map`` collectives are exercised without a TPU pod.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The image's sitecustomize may have registered (and selected) the axon TPU
# backend before this conftest runs; force the CPU backend for tests either
# way.  Benchmarks (bench.py) use the real TPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
