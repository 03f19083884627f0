"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

Integer codec math is platform-independent, so CPU tests validate the exact
same computations that run on TPU; multi-chip sharding tests use the 8
virtual host devices (SURVEY.md §4.8).
"""

import os

# The environment pins JAX_PLATFORMS=axon (real TPU via tunnel); tests must
# force CPU so they are fast, deterministic, and can use 8 virtual devices.
# sitecustomize may already have imported jax, so updating os.environ alone
# is not enough — set the config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
